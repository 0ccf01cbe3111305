package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => T}

/** SURVEY §2E query entries over the `documents` table. */
object TextQueries {

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  /** E1: token counting — whitespace tokens vs BPE-ish regex tokens. */
  def textTokens(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.select(
        col("doc_id"),
        T.wsTokenCount(col("text")).as("n_ws_tokens"),
        T.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        round(length(col("text")) / T.wsTokenCount(col("text")), 4)
          .as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  /** E2: quality scoring — length/stopword/punctuation signals. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val nTok = T.wsTokenCount(col("text"))
    val stopRatio = T.tokenCountIn(col("text"), T.EnStopwords) / nTok
    val punctRatio = T.punctCount(col("text")) / length(col("text"))
    d.select(
        col("doc_id"),
        nTok.as("n_tokens"),
        round(stopRatio, 4).as("stopword_ratio"),
        round(punctRatio, 4).as("punct_ratio"),
        round(T.qualityScore(nTok, stopRatio, punctRatio), 4)
          .as("quality"))
      .orderBy(col("doc_id"))
  }

  /** E3: language-ID heuristic — marker-word hit counts per candidate
    * language, argmax with a deterministic tiebreak (en>de>es>fr). */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val scores: Seq[(String, Column)] = T.LangMarkers.map {
      case (lang, words) => lang -> T.tokenCountIn(col("text"), words)
    }
    val Seq(en, de, es, fr) = scores.map(_._2)
    val pred = when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
    d.select(
        col("doc_id"),
        en.as("s_en"), de.as("s_de"), es.as("s_es"), fr.as("s_fr"),
        pred.as("pred_lang"),
        col("lang").as("true_lang"),
        (pred === col("lang")).as("is_match"))
      .orderBy(col("doc_id"))
  }

  /** E4: document fingerprint — rolling polynomial hash. */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.select(col("doc_id"), T.polyFingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }
}
