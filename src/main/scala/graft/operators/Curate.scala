package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => T}

/** End-to-end corpus curation — the composed pipeline this library's
  * operators exist for, as ONE query: quality-score every document
  * (E2's exact expression), drop low-quality docs, drop exact
  * duplicates (keep the min doc_id per md5), then drop near-dup
  * cluster non-representatives (C2's shingle pair graph + C6's
  * connected components, computed over the already-filtered corpus).
  * What survives is the training set a data pipeline would feed
  * downstream.
  *
  * Scale shape: the quality filter and md5 window are per-row scan
  * work plus one hash-partitioned window; the near-dup stage inherits
  * C2/C6's inverted-index + label-propagation structure. Each stage
  * shrinks the data the next one sees — the same reason production
  * curation pipelines run in this order.
  */
object Curate {

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  /** Minimum composite quality (unrounded — identical expression tree
    * on both engines, so the boundary is exact). */
  val MinQuality = 0.5

  /** Stages 1–3 (quality floor → exact dedup → near-dup component
    * non-representatives dropped), returning the surviving docs with
    * full metadata — shared by [[curateCorpus]] and [[curateTrain]].
    * Both callers produce the SAME canonicalized sub-plan, so the
    * persisted `exact` frame is one CacheManager entry, not two. */
  /** Stage 1: E2-scored docs above the quality floor. */
  private def scoredDocs(spark: SparkSession, dir: String): DataFrame = {
    val nTok = T.wsTokenCount(col("text"))
    val stopRatio = T.tokenCountIn(col("text"), T.EnStopwords) / nTok
    val punctRatio = T.punctCount(col("text")) / length(col("text"))
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        nTok.as("n_tokens"),
        T.qualityScore(nTok, stopRatio, punctRatio).as("quality"))
      .filter(col("quality") >= MinQuality)
  }

  private def survivors(spark: SparkSession, dir: String): DataFrame = {
    val scored = scoredDocs(spark, dir)
    // exact dedup: keep the min doc_id per content hash. Persisted —
    // the frame feeds both the pair pipeline and the final anti-join,
    // and Catalyst does not dedup the two scan+window subtrees. Like
    // annLsh's base cache, there is deliberately no unpersist: the
    // entry is a small doc-projection, CacheManager dedups repeated
    // calls by canonicalized plan (one entry, not one per call), and
    // eviction is safe — the lineage recomputes.
    val exact = exactDedup(scored)
    // near-dup dedup on the surviving set: drop every doc whose
    // component representative is another doc
    val pairs = Dedup.ngramPairsOf(exact.select(col("doc_id"), col("text")))
      .select(col("doc_a"), col("doc_b"))
      .persist()
    val dupIds = Dedup.componentLabels(pairs)
      .filter(col("node") =!= col("lbl"))
      .select(col("node").as("dup_id"))
    val out = exact
      .join(dupIds, col("doc_id") === col("dup_id"), "left_anti")
    pairs.unpersist()
    out
  }

  /** Stage 2: min-doc_id-per-md5 exact dedup (persisted; see the
    * cache note above). */
  private def exactDedup(scored: DataFrame): DataFrame =
    scored
      .withColumn("rep",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("rep"))
      .drop("rep")
      .persist()

  def curateCorpus(spark: SparkSession, dir: String): DataFrame =
    survivors(spark, dir)
      .select(col("doc_id"), col("n_tokens"),
        round(col("quality"), 4).as("quality"))
      .orderBy(col("doc_id"))

  /** §2I capstone — the full TRAINING-set builder: [[survivors]]
    * (quality → exact dedup → near-dup drop), then
    *   4. drop the eval slice itself and every surviving doc the
    *      standalone [[Decontaminate]] pass flags as contaminated
    *      (≥ τ containment of an eval doc), and
    *   5. apply [[Sampling]]'s deterministic per-language rebalance
    *      (pure per-row hash-threshold filter — composes for free).
    * Five operators, one query, one fully-composed DuckDB oracle. */
  def curateTrain(spark: SparkSession, dir: String): DataFrame =
    trainKept(spark, dir)
      .select(col("doc_id"), col("lang"),
        round(col("quality"), 4).as("quality"))
      .orderBy(col("doc_id"))

  /** Stages 1–5 with full metadata — the kept set behind
    * [[curateTrain]] and [[curatePack]]. Same canonicalized sub-plan
    * from both callers, so [[survivors]]' cache entry is shared. */
  private def trainKept(spark: SparkSession, dir: String): DataFrame =
    decontamKept(spark, dir).filter(Sampling.keepFilter)

  /** Stages 1–4: survivors minus the eval slice and every doc the
    * standalone decontaminate pass flags. */
  private def decontamKept(spark: SparkSession, dir: String): DataFrame =
    decontamKeptOf(spark, dir, survivors(spark, dir))

  /** Stage-4 transform over an ALREADY-BUILT survivors frame —
    * split out so [[curateReport]] can build the survivor set (and
    * its eager component-labels loop) exactly once. */
  private def decontamKeptOf(spark: SparkSession, dir: String,
      surv: DataFrame): DataFrame = {
    val contaminated = Decontaminate.decontaminate(spark, dir)
      .select(col("train_doc")).distinct()
    surv
      .filter(col("source") =!= Decontaminate.EvalSource)
      .join(contaminated, col("doc_id") === col("train_doc"), "left_anti")
  }

  /** §2I×J2 — pack the CURATED training set: [[curateTrain]]'s kept
    * docs laid out into fixed token-budget context windows by
    * [[Sampling.packOf]]'s per-source-shard algebra. The sixth
    * operator family composed under the same fully-expanded DuckDB
    * oracle — the trainer-facing output of the whole pipeline (what
    * actually ships to the data loader is packed sequences of the
    * curated corpus, not loose documents). Token counts are
    * [[survivors]]' wsTokenCount column — single-sourced with
    * text_tokens and pack_sequences, so the packer, the curator and
    * the token-count query can never disagree. */
  def curatePack(spark: SparkSession, dir: String): DataFrame =
    Sampling.packOf(trainKept(spark, dir)
      .select(col("doc_id"), col("source"), col("n_tokens")))

  /** §2I (round 13): per-document PROVENANCE — for EVERY input doc,
    * the first pipeline stage that dropped it (quality / exact_dup /
    * near_dup / eval_slice / contaminated / rebalance) or `kept`.
    * The "why was my document dropped" audit that curate_report's
    * funnel counts cannot answer (counts say WHICH stage ate the
    * corpus; provenance says which stage ate THIS doc) — the
    * row-level lineage a data card / takedown request / debugging
    * session actually needs. Every stage predicate is the SAME
    * single-sourced expression the capstone pipeline runs (E2
    * quality tree, md5 window, C2+C6 components, decontaminate's
    * hit set, the rebalance hash threshold), evaluated in pipeline
    * order — so provenance and the pipeline cannot disagree, and
    * Σ per-stage drops reconciles with curate_report by
    * construction.
    *
    * Scale shape: the component/decontaminate substrates are the
    * audited C2/C6/E-family shapes; the flag assembly is three LEFT
    * joins of small id sets onto the scored scan + one CASE
    * projection. Verdict strings + rounded quality ⇒ full hash
    * gate. */
  def curateProvenance(spark: SparkSession, dir: String): DataFrame = {
    val nTok = T.wsTokenCount(col("text"))
    val stopRatio = T.tokenCountIn(col("text"), T.EnStopwords) / nTok
    val punctRatio = T.punctCount(col("text")) / length(col("text"))
    val scoredAll = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        T.qualityScore(nTok, stopRatio, punctRatio).as("quality"))
      .persist()
    val exKept = exactDedup(
      scoredAll.filter(col("quality") >= MinQuality)
        .select(col("doc_id"), col("text"), col("quality")))
    val pairs = Dedup.ngramPairsOf(exKept.select(col("doc_id"), col("text")))
      .select(col("doc_a"), col("doc_b"))
      .persist()
    val dupIds = Dedup.componentLabels(pairs)
      .filter(col("node") =!= col("lbl"))
      .select(col("node").as("doc_id"), lit(1).as("is_dup"))
    val contaminated = Decontaminate.decontaminate(spark, dir)
      .select(col("train_doc").as("doc_id")).distinct()
      .withColumn("is_cont", lit(1))
    val out = scoredAll
      .join(exKept.select(col("doc_id"), lit(1).as("in_ex")),
        Seq("doc_id"), "left")
      .join(dupIds, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"),
        round(col("quality"), 4).as("quality"),
        when(col("quality") < MinQuality, "quality")
          .when(col("in_ex").isNull, "exact_dup")
          .when(col("is_dup").isNotNull, "near_dup")
          .when(col("source") === Decontaminate.EvalSource, "eval_slice")
          .when(col("is_cont").isNotNull, "contaminated")
          .when(!Sampling.keepFilter, "rebalance")
          .otherwise("kept").as("dropped_at"))
      .orderBy(col("doc_id"))
    pairs.unpersist()
    out
  }

  /** §2I: the curation FUNNEL report — docs surviving each pipeline
    * stage (input → quality floor → exact dedup → near-dup drop →
    * eval-slice + decontamination drop → rebalance sample), the
    * observability row every production curation run logs ("which
    * stage ate my corpus?"). Each stage count is a 1-row aggregate
    * over the SAME frames the capstone queries execute —
    * [[scoredDocs]] / [[exactDedup]] / [[survivors]] /
    * [[decontamKept]] / [[trainKept]] are shared code, and the
    * persisted exact frame is one CacheManager entry across all six
    * branches (canonicalized-plan dedup), so the report cannot
    * drift from the pipeline it reports on. Exact integer counts ⇒
    * full hash gate. */
  def curateReport(spark: SparkSession, dir: String): DataFrame = {
    // Build each stage frame ONCE and derive the later stages from
    // it. The naive form (each stage calling its own pipeline
    // function) re-ran survivors() three times and the decontaminate
    // chain twice — and the component-labels loop inside survivors
    // executes EAGERLY at call time, so that was 3 full iterative
    // star-contraction runs per report (measured: 15.4 s → a 10 s
    // sf0.001 plan-bound floor). One build each + a persisted
    // survivor/decontam frame (CacheManager dedups the canonical
    // plan with the capstone queries' own entries): 15.4 s → the
    // cost of one pipeline.
    val surv = survivors(spark, dir).persist()
    val deKept = decontamKeptOf(spark, dir, surv).persist()
    val stages: Seq[(Int, String, DataFrame)] = Seq(
      (0, "input", Tables(spark, dir).documents),
      (1, "quality", scoredDocs(spark, dir)),
      (2, "exact", exactDedup(scoredDocs(spark, dir))),
      (3, "neardup", surv),
      (4, "decontam", deKept),
      (5, "sampled", deKept.filter(Sampling.keepFilter)))
    stages.map { case (idx, name, df) =>
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"))
    }.reduce(_.unionAll(_)).orderBy(col("stage_idx"))
  }
}
