package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2C adjunct — entity resolution (record linkage): find the
  * near-identical catalog names an exact dedup misses ("cold anvil" /
  * "old anvil"), the blocking + edit-distance-verify pass every
  * master-data pipeline runs before merging records.
  *
  * Scale shape: pair work runs over the DISTINCT-name domain, never
  * the row stream — names aggregate first (two-phase count groupBy),
  * so a 100 TB catalog with a bounded name vocabulary pays pair cost
  * on |vocab|, not |rows|. Blocking is the LENGTH BAND
  * |len_a − len_b| ≤ τ — a COMPLETE filter (an edit distance ≤ τ
  * cannot change length by more than τ), realized as a plain
  * equi-join: the probe side explodes each name to the 2τ+1 lengths
  * it can match and the join keys on the build side's own length, so
  * every candidate pair matches exactly once and the plan is a hash
  * join (no Cartesian, no BNLJ). Verify = `levenshtein` — the
  * standard unit-cost DP in both engines, an exact INTEGER ⇒ full
  * hash gate. */
object EntityRes {

  /** Edit-distance match threshold (and the length-band radius). */
  val ErTau = 3

  /** C: near-identical part-name pairs with row counts per side. */
  def partEr(spark: SparkSession, dir: String): DataFrame =
    erPairsOf(Tables(spark, dir).part.select(col("p_name").as("name")))

  /** Blocked ER pairs over any single-column (name) frame. */
  def erPairsOf(rows: DataFrame): DataFrame = {
    // the distinct-name table feeds both join sides — persist, or the
    // full row scan recomputes per side (no-subtree-dedup)
    val names = rows.groupBy(col("name")).agg(count(lit(1)).as("n"))
      .select(col("name"), length(col("name")).as("len"), col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probe = names.select(col("name").as("name_b"),
      col("len").as("len_b"), col("n").as("n_b"),
      explode(sequence(col("len") - ErTau, col("len") + ErTau)).as("k"))
    val cand = names.select(col("name").as("name_a"),
        col("len").as("len_a"), col("n").as("n_a"), col("len").as("k"))
      .join(probe, Seq("k"))
      .filter(col("name_a") < col("name_b"))
    cand.withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= ErTau)
      .select(col("name_a"), col("name_b"), col("len_a"), col("len_b"),
        col("n_a"), col("n_b"), col("dist"))
      .orderBy(col("name_a"), col("name_b"))
  }
}
