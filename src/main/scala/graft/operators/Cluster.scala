package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{VectorFunctions => V}

/** SURVEY §2D adjunct — k-means clustering over the `embeddings`
  * table (Lloyd's algorithm), the standard corpus-structuring step of
  * a training-data pipeline (topic buckets, per-cluster sampling
  * quotas, cluster-aware dedup).
  *
  * Scale design per iteration:
  *   - assignment: centroids are k×dim literals broadcast inside a
  *     codegen'd projection (same shape as [[Similarity.annIvf]]) —
  *     one scan, no shuffle, no UDF;
  *   - update: a typed [[SumVec]] partial aggregate — each partition
  *     reduces to ≤k (sum, count) buffers BEFORE the exchange, so the
  *     shuffle carries k × numPartitions tiny rows, never data;
  *   - the k centroids collected per round are quantizer state (k·dim
  *     doubles), not data-plane rows — the same training-plane
  *     exception as annIvf's 16-vector collect.
  * Iteration count is FIXED (no convergence probe) so the round count
  * is known at plan time and each round is one job; init is the
  * deterministic smallest-xxhash64 sample, so results are reproducible
  * run to run modulo FP sum order (which the 4dp output rounding and
  * the rows-only gate absorb; properties in ClusterSpec are
  * tolerance-based).
  */
object Cluster {

  // Shadows functions.round: DuckDB-exact binary rounding (OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  /** One assigned vector. */
  final case class Assigned(vec_id: Long, cluster: Int, v: Seq[Double])

  /** Per-cluster elementwise (Σv, n) partial aggregate — associative,
    * commutative, constant-size buffer (dim doubles + 1 long). */
  final class SumVec(dim: Int)
      extends Aggregator[Assigned, (Array[Double], Long), (Seq[Double], Long)] {
    def zero: (Array[Double], Long) = (Array.ofDim[Double](dim), 0L)
    def reduce(acc: (Array[Double], Long), a: Assigned): (Array[Double], Long) = {
      val s = acc._1
      var i = 0
      while (i < dim) { s(i) += a.v(i); i += 1 }
      (s, acc._2 + 1)
    }
    def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      val s = a._1
      var i = 0
      while (i < dim) { s(i) += b._1(i); i += 1 }
      (s, a._2 + b._2)
    }
    def finish(acc: (Array[Double], Long)): (Seq[Double], Long) =
      (acc._1.toSeq, acc._2)
    def bufferEncoder: Encoder[(Array[Double], Long)] =
      ExpressionEncoder[(Array[Double], Long)]()
    def outputEncoder: Encoder[(Seq[Double], Long)] =
      ExpressionEncoder[(Seq[Double], Long)]()
  }

  private def centCol(c: Seq[Double]) = array(c.map(lit): _*)

  /** Squared Euclidean distance of column `v` to each centroid, as an
    * array column: ‖x‖² − 2·x·c + ‖c‖² — reuses the codegen'd
    * [[V.dot]] so the per-dim loop never runs interpreted. */
  private def dist2s(centroids: Array[Seq[Double]]) = {
    val x2 = V.dot(col("v"), col("v"))
    array(centroids.map { c =>
      val c2 = c.map(x => x * x).sum
      x2 - lit(2.0) * V.dot(col("v"), centCol(c)) + lit(c2)
    }: _*)
  }

  /** Argmin cluster id over the `d2s` array column (1-based from
    * array_position, returned 0-based); lowest-index tiebreak. */
  private def assignCol =
    (expr("array_position(d2s, array_min(d2s))") - 1L).cast("int")

  /** Lloyd's k-means: fixed `iters` rounds from the deterministic
    * smallest-xxhash64(vec_id) init. Returns (vec_id, cluster, dist). */
  def kmeansAssignments(spark: SparkSession, dir: String,
      k: Int = 8, iters: Int = 5, dim: Int = 64): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), V.toDouble(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var centroids: Array[Seq[Double]] = e
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h")).limit(k)
      .select(col("v")).collect().map(_.getSeq[Double](0))

    for (_ <- 1 to iters) {
      val assigned = e.withColumn("d2s", dist2s(centroids))
        .select(col("vec_id"), assignCol.as("cluster"), col("v"))
        .as[Assigned]
      val sums = assigned.groupByKey(_.cluster)
        .agg(new SumVec(dim).toColumn.name("sumn"))
        .collect().toMap
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        sums.get(i) match {
          case Some((s, n)) if n > 0 => s.map(_ / n)
          case _ => old // empty cluster keeps its centroid
        }
      }
    }

    // greatest(…, 0): ‖x‖²−2x·c+‖c‖² can round to −ε for x≈c, and
    // sqrt(−ε) would be NaN.
    // Persist-without-unpersist (Curate.survivors pattern): the
    // returned frame still reads `e`, so unpersisting here would make
    // the final assignment pass re-read + re-cast from parquet.
    // CacheManager dedups by canonicalized plan; eviction recomputes.
    e.withColumn("d2s", dist2s(centroids))
      .select(col("vec_id"),
        assignCol.as("cluster"),
        round(sqrt(greatest(expr("array_min(d2s)"), lit(0.0))), 4).as("dist"))
      .orderBy(col("vec_id"))
  }

  /** Query entry (rows-only gate; properties in ClusterSpec). */
  def embedCluster(spark: SparkSession, dir: String): DataFrame =
    kmeansAssignments(spark, dir)
}
