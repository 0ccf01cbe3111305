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

  // ----- D8: dominant principal direction (power iteration) --------

  /** One weighted vector for the power-iteration update. */
  final case class WVec(w: Double, v: Seq[Double])

  /** Elementwise Σ w·v partial aggregate — the power-iteration
    * matvec `(XᵀX)v = Σ_x (x·v)·x` as a constant-size buffer (dim
    * doubles): each partition folds locally, the exchange carries ONE
    * dim-vector per partition, never the data. */
  final class SumWeighted(dim: Int)
      extends Aggregator[WVec, Array[Double], Seq[Double]] {
    def zero: Array[Double] = Array.ofDim[Double](dim)
    def reduce(acc: Array[Double], a: WVec): Array[Double] = {
      var i = 0
      while (i < dim) { acc(i) += a.w * a.v(i); i += 1 }
      acc
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < dim) { a(i) += b(i); i += 1 }
      a
    }
    def finish(acc: Array[Double]): Seq[Double] = acc.toSeq
    def bufferEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** The dominant right singular direction of the embedding matrix by
    * distributed power iteration: v ← normalize(Σ_x (x·v)·x), fixed
    * iteration budget, deterministic smallest-xxhash64 start vector
    * (the k-means init convention). Per round: ONE corpus pass — the
    * per-row dot is the codegen'd [[V.dot]], the update is the
    * [[SumWeighted]] partial aggregate (dim-sized buffers, single
    * group), and the dim-vector collect is quantizer-training state,
    * not data plane. Returns the unit direction. */
  def powerDirection(e: DataFrame, iters: Int = 8,
      dim: Int = 64): Array[Double] = {
    import e.sparkSession.implicits._
    var v: Array[Double] = e
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h")).limit(1)
      .select(col("v")).collect()(0).getSeq[Double](0).toArray
    def normalize(a: Array[Double]): Array[Double] = {
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n == 0) a else a.map(_ / n)
    }
    v = normalize(v)
    for (_ <- 1 to iters) {
      val w = e.select(
          V.dot(col("v"), centCol(v.toSeq)).as("w"), col("v"))
        .as[WVec]
        .groupByKey(_ => 0)
        .agg(new SumWeighted(dim).toColumn.name("s"))
        .collect()(0)._2
      v = normalize(w.toArray)
    }
    v
  }

  /** D8 query entry: per-vector projection onto the corpus' dominant
    * principal direction plus the residual norm — the
    * "All-but-the-Top" (Mu & Viswanath, ICLR'18) embedding
    * postprocessing read: a corpus whose vectors pile onto one
    * direction carries less usable geometry; removing the common
    * component (keeping the residual) routinely improves cosine
    * retrieval. proj = x·v, resid = √max(‖x‖²−proj², 0).
    *
    * Rows-only gate (like k-means: cross-partition FP merge order is
    * not cross-engine reproducible); ClusterSpec asserts the
    * Rayleigh-quotient dominance of the found direction over the
    * start vector and random probes, unit-norm, iteration
    * monotonicity, and a driver-side projection recompute. */
  def embedPca(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), V.toDouble(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val v = powerDirection(e)
    val proj = V.dot(col("v"), centCol(v.toSeq))
    val x2 = V.dot(col("v"), col("v"))
    e.select(col("vec_id"), proj.as("p"), x2.as("x2"))
      .select(col("vec_id"),
        round(col("p"), 4).as("proj"),
        round(sqrt(greatest(col("x2") - col("p") * col("p"), lit(0.0))), 4)
          .as("resid_norm"))
      .orderBy(col("vec_id"))
  }
}
