package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tuning instrument for the knn_graph_ivf dials (VERDICT r13 #4):
  * mean recall@KnnK and wall time per (nProbe, refineRounds) point,
  * measured against the exact O(n²) graph computed ONCE. Results are
  * documented in BASELINE.md; the registry defaults
  * (Similarity.KnnGraphProbe / KnnGraphRefineRounds) are chosen off
  * this table, not guessed.
  *
  *   SPARK_GRAFT_SWEEP_PROBES=8,12,16  SPARK_GRAFT_SWEEP_ROUNDS=1,2 \
  *   sbt "runMain graft.RecallSweep /root/testdata/sf0.1"
  *
  * One JSON line per dial point on stdout. Not a registry query — an
  * offline measurement loop, the same family as Bench/PlanAudit.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val probes = sys.env.getOrElse("SPARK_GRAFT_SWEEP_PROBES", "4,8,12,16,24")
      .split(",").map(_.trim.toInt).toSeq
    val rounds = sys.env.getOrElse("SPARK_GRAFT_SWEEP_ROUNDS", "1,2")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = operators.Similarity.KnnK
    // exact ground truth once (the expensive arm by design),
    // materialized to parquet so the per-dial cache clear (which
    // resets knnGraphIvf's internal persists) cannot force an O(n²)
    // recompute
    val exactPath = java.nio.file.Files
      .createTempDirectory("graft-recall-exact").toString + "/exact"
    operators.Similarity.embedKnnGraph(spark, sfDir)
      .select(col("q_id"), col("n_id"))
      .write.mode("overwrite").parquet(exactPath)
    val exact = spark.read.parquet(exactPath)
    val nQ = exact.select(col("q_id")).distinct().count()
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    for (p <- probes; r <- rounds) {
      val t0 = System.nanoTime()
      val approx = operators.Similarity.knnGraphIvf(spark, sfDir,
        nProbe = p, refineRounds = r).select(col("q_id"), col("n_id"))
      val hits = exact.join(approx, Seq("q_id", "n_id")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = hits.toDouble / (nQ * k)
      println(s"""{"probe":$p,"rounds":$r,"recall":${fmt(recall)},""" +
        s""""sec":${fmt(sec)},"n_queries":$nQ,"k":$k,"sf":"$sfDir"}""")
      spark.sharedState.cacheManager.clearCache()
      ()
    }
    spark.stop()
  }
}
