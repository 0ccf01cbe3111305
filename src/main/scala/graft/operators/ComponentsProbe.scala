package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Timing probe for the ngramPairsOf → componentLabels chain that
  * ~11 registry queries pay per invocation (r15 optimization
  * evidence behind the componentLabels driver union-find fast
  * path). Args: <sfDir>. */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cprobe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    spark.range(1000000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    for (rep <- 1 to 3) {
      val docs = Tables(spark, sfDir).documents
      val sh = t(s"rep$rep shingleIndex")(
        { val x = Dedup.shingleIndexOf(docs)
          x.write.format("noop").mode("overwrite").save(); x })
      val pairs = t(s"rep$rep ngramPairs")(
        { val p = Dedup.ngramPairsOf(docs)
            .select(col("doc_a"), col("doc_b")).persist()
          p.count(); p })
      val (labels, rounds) = t(s"rep$rep componentLabels")(
        Dedup.componentLabelsWithRounds(pairs))
      println(s"[cprobe] rep$rep rounds=$rounds " +
        s"labels=${labels.count()} pairs=${pairs.count()}")
      pairs.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
