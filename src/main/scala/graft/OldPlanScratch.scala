package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TEMPORARY (r15 optimization round): reconstructs pre-optimization
  * sub-plans exactly as HEAD~ executed them, so the before-plan files
  * under plans/r15 can show the per-round shape that checkpoint-
  * truncated final frames hide. Deleted at the end of the round. */
object OldPlanScratch {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
    new java.io.File(outDir).mkdirs()
    // graph_kcore per-round plan AS AT HEAD (window h-index form over
    // the unpartitioned cached adjacency)
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    val a = li.select(col("k"), col("p").as("src"))
    val b = li.select(col("k"), col("p").as("dst"))
    val und = a.join(b, "k").filter(col("src") < col("dst"))
      .select("src", "dst").distinct()
    val adj = und.unionAll(und.select(col("dst"), col("src")))
      .toDF("node", "nbr")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg0 = adj.groupBy(col("node")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("node")).orderBy(col("cn").desc)
    val round = adj
      .join(deg0.select(col("node").as("nbr"), col("c").as("cn")), "nbr")
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy(col("node"))
      .agg(max(least(col("rk"), col("cn"))).as("c"))
    Files.writeString(Paths.get(s"$outDir/graph_kcore_round_before.txt"),
      round.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    println(s"[oldPlanScratch] wrote $outDir/graph_kcore_round_before.txt")
    spark.stop()
  }
}
