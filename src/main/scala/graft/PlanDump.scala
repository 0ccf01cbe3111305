package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named registry queries to files —
  * the optimization-round plan evidence (`plans/r<N>/<q>_{before,after}
  * .txt`). Usage: PlanDump <sfDir> <outDir> <q1,q2,...> [suffix]
  *
  * For iterative operators whose final frame truncates at checkpoints
  * (graph_kcore, dedup_components consumers), the dumped plan shows the
  * output stage; the per-round shape is additionally dumped for
  * graph_kcore via [[graft.operators.Graph.kcoreHRound]] on the round-0
  * inputs, which is the plan the loop executes every round. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val suffix = if (args.length > 3) args(3) else "before"
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
    val unknown = names.toSet -- SparkEntry.queries.keySet - "graph_kcore_round"
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    names.foreach { name =>
      val df =
        if (name == "graph_kcore_round")
          graft.operators.Graph.kcoreHRoundForPlan(spark, sfDir)
        else SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      spark.catalog.clearCache()
      println(s"[planDump] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
