package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B probe for the kcore h-round formulations over the same
  * cached adjacency (r15 optimization evidence: window vs
  * counts-collapse, repartitioned vs not, chained vs single).
  * Args: <sfDir> <reps>. */
object KcoreAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
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
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    val a = li.select(col("k"), col("p").as("src"))
    val b = li.select(col("k"), col("p").as("dst"))
    val und = a.join(b, "k").filter(col("src") < col("dst"))
      .select("src", "dst").distinct()
    def buildAdj(repart: Boolean): DataFrame = {
      val base = und.unionAll(und.select(col("dst"), col("src")))
        .toDF("node", "nbr")
      (if (repart) base.repartition(col("node")) else base)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    def windowRound(adj: DataFrame, cc: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("node")).orderBy(col("cn").desc)
      adj.join(cc.select(col("node").as("nbr"), col("c").as("cn")), "nbr")
        .withColumn("rk", row_number().over(w).cast("long"))
        .groupBy(col("node"))
        .agg(max(least(col("rk"), col("cn"))).as("c"))
    }
    def time(label: String, df: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $label median=${ts.sorted.apply(reps / 2)}%.2f " +
        ts.map(t => f"$t%.2f").mkString("[", ",", "]"))
    }
    for (repart <- Seq(false, true)) {
      val adj = buildAdj(repart)
      adj.count() // materialize cache outside the timed region
      val deg0 = adj.groupBy(col("node")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      // one lazily-chained bulk of 4 rounds (the pre-r15 shape: no
      // exchange boundary, so the value-frame join plans statically
      // as SMJ) vs one materialized round (AQE can broadcast the
      // realized value frame)
      time(s"repart=$repart chained x4",
        (1 to 4).foldLeft(deg0: DataFrame)((cc, _) => windowRound(adj, cc)))
      time(s"repart=$repart single x1", windowRound(adj, deg0))
      time(s"repart=$repart shipped x1",
        graft.operators.Graph.kcoreHRound(adj, deg0))
      adj.unpersist(blocking = true)
    }
    spark.stop()
  }
}
