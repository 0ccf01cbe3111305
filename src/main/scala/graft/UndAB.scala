package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the undirected co-purchase edge build — 2-scan
  * self-join vs 1-scan groupBy+pair-explode (r15 optimization
  * evidence behind Graph.undEdges; asserts both forms emit the same
  * edge set). Args: <sfDir> [reps]. */
object UndAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    spark.range(1000000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[undab] $label median=${ts.sorted.apply(reps / 2)}%.2f " +
        ts.map(x => f"$x%.2f").mkString("[", ",", "]"))
    }
    val a = li.select(col("k"), col("p").as("src"))
    val b = li.select(col("k"), col("p").as("dst"))
    time("selfjoin") {
      a.join(b, "k").filter(col("src") < col("dst"))
        .select("src", "dst").distinct()
        .write.format("noop").mode("overwrite").save()
    }
    // HOF pair expansion (interpreted — the CLAUDE.md caveat; order
    // sizes are ~4 so per-row element counts are tiny)
    val grouped = li.groupBy(col("k")).agg(collect_set(col("p")).as("ps"))
    val pairsHof = grouped.select(explode(expr(
      "flatten(transform(ps, (x, i) -> " +
        "transform(slice(ps, i + 2, size(ps)), y -> " +
        "struct(least(x, y) as src, greatest(x, y) as dst))))")).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    time("groupHof") {
      pairsHof.write.format("noop").mode("overwrite").save()
    }
    // sanity: same edge set
    val n1 = a.join(b, "k").filter(col("src") < col("dst"))
      .select("src", "dst").distinct().count()
    val n2 = pairsHof.count()
    println(s"[undab] edges selfjoin=$n1 groupHof=$n2 equal=${n1 == n2}")
    spark.stop()
  }
}
