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
    // r16 skew probe (VERDICT r15 item 4): collect_set(k) concentrates
    // a hot k's whole membership in one task and the pair expansion is
    // an interpreted HOF — measure (a) the ps array width distribution
    // on the k-exchange and (b) max/median task duration across the
    // stages of one groupHof execution. A max/median task ratio < ~4
    // at sf1 clears the guide §2.5 bar.
    val widths = grouped.agg(
      max(size(col("ps"))).as("max_w"),
      expr("percentile(size(ps), 0.5)").as("p50_w"),
      expr("percentile(size(ps), 0.999)").as("p999_w"),
      count(lit(1)).as("n_keys")).head()
    println(s"[undab] ps widths: max=${widths.get(0)} " +
      s"p50=${widths.get(1)} p999=${widths.get(2)} keys=${widths.get(3)}")
    val taskDurs = new java.util.concurrent.ConcurrentHashMap[
      Int, scala.collection.mutable.ArrayBuffer[Long]]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskDurs.computeIfAbsent(te.stageId,
          _ => scala.collection.mutable.ArrayBuffer.empty[Long])
          .synchronized {
            taskDurs.get(te.stageId) += te.taskInfo.duration
          }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    pairsHof.write.format("noop").mode("overwrite").save()
    Thread.sleep(2000) // listener events are posted asynchronously
    spark.sparkContext.removeSparkListener(listener)
    val it2 = taskDurs.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val ds = e.getValue.sorted
      if (ds.nonEmpty) {
        val med = math.max(1L, ds(ds.length / 2))
        println(f"[undab] stage=${e.getKey} tasks=${ds.length} " +
          f"median=${med}ms max=${ds.last}ms ratio=${ds.last.toDouble / med}%.2f")
      }
    }
    // sanity: same edge SET, not just the same count (ADVICE r15 —
    // a restructure that drops one edge and adds another must fail
    // this): both except() directions must be empty.
    val sj = a.join(b, "k").filter(col("src") < col("dst"))
      .select("src", "dst").distinct()
    val n1 = sj.count()
    val n2 = pairsHof.count()
    val onlySj = sj.except(pairsHof).count()
    val onlyHof = pairsHof.except(sj).count()
    println(s"[undab] edges selfjoin=$n1 groupHof=$n2 " +
      s"onlySelfjoin=$onlySj onlyGroupHof=$onlyHof " +
      s"equal=${n1 == n2 && onlySj == 0 && onlyHof == 0}")
    spark.stop()
  }
}
