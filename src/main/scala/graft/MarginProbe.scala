package graft

import org.apache.spark.sql.SparkSession

/** Builder-side half-boundary margin probe (VERDICT r13 #1): for each
  * registry query, the minimum distance — in ULPs of the scaled
  * value — of any roundDuck'd value from its rounding decision
  * boundary. A small nonzero minimum on a query whose value rides a
  * transcendental (ln/exp/pow: libm-dependent last bits) is the
  * events_survival flake signature: a cross-box ulp drift can flip
  * the rounded output and fail the driver's hash gate even though the
  * builder box is green. Run after adding/altering any FP-bearing
  * query:
  *
  *   SPARK_GRAFT_PROBE_ONLY=events_entropy,corpus_jsd \
  *   sbt "runMain graft.MarginProbe /root/testdata/sf0.1"
  *
  * One JSON line per query: min_margin_ulps (the watch number — for
  * transcendental-fed sites, anything under ~1e3 deserves a
  * restructure to exact algebra), n_exact_boundary (values landing
  * EXACTLY on a boundary — rational-by-construction values do this
  * legitimately; floor is deterministic on identical bits), and
  * n_samples. Plans under the probe carry an identity UDF inside
  * roundDuck, so this is an instrument, never a gate or bench path.
  */
object MarginProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_PROBE_ONLY names unknown queries: ${unknown.mkString(",")}")
    }
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
    graft.functions.OracleMath.MarginTracker.enabled = true
    def fmt(v: Double): String =
      if (v == Double.MaxValue) "null"
      else String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    // sequential on purpose: the tracker is one static channel
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        val t = graft.functions.OracleMath.MarginTracker
        t.reset()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[probe] $name failed: ${e.getMessage}")
            false
          }
        if (ok)
          println(s"""{"query":"$name","min_margin_ulps":${fmt(t.minMarginUlps)},""" +
            s""""n_exact_boundary":${t.nExactBoundary},"n_samples":${t.nSamples}}""")
      }
    spark.stop()
  }
}
