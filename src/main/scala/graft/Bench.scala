package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Each query is materialized through the `noop` sink — every output
  * column is computed and serialized, so Catalyst can't dead-code-
  * eliminate projections the way it can under `count()` (which prunes
  * unused columns and elides unlimited global sorts).
  *
  * Each query is timed `Runs` times back-to-back and the MEDIAN is
  * reported — one-shot numbers on this box swing 2–8× on identical
  * plans (nine phantom "regressions" in round 3, every one of which
  * vanished on re-run), so a single sample cannot feed a 2× gate.
  * All samples are kept in `"runs"` so the spread stays visible; the
  * first sample also carries the per-query codegen-compile cost,
  * which the median correctly pushes out of the headline signal. A
  * query that fails is recorded with value -1 and listed in
  * `"failed"`; its time-to-crash is excluded from the total and it
  * is not re-run.
  *
  * Artifact shape: the driver captures only the TAIL of stdout, and
  * round 4's line — which carried every per-query sample — overflowed
  * it (18 of 70 queries lost, `parsed: null`). So stdout now gets ONE
  * compact line (total + per-query medians + failures) printed last,
  * and the full artifact including all raw samples goes to
  * `SPARK_GRAFT_BENCH_OUT` (default `/tmp/graft_bench_full.json`).
  */
object Bench {
  /** `SPARK_GRAFT_BENCH_RUNS` overrides samples-per-query;
    * `SPARK_GRAFT_BENCH_ONLY=q2,q5` restricts to named queries — the
    * CLAUDE.md variance rule's "re-time the suspect in isolation"
    * recipe as a flag instead of a throwaway main. */
  private val Runs =
    sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // cached plans keep AQE partition coalescing (Spark 4 keeps
      // it off by default for cache-partitioning stability; the
      // persisted frames here are consumed within one query)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/scheduler paths so the first measured query
    // isn't charged ~5-7s of one-time session cost (observed: whichever
    // query ran first looked 10x slower than steady-state).
    spark.range(1000000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // fail fast on a typo'd name: a silent empty selection would still
    // print a well-formed {"value":0.000,...} line that reads as a result
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.mkString(",")}")
    }
    val selected = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val first = once()
      val samples =
        if (first._2) first +: Seq.fill(Runs - 1)(once()) else Seq(first)
      (name, samples.map(_._1), samples.forall(_._2))
    }
    // Locale.ROOT: the f-interpolator honors the default locale, and
    // a comma decimal separator (de_DE etc.) would corrupt the JSON.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results
      .map { case (k, v, ok) =>
        "\"" + k + "\":" + (if (ok) fmt(median(v)) else "-1.0") }
      .mkString("{", ",", "}")
    val runs = results
      .map { case (k, v, _) =>
        "\"" + k + "\":" + v.map(fmt).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => median(v) }.sum
    // n_queries always, "only":true when SPARK_GRAFT_BENCH_ONLY is
    // active: a harness tailing stdout must be able to tell a
    // partial-suite "total" from the full-suite one without diffing
    // the queries map against SparkEntry.
    val subset = (if (only.isDefined) ""","only":true""" else "") +
      s""","n_queries":${selected.size}"""
    val compact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","stat":"median_of_$Runs","queries":$qs,"failed":$failed$subset,"sf":"$sfDir"}"""
    // The driver keeps only the TAIL (~2000 chars) of stdout, and at
    // 92 queries the compact line alone exceeds it — round 7 lost the
    // "metric"/"value" prefix and the official total was unrecoverable.
    // So a short total-only line (no queries map, bounded size) is
    // printed LAST: whatever the tail truncates, this line survives
    // whole and parses standalone.
    // "pinned" points any reader of a one-shot (or contended) run at
    // the committed medians: per CLAUDE.md/BASELINE.md, a driver-tail
    // reading above a query's pinned isolated median ×5 is adjudicated
    // by the isolation protocol (SPARK_GRAFT_BENCH_ONLY, runs=7)
    // before any code action — round 13 burned a judge session proving
    // five 25–50× phantoms were box contention.
    val summary =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","stat":"median_of_$Runs","failed":$failed$subset,"pinned":"BENCH_FULL.json","sf":"$sfDir"}"""
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","stat":"median_of_$Runs","queries":$qs,"runs":$runs,"failed":$failed$subset,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/tmp/graft_bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    // printed after spark.stop() so no late executor/log line can land
    // between this and process exit — the driver tails stdout. The
    // short summary line goes last (see above).
    println(compact)
    // r16 (VERDICT r15 item 2): the driver's per-query comparison was
    // blinded because the compact line (~7k chars at 266 queries)
    // exceeds the driver's stdout tail capture. Re-emit the per-query
    // medians as multiple SELF-CONTAINED json lines, each under 1800
    // chars, between the compact line and the final summary line (the
    // official total stays LAST). Each part parses standalone:
    // {"metric":"queries_part","part":i,"parts":n,"queries":{...}}.
    val entries = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) fmt(median(v)) else "-1.0") }
    val partBudget = 1600 // payload budget; wrapper adds ~70 chars
    val parts = entries.foldLeft(Vector(Vector.empty[String])) { (acc, e) =>
      if (acc.last.isEmpty ||
          acc.last.map(_.length + 1).sum + e.length <= partBudget)
        acc.init :+ (acc.last :+ e)
      else acc :+ Vector(e)
    }
    parts.zipWithIndex.foreach { case (p, i) =>
      println(s"""{"metric":"queries_part","part":${i + 1},"parts":${parts.size},"queries":${p.mkString("{", ",", "}")}}""")
    }
    println(summary)
  }
}
