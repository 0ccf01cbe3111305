package graft

/** [[ShuffleAudit]] — the measured data-movement instrument must keep
  * producing credible numbers: the r15 session found BOTH obvious
  * metric layers silently under-reporting local parquet scans
  * (per-task input metrics ~0.1%, Hadoop global file statistics
  * footers-only), a failure mode that produces a well-formed artifact
  * full of nonsense. This pins the /proc-based sourcing against
  * ground truth so a Spark/parquet upgrade that shifts IO paths
  * fails loudly instead of quietly zeroing a committed artifact. */
class ShuffleAuditSpec extends SparkSuite {

  private def fields(line: String): Map[String, Double] = {
    val body = line.substring(line.indexOf(":{") + 2).stripSuffix("}")
    body.split(",").map { kv =>
      val Array(k, v) = kv.split(":")
      k.replaceAll("\"", "") -> v.toDouble
    }.toMap
  }

  test("scan-heavy and shuffle-heavy queries report credible bytes") {
    val out = ShuffleAudit.run(spark, sfDir,
      Some(Set("q1_agg", "events_sessionize")))
    assert(out.size == 2)
    val byName = out.map(l =>
      l.substring(1, l.indexOf(':') - 1) -> fields(l)).toMap
    // q1_agg scans lineitem: the pruned projection at sf0.001 is
    // tens of kB — anything under 10 kB means the scan went
    // unmeasured again (the r15 inputMetrics/Hadoop-stats class)
    val agg = byName("q1_agg")
    assert(agg("scan_read_bytes") > 10 * 1024,
      s"q1_agg scan bytes implausibly low: $agg")
    // ...and its map-side partial keeps the shuffle tiny relative
    // to the scan (the ratio contract the artifact exists to watch)
    assert(agg("shuffle_per_scan") < 0.5, s"q1_agg lost its partial: $agg")
    // a sessionize (window over user_id) must MOVE bytes through
    // the exchange — zero shuffle would mean broken attribution
    val ses = byName("events_sessionize")
    assert(ses("shuffle_write_bytes") > 1024,
      s"events_sessionize shuffle bytes implausibly low: $ses")
    assert(ses("shuffle_read_bytes") >= ses("shuffle_write_bytes"),
      s"read >= write for a fully-consumed exchange: $ses")
    out.foreach(l => assert(fields(l)("disk_spill_bytes") >= 0))
  }
}
