package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** `range_join` — half-open window semantics on a hand fixture
  * (including bin-boundary anchors) and equality with the naive
  * inequality-join form at sf0.001. */
class RangeJoinSpec extends SparkSuite {

  test("windows are half-open [start, start+w), bins invisible (fixture)") {
    val s = spark; import s.implicits._
    // anchor 1 starts exactly on a bin boundary (covers ONE bin);
    // anchor 2 straddles two bins.
    val anchors = Seq((1L, 7200L), (2L, 3650L)).toDF("anchor_id", "a_sec")
    val points = Seq(
      (10L, 1L, 1.0, 7200L),  // == anchor-1 start → in (1); < 7250 → in (2)
      (11L, 2L, 1.0, 10799L), // anchor-1 start + w - 1   → in  (1)
      (12L, 3L, 1.0, 10800L), // == anchor-1 end          → out
      (13L, 4L, 1.0, 7199L),  // 1s before anchor-1 start → in (2) only
      (14L, 5L, 1.0, 7100L),  // inside anchor-2 only     → in  (2)
      (15L, 5L, 1.0, 3650L),  // == anchor-2 start, same user → in (2)
      (16L, 6L, 1.0, 7250L)   // == anchor-2 end (out) but inside 1 → in (1)
    ).toDF("event_id", "user_id", "value", "e_sec")

    val out = RangeJoin.rangeJoinAgg(anchors, points, 3600L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 3L)), s"anchor 1: $out") // events 10,11,16
    assert(out(2L) == ((4L, 3L)), s"anchor 2: $out") // 10,13,14,15; users 1,4,5
  }

  test("binned form equals the naive inequality join at sf0.001") {
    val ev = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("value"), Tables.tsNsToSec("ts").as("e_sec"))
    val anchors = ev
      .filter(col("event_type") === "purchase" &&
              col("value") > RangeJoin.AnchorMinValue)
      .select(col("event_id").as("anchor_id"), col("e_sec").as("a_sec"))
    // Naive form: the inequality join Spark would plan as a nested
    // loop — fine as a test oracle at sf0.001, the shape the binned
    // operator exists to avoid at scale.
    val naive = anchors.join(ev.drop("event_type"),
        col("e_sec") >= col("a_sec") &&
        col("e_sec") < col("a_sec") + lit(RangeJoin.WindowSec))
      .groupBy(col("anchor_id"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

    val binned = RangeJoin.eventsInWindows(spark, sfDir)
      .select(col("anchor_id"), col("n_events"), col("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

    assert(binned.nonEmpty, "no anchors matched at sf0.001")
    assert(binned == naive)
  }

  test("property: binned == naive for random (incl. negative) seconds") {
    // `div` truncates toward zero, so "bin 0" spans (-w, w) — wider
    // than w, but coverage stays correct: bin(e_sec) is monotone and
    // anchors explode to the full [bin(a), bin(a+w-1)] range, which
    // is always <= 2 bins. Random signed seconds exercise exactly
    // that near-zero regime the sf data (2024 epoch) never hits.
    val s = spark; import s.implicits._
    import org.scalacheck.Prop.forAll
    val w = 100L
    val prop = forAll { (as0: List[Long], ps0: List[Long]) =>
      val as = as0.take(6).map(_ % 500L)
      val ps = ps0.take(30).map(_ % 500L)
      as.isEmpty || ps.isEmpty || {
        val anchors = as.zipWithIndex
          .map { case (a, i) => (i.toLong, a) }.toDF("anchor_id", "a_sec")
        val points = ps.zipWithIndex
          .map { case (p, i) => (i.toLong, i.toLong % 3, 1.0, p) }
          .toDF("event_id", "user_id", "value", "e_sec")
        val got = RangeJoin.rangeJoinAgg(anchors, points, w).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = as.zipWithIndex.flatMap { case (a, i) =>
          val n = ps.count(p => p >= a && p < a + w)
          if (n > 0) Some(i.toLong -> n.toLong) else None
        }.toMap
        got == want
      }
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(10)
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("the join is a bin equi-join, not a nested loop") {
    val plan = RangeJoin.eventsInWindows(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
           !plan.contains("CartesianProduct"),
      s"range join must not plan a nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join on the bin key:\n$plan")
    // Catalyst does not dedup repeated subtrees (CLAUDE.md): events IS
    // read twice here — once filtered to anchors (predicate pushed to
    // parquet), once as the point side — and that is the intended
    // shape: a single-scan explode-both-roles form would lose the
    // anchor pushdown. Lock the count so a refactor that accidentally
    // multiplies scans fails loudly.
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 2, s"expected exactly 2 parquet scans, got $scans:\n$plan")
  }

  test("band join: closed ±w edges, keyed, each pair once, zero-match " +
    "anchors kept (fixture)") {
    val s = spark; import s.implicits._
    val w = 300L
    val anchors = Seq(
      (1L, 7L, 1000L),  // matches at Δ = -300, 0, +300; 299+Δ excluded
      (2L, 7L, 5000L),  // zero matches → retained with n = 0, NULL gap
      (3L, 8L, 1000L)   // same times as anchor 1 but other key → 1 match
    ).toDF("anchor_id", "key", "a_sec")
    val points = Seq(
      (7L, 700L),   // Δ = -300 → in (closed edge)
      (7L, 699L),   // Δ = -301 → out
      (7L, 1000L),  // Δ = 0    → in
      (7L, 1300L),  // Δ = +300 → in (closed edge; also a bin boundary)
      (7L, 1301L),  // Δ = +301 → out
      (8L, 1299L)   // other key, Δ = 299 → in for anchor 3 only
    ).toDF("key", "p_sec")
    val got = RangeJoin.bandJoinAgg(anchors, points, w).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 0L)), s"anchor 1: $got")
    assert(got(2L) == ((0L, -1L)), s"anchor 2 (zero-match): $got")
    assert(got(3L) == ((1L, 299L)), s"anchor 3: $got")
  }

  test("band join: binned == naive inequality join at sf0.001, and " +
    "plans an equi-join") {
    val q = RangeJoin.eventsBandJoin(spark, sfDir)
    val ev = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("event_type"),
              Tables.tsNsToSec("ts").as("sec"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("u"), col("sec").as("a_sec"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("u2"), col("sec").as("p_sec"))
    val naive = p.join(e, col("u") === col("u2") &&
        abs(col("p_sec") - col("a_sec")) <= lit(RangeJoin.BandSec), "left")
      .groupBy(col("purchase_id"))
      .agg(count(col("p_sec")).as("n"), min(abs(col("p_sec") - col("a_sec"))))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1).toSeq
    val got = q.collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got.nonEmpty && got == naive)
    assert(got.exists(_._2 == 0L), "want at least one zero-match anchor")

    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
           !plan.contains("CartesianProduct"),
      s"band join must not plan a nested loop:\n$plan")
  }
}
