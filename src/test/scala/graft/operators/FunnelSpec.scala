package graft.operators

import graft.SparkSuite

/** `events_funnel` / `events_retention` — strict-ordering semantics on
  * a hand fixture plus structural invariants at sf0.001. */
class FunnelSpec extends SparkSuite {

  test("funnel requires strict stage ordering (hand fixture)") {
    val s = spark; import s.implicits._
    val ev = Seq(
      // u1: full ordered funnel
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // u2: click BEFORE first view — must not count; no later click
      (2L, "click", 50L), (2L, "view", 100L),
      // u3: purchase before click — stage stops at 2
      (3L, "view", 10L), (3L, "purchase", 15L), (3L, "click", 20L),
      // u4: no view at all — stage 0 even with click+purchase
      (4L, "click", 10L), (4L, "purchase", 20L),
      // u5: same-second click (ep == t1) must NOT count (strict >)
      (5L, "view", 100L), (5L, "click", 100L)
    ).toDF("user_id", "event_type", "ep")
    val out = Funnel.funnelOf(ev).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))
      .toMap
    assert(out(1L) == ((Some(100L), Some(200L), Some(300L), 3)))
    assert(out(2L) == ((Some(100L), None, None, 1)))
    assert(out(3L)._4 == 2)
    assert(out(4L) == ((None, None, None, 0)))
    assert(out(5L) == ((Some(100L), None, None, 1)))
  }

  test("sequences: trigrams never span users; counts on a hand fixture") {
    val s = spark; import s.implicits._
    val ev = Seq(
      // u1: a b c d → abc, bcd
      (1L, 1L, "a", 10L), (1L, 2L, "b", 20L),
      (1L, 3L, "c", 30L), (1L, 4L, "d", 40L),
      // u2: a b c → abc (and NOT c,a,b across the user boundary)
      (2L, 5L, "a", 10L), (2L, 6L, "b", 20L), (2L, 7L, "c", 30L),
      // u3: only two events — no trigram
      (3L, 8L, "x", 10L), (3L, 9L, "y", 20L)
    ).toDF("user_id", "event_id", "event_type", "ep")
    val out = Funnel.sequencesOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(out == Map(("a", "b", "c") -> 2L, ("b", "c", "d") -> 1L), s"$out")
  }

  test("funnel stage counts are monotone non-increasing at sf0.001") {
    val rows = Funnel.eventsFunnel(spark, sfDir).collect()
    val reached = (1 to 3).map(k => rows.count(_.getInt(4) >= k))
    assert(reached(0) >= reached(1) && reached(1) >= reached(2),
      s"funnel not monotone: $reached")
    rows.foreach { r =>
      val (t1, t2, t3) = (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))
      if (t2.isDefined) {
        assert(t1.isDefined &&
          t1.get.asInstanceOf[Long] < t2.get.asInstanceOf[Long])
      }
      if (t3.isDefined) {
        assert(t2.isDefined &&
          t2.get.asInstanceOf[Long] < t3.get.asInstanceOf[Long])
      }
    }
  }

  test("funnel scans events once and shuffles once (plus output sort)") {
    val plan = Funnel.eventsFunnel(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 events scan, got $scans:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$plan")
    // the naive agg-join form planned 6 scans / 4 hash exchanges
  }

  test("retention scans events once") {
    val plan = Funnel.eventsRetention(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 events scan, got $scans:\n$plan")
  }

  test("co-occurrence counts same-user type pairs with exact Jaccard") {
    val s = spark; import s.implicits._
    // u1 {a,b}, u2 {a,b,c}, u3 {a}; duplicate events must not
    // double-count a user
    val ev = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a")
    ).toDF("user_id", "event_type")
    val out = Funnel.cooccurrenceOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(out(("a", "b")) === ((2L, 3L, 2L, 0.666667)))
    assert(out(("a", "c")) === ((1L, 3L, 1L, 0.333333)))
    assert(out(("b", "c")) === ((1L, 2L, 1L, 0.5)))
  }

  test("co-occurrence reach tables broadcast; pairs never sort-merge") {
    val q = Funnel.eventsCooccurrence(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-type reach must broadcast:\n$plan")
  }

  test("pathing orders by (ep, event_id) and counts transitions (fixture)") {
    val s = spark; import s.implicits._
    // u1: a@1 -> b@2 -> c@2 (tie broken by event_id: 20 < 21)
    // u2: b@5 -> a@6
    val ev = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L), (1L, 21L, "c", 2L),
      (2L, 30L, "b", 5L), (2L, 31L, "a", 6L)
    ).toDF("user_id", "event_id", "event_type", "ep")
    val out = Funnel.pathingOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("a", "b")) == ((1L, 1.0)))
    assert(out(("b", "c")) == ((1L, 0.5)))
    assert(out(("b", "a")) == ((1L, 0.5)))
    assert(out.size == 3, s"unexpected transitions: $out")
  }

  test("pathing probabilities sum to 1 per from_type at sf0.001") {
    val rows = Funnel.eventsPathing(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-3,
        s"$from: probabilities sum to $total")
      val ns = rs.map(_.getLong(2))
      assert(ns.forall(_ > 0))
    }
  }

  test("retention: cohorts exist, offsets non-negative, week-0 populated") {
    val rows = Funnel.eventsRetention(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "negative week_offset leaked")
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (cw, rs) =>
      // the signup event itself lands at offset 0
      assert(rs.exists(_._2 == 0L), s"cohort $cw missing week-0 row")
      val w0 = rs.find(_._2 == 0L).get._3
      assert(rs.forall(_._3 <= w0),
        s"cohort $cw: some offset exceeds week-0 user count")
    }
  }

  test("anomaly z-scores equal an independent trailing-window reference") {
    import org.apache.spark.sql.functions._
    // independent reference from the raw hourly counts
    val hourly = graft.Tables(spark, sfDir).events
      .select(col("event_type"), graft.Tables.tsNsToSec("ts").as("ep"))
      .selectExpr("event_type", "ep div 3600L AS h")
      .groupBy("event_type", "h").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = hourly.groupBy(_._1).view.mapValues(
      _.map(t => t._2 -> t._3).toMap).toMap
    val want = (for {
      (tpe, hs) <- byType.toSeq
      (h, cnt) <- hs.toSeq
      window = ((h - 24) to (h - 1)).flatMap(hs.get)
      if window.size >= Funnel.AnomalyMinBaseline
      nw = window.size
      sumx = window.sum
      sumx2 = window.map(x => x * x).sum
      varr = (sumx2.toDouble - sumx.toDouble * sumx / nw) / (nw - 1)
      if varr > 0
      z = (cnt.toDouble - sumx.toDouble / nw) / math.sqrt(varr)
    } yield (tpe, h * 3600) ->
        ((cnt.toInt, math.abs(z) > Funnel.AnomalySpikeZ))).toMap
    val got = Funnel.eventsAnomaly(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getInt(2), r.getBoolean(4)))).toMap
    assert(got.keySet === want.keySet,
      s"row sets differ: extra=${(got.keySet -- want.keySet).take(3)} " +
        s"missing=${(want.keySet -- got.keySet).take(3)}")
    got.foreach { case (k, v) => assert(want(k) === v, s"row $k") }
    assert(got.nonEmpty, "baseline window must yield scored hours")
  }

  test("attribution credits first/last prior touch (hand fixture)") {
    val s = spark; import s.implicits._
    val G = 1000000000L // epoch-nanos per second, as Tables.events
    val ev = Seq(
      // u1: two purchases; the second sees the post-purchase view
      (1L, 1L, "view", 1 * G), (2L, 1L, "click", 2 * G),
      (3L, 1L, "purchase", 3 * G), (4L, 1L, "view", 4 * G),
      (5L, 1L, "purchase", 5 * G),
      // u2: conversion with no history at all
      (6L, 2L, "purchase", 1 * G),
      // u3: everything in the same nanosecond — (ts, event_id)
      // tiebreak decides; the id-10 view FOLLOWS the purchase
      (7L, 3L, "view", 1 * G), (8L, 3L, "click", 1 * G),
      (9L, 3L, "purchase", 1 * G), (10L, 3L, "view", 1 * G),
      // u4: prior history that contains no touch types
      (11L, 4L, "error", 1 * G), (12L, 4L, "purchase", 2 * G)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Funnel.attributionOf(ev).collect().map { r =>
      r.getLong(0) -> ((Option(r.get(3)), Option(r.get(4)),
        Option(r.get(5)), Option(r.get(6)), r.getInt(7)))
    }.toMap
    assert(out.keySet == Set(3L, 5L, 6L, 9L, 12L),
      "exactly the purchases are attributed")
    assert(out(3L) == ((Some("view"), Some(1L), Some("click"), Some(2L), 2)))
    assert(out(5L) == ((Some("view"), Some(1L), Some("view"), Some(4L), 3)))
    assert(out(6L) == ((None, None, None, None, 0)))
    assert(out(9L) == ((Some("view"), Some(7L), Some("click"), Some(8L), 2)))
    assert(out(12L) == ((None, None, None, None, 0)))
  }

  test("attribution scans events once and shuffles once (plus output sort)") {
    val q = Funnel.eventsAttribution(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 events scan, got $scans:\n$plan")
    val hashEx = "hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected 1 hash exchange (user_id), got $hashEx:\n$plan")
    val windows = "Window".r.findAllIn(plan).length
    assert(windows == 1,
      s"five aggregates over one frame must fuse into 1 Window node, got $windows:\n$plan")
  }

  test("engagement: MAU dominates DAU, the span's first day has no " +
      "lookback, stickiness is the exact rounded ratio, an " +
      "independent sliding-window replica agrees") {
    val rows = Funnel.eventsEngagement(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    rows.foreach { case (day, dau, mau, st) =>
      assert(mau >= dau, s"day $day: MAU $mau < DAU $dau")
      assert(st > 0 && st <= 1.0)
    }
    val firstDay = rows.head
    assert(firstDay._2 === firstDay._3,
      "first observed day has no history: MAU must equal DAU")
    // independent replica: driver-side sliding distinct over user-days
    val ud = graft.Tables(spark, sfDir).events
      .selectExpr("(ts div 1000000000L) div 86400L as day", "user_id")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = ud.groupBy(_._1)
    rows.foreach { case (day, dau, mau, _) =>
      assert(byDay(day).map(_._2).toSet.size.toLong === dau)
      val win = (day - Funnel.MauWindowDays + 1) to day
      val expectMau = win.flatMap(d =>
        byDay.getOrElse(d, Array.empty[(Long, Long)]).map(_._2)).toSet.size
      assert(expectMau.toLong === mau, s"day $day MAU")
    }
  }

  test("events_rfm: scores bounded, segments match the CASE, replica agrees") {
    val got = graft.operators.Funnel.eventsRfm(spark, sfDir).collect()
    assert(got.nonEmpty)
    // driver replica of the per-user metrics (cents-exact monetary)
    val ev = graft.Tables(spark, sfDir).events
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("user_id", "ts div 1000000000 AS ep",
        "cast(floor(value * 100) AS long) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxEp = ev.map(_._2).max
    val byUser = ev.groupBy(_._1).map { case (u, rs) =>
      u -> ((maxEp - rs.map(_._2).max) / 86400L,
        rs.length.toLong, rs.map(_._3).sum)
    }
    got.foreach { r =>
      val (u, rec, freq, mon) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val (wRec, wFreq, wCents) = byUser(u)
      assert(rec == wRec && freq == wFreq, s"user $u metrics")
      assert(math.abs(mon - wCents / 100.0) < 1e-9, s"user $u monetary")
      val (rs, fs, ms, seg) =
        (r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7))
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      val want =
        if (rs >= 4 && fs >= 4 && ms >= 4) "champions"
        else if (fs >= 4) "loyal"
        else if (ms >= 4) "big_spender"
        else if (rs <= 2 && fs >= 3) "at_risk"
        else if (rs == 1) "churned"
        else "casual"
      assert(seg == want, s"user $u segment")
    }
    // every score level is populated somewhere (the boundaries cut)
    assert(got.map(_.getInt(4)).distinct.length >= 3)
  }
}
