package graft.operators

import graft.SparkSuite

/** `events_lifecycle` / `interval_coverage` / `events_markov` —
  * semantics on hand fixtures plus structural invariants at sf0.001. */
class LifecycleSpec extends SparkSuite {

  test("lifecycle classifies new/retained/resurrected/churned (hand fixture)") {
    val s = spark; import s.implicits._
    // u1 active d1,d2,d4; u2 active d1 only; u3 active d4 only
    val act = Seq(
      (1L, 1L), (2L, 1L), (4L, 1L),
      (1L, 2L),
      (4L, 3L)
    ).toDF("day", "user_id")
    val out = Lifecycle.lifecycleOf(act).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // day1: u1,u2 new; nobody churns INTO day1
    assert(out(1L) == ((2L, 0L, 0L, 0L, 2L)))
    // day2: u1 retained; u2 churned into day2 (absent after day1)
    assert(out(2L) == ((0L, 1L, 0L, 1L, 1L)))
    // day3 silent: u1's churn-into-day3 is dropped (dau=0 filter)
    assert(!out.contains(3L))
    // day4: u1 resurrected (gap), u3 new; churn-into-day5 dropped
    assert(out(4L) == ((1L, 0L, 1L, 0L, 2L)))
  }

  test("interval coverage merges overlaps, counts segments (hand fixture)") {
    val s = spark; import s.implicits._
    // win=100: u1 [0,100)+[50,150)+[300,400) → 250 sec, 2 segments;
    // u2 duplicate instants [10,110)x2 → 100 sec, 1 segment;
    // u3 touching [0,100)+[100,200) → 200 sec, 2 segments (ep >= prev_end)
    val iv = Seq(
      (1L, 0L, 1L), (1L, 50L, 2L), (1L, 300L, 3L),
      (2L, 10L, 4L), (2L, 10L, 5L),
      (3L, 0L, 6L), (3L, 100L, 7L)
    ).toDF("user_id", "ep", "event_id")
    val out = Lifecycle.intervalCoverageOf(iv, 100L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((3L, 250L, 2L)))
    assert(out(2L) == ((2L, 100L, 1L)))
    assert(out(3L) == ((2L, 200L, 2L)))
  }

  test("interval coverage bounds at sf0.001: covered_sec ≤ n_events·win") {
    val rows = Lifecycle.intervalCoverage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, cov, seg) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cov >= Lifecycle.CoverageWindowSec && // ≥ one window
        cov <= n * Lifecycle.CoverageWindowSec, s"coverage out of bounds: $r")
      assert(seg >= 1 && seg <= n)
      assert(cov >= seg * Lifecycle.CoverageWindowSec)
    }
  }

  test("dwell gaps are ordered: 0 ≤ avg ≤ p90 ≤ max; n totals match pathing") {
    val rows = Lifecycle.eventsDwell(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, avg, p90, mx) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))
      assert(n > 0)
      assert(avg >= 0.0 && avg <= mx + 1e-9, s"$r")
      assert(p90 >= 0.0 && p90 <= mx + 1e-9, s"$r")
    }
    // every consecutive pair contributes exactly once: Σn equals the
    // corpus event count minus one per user with ≥1 event
    import org.apache.spark.sql.functions._
    val ev = graft.Tables(spark, sfDir).events
    val total = ev.count()
    val users = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == total - users)
  }

  test("lifecycle: dau equals per-day distinct users; single events scan") {
    val df = Lifecycle.eventsLifecycle(spark, sfDir)
    val rows = df.collect()
    val ev = graft.Tables(spark, sfDir).events
    import org.apache.spark.sql.functions._
    val dau = ev.select(expr("(ts div 1000000000L) div 86400L").as("day"),
        col("user_id")).distinct()
      .groupBy("day").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(5) == dau(r.getLong(0)), s"$r"))
    // the contribution-explode keeps the tagged frame single-lineage:
    // exactly one source leaf in the executed plan (tree walk — a
    // textual count double-prints under AQE's initial-plan section;
    // in a shared-session suite a matching cached plan may substitute
    // the parquet scan, so in-memory leaves count as the source too)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def scans(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case _: FileSourceScanExec => 1
      case _: InMemoryTableScanExec => 1
      case other => other.children.map(scans).sum
    }
    df.count() // materialize so AQE finalizes the plan
    val n = scans(df.queryExecution.executedPlan)
    assert(n == 1, s"expected 1 events source leaf, got $n")
  }

  test("pareto: cents-exact classes, cumulative share monotone") {
    val rows = Lifecycle.ordersPareto(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // independent recompute of the integer-cents classification
    val o = graft.Tables(spark, sfDir).orders.collect()
      .map(r => r.getLong(1) -> math.floor(r.getDouble(3) * 100).toLong)
    val rev = o.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = rev.values.sum
    val order = rev.toSeq.sortBy { case (k, v) => (-v, k) }
    var cum = 0L
    val expect = order.map { case (k, v) =>
      cum += v
      k -> (v, if (cum * 2 <= total) "A"
               else if (cum * 5 <= total * 4) "B" else "C")
    }.toMap
    assert(rows.length == expect.size)
    var prevShare = 0.0
    rows.foreach { r =>
      val (k, share, cls) = (r.getLong(0), r.getDouble(2), r.getString(3))
      assert(cls == expect(k)._2, s"class mismatch for $k")
      assert(share >= prevShare, "cum_share must be non-decreasing")
      prevShare = share
    }
    assert(math.abs(rows.last.getDouble(2) - 1.0) < 1e-9)
    assert(Set("A", "B", "C").subsetOf(rows.map(_.getString(3)).toSet),
      "fixture must exercise all three classes")
  }

  test("above-avg: integer flag matches a direct recompute") {
    val rows = Lifecycle.ordersAboveAvg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val o = graft.Tables(spark, sfDir).orders.collect()
      .map(r => r.getLong(1) -> math.floor(r.getDouble(3) * 100).toLong)
    val byCust = o.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val cents = byCust(r.getLong(0))
      val (n, tot) = (cents.length.toLong, cents.sum)
      assert(r.getLong(1) == n, s"n_orders $r")
      assert(r.getLong(2) == cents.count(c => c * n > tot).toLong,
        s"n_above $r")
      assert(math.abs(r.getDouble(3) - tot.toDouble / (n * 100.0)) < 1e-3,
        s"avg_price $r")
    }
    // the flag is meaningful: above-average orders are a strict
    // minority-to-majority split, never all or none, on real data
    assert(rows.exists(r => r.getLong(2) > 0 && r.getLong(2) < r.getLong(1)))
  }

  test("streaks: islands of consecutive months (hand recompute)") {
    val rows = Lifecycle.ordersStreaks(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val o = graft.Tables(spark, sfDir).orders
      .selectExpr("o_custkey",
        "cast(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS int) AS mk")
      .collect().map(r => (r.getLong(0), r.getInt(1))).distinct
    val byCust = o.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val mks = byCust(r.getLong(0))
      var lens = List(1)
      mks.zip(mks.tail).foreach { case (a, b) =>
        if (b == a + 1) lens = (lens.head + 1) :: lens.tail
        else lens = 1 :: lens
      }
      assert(r.getLong(1) == mks.length.toLong, s"n_months $r")
      assert(r.getLong(2) == lens.length.toLong, s"n_streaks $r")
      assert(r.getLong(3) == lens.max.toLong, s"max_streak $r")
    }
  }

  test("twap: duration-weighted mean reconciles; single-event users NULL") {
    val rows = Lifecycle.eventsTwap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val evs = graft.Tables(spark, sfDir).events
      .selectExpr("user_id", "ts div 1000000000 AS ep", "event_id",
        "cast(floor(value * 100) AS long) AS cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = evs.groupBy(_._1)
    rows.foreach { r =>
      val es = byUser(r.getLong(0)).sortBy(e => (e._2, e._3))
      assert(r.getLong(1) == es.length.toLong, s"n_events $r")
      if (es.length == 1) assert(r.isNullAt(3), s"single-event twap $r")
      else {
        val durs = es.zip(es.tail).map { case (a, b) => (a._4, b._2 - a._2) }
        val (wsum, dsum) = (durs.map(p => p._1 * p._2).sum, durs.map(_._2).sum)
        assert(r.getLong(2) == dsum, s"dur_sec $r")
        if (dsum == 0) assert(r.isNullAt(3))
        else assert(math.abs(r.getDouble(3) - wsum.toDouble / (dsum * 100.0)) < 1e-3,
          s"twap $r")
      }
    }
  }

  test("abtest: one row, counts and z reconcile with a direct recompute") {
    val rows = Lifecycle.eventsAbtest(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    // purchases per user, recomputed driver-side
    val perUser = graft.Tables(spark, sfDir).events.collect()
      .map(x => (x.getLong(2), x.getString(3)))
      .groupBy(_._1).view
      .mapValues(_.count(_._2 == "purchase").toLong).toMap
    val (a, b) = perUser.partition(_._1 % 2 == 0)
    assert(r.getLong(0) == a.size.toLong && r.getLong(3) == b.size.toLong)
    val (sa, sb) = (a.values.sum, b.values.sum)
    assert(r.getLong(1) == sa && r.getLong(4) == sb)
    val (mA, mB) = (sa.toDouble / a.size, sb.toDouble / b.size)
    assert(math.abs(r.getDouble(2) - mA) < 1e-3)
    assert(math.abs(r.getDouble(5) - mB) < 1e-3)
    def svar(xs: Iterable[Long]): Double = {
      val n = xs.size; val m = xs.sum.toDouble / n
      xs.map(x => (x - m) * (x - m)).sum / (n - 1)
    }
    val z = (mA - mB) / math.sqrt(svar(a.values) / a.size + svar(b.values) / b.size)
    assert(math.abs(r.getDouble(6) - z) < 1e-3, s"z ${r.getDouble(6)} vs $z")
  }

  test("sla: latencies, threshold and percentiles reconcile with a recompute") {
    val rows = Lifecycle.ordersSla(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val t = graft.Tables(spark, sfDir)
    def day(r: org.apache.spark.sql.Row, i: Int): java.time.LocalDate =
      r.get(i) match {
        case d: java.time.LocalDateTime => d.toLocalDate
        case ts: java.sql.Timestamp => ts.toLocalDateTime.toLocalDate
      }
    val lats = t.lineitem.select("l_orderkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), day(r, 1)))
    val ords = t.orders
      .select("o_orderkey", "o_orderdate", "o_orderpriority").collect()
      .map(r => r.getLong(0) -> ((day(r, 1), r.getString(2)))).toMap
    val perPrio = lats.flatMap { case (k, ship) =>
      ords.get(k).map { case (od, prio) =>
        (prio, java.time.temporal.ChronoUnit.DAYS.between(od, ship))
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val prio = r.getString(0)
      val ls = perPrio(prio).sorted
      assert(r.getLong(1) == ls.length.toLong)
      assert(r.getLong(2) == ls.count(_ <= Lifecycle.SlaDays).toLong)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      // p50/p90 interpolated within the observed range, ordered
      assert(r.getDouble(4) >= ls.head && r.getDouble(4) <= ls.last)
      assert(r.getDouble(5) >= r.getDouble(4) && r.getDouble(5) <= ls.last)
    }
  }

  test("seasonality: peaked vs flat fixtures, exact chi-square algebra") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sea").toString
    def ns(day: Long, hour: Long): Long = (day * 86400L + hour * 3600L + 1L) * 1000000000L
    // epoch day 4 = Monday (day 0 = Thursday); dow = (day+3) % 7
    val rows =
      (1 to 3).map(_ => ("a", ns(4, 2))) ++              // all Monday 02h
      (4L to 10L).map(d => ("b", ns(d, 0)))              // one per dow, 00h
    rows.toDF("event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Lifecycle.eventsSeasonality(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getInt(4), r.getDouble(5)))).toMap
    // a: χ²_dow = (7·9−9)/3 = 18; χ²_hour = (24·9−9)/3 = 69
    assert(out("a") == ((3L, 0, 18.0, 2, 69.0)))
    // b: flat dow ⇒ 0 with earliest-bin peak; all hour-0 ⇒ (24·49−49)/7
    assert(out("b") == ((7L, 0, 0.0, 0, 161.0)))
  }

  test("seasonality: sf invariants — mass, ranges, nonneg chi2") {
    val rows = Lifecycle.eventsSeasonality(spark, sfDir).collect()
    val n = graft.Tables(spark, sfDir).events.count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach { r =>
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 6)
      assert(r.getInt(4) >= 0 && r.getInt(4) <= 23)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(5) >= 0.0)
    }
  }

  test("backlog: end-of-day snapshots on a hand fixture, lineless order stays open") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bl").toString
    def d(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(1970, 1, 1).plusDays(day).atStartOfDay())
    Seq((1L, d(0)), (2L, d(1)), (3L, d(2)))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, d(1)), (1L, d(3)), (2L, d(1)))
      .toDF("l_orderkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Lifecycle.ordersBacklog(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out(0L) == ((1L, 0L, 1L)))
    assert(out(1L) == ((1L, 1L, 1L)))   // order 2 opens and closes
    assert(out(2L) == ((1L, 0L, 2L)))
    assert(out(3L) == ((0L, 1L, 1L)))   // order 3 (lineless) remains
  }

  test("backlog: sf invariants — nonneg, mass conserved, lineless residue") {
    val rows = Lifecycle.ordersBacklog(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val days = rows.map(_._1)
    assert(days.last - days.head + 1 == days.length, "dense grid")
    rows.foreach(r => assert(r._4 >= 0L, s"negative backlog at $r"))
    val t = graft.Tables(spark, sfDir)
    val nOrders = t.orders.count()
    val nWithLines = t.lineitem.select("l_orderkey").distinct().count()
    assert(rows.map(_._2).sum == nOrders)
    assert(rows.map(_._3).sum == nWithLines)
    assert(rows.last._4 == nOrders - nWithLines,
      "final backlog = forever-open lineless orders")
  }

  test("changepoint: planted level shift lands on the last pre-shift day") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cp").toString
    def ns(day: Long, sec: Long): Long = (day * 86400L + sec) * 1000000000L
    // type a: 1/day on days 0-3, then 5/day on days 4-7 (level shift)
    val rows =
      (0L to 3L).map(d => ("a", ns(d, 10))) ++
      (4L to 7L).flatMap(d => (1L to 5L).map(i => ("a", ns(d, i)))) ++
      // type b: flat 2/day on days 0-2 → dev 0 everywhere, earliest day
      (0L to 2L).flatMap(d => Seq(("b", ns(d, 1)), ("b", ns(d, 2))))
    rows.toDF("event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Lifecycle.eventsChangepoint(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4),
          r.getDouble(5)))).toMap
    // N=8, S=24: peak |8·prefix − i·24| = 64 at day 3, negative side
    assert(out("a") == ((8L, 24L, 3L, -1, 8.0)))
    // flat series: dev 0, earliest-day tiebreak, side 0
    assert(out("b") == ((3L, 6L, 0L, 0, 0.0)))
  }

  test("changepoint: sf invariants — one row per type, cp inside the span") {
    val rows = Lifecycle.eventsChangepoint(spark, sfDir).collect()
    val types = graft.Tables(spark, sfDir).events
      .select("event_type").distinct().count()
    assert(rows.length == types)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(2) > 0L)
      assert(Set(-1, 0, 1).contains(r.getInt(4)))
      assert(r.getDouble(5) >= 0.0)
    }
  }

  test("resample: LOCF fixture — gap days carry the last sample") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rs").toString
    def ns(day: Long, sec: Long): Long = (day * 86400L + sec) * 1000000000L
    Seq(
      // user 1: two events day 0 (last = eid 11, 2.50), gap days 1-2,
      // one event day 3
      (1L, 10L, ns(0, 100), 1.00),
      (1L, 11L, ns(0, 200), 2.50),
      (1L, 12L, ns(3, 50), 7.25),
      // user 2: single active day
      (2L, 20L, ns(5, 10), 3.00)
    ).toDF("user_id", "event_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Lifecycle.eventsResample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet ==
      Set((1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L), (2L, 5L)))
    assert(out((1L, 0L)) == ((2L, 250L)))
    assert(out((1L, 1L)) == ((0L, 250L)))   // carried
    assert(out((1L, 2L)) == ((0L, 250L)))   // carried
    assert(out((1L, 3L)) == ((1L, 725L)))
    assert(out((2L, 5L)) == ((1L, 300L)))
  }

  test("resample: sf invariants — dense contiguous grid, event mass conserved") {
    val rows = Lifecycle.eventsResample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val days = rs.map(_._2).sorted
      assert(days.last - days.head + 1 == days.length, s"user $u grid dense")
      assert(days.distinct.length == days.length)
    }
    // locf never null once the grid starts; gap days exist in corpus
    assert(rows.exists(_._3 == 0L), "sf0.001 has gap days")
    val total = rows.map(_._3).sum
    val nEvents = graft.Tables(spark, sfDir).events.count()
    assert(total == nEvents, "per-day counts must sum to the corpus")
  }

  test("basket: fixture rules — support cut, confidences, lift") {
    val s = spark; import s.implicits._
    // orders: 1{A,B,C} 2{A,B} 3{A,C} 4{D}; N=4
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L),
      (4L, 40L)
    ).toDF("k", "p")
    val out = Lifecycle.basketOf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    // (B,C) co-occur once → cut; D infrequent → pruned pre-join
    assert(out.keySet == Set((10L, 20L), (10L, 30L)))
    // n_ab=2, n_a=3, n_b=2: conf 2/3, 1.0; lift 2·4/(3·2)
    assert(out((10L, 20L)) == ((2L, 3L, 2L, 0.6667, 1.0, 1.3333)))
    assert(out((10L, 30L)) == ((2L, 3L, 2L, 0.6667, 1.0, 1.3333)))
  }

  test("basket: sf invariants — bounds and rule sanity") {
    val rows = Lifecycle.ordersBasket(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nab, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nab >= Lifecycle.BasketMinOrders)
      assert(nab <= math.min(na, nb))
      assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0)
      assert(r.getDouble(6) > 0 && r.getDouble(6) <= 1.0)
      assert(r.getDouble(7) > 0)
      assert(r.getLong(0) < r.getLong(1))
    }
  }

  test("rolling uniques: trailing-week distinct recompute; wau ≥ dau") {
    val rows = Lifecycle.eventsRollingUniques(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ud = graft.Tables(spark, sfDir).events
      .selectExpr("user_id", "(ts div 1000000000) div 86400 AS day")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = ud.groupBy(_._2)
    rows.foreach { r =>
      val d = r.getLong(0)
      val dau = byDay(d).map(_._1).distinct.length
      val wau = ud.filter(p => p._2 <= d &&
        p._2 > d - Lifecycle.RollingWindowDays).map(_._1).distinct.length
      assert(r.getLong(1) == dau.toLong, s"dau $r")
      assert(r.getLong(2) == wau.toLong, s"wau $r")
      assert(r.getLong(2) >= r.getLong(1), "wau must dominate dau")
      assert(math.abs(r.getDouble(3) - dau.toDouble / wau) < 1e-3)
    }
    // only active days appear
    assert(rows.length == byDay.size)
  }

  test("ewma: halving recurrence and residual reconstruction") {
    val rows = Lifecycle.eventsEwma(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // independent sequential recompute from the raw daily counts
    val daily = graft.Tables(spark, sfDir).events
      .selectExpr("event_type", "(ts div 1000000000L) div 86400L AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (tpe, trs) =>
      var e = Double.NaN
      trs.sortBy(_.getLong(1)).zipWithIndex.foreach { case (r, i) =>
        val n = r.getLong(2)
        assert(n == daily((tpe, r.getLong(1))), s"count mismatch $r")
        val prev = e
        e = if (i == 0) n.toDouble else (e + n) / 2.0
        assert(math.abs(r.getDouble(3) - e) < 1e-4, s"ewma mismatch $r")
        if (i == 0) assert(r.isNullAt(4))
        else assert(math.abs(r.getDouble(4) - (n - prev)) < 1e-4,
          s"residual mismatch $r")
      }
    }
  }

  test("events_trend: slope and forecast match an exact BigInt OLS recompute") {
    val out = Lifecycle.eventsTrend(spark, sfDir).collect()
    assert(out.nonEmpty)
    // independent exact recompute: daily counts from the Tables seam,
    // the OLS rationals in BigInt, the one double division at the end
    val daily = graft.Tables(spark, sfDir).events
      .select(org.apache.spark.sql.functions.col("event_type"),
        graft.Tables.tsNsToSec("ts").as("ep"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .groupBy(_._1._1)
    out.foreach { r =>
      val tpe = r.getString(0)
      val pts = daily(tpe).map { case ((_, d), c) => (BigInt(d), BigInt(c)) }
      val n = BigInt(pts.size)
      val sx = pts.map(_._1).sum
      val sy = pts.map(_._2).sum
      val sxy = pts.map { case (x, y) => x * y }.sum
      val sxx = pts.map { case (x, _) => x * x }.sum
      val d1 = pts.map(_._1).max
      val den = n * sxx - sx * sx
      val slope = (n * sxy - sx * sy).toDouble / den.toDouble
      val fc = ((sy * sxx - sx * sxy) +
        (n * sxy - sx * sy) * (d1 + BigInt(Lifecycle.TrendHorizonDays)))
        .toDouble / den.toDouble
      assert(r.getLong(1) === pts.size.toLong, s"n_days $tpe")
      assert(r.getLong(2) === d1.toLong, s"d1 $tpe")
      assert(math.abs(r.getDouble(3) - slope) <= 5e-7, s"slope $tpe")
      assert(math.abs(r.getDouble(4) - fc) <= 5e-5, s"forecast $tpe")
    }
  }

  test("events_trend hand fixture: exact line recovered exactly") {
    val s2 = spark; import s2.implicits._
    // counts 10, 12, 14 on days 100..102: slope 2, next +7 = day 109
    // → forecast 10 + 2·9 = 28. Build the daily frame directly and
    // drive the same algebra through a micro eventsTrend replica to
    // pin the rational formulas themselves.
    val daily = Seq(("a", 100L, 10L), ("a", 101L, 12L), ("a", 102L, 14L))
      .toDF("event_type", "day", "c")
    import org.apache.spark.sql.functions._
    val st = daily.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"), sum(col("day")).as("sx"),
      sum(col("c")).as("sy"), sum(col("day") * col("c")).as("sxy"),
      sum(col("day") * col("day")).as("sxx"), max(col("day")).as("d1"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val sn = col("n") * col("sxy") - col("sx") * col("sy")
    val fc = (col("sy") * col("sxx") - col("sx") * col("sxy")) +
      sn * (col("d1") + lit(Lifecycle.TrendHorizonDays))
    val row = st.select(
      (sn.cast("double") / den.cast("double")).as("slope"),
      (fc.cast("double") / den.cast("double")).as("fc")).head()
    assert(row.getDouble(0) === 2.0)
    assert(row.getDouble(1) === 28.0)
  }

  test("events_interarrival: hand gaps, per-user-per-type windows, " +
    "interpolated p90") {
    val s = spark; import s.implicits._
    // user 1 type A at 0,10,30 -> gaps 10,20; user 2 type A at
    // 100,105 -> gap 5; the single type-B event contributes nothing.
    val ev = Seq(
      (1L, 1L, "A", 0L), (1L, 2L, "A", 10L), (1L, 3L, "A", 30L),
      (2L, 4L, "A", 100L), (2L, 5L, "A", 105L),
      (1L, 6L, "B", 50L)
    ).toDF("user_id", "event_id", "event_type", "ep")
    val got = Lifecycle.interarrivalOf(ev).collect()
    assert(got.length == 1 && got.head.getString(0) == "A")
    val r = got.head
    assert(r.getLong(1) == 3L && r.getLong(2) == 35L)
    assert(math.abs(r.getDouble(3) - 35.0 / 3) < 1e-3)
    assert(r.getDouble(4) === 10.0)          // p50 of [5,10,20]
    // p90: index 0.9·(3−1) = 1.8 -> 10 + 0.8·(20−10) = 18
    assert(r.getDouble(5) === 18.0)
    assert(r.getLong(6) == 20L)
  }

  test("burstiness: periodic = -1 exactly, heavy-tail positive, " +
    "n<2 filtered (hand fixture)") {
    val s = spark; import s.implicits._
    // type P: gaps 10,10,10 (periodic); type H: gaps 1,1,1,1,96
    // (bursty: sd > mean); type X: one event, no gap
    val ev = (Seq(0L, 10L, 20L, 30L).zipWithIndex.map { case (t, i) =>
      (1L, i.toLong, "P", t) } ++
      Seq(0L, 1L, 2L, 3L, 4L, 100L).zipWithIndex.map { case (t, i) =>
        (2L, 10L + i.toLong, "H", t) } ++
      Seq((3L, 99L, "X", 5L)))
      .toDF("user_id", "event_id", "event_type", "ep")
    val got = Lifecycle.burstinessOf(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    assert(got.size == 2 && !got.contains("X"))
    assert(got("P") == ((3L, 10.0, -1.0)))
    val (n, mu, b) = got("H")
    assert(n == 5L && mu == 20.0 && b > 0.0, s"H: $n $mu $b")
    // driver recompute of H's burstiness
    val gaps = Seq(1.0, 1.0, 1.0, 1.0, 96.0)
    val m = gaps.sum / gaps.length
    val sd = math.sqrt(gaps.map(g => (g - m) * (g - m)).sum / gaps.length)
    assert(math.abs(b - (sd - m) / (sd + m)) < 1e-6)
  }

  test("markov transition matrix: counts, row-normalized probabilities " +
    "(hand fixture)") {
    val s = spark; import s.implicits._
    // u1: A→B→A; u2: A→A. Rows: A→B 1, B→A 1, A→A 1 ⇒ from A the
    // row splits 0.5/0.5; no transition OUT of the final events.
    val ev = Seq(
      (1L, 1L, "A", 0L), (1L, 2L, "B", 10L), (1L, 3L, "A", 20L),
      (2L, 4L, "A", 0L), (2L, 5L, "A", 5L)
    ).toDF("user_id", "event_id", "event_type", "ep")
    val got = Lifecycle.markovOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.size == 3)
    assert(got(("A", "A")) == ((1L, 0.5)))
    assert(got(("A", "B")) == ((1L, 0.5)))
    assert(got(("B", "A")) == ((1L, 1.0)))
  }

  test("markov rows sum to 1 per from_type at sf0.001") {
    val rows = Lifecycle.eventsMarkov(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (f, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-2, s"row $f sums to $p") // round(4)·k slack
    }
  }

  test("kaplan-meier survival: censoring keeps n_risk honest " +
    "(hand fixture)") {
    val s = spark; import s.implicits._
    // 4 signups at ep=0. u1 converts day 0 (ep 10), u2 day 2
    // (ep 2·86400), u3/u4 never (censored at tmax ep=4·86400 → day 4).
    // KM: day 0: n=4, d=1, S=0.75; day 2: n=3, d=1, S=0.75·(2/3)=0.5.
    val ev = Seq(
      (1L, "signup", 0L), (2L, "signup", 0L),
      (3L, "signup", 0L), (4L, "signup", 0L),
      (1L, "purchase", 10L), (2L, "purchase", 2L * 86400L),
      (3L, "view", 4L * 86400L), (4L, "view", 4L * 86400L)
    ).toDF("user_id", "event_type", "ep")
    val got = Lifecycle.survivalOf(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.size == 2)
    assert(got(0L) == ((4L, 1L, 0.75)))
    assert(got(2L) == ((3L, 1L, 0.5)))
  }

  test("kaplan-meier survival: full-conversion final day hits exactly 0") {
    val s = spark; import s.implicits._
    // both subjects convert on day 1 → d = n_risk, S = 0 (the
    // ln(0)-guard path in both engines).
    val ev = Seq(
      (1L, "signup", 0L), (2L, "signup", 0L),
      (1L, "purchase", 86400L), (2L, "purchase", 86400L)
    ).toDF("user_id", "event_type", "ep")
    val got = Lifecycle.survivalOf(ev).collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 2L && got.head.getLong(2) == 2L)
    assert(got.head.getDouble(3) == 0.0)
  }

  test("survival is monotone non-increasing in (0,1] at sf0.001") {
    val rows = Lifecycle.eventsSurvival(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val s = rows.map(_.getDouble(3))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a })
    assert(s.forall(x => x >= 0.0 && x < 1.0))
    // purchases-before-signup never count: every duration ≥ 0
    assert(rows.map(_.getLong(0)).forall(_ >= 0L))
  }

  test("events_forecast: 7-day contiguous grid per type, linear in " +
    "day, and the horizon point equals events_trend's fc_d7") {
    val trend = Lifecycle.eventsTrend(spark, sfDir).collect()
      .filter(!_.isNullAt(3)) // n >= 2 types only
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(4))).toMap
    val fc = Lifecycle.eventsForecast(spark, sfDir).collect()
      .groupBy(_.getString(0))
    assert(fc.keySet === trend.keySet, "same fitted types as the trend")
    fc.foreach { case (t, rows) =>
      val (d1, fcD7) = trend(t)
      val days = rows.map(_.getLong(1)).sorted.toSeq
      assert(days === (d1 + 1 to d1 + Lifecycle.TrendHorizonDays).toSeq,
        s"$t grid")
      // same rational line, same rounding: the grid's horizon point
      // IS the trend query's single-point forecast
      val last = rows.maxBy(_.getLong(1)).getDouble(2)
      assert(last === fcD7, s"$t horizon point $last vs trend $fcD7")
      // a line: second differences vanish up to round(4) noise
      val ys = rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq
      ys.sliding(3).foreach { w =>
        assert(math.abs((w(2) - w(1)) - (w(1) - w(0))) < 3e-4,
          s"$t not linear: $ys")
      }
    }
  }

  test("orders_yoy: cents-exact monthly revenue with prior-year " +
    "growth, NULL where no baseline exists") {
    import org.apache.spark.sql.functions.{col, floor, month, year}
    val cents = graft.Tables(spark, sfDir).orders
      .select(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        floor(col("o_totalprice") * 100).cast("long").as("c"))
      .collect()
      .groupBy(r => (r.getInt(0), r.getInt(1)))
      .map { case (k, rs) => k -> ((rs.map(_.getLong(2)).sum, rs.length)) }
    val got = Lifecycle.ordersYoy(spark, sfDir).collect()
    assert(got.map(r => (r.getInt(0), r.getInt(1))).toSet === cents.keySet)
    got.foreach { r =>
      val k = (r.getInt(0), r.getInt(1))
      val (rev, n) = cents(k)
      assert(math.abs(r.getDouble(2) - rev / 100.0) < 5e-3, s"$k revenue")
      assert(r.getLong(3) === n.toLong, s"$k n_orders")
      cents.get((k._1 - 1, k._2)) match {
        case Some((prev, _)) =>
          assert(math.abs(r.getDouble(4) -
            (rev - prev) * 100.0 / prev) < 1e-3, s"$k yoy")
        case None => assert(r.isNullAt(4), s"$k must have NULL yoy")
      }
    }
    // the first calendar year can never have a baseline
    val y0 = cents.keySet.map(_._1).min
    assert(got.filter(_.getInt(0) == y0).forall(_.isNullAt(4)))
  }
}
