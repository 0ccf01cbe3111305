package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Profile]] — recompute equality, planted-null accounting, and the
  * one-column-per-branch scan-pruning contract. */
class ProfileSpec extends SparkSuite {

  test("profile matches an independent per-column recompute") {
    val got = Profile.tableProfile(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSeq == Profile.LineitemCols.sorted)
    val li = graft.Tables(spark, sfDir).lineitem
    got.foreach { r =>
      val c = r.getString(0)
      val e = li.agg(
        count(lit(1)), sum(when(col(c).isNull, 1L).otherwise(0L)),
        countDistinct(col(c)),
        min(col(c)).cast("string"), max(col(c)).cast("string")).head()
      assert(r.getLong(1) == e.getLong(0), s"$c n_rows")
      assert(r.getLong(2) == e.getLong(1), s"$c n_null")
      assert(r.getLong(3) == e.getLong(2), s"$c n_distinct")
      assert(r.getString(4) == e.getString(3), s"$c min")
      assert(r.getString(5) == e.getString(4), s"$c max")
    }
  }

  test("nulls are counted, not silently dropped") {
    val s = spark; import s.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (null, "b"), (3L, null), (null, null), (3L, "a"))
      .toDF("k", "v")
    val rows = Profile.profileOf(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5)))).toMap
    assert(rows("k") == ((5L, 2L, 2L, Some("1"), Some("3"))))
    assert(rows("v") == ((5L, 2L, 2L, Some("a"), Some("b"))))
  }

  test("each union branch scans exactly its one column") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val q = Profile.tableProfile(spark, sfDir)
    q.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val ss = scans(q.queryExecution.executedPlan)
    assert(ss.length == Profile.LineitemCols.length,
      s"one scan per profiled column, got ${ss.length}")
    val readCols = ss.map(_.requiredSchema.fieldNames.toSeq)
    readCols.foreach { fields =>
      assert(fields.length <= 1,
        s"branch must read exactly its one column, read: $fields")
    }
    assert(readCols.flatten.sorted == Profile.LineitemCols.sorted,
      s"branches must cover the profiled columns once each: $readCols")
    // and no Expand anywhere — the N-distinct trap this shape avoids
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"unexpected Expand:\n$plan")
  }

  test("skew report: exact fixture algebra, deterministic tiebreak") {
    val s = spark; import s.implicits._
    // a×5, b×3, c×1, d×1: n_rows=10, n_keys=4, top=(a,5),
    // top_share=0.5, skew_ratio = 5·4/10 = 2.0
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val r = Profile.skewOf(df, "fix.k", "k").head()
    assert(r.getString(0) === "fix.k")
    assert(r.getLong(1) === 10L && r.getLong(2) === 4L)
    assert(r.getString(3) === "a" && r.getLong(4) === 5L)
    assert(r.getDouble(5) === 0.5 && r.getDouble(6) === 2.0)
    // tie on the max count resolves to the SMALLER key
    val tied = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq("c"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    assert(Profile.skewOf(tied, "t.k", "k").head().getString(3) === "a")
    // real entry: every profiled key present, shares in (0, 1],
    // ratio ≥ 1 (the heaviest key is at least the mean)
    val out = Profile.tableSkew(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq ===
      Profile.SkewKeys.map { case (t, c) => s"$t.$c" }.sorted)
    out.foreach { row =>
      assert(row.getDouble(5) > 0.0 && row.getDouble(5) <= 1.0)
      assert(row.getDouble(6) >= 1.0)
    }
  }

  test("typed profile: pinned formatting contract and micro-grain ts") {
    val rows = Profile.tableProfileTyped(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5), r.getString(6))).toMap
    assert(rows.keySet == Profile.TypedCols
      .map { case (t, c, _) => (t, c) }.toSet)
    val fixed6 = """-?\d+\.\d{6}""".r
    val tsFmt = """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{6}""".r
    Seq(("events", "value"), ("orders", "o_totalprice")).foreach { k =>
      val (_, _, _, mn, mx) = rows(k)
      assert(fixed6.matches(mn) && fixed6.matches(mx),
        s"$k min/max must be fixed 6-decimal: $mn / $mx")
    }
    Seq(("events", "ts"), ("orders", "o_orderdate")).foreach { k =>
      val (_, _, _, mn, mx) = rows(k)
      assert(tsFmt.matches(mn) && tsFmt.matches(mx),
        s"$k min/max must be 6-digit-micros timestamps: $mn / $mx")
      assert(mn <= mx)
    }
    // ts profiles at the MICRO grain (the oracle engine's read grain):
    // the distinct count must equal a micro-truncated recompute, not
    // the raw-nanos one
    val ev = graft.Tables(spark, sfDir).events
    val microDistinct = ev.selectExpr("ts div 1000 AS us")
      .agg(countDistinct(col("us"))).head().getLong(0)
    assert(rows(("events", "ts"))._3 == microDistinct)
  }

  test("table_fk_check: generator tables are orphan-free; fixture catches planted orphans") {
    val s2 = spark; import s2.implicits._
    val real = Profile.tableFkCheck(spark, sfDir).collect()
    assert(real.length == Profile.FkEdges.length)
    real.foreach { r =>
      assert(r.getLong(3) == 0L, s"${r.getString(0)} orphans")
      assert(r.getDouble(4) == 0.0)
    }
    // planted fixture: 2 orphans, 1 null key, duplicate parent keys
    val child = Seq(Some(1L), Some(2L), Some(99L), Some(98L), None)
      .toDF("k")
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk")
    val got = Profile.fkCheckOf(child, parent, "t.k -> p.pk").head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((5L, 1L, 2L)))
    assert(got.getDouble(4) == 0.4)
  }

  test("table_histogram bins cover every row; edges tile [min, max]") {
    val t = graft.Tables(spark, sfDir)
    val rows = Profile.tableHistogram(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    Profile.HistCols.foreach { case (table, c) =>
      val df = table match {
        case "lineitem" => t.lineitem
        case "orders"   => t.orders
        case "events"   => t.events
      }
      val n = df.count()
      val mine = rows.filter(_._1 == s"$table.$c")
      assert(mine.map(_._5).sum == n, s"$table.$c: counts must cover")
      assert(mine.forall(r => r._2 >= 0 && r._2 < Profile.HistBins))
      // edges are monotone and consistent: lo(bin) < hi(bin), and
      // the occupied bins are distinct
      assert(mine.forall(r => r._3 <= r._4))
      assert(mine.map(_._2).distinct.length == mine.length)
    }
  }

  test("snapshot_diff statuses match the membership algebra exactly") {
    val ids = graft.Tables(spark, sfDir).documents
      .select(col("doc_id")).collect().map(_.getLong(0))
    val got = Profile.snapshotDiff(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.foreach { id =>
      val inA = id % 7 != 3
      val inB = id % 11 != 7
      val expect =
        if (!inA && inB) Some("added")
        else if (inA && !inB) Some("removed")
        else if (inA && inB && id % 5 == 0) Some("changed")
        else None
      assert(got.get(id) === expect, s"doc $id")
    }
    // no phantom rows, and all three delta kinds actually occur
    assert(got.keySet.subsetOf(ids.toSet))
    assert(got.values.toSet === Set("added", "removed", "changed"))
  }

  test("snapshot_diff hash columns reflect membership, never text") {
    val rows = Profile.snapshotDiff(spark, sfDir).collect()
    rows.foreach { r =>
      val (status, a, b) = (r.getString(1), r.getString(2), r.getString(3))
      status match {
        case "added"   => assert(a == null && b != null)
        case "removed" => assert(a != null && b == null)
        case "changed" => assert(a != null && b != null && a != b)
      }
    }
  }

  test("table_corr: bounded coefficients, one scan, and an exact planted fixture") {
    val df = Profile.tableCorr(spark, sfDir)
    val rows = df.collect()
    val nPairs = Profile.CorrCols.combinations(2).size
    assert(rows.length == nPairs)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0, s"|r|>1: $r")
      assert(r.getLong(3) > 0)
    }
    // all six pairs come from ONE aggregate pass over one scan
    df.count()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case _: FileSourceScanExec => 1
      case other => other.children.map(scans).sum
    }
    assert(scans(df.queryExecution.executedPlan) == 1)
    // exact-correlation sanity on a hand frame: y = 2x → r = 1
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.corr
    val r = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0))
      .toDF("x", "y").agg(corr($"x", $"y")).collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("table_fds: key FDs hold, reverse directions fail, counts reconcile") {
    val rows = Profile.tableFds(spark, sfDir).collect()
    val n = Profile.FdCols.size
    assert(rows.length == n * (n - 1))
    val o = graft.Tables(spark, sfDir).orders
      .select(Profile.FdCols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => Profile.FdCols.indices.map(r.get).toVector)
    val idx = Profile.FdCols.zipWithIndex.toMap
    rows.foreach { r =>
      val (det, dep) = (r.getString(0), r.getString(1))
      val dv = o.map(_(idx(det))).distinct.length
      val pv = o.map(v => (v(idx(det)), v(idx(dep)))).distinct.length
      assert(r.getLong(2) == dv.toLong, s"n_det $r")
      assert(r.getLong(3) == pv.toLong, s"n_pairs $r")
      assert(r.getBoolean(4) == (dv == pv), s"fd_holds $r")
    }
    val holds = rows.filter(_.getBoolean(4))
      .map(r => (r.getString(0), r.getString(1))).toSet
    // the unique key determines everything; no other column
    // determines the key back
    Profile.FdCols.filter(_ != "o_orderkey").foreach { c =>
      assert(holds.contains(("o_orderkey", c)), s"o_orderkey -> $c")
      assert(!holds.contains((c, "o_orderkey")), s"$c -> o_orderkey")
    }
    // the round-11 decomposition: exactly n single-column scans (the
    // per-column n_det branches) + C(n,2) two-column scans (the
    // unordered n_pairs branches) — NOT n·(n-1) ordered-pair
    // branches, and never an un-pruned full-schema scan (the
    // single-pass Expand ×16 alternative measured 2.5× slower — see
    // the operator doc)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = Profile.tableFds(spark, sfDir)
    df.count()
    def scans2(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans2(a.executedPlan)
      case q: QueryStageExec => scans2(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans2)
    }
    val scans = scans2(df.queryExecution.executedPlan)
    assert(scans.length == n + n * (n - 1) / 2,
      s"expected $n 1-col + ${n * (n - 1) / 2} 2-col branches, got ${scans.length}")
    val widths = scans.map(_.requiredSchema.fields.length).sorted
    assert(widths == Seq.fill(n)(1) ++ Seq.fill(n * (n - 1) / 2)(2),
      s"branch scans must prune to exactly their 1 or 2 columns: $widths")
  }

  test("table_benford: planted fixture, dense digit axis, probability mass") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // 4 ones-digit values, 2 nines, sub-1.0 filtered, digit 2..8 absent
    val vals = Seq(1.5, 19.99, 123.0, 1000000.25, 9.1, 94.2, 0.4)
      .toDF("x")
    val rows = Profile.benfordOf(vals).collect()
    assert(rows.length === 9, "dense 1..9 axis even with absent digits")
    val byDigit = rows.map(r => r.getInt(0) ->
      ((r.getLong(1), r.getDouble(2)))).toMap
    assert(byDigit(1) === ((4L, 0.666667)))
    assert(byDigit(9) === ((2L, 0.333333)))
    (2 to 8).foreach(d => assert(byDigit(d)._1 === 0L, s"digit $d"))
    // benford_p column carries the exact reference mass (sums to 1)
    val pSum = Profile.BenfordP.sum
    assert(math.abs(pSum - 1.0) < 1e-12)
    // an absent digit still pays its full expected chi2 term:
    // (0 - p*6)^2 / (p*6) = p*6
    val r2 = rows.find(_.getInt(0) == 2).get
    val exp2 = Profile.BenfordP(1) * 6
    assert(math.abs(r2.getDouble(4) - exp2) < 1e-3)

    // corpus: shares sum to 1, all digits present at sf0.001
    val corpus = Profile.tableBenford(spark, sfDir).collect()
    assert(corpus.length === 9)
    val n = corpus.map(_.getLong(1)).sum
    assert(n > 0)
    corpus.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(4) >= 0.0)
    }
    assert(math.abs(corpus.map(_.getDouble(2)).sum - 1.0) < 1e-3)
  }

  test("table_outliers: planted extreme flagged, bulk suppressed") {
    val s = spark; import s.implicits._
    // 9 values tight around 10 (median 10, MAD 1) + one at 1000:
    // z(1000) = 0.6745*990 ≈ 668; z of the bulk ≤ 0.6745*2/1 < 3.5
    val vals = (1L to 9L).map(i => (i, "a", 8.0 + (i % 5))) :+
      ((100L, "a", 1000.0))
    val e = vals.toDF("event_id", "event_type", "value")
    val rows = Profile.madOutliersOf(e).collect()
    assert(rows.length === 1, rows.mkString(";"))
    assert(rows.head.getLong(0) === 100L)
    assert(rows.head.getDouble(5) > 100.0)

    // a constant group (MAD = 0) must emit nothing, not a div-by-zero
    val const = (1L to 5L).map(i => (i, "c", 7.0)).toDF(
      "event_id", "event_type", "value")
    assert(Profile.madOutliersOf(const).collect().isEmpty)

    // corpus: every reported |z| above threshold, none missed below
    val out = Profile.tableOutliers(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(math.abs(r.getDouble(5)) > 3.4999,
      s"event ${r.getLong(0)} z ${r.getDouble(5)}"))
  }

  test("table_ks: exact hand-CDF fixture, identical samples read D = 0") {
    val s = spark; import s.implicits._
    // a = {1,1,2}, b = {2,3,3}: cum_a = 2,3,3; cum_b = 0,1,3 →
    // D_num = max(6,6,0) = 6, D = 6/9 = 0.666667; crit(3,3) ≈ 1.1089
    val e = (Seq(("a", 1.0), ("a", 1.0), ("a", 2.0),
      ("b", 2.0), ("b", 3.0), ("b", 3.0)) ++
      Seq(("c", 1.0), ("c", 1.0), ("c", 2.0))) // c duplicates a
      .toDF("event_type", "value")
    val rows = Profile.ksOf(e, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = rows(("a", "b"))
    assert(ab.getLong(2) === 3L && ab.getLong(3) === 3L)
    assert(ab.getDouble(4) === 0.666667)
    val expCrit = Profile.KsCrit05 * math.sqrt(6.0 / 9.0)
    assert(math.abs(ab.getDouble(5) - expCrit) < 1e-5)
    assert(!ab.getBoolean(6), "small-n fixture cannot be significant")
    // identical distributions → D exactly 0
    assert(rows(("a", "c")).getDouble(4) === 0.0)
    assert(rows(("b", "c")).getDouble(4) === 0.666667)

    // NULL values sit outside the CDF entirely (ADVICE r14): with
    // nulls injected, totals and D must match the null-free fixture —
    // the old form counted them in n_a while the bucketed CDF
    // silently dropped them, so cum/n never reached 1
    val withNulls = e.union(Seq(("a", Option.empty[Double]),
      ("b", Option.empty[Double])).toDF("event_type", "value"))
    val nn = Profile.ksOf(withNulls, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val nab = nn(("a", "b"))
    assert(nab.getLong(2) === 3L && nab.getLong(3) === 3L)
    assert(nab.getDouble(4) === 0.666667)

    // corpus: 10 pairs, D in [0,1], crit consistent with n
    val corpus = Profile.tableKs(spark, sfDir).collect()
    assert(corpus.length === 10)
    corpus.foreach { r =>
      val d = r.getDouble(4)
      assert(d >= 0.0 && d <= 1.0)
      assert(r.getBoolean(6) === (d > r.getDouble(5) - 1e-9) ||
        math.abs(d - r.getDouble(5)) < 1e-5)
    }
  }

  test("table_gini: equal spend reads 0, one-winner reads (n-1)/n") {
    val s = spark; import s.implicits._
    val seg = (
      (1L to 4L).map(i => ("EQ", i, 100L)) ++
      (1L to 3L).map(i => ("WIN", i, 0L)) :+ (("WIN", 4L, 1000L))
    ).toDF("c_mktsegment", "c_custkey", "cents")
    val rows = Profile.giniOf(seg).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows("EQ") === 0.0)
    assert(rows("WIN") === 0.75) // (n-1)/n with n = 4

    val corpus = Profile.tableGini(spark, sfDir).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val g = r.getDouble(3)
      assert(g >= 0.0 && g < 1.0, s"${r.getString(0)}: $g")
      assert(r.getInt(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("table_kanon: class accounting consistent with a driver-side " +
    "recompute on every QI set") {
    val src = graft.Tables(spark, sfDir).orders
      .join(graft.Tables(spark, sfDir).customer,
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderpriority", "o_orderstatus",
        "c_nationkey")
      .collect()
    val got = Profile.tableKanon(spark, sfDir).collect()
    assert(got.length == Profile.KanonQis.length)
    got.foreach { r =>
      val qi = r.getString(0).split(",").toSeq
      val classes = src.groupBy(row =>
        qi.map(c => row.get(row.fieldIndex(c))).mkString("|"))
        .map(_._2.length.toLong)
      assert(r.getLong(1) == classes.sum, s"$qi n_rows")
      assert(r.getLong(2) == classes.size.toLong, s"$qi n_classes")
      assert(r.getLong(3) == classes.min, s"$qi min_class")
      val atRisk = classes.filter(_ < Profile.KanonK).sum
      assert(r.getLong(5) == atRisk, s"$qi n_rows_at_risk")
      assert(r.getBoolean(4) == (classes.min >= Profile.KanonK))
    }
    // the 3-column QI must be at least as risky as its 2-column prefix
    val byQi = got.map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(byQi("c_mktsegment,o_orderpriority,o_orderstatus") >=
      byQi("c_mktsegment,o_orderpriority"))
  }

  test("table_cramers_v: functional dependence reads 1, perfect " +
    "independence reads 0; corpus rows in [0,1]") {
    val s = spark; import s.implicits._
    val dep = Seq.fill(3)(("a", "p")) ++ Seq.fill(3)(("b", "q"))
    val r1 = Profile.cramersOf(dep.toDF("u", "v"), "u", "v").collect().head
    assert(r1.getDouble(5) === 1.0 && r1.getInt(3) == 1)
    val ind = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q"))
    val r0 = Profile.cramersOf(ind.toDF("u", "v"), "u", "v").collect().head
    assert(r0.getDouble(4) === 0.0 && r0.getDouble(5) === 0.0)

    val corpus = Profile.tableCramersV(spark, sfDir).collect()
    assert(corpus.length == Profile.CramersPairs.length)
    corpus.foreach { r =>
      val v = r.getDouble(5)
      assert(v >= 0.0 && v <= 1.0, s"${r.getString(0)}x${r.getString(1)}: $v")
      assert(r.getDouble(4) >= 0.0 && r.getInt(3) >= 1)
    }
  }

  test("table_seq_gaps: in-bucket, boundary and whole-missing-bucket " +
    "gaps all surface; bucketed == global-lead recompute") {
    val s = spark; import s.implicits._
    // 4095|4097 straddle the 4096 boundary (across-bucket branch);
    // 100 -> 9000 spans ALL of bucket 1 (whole-missing-bucket case);
    // 1,2,5 has the plain in-bucket gap (3,4).
    val keys = Seq(1L, 2L, 5L, 100L, 4095L, 4097L, 9000L).toDF("k")
    val got = Profile.seqGapsOf(keys).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (3L, 4L, 2L), (6L, 99L, 94L), (101L, 4094L, 3994L),
      (4096L, 4096L, 1L), (4098L, 8999L, 4902L)))

    // corpus: bucketed result == the naive single-window recompute
    val keysC = graft.Tables(spark, sfDir).lineitem
      .select(col("l_orderkey").as("k")).distinct()
    val gaps = Profile.tableSeqGaps(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k"))
    val naive = keysC.withColumn("nk", lead(col("k"), 1).over(w))
      .filter(col("nk") - col("k") > 1)
      .select(col("k") + 1, col("nk") - 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gaps == naive && gaps.nonEmpty)
  }

  test("table_psi: identical periods ≈ 0, a shifted period flags; " +
    "running total is order-exact") {
    val s = spark; import s.implicits._
    // same cents multiset in both halves → every bin share pair equal
    // → psi exactly 0 (Laplace keeps each term finite)
    val same = (0 until 200).flatMap { i =>
      Seq((i * 10L, 0L), (i * 10L, 100L)) // day 0 = ref, 100 = cur
    }.toDF("cents", "day")
    val psiSame = Profile.psiOf(same).collect()
    assert(psiSame.length == Profile.PsiBins)
    assert(psiSame.map(_.getDouble(6)).forall(_ == 0.0))
    assert(psiSame.last.getDouble(7) == 0.0)

    // current period mass moved to the top bin → big positive index
    val shifted = ((0 until 200).map(i => (i.toLong, 0L)) ++
      (0 until 200).map(_ => (10000L, 100L))).toDF("cents", "day")
    val psiShift = Profile.psiOf(shifted).collect()
    assert(psiShift.last.getDouble(7) > 0.25, // the "break" band
      s"psi=${psiShift.last.getDouble(7)}")
    // per-bin counts conserve the input
    assert(psiShift.map(_.getLong(2)).sum == 200L)
    assert(psiShift.map(_.getLong(3)).sum == 200L)
  }

  test("table_mutual_info: functional dependence hits nmi=1, " +
    "independence hits 0") {
    val s = spark; import s.implicits._
    // y = f(x), both uniform on 2 values → MI = H = ln 2, NMI = 1
    val dep = (0 until 100).map(i => (s"x${i % 2}", s"y${i % 2}"))
      .toDF("a", "b")
    val gotDep = Profile.mutualInfoOf(dep, "a", "b").collect().head
    assert(math.abs(gotDep.getDouble(5) - math.log(2)) < 1e-6)
    assert(gotDep.getDouble(6) == 1.0)

    // independent uniform 2×2 → every cell nij·n = ri·cj → MI = 0
    val ind = (0 until 100).map(i => (s"x${i % 2}", s"y${(i / 2) % 2}"))
      .toDF("a", "b")
    val gotInd = Profile.mutualInfoOf(ind, "a", "b").collect().head
    assert(gotInd.getDouble(5) == 0.0)
  }

  test("table_keys: verdicts and dup counts per candidate at sf0.001; " +
    "superset candidates never lose distinctness") {
    val got = Profile.tableKeys(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toMap
    assert(got.size == Profile.KeyCandidates.length)
    got.values.foreach { case (n, d, dup, isKey) =>
      assert(dup == n - d)
      assert(isKey == (dup == 0L))
    }
    // l_orderkey ⊂ (l_orderkey, l_linenumber): distinctness monotone
    assert(got("l_orderkey")._2 <= got("l_orderkey,l_linenumber")._2)
    // driver recompute of the single-column candidate
    val exact = graft.Tables(spark, sfDir).lineitem
      .select(col("l_orderkey")).distinct().count()
    assert(got("l_orderkey")._2 == exact)
  }

  test("table_mutual_info at sf0.001: MI ≥ 0, NMI ∈ [0,1]") {
    val rows = Profile.tableMutualInfo(spark, sfDir).collect()
    assert(rows.length == Profile.CramersPairs.length)
    rows.foreach { r =>
      assert(r.getDouble(5) >= -1e-9, s"negative MI: $r") // round(6) slack
      if (!r.isNullAt(6))
        assert(r.getDouble(6) >= -1e-9 && r.getDouble(6) <= 1.0)
    }
  }

  test("table_checksum: permutation-invariant, flips one value ⇒ new " +
    "sig, null accounting") {
    import spark.implicits._
    val base = Seq((1L, Option("a")), (2L, Option("b")), (3L, None))
      .toDF("k", "s")
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Profile.checksumOf(df, "t", Seq("k", "s")).collect()
        .map(r => r.getString(1) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val got = sigs(base)
    assert(got("k") == (got("k")._1, 0L, got("k")._3))
    assert(got("s")._2 == 1L)          // one null accounted
    // row order / partitioning never changes the fingerprint
    val shuffled = sigs(base.orderBy(col("s").desc).repartition(3))
    assert(shuffled == got)
    // flipping a single value flips exactly that column's sig
    val flipped = sigs(Seq((1L, Option("a")), (2L, Option("c")), (3L, None))
      .toDF("k", "s"))
    assert(flipped("k")._3 == got("k")._3)
    assert(flipped("s")._3 != got("s")._3)
    // sf0.001 registry shape: one row per profiled column, no nulls
    // in the synthetic dims
    val reg = Profile.tableChecksum(spark, sfDir).collect()
    assert(reg.length == Profile.ChecksumCols.map(_._2.size).sum)
    assert(reg.forall(_.getLong(3) == 0L))
  }

  test("table_freshness: per-type panel matches an independent " +
    "recompute and the corpus watermark has zero lag") {
    val per = graft.Tables(spark, sfDir).events
      .select(col("event_type"),
        graft.Tables.tsNsToSec("ts").as("ep"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("ep").as("lo"), max("ep").as("hi"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val tmax = per.values.map(_._3).max
    val got = Profile.tableFreshness(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === per.keySet)
    got.foreach { r =>
      val (n, lo, hi) = per(r.getString(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === hi, "last_sec")
      assert(r.getLong(3) === tmax - hi, "lag_sec")
      assert(r.getLong(4) === hi - lo, "span_sec")
      if (hi > lo)
        assert(math.abs(r.getDouble(5) - n * 86400.0 / (hi - lo)) < 1e-3,
          "per_day")
      else assert(r.isNullAt(5), "zero span must report NULL rate")
    }
    // the type holding the corpus watermark is exactly the zero-lag row
    assert(got.filter(_.getLong(3) == 0L).nonEmpty)
  }
}
