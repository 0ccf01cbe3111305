package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** `sample_stratified` — rate correctness, determinism, and the
  * no-shuffle data-plane contract. */
class SamplingSpec extends SparkSuite {

  test("per-stratum sample rates land near nominal") {
    val d = graft.Tables(spark, sfDir).documents
    val totals = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.sampleStratified(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Sampling.LangThresholds.foreach { case (lang, _, rate) =>
      val n = totals.getOrElse(lang, 0L)
      if (n > 0) {
        val got = sampled.getOrElse(lang, 0L).toDouble / n
        // binomial: sd = sqrt(p(1-p)/n); allow 4 sd + small-n slack
        val tol = 4 * math.sqrt(rate * (1 - rate) / n) + 0.02
        assert(math.abs(got - rate) <= tol,
          s"$lang: got $got want $rate ±$tol (n=$n)")
      }
    }
  }

  test("sample is deterministic and independent of partitioning") {
    val a = Sampling.sampleStratified(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    val d = graft.Tables(spark, sfDir).documents.repartition(13)
    val b = d.select(col("doc_id"), col("lang"),
        Sampling.hashBucket(col("doc_id")).as("bucket"))
      .filter(col("bucket") <
        Sampling.LangThresholds.foldLeft(lit("0000")) {
          case (acc, (lang, thr, _)) =>
            when(col("lang") === lang, lit(thr)).otherwise(acc)
        })
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(a == b)
  }

  test("data plane is scan+filter: no window, no agg, only the output sort") {
    val plan = Sampling.sampleStratified(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window:\n$plan")
    assert(!plan.contains("HashAggregate"), s"unexpected aggregate:\n$plan")
    // the single rangepartitioning Exchange of the presentation
    // orderBy is the only allowed shuffle
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected ≤1 Exchange, got $exchanges:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"unexpected hash shuffle:\n$plan")
  }

  test("pack_sequences lays out a contiguous token stream per source") {
    val packed = Sampling.packSequences(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getInt(4)))
    val b = Sampling.PackBudget
    packed.groupBy(_._2).foreach { case (src, rowsUnsorted) =>
      val rows = rowsUnsorted.sortBy(_._1)
      // reconstruct the stream: each doc starts where the previous
      // one's tokens ended
      var off = 0L
      rows.foreach { case (id, _, n, seqId, seqOff) =>
        assert(seqId === (off / b).toInt,
          s"doc $id in $src: seq_id ${seqId} != ${off / b}")
        assert(seqOff === (off % b).toInt,
          s"doc $id in $src: seq_offset ${seqOff} != ${off % b}")
        off += n
      }
      // no window is skipped: ids are dense over the stream
      assert(rows.map(_._4).distinct.sorted.zipWithIndex
        .forall { case (s, i) => s == i },
        s"seq_ids must be dense per source in $src")
    }
    // token counts agree with text_tokens' definition
    val fromTokens = graft.functions.TextQueries.textTokens(spark, sfDir)
      .select(col("doc_id"), col("n_ws_tokens")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    packed.foreach { case (id, _, n, _, _) =>
      assert(fromTokens(id) === n)
    }
  }

  test("mix_sources thins to the recipe rate; keep-all sources stay whole") {
    val s = spark; import s.implicits._
    // planted skew: src0 (w=1, 300 docs) must thin to 1/3; src1
    // (w=2, 200 docs) lands EXACTLY on thr=65536 (boundary keep-all);
    // src2 (w=3, 100 docs) is over-entitled (thr clamps) — all three
    // regimes of the threshold algebra in one fixture
    val docs = ((0 until 300).map(i => (i.toLong, "src0")) ++
      (300 until 500).map(i => (i.toLong, "src1")) ++
      (500 until 600).map(i => (i.toLong, "src2")))
      .toDF("doc_id", "source")
    val kept = Sampling.mixOf(docs)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // src1/src2: keep-all, exact
    assert(kept("src1") == 200L, s"boundary thr=65536 must keep all: $kept")
    assert(kept("src2") == 100L, s"clamped thr must keep all: $kept")
    // src0: rate 21845/65536 ≈ 1/3, binomial tolerance
    val rate = 21845.0 / 65536
    val tol = 4 * math.sqrt(rate * (1 - rate) / 300) + 0.02
    assert(math.abs(kept("src0").toDouble / 300 - rate) <= tol,
      s"src0: got ${kept("src0")}/300, want ≈$rate ±$tol")
    // and on the real corpus the kept set is deterministic
    val a = Sampling.mixSources(spark, sfDir).collect().map(_.getLong(0)).toSeq
    val b = Sampling.mixSources(spark, sfDir).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("mix_epochs replicates to the recipe rate; all three regimes") {
    val s = spark; import s.implicits._
    // same planted skew as mix_sources, but read as UPsampling rates:
    // src0 (w=1, 300 docs) → rate 1/3: base 0, extra-copy lottery only;
    // src1 (w=2, 200 docs) → rate exactly 1: base 1, rem 0 (no draw);
    // src2 (w=3, 100 docs) → rate exactly 3: base 3, rem 0 (×3 exact)
    val docs = ((0 until 300).map(i => (i.toLong, "src0")) ++
      (300 until 500).map(i => (i.toLong, "src1")) ++
      (500 until 600).map(i => (i.toLong, "src2")))
      .toDF("doc_id", "source")
    val out = Sampling.epochsOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    val bySrc = out.groupBy(_._2)
    // src1: exactly one copy of every doc, all epoch 0
    assert(bySrc("src1").length == 200 &&
      bySrc("src1").forall(r => r._3 == 0 && r._4 == 1),
      "rate exactly 1 must emit each doc once")
    // src2: exactly three copies of every doc, epochs dense 0..2
    assert(bySrc("src2").length == 300, "rate 3 must triple the source")
    bySrc("src2").groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._3).sorted.toSeq == Seq(0, 1, 2),
        s"doc $id: epochs must be dense 0..2")
      assert(rows.forall(_._4 == 3))
    }
    // src0: base 0 — every emitted doc appears exactly once, and the
    // emitted fraction is rem/65536 = 21845/65536 ≈ 1/3 ± binomial
    val src0 = bySrc.getOrElse("src0", Array.empty)
    assert(src0.forall(r => r._3 == 0 && r._4 == 1))
    assert(src0.map(_._1).distinct.length == src0.length)
    val rate = 21845.0 / 65536
    val tol = 4 * math.sqrt(rate * (1 - rate) / 300) + 0.02
    assert(math.abs(src0.length.toDouble / 300 - rate) <= tol,
      s"src0: got ${src0.length}/300, want ≈$rate ±$tol")
    // low-discrepancy invariant: within a source, copies differ by ≤1
    bySrc.foreach { case (src, rows) =>
      val counts = rows.groupBy(_._1).map(_._2.length).toSet
      assert(counts.size <= 2 &&
        (counts.size == 1 || counts.max - counts.min == 1),
        s"$src: per-doc copies must differ by at most 1, got $counts")
    }
    // and on the real corpus the emitted multiset is deterministic
    val a = Sampling.mixEpochs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(2))).toSeq
    val b = Sampling.mixEpochs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(2))).toSeq
    assert(a == b)
  }

  test("mix_epochs broadcasts the rate table; corpus is never hash-shuffled") {
    val q = Sampling.mixEpochs(spark, sfDir)
    q.collect() // let AQE finalize join strategies before reading the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not sort-merge against a tiny rate table:\n$plan")
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case _: FileSourceScanExec => 1
      case other => other.children.map(scans).sum
    }
    val n = scans(q.queryExecution.executedPlan)
    assert(n == 2, s"expected exactly 2 documents scans, got $n:\n$plan")
  }

  test("mix_temperature flattens toward sqrt shares; rare langs keep all") {
    val s = spark; import s.implicits._
    // planted skew: en 400 / fr 100 / de 100 → isqrt weights 20/10/10,
    // wsum 40, total 600: en thr = 600·20·65536/(40·400) = 49152
    // exactly (rate 3/4 — the thinning branch, integer-exact), fr/de
    // thr = 98304 → clamped keep-all
    val docs = ((0 until 400).map(i => (i.toLong, "en")) ++
      (400 until 500).map(i => (i.toLong, "fr")) ++
      (500 until 600).map(i => (i.toLong, "de")))
      .toDF("doc_id", "lang")
    val kept = Sampling.tempOf(docs)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("fr") == 100L && kept("de") == 100L,
      s"under-represented langs must keep every doc: $kept")
    val rate = 49152.0 / 65536
    val tol = 4 * math.sqrt(rate * (1 - rate) / 400) + 0.02
    assert(math.abs(kept("en").toDouble / 400 - rate) <= tol,
      s"en: got ${kept("en")}/400, want ≈$rate ±$tol")
    // thr_hex audit column is exact for the thinned stratum
    val enThr = Sampling.tempOf(docs).filter(col("lang") === "en")
      .select("thr_hex").distinct().collect().map(_.getString(0)).toSeq
    assert(enThr == Seq("c000"), s"49152 = 0xc000: $enThr") // 0xc000
    // real corpus: deterministic, and the dominant lang is the one
    // that thins (temperature only ever flattens)
    val a = Sampling.mixTemperature(spark, sfDir).collect().map(_.getLong(0)).toSeq
    val b = Sampling.mixTemperature(spark, sfDir).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("mix_temperature broadcasts the rate table; corpus never hash-shuffles") {
    val q = Sampling.mixTemperature(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not sort-merge against a |langs|-row table:\n$plan")
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case _: FileSourceScanExec => 1
      case other => other.children.map(scans).sum
    }
    val n = scans(q.queryExecution.executedPlan)
    assert(n == 2, s"expected exactly 2 documents scans, got $n:\n$plan")
  }

  test("mix_sources broadcasts the rate table; corpus is never hash-shuffled") {
    val q = Sampling.mixSources(spark, sfDir)
    q.collect() // let AQE finalize join strategies before reading the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not sort-merge against a 20-row rate table:\n$plan")
    // deliberately two scans (count pass + probe pass), same
    // compute-stats-then-apply rationale as text_oov; lock the count
    // by walking the tree (a finalized AQE plan string prints Initial
    // AND Final sections — textual counts double, CLAUDE.md trap)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case _: FileSourceScanExec => 1
      case other => other.children.map(scans).sum
    }
    val n = scans(q.queryExecution.executedPlan)
    assert(n == 2, s"expected exactly 2 documents scans, got $n:\n$plan")
  }

  test("corpus_shuffle is a permutation: every doc once, contiguous pos " +
      "per shard, deterministic, stable under input partitioning") {
    val d = graft.Tables(spark, sfDir).documents
    val out = Sampling.corpusShuffle(spark, sfDir).collect()
    val nDocs = d.count()
    assert(out.length.toLong === nDocs, "one output row per doc")
    assert(out.map(_.getLong(0)).distinct.length.toLong === nDocs,
      "no doc repeated or dropped — a permutation")
    // per-shard pos is exactly 1..n_shard
    out.groupBy(_.getString(1)).foreach { case (shard, rows) =>
      val ps = rows.map(_.getInt(2)).sorted
      assert(ps.toSeq === (1 to rows.length).toSeq,
        s"shard $shard pos must be contiguous from 1")
    }
    // shard id is the declared-width hex prefix
    assert(out.forall(_.getString(1).length == Sampling.ShardHexWidth))
    // deterministic + independent of how the input arrives
    val again = Sampling.shuffleOf(d.repartition(7)).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
      === again.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq)
  }

  test("corpus_shuffle actually shuffles: read order is decorrelated " +
      "from doc_id order") {
    val out = Sampling.corpusShuffle(spark, sfDir).collect()
    // The load-bearing check: reading the whole corpus in
    // (shard, pos) order — the order a trainer consumes it — must
    // NOT be monotone in doc_id. Works at any fixture size (500
    // docs: probability ~1/500! under the null, and the permutation
    // is deterministic, so no run-to-run flake).
    val readOrder = out
      .sortBy(r => (r.getString(1), r.getInt(2)))
      .map(_.getLong(0)).toSeq
    assert(readOrder !== readOrder.sorted,
      "global (shard, pos) read order kept ascending doc_id — not shuffled")
    // Per-shard, only where the shard is big enough for the check to
    // mean anything: a sorted 6-permutation has p = 1/720 under the
    // null. The 500-doc/256-shard fixture tops out at ~7 docs/shard
    // (a ≥10 threshold is unreachable there — round-8 ADVICE), so
    // these shards may be few or absent; the global check above is
    // the gate either way.
    out.groupBy(_.getString(1)).filter(_._2.length >= 6)
      .foreach { case (shard, rows) =>
        val ids = rows.sortBy(_.getInt(2)).map(_.getLong(0)).toSeq
        assert(ids !== ids.sorted,
          s"shard $shard kept ascending doc_id order — not shuffled")
      }
  }

  test("corpus_shuffle plan: exactly one hash exchange (on shard), " +
      "per-shard sort, no global window") {
    val q = Sampling.corpusShuffle(spark, sfDir)
    q.collect() // finalize AQE before walking
    // walk the tree, not the string: a finalized AQE plan prints
    // initial+final sections, doubling textual exchange counts
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def hashEx(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
      case a: AdaptiveSparkPlanExec => hashEx(a.executedPlan)
      case qs: QueryStageExec => hashEx(qs.plan)
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] =>
        e +: e.children.flatMap(hashEx)
      case other => other.children.flatMap(hashEx)
    }
    val ex = hashEx(q.queryExecution.executedPlan)
    assert(ex.length == 1,
      s"expected exactly one hash exchange:\n${q.queryExecution.executedPlan}")
    assert(ex.head.outputPartitioning.asInstanceOf[HashPartitioning]
      .expressions.map(_.sql).exists(_.contains("shard")),
      "the one hash exchange must partition by shard")
  }

  test("mix_curriculum: every doc staged once, stages are quality-" +
      "monotone (1 = cleanest), per-(stage, shard) pos contiguous") {
    val d = graft.Tables(spark, sfDir).documents
    val out = Sampling.mixCurriculum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3),
        r.getDouble(4)))
    assert(out.length.toLong === d.count(), "one row per doc")
    assert(out.map(_._1).distinct.length === out.length)
    val byStage = out.groupBy(_._2)
    assert(byStage.keySet.subsetOf(Set(1, 2, 3, 4)))
    assert(byStage.size >= 2, "fixture must spread over stages")
    // monotone: a cleaner stage's worst doc is at least as good as a
    // noisier stage's best (roundDuck is monotone, so the rounded
    // witness is valid)
    val sorted = byStage.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((s1, a), (s2, b)) =>
        assert(a.map(_._5).min >= b.map(_._5).max,
          s"stage $s1 must dominate stage $s2 on quality")
      case _ => ()
    }
    // within each (stage, shard): pos is exactly 1..n
    out.groupBy(r => (r._2, r._3)).foreach { case (k, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length).toSeq,
        s"$k pos must be contiguous from 1")
    }
  }

  test("sample_exact_k keeps exactly min(k, stratum) per language, dense ranks") {
    val strata = graft.Tables(spark, sfDir).documents
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampling.sampleExactK(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val perLang = got.groupBy(_._1)
    assert(perLang.keySet === strata.keySet)
    perLang.foreach { case (lang, rows) =>
      val want = math.min(Sampling.ExactK.toLong, strata(lang))
      assert(rows.length.toLong === want,
        s"$lang: got ${rows.length}, want exactly $want")
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length).toSeq,
        s"$lang ranks must be dense from 1")
    }
    // an independent draw from sampleStratified's salt: the kept sets
    // must not coincide (same-salt reuse would correlate samples)
    val strat = Sampling.sampleStratified(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._3).toSet != strat)
  }

  test("sample_exact_k re-runs identically (salt-determined)") {
    val a = Sampling.sampleExactK(spark, sfDir).collect().toSeq
    val b = Sampling.sampleExactK(spark, sfDir).collect().toSeq
    assert(a === b)
  }

  test("mix_balanced_batches: every batch reproduces the language mix ±1") {
    val got = Sampling.mixBalancedBatches(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val total = graft.Tables(spark, sfDir).documents.count()
    assert(got.length.toLong == total, "every doc is assigned")
    assert(got.forall(r => r._3 >= 0 && r._3 < Sampling.NumBatches))
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val counts = (0 until Sampling.NumBatches)
        .map(b => rows.count(_._3 == b))
      assert(counts.max - counts.min <= 1,
        s"$lang per-batch counts must differ by <=1: $counts")
    }
  }

  test("asof_join_forward matches a per-user driver replica incl. ties") {
    val ev = graft.Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val purchasesByUser = ev.filter(_._4 == "purchase")
      .groupBy(_._2).map { case (u, ps) =>
        u -> ps.map(p => (p._3, p._1)).sorted.toVector
      }
    val got = graft.operators.AsOfJoin.viewsAsOfNextPurchase(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some((r.getLong(3), r.getLong(4))))).toMap
    ev.filter(_._4 == "view").foreach { case (vid, u, vts, _) =>
      // the first purchase sorting after the view in (ts, tag,
      // event_id) order: any purchase with ts >= vts qualifies
      // (purchase tag 1 > view tag 0 at equal ts)
      val next = purchasesByUser.getOrElse(u, Vector.empty)
        .find { case (pts, _) => pts >= vts }
      val want = next.map { case (pts, pid) => (pid, pts / 1000000000L) }
      assert(got(vid) == want, s"view $vid")
    }
  }

  test("importance sample: keep decision reconciles, rate tracks quality") {
    val rows = Sampling.sampleImportance(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) < r.getLong(3), s"kept row above threshold $r")
      assert(r.getLong(3) <= Sampling.ImportanceScale, s"thr overflow $r")
      // bucket re-derivation from the salt
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((Sampling.ImportanceSeed + r.getLong(0))
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getLong(2) == java.lang.Long.parseLong(md.take(4), 16),
        s"bucket mismatch $r")
    }
    // P(keep) = quality ⇒ the kept fraction should track mean quality
    // (binomial noise at n=500 is ~±4σ ≈ 9%)
    val total = graft.Tables(spark, sfDir).documents.count()
    val keptFrac = rows.length.toDouble / total
    val meanQ = graft.functions.TextQueries.textQuality(spark, sfDir)
      .agg(org.apache.spark.sql.functions.avg("quality")).head().getDouble(0)
    assert(math.abs(keptFrac - meanQ) < 0.1,
      s"kept $keptFrac vs mean quality $meanQ")
  }

  test("sample_exact_k plans a WindowGroupLimit: shards pre-cut to top-k") {
    // the rank<=k filter must rewrite to a WindowGroupLimit so each
    // map task keeps at most k rows per stratum BEFORE the lang
    // exchange — the property that makes the exact-k sample viable
    // when a stratum holds billions of rows
    val plan = Sampling.sampleExactK(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("sample_split: total disjoint cover at sane rates, pure fate " +
      "function data plane") {
    val d = graft.Tables(spark, sfDir).documents
    val out = Sampling.sampleSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    // every document lands in exactly one split
    assert(out.length.toLong === d.count(), "one row per doc")
    assert(out.map(_._1).distinct.length === out.length)
    val byS = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byS.keySet === Set("train", "val", "test"))
    val n = out.length.toDouble
    assert(byS("train") / n > 0.85 && byS("train") / n < 0.94,
      s"train share off nominal 0.90: $byS")
    for (s <- Seq("val", "test"))
      assert(byS(s) / n > 0.02 && byS(s) / n < 0.09,
        s"$s share off nominal 0.05: $byS")
    // determinism across independent plans
    val again = Sampling.sampleSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(again.toSeq === out.toSeq)
    // same data-plane contract as sample_stratified: scan + project,
    // the presentation orderBy's range exchange is the only shuffle
    val plan = Sampling.sampleSplit(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("HashAggregate"),
      s"split must stay a per-row fate function:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"unexpected hash shuffle:\n$plan")
  }

  test("sample_leakage_split: no near-dup cluster straddles splits; " +
      "singletons keep the sample_split assignment") {
    // (doc_id, rep_doc, split)
    val out = Sampling.sampleLeakageSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(4)))
    assert(out.map(_._1).distinct.length === out.length, "one row per doc")
    val byRep = out.groupBy(_._2)
    // the leakage-safety contract: one split per cluster
    byRep.foreach { case (rep, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"cluster $rep straddles splits: ${members.toSeq}")
    }
    // non-vacuous: the corpus has multi-member near-dup clusters
    assert(byRep.exists(_._2.length > 1),
      "no multi-member clusters at this sf — test is vacuous")
    // unclustered docs fall through to their own id = the exact J11
    // assignment (same salt + fences)
    val j11 = Sampling.sampleSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    val singles = out.filter(t => t._1 == t._2 && byRep(t._2).length == 1)
    assert(singles.nonEmpty)
    singles.foreach { case (id, _, s) =>
      assert(j11(id) === s, s"singleton $id diverged from sample_split")
    }
  }

  test("mix_soft_dedup: weight is 1/multiplicity; dup-group mass " +
      "sums to one document") {
    import spark.implicits._
    // fixture with planted exact dups (the shipped corpus has none
    // below sf0.1): 3 copies, 2 copies, and a unique text
    val d = Seq(
      (1L, "en", "aaa bbb"), (2L, "en", "aaa bbb"), (3L, "de", "aaa bbb"),
      (4L, "en", "ccc ddd"), (5L, "en", "ccc ddd"),
      (6L, "fr", "eee")).toDF("doc_id", "lang", "text")
    val out = Sampling.mixSoftDedupOf(d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(out.map(t => (t._1, t._2)) ===
      Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 2L), (5L, 2L), (6L, 1L)))
    out.foreach { case (_, n, w) =>
      assert(math.abs(w - 1.0 / n) < 5e-7, s"weight off 1/$n: $w")
    }
    // total mass = one document per unique text (3 groups), up to
    // the 6-decimal rounding of 1/3
    assert(math.abs(out.map(_._3).sum - 3.0) < 1e-4)

    // on the real corpus: one row per doc, weights in (0,1], and the
    // degenerate no-dup case collapses to all-ones (dedup_exact's
    // n_dups=1 everywhere at this sf)
    val corpus = Sampling.mixSoftDedup(spark, sfDir).collect()
    assert(corpus.length === 500)
    assert(corpus.forall(r => r.getDouble(3) > 0 && r.getDouble(3) <= 1.0))
  }

  test("sample_time_split: ~80/20 around an embargoed boundary; " +
    "splits partition events; no train event after any test event") {
    val rows = Sampling.sampleTimeSplit(spark, sfDir).collect()
      .map(r => (r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    val byS = rows.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byS.keySet.subsetOf(Set("train", "test", "embargo")))
    val n = rows.length.toDouble
    val trainShare = byS("train").length / n
    assert(trainShare >= 0.75 && trainShare <= 0.85, s"train $trainShare")
    // the embargo really separates the sides by >= 7 days
    val maxTrain = byS("train").max
    val minTest = byS("test").min
    assert(minTest - maxTrain >= Sampling.TimeSplitEmbargoDays * 86400L
      - 86400L, s"gap ${minTest - maxTrain}")
    byS.getOrElse("embargo", Array.empty[Long]).foreach { e =>
      assert(e > maxTrain && e < minTest) }
  }

  test("best-fit-decreasing: tightest-bin placement, deterministic " +
    "ties, exact fills (hand fixture)") {
    // budget 1000: 1000 | 600+400 | 500+500 — three exactly-full bins
    val got = Sampling.bestFitDecreasing(
      Seq((1L, 1000L), (2L, 600L), (3L, 500L), (4L, 400L), (5L, 500L)),
      1000L).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 5L -> 2L, 4L -> 1L))
    // equal sizes tie to the lowest bin id
    val ties = Sampling.bestFitDecreasing(
      Seq((10L, 300L), (11L, 300L), (12L, 300L)), 600L).toMap
    assert(ties == Map(10L -> 0L, 11L -> 0L, 12L -> 1L))
  }

  test("pack_bestfit at sf0.001: bins within budget, at most one " +
    "half-empty bin per shard, docs partitioned") {
    val rows = Sampling.packBestfit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length)
    val fills = rows.groupBy(x => (x._2, x._3, x._4))
      .map { case (k, ds) => k -> ds.map(_._5).sum }
    assert(fills.values.forall(_ <= Sampling.PackBudget))
    fills.toSeq.groupBy { case ((s, sh, _), _) => (s, sh) }
      .foreach { case (shard, bins) =>
        assert(bins.count(_._2 < Sampling.PackBudget / 2) <= 1,
          s"shard $shard has >1 half-empty bin")
      }
  }

  test("mix_dsir: target-only vocabulary scores positive, raw-only " +
    "negative; exact add-1 recompute (hand fixture)") {
    val s = spark; import s.implicits._
    // target docs say "aa", raw-only docs say "bb": ct(aa)=2,cr(aa)=2;
    // ct(bb)=0,cr(bb)=2; Nt=2, Nr=4, V=2.
    val docs = Seq(
      (1L, "aa aa", true), (2L, "bb bb", false)
    ).toDF("doc_id", "text", "is_t")
    val got = Sampling.dsirOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def term(ct: Long, cr: Long) =
      math.log(((ct + 1).toDouble * (4 + 2)) / ((cr + 1).toDouble * (2 + 2)))
    def rd(x: Double) = math.rint(x * 1e4) / 1e4
    assert(got(1L)._1 == 2L && got(2L)._1 == 2L)
    assert(got(1L)._2 == rd(2 * term(2, 2)) && got(1L)._2 > 0)
    assert(got(2L)._2 == rd(2 * term(0, 2)) && got(2L)._2 < 0)
  }

  test("mix_dsir at sf0.001: target slice scores higher on average " +
    "than the rest") {
    val d = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"))
    val scored = Sampling.mixDsir(spark, sfDir)
      .join(d, "doc_id").collect()
    assert(scored.nonEmpty)
    val (t, r) = scored.partition(
      _.getAs[String]("lang") == Sampling.DsirTargetLang)
    def mean(a: Array[org.apache.spark.sql.Row]) =
      a.map(_.getAs[Double]("dsir_logratio")).sum / a.length
    assert(t.nonEmpty && r.nonEmpty)
    assert(mean(t) > mean(r),
      s"target mean ${mean(t)} !> raw mean ${mean(r)}")
  }

  test("sample_bootstrap: Poisson(1) mass, replicate independence, " +
    "driver recompute of replicate 0") {
    val rows = Sampling.sampleBootstrap(spark, sfDir).collect()
    assert(rows.length == Sampling.BootReps)
    val nDocs = graft.Tables(spark, sfDir).documents.count()
    rows.foreach { r =>
      val drawn = r.getLong(1)
      // E[n_drawn] = n, Var = n: a 5σ band never flakes
      assert(math.abs(drawn - nDocs) < 5 * math.sqrt(nDocs.toDouble) + 10,
        s"replicate ${r.getInt(0)} drew $drawn of $nDocs")
      assert(r.getLong(2) <= math.min(nDocs, drawn))
    }
    assert(rows.map(_.getLong(1)).distinct.length > 1,
      "independent replicates must not all draw identically")
    val docs = graft.Tables(spark, sfDir).documents
      .select(col("doc_id")).collect().map(_.getLong(0))
    def kOf(rep: Int, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"${Sampling.BootSeed}$rep:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(h.substring(0, 8), 16).toDouble /
        4294967296.0
      Sampling.BootCdf.count(u >= _).toLong
    }
    val exp = docs.map(kOf(0, _)).sum
    assert(rows.find(_.getInt(0) == 0).get.getLong(1) == exp,
      "replicate 0 draw total != driver md5 inverse-CDF recompute")
  }

  test("sample_weighted: exactly k pointer hits; every doc heavier " +
      "than the stride is selected; two-level cumsum == flat PPS") {
    import org.apache.spark.sql.functions._
    val rows = Sampling.sampleWeighted(spark, sfDir).collect()
    val k = Sampling.WSampleK
    assert(rows.map(_.getInt(2).toLong).sum == k,
      s"pointer hits must total exactly k=$k")
    // ground truth: flat (unbucketed) systematic PPS over the same
    // salted order, recomputed driver-side — proves the bucketed
    // two-level cumulative sum changed nothing
    val d = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"),
        greatest(graft.functions.TextFunctions.wsTokenCount(col("text"))
          .cast("long"), lit(1L)).as("w"),
        md5(concat(lit(Sampling.WSampleSeed), col("doc_id").cast("string"))
          .cast("binary")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._3, t._1))
    val tot = d.map(_._2).sum
    def nPtr(c: Long): Long =
      if (2 * k * c <= tot) 0L
      else math.min(k, (2 * k * c + tot - 1) / (2 * tot))
    var c = 0L
    val expected = d.flatMap { case (id, w, _) =>
      val hits = nPtr(c + w) - nPtr(c)
      c += w
      if (hits >= 1) Some((id, w, hits)) else None
    }.sortBy(_._1)
    assert(rows.length == expected.length, "selected-set size")
    rows.sortBy(_.getLong(0)).zip(expected).foreach { case (r, (id, w, h)) =>
      assert(r.getLong(0) == id && r.getLong(1) == w &&
        r.getInt(2).toLong == h, s"row mismatch at doc $id")
    }
    // PPS guarantee: a span at least one stride (W/k) wide always
    // contains a pointer
    val selected = rows.map(_.getLong(0)).toSet
    d.filter(t => t._2 * k >= tot).foreach { case (id, _, _) =>
      assert(selected.contains(id), s"doc $id heavier than stride missed")
    }
  }

  test("quality_ensemble: score recombines from its component columns; " +
      "keep threshold consistent; rule count matches the E24 flags") {
    import org.apache.spark.sql.functions._
    val rows = graft.functions.TextQueries.qualityEnsemble(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getInt(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getBoolean(6))).toMap
    assert(rows.nonEmpty)
    val Q = graft.functions.TextQueries
    rows.foreach { case (id, (q, np, typ, fln, ens, keep)) =>
      assert(np >= 0 && np <= 5, s"doc $id rule count")
      assert(typ >= 0.0 && typ <= 1.0, s"doc $id typicality range")
      assert(fln >= 0.0 && fln <= 1.0, s"doc $id flesch_norm range")
      // rounded components recombine to the rounded score within the
      // rounding grain of the four addends
      val recomb = Q.EnsWQuality * q + Q.EnsWGopher * (np / 5.0) +
        Q.EnsWTypicality * typ + Q.EnsWFlesch * fln
      assert(math.abs(recomb - ens) < 2e-4,
        s"doc $id ensemble $ens vs recombined $recomb")
      // keep compares the unrounded score: away from the boundary the
      // rounded score must agree with the flag
      if (math.abs(ens - Q.EnsKeepMin) > 1e-3)
        assert(keep == (ens >= Q.EnsKeepMin), s"doc $id keep flag")
    }
    // rule count column == the certified E24 per-row flags
    val flags = graft.functions.TextQueries.gopherRulesRowOf(
        graft.Tables(spark, sfDir).documents)
      .select(col("doc_id"), (col("r_len").cast("int") +
        col("r_wlen").cast("int") + col("r_div").cast("int") +
        col("r_rep").cast("int") + col("r_stop").cast("int")).as("np"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    flags.foreach { case (id, np) =>
      rows.get(id).foreach { t =>
        assert(t._2 == np, s"doc $id n_rules_passed vs E24 flags")
      }
    }
  }
}
