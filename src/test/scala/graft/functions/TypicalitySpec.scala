package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** `text_typicality` + `corpus_stats` — exact rational semantics on
  * hand fixtures plus structural invariants and scan-count locks on
  * the real corpus. */
class TypicalitySpec extends SparkSuite {

  test("typicality is the exact rational mean corpus frequency") {
    val s = spark; import s.implicits._
    // corpus counts: a=6, b=2, r=1, s=1 → N=10
    val docs = Seq(
      (0L, "a a a b"), // Σcnt = 6+6+6+2 = 20, n=4 → 20/40 = 0.5
      (1L, "r s a"),   // Σcnt = 1+1+6  =  8, n=3 → 8/30  = 0.266667
      (2L, "a a b")    // Σcnt = 6+6+2  = 14, n=3 → 14/30 = 0.466667
    ).toDF("doc_id", "text")
    val out = TextQueries.typicalityOf(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(0L) == ((4, 20L, 2L, 0.5)))
    assert(out(1L) == ((3, 8L, 1L, 0.266667)))
    assert(out(2L) == ((3, 14L, 2L, 0.466667)))
    // the common-token doc must outrank the rare-token doc — the
    // signal the operator exists for
    assert(out(0L)._4 > out(1L)._4)
  }

  test("real corpus: bounds hold and the signal discriminates") {
    val rows = TextQueries.textTypicality(spark, sfDir).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, sumCnt, minCnt, typ) =>
      assert(n > 0 && minCnt >= 1L && sumCnt >= n.toLong,
        "every token occurs at least once (its own occurrence)")
      assert(typ > 0.0 && typ <= 1.0)
    }
    assert(rows.map(_._4).distinct.length > 1,
      "typicality must vary across the corpus, not collapse to a constant")
  }

  test("vocab broadcasts and is computed once: 1 parquet scan + 2 cache reads") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val q = TextQueries.textTypicality(spark, sfDir)
    q.collect() // finalize AQE
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab must broadcast back over the token stream:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"token stream must not sort-merge against the vocab:\n$plan")
    // vocab is referenced twice (probe join + corpus total): persisted,
    // so the plan shows ONE parquet scan (the probe pass) and TWO
    // InMemoryTableScans — unpersisted it would recompute the corpus
    // wordcount per reference. Tree walk stopping at cache boundaries
    // (IncrementalSpec pattern; textual counts double-count under AQE).
    def walk(p: SparkPlan): (Int, Int) = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case qs: QueryStageExec => walk(qs.plan)
      case _: InMemoryTableScanExec => (0, 1)
      case _: FileSourceScanExec => (1, 0)
      case other =>
        val c = other.children.map(walk)
        (c.map(_._1).sum, c.map(_._2).sum)
    }
    val (parquet, mem) = walk(q.queryExecution.executedPlan)
    assert(parquet == 1, s"expected 1 documents scan (probe pass), got $parquet:\n$plan")
    assert(mem == 2, s"expected 2 cached-vocab reads, got $mem:\n$plan")
  }

  test("corpus_stats: volumes reconcile and shares sum to 1") {
    val d = graft.Tables(spark, sfDir).documents
    val rows = TextQueries.corpusStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(2).toLong).sum === d.count(),
      "stratum doc counts must sum to the corpus")
    val shareSum = rows.map(_.getDouble(6)).sum
    assert(math.abs(shareSum - 1.0) < 1e-3,
      s"doc shares must sum to ~1 (rounding only): $shareSum")
    rows.foreach { r =>
      assert(r.getLong(3) > 0L && r.getLong(4) > 0L)
      assert(r.getDouble(5) > 0.0)
    }
  }
}
