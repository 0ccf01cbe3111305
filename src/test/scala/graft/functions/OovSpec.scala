package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** `text_oov` — vocabulary-cut semantics on a hand fixture plus
  * structural invariants on the real corpus. */
class OovSpec extends SparkSuite {

  test("vocab cut keeps top-K by (count desc, token asc); ratios exact") {
    val s = spark; import s.implicits._
    // corpus counts: a=4, b=3, z=3, c=1, q=1 → K=2 vocabulary is
    // {a, b}: the b/z tie at count 3 resolves by token ASC
    val docs = Seq(
      (0L, "a a a b b c"),
      (1L, "a b z"),
      (2L, "z z q")
    ).toDF("doc_id", "text")
    val out = TextQueries.oovOf(docs, vocabK = 2).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3))))
      .toMap
    assert(out(0L) == ((6, 1, 0.1667))) // c
    assert(out(1L) == ((3, 1, 0.3333))) // z lost the tie to b
    assert(out(2L) == ((3, 3, 1.0)))    // all out-of-vocabulary
  }

  test("real corpus: cut discriminates and ratios are sane") {
    val out = TextQueries.textOov(spark, sfDir).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (n, oov, ratio) =>
      assert(oov >= 0 && oov <= n)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // K=16 against the ~31-token synthetic vocabulary must mark SOME
    // tokens OOV and keep SOME in-vocab — a degenerate all-or-nothing
    // cut would gate nothing (the round-6 lesson: K ≥ |vocab| scored
    // zero everywhere)
    assert(out.exists(_._2 > 0), "no document has any OOV token")
    assert(out.exists(t => t._2 < t._1), "every token is OOV")
  }

  test("vocabulary broadcast joins back; corpus tokens never hash-shuffle by token") {
    val q = TextQueries.textOov(spark, sfDir)
    q.collect() // finalize AQE
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"K-row vocabulary must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"token stream must not sort-merge against a K-row vocabulary:\n$plan")
    // DELIBERATELY two scans (vocab pass + probe pass): persisting the
    // exploded token stream to save one column-pruned parquet scan
    // would materialize MORE bytes than the scan reads at 100 TB —
    // compute-stats-then-apply reads twice by design. Lock the count
    // so an accidental third reference is caught. Tree walk, not a
    // textual count: a finalized AQE plan prints Initial AND Final
    // sections, double-counting every scan (CLAUDE.md trap).
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // An InMemoryTableScan counts as a corpus pass too: when
    // text_typicality's PERSISTED vocab wordcount (same canonical
    // subplan) is live in this session, CacheManager substitutes it
    // into this query's vocab pass — one parquet scan + one cache
    // read. Standalone it's two parquet scans. Either way the
    // contract is the same: exactly TWO corpus passes, never a third
    // reference.
    def scans(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case _: FileSourceScanExec => 1
      case _: InMemoryTableScanExec => 1
      case other => other.children.map(scans).sum
    }
    val n = scans(q.queryExecution.executedPlan)
    assert(n == 2, s"expected exactly 2 corpus passes, got $n:\n$plan")
  }
}
