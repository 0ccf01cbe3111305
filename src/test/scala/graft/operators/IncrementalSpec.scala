package graft.operators

import graft.SparkSuite

/** `dedup_incremental` — planted exact/near/batch-internal cases and
  * structural invariants at sf0.001. */
class IncrementalSpec extends SparkSuite {

  test("planted batch docs get the right exact/near/keep flags") {
    val s = spark; import s.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val clean = "one two three four five six seven eight nine ten"
    // doc_id % 5 == 4 → batch; everything else is corpus.
    val d = Seq(
      (0L, base),                           // corpus
      (1L, "completely different corpus text here now"), // corpus
      (4L, base),                           // batch: exact copy of 0
      (9L, base.replace(" mu", " nu")),     // batch: 9/11 jaccard vs 0
      (14L, clean),                         // batch: novel → keep
      (19L, clean)                          // batch: dup of 14 (later id)
    ).toDF("doc_id", "text")
    val out = Incremental.incrementalOf(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(out(4L) == ((true, true, false)), s"exact copy: $out")
    assert(out(9L) == ((false, true, false)), s"near copy: $out")
    assert(out(14L) == ((false, false, true)), s"novel doc: $out")
    assert(out(19L) == ((true, false, false)), s"in-batch dup: $out")
  }

  test("documents parquet is scanned once per persisted stage, not per reference") {
    // hashes (2 refs) and the shingle index (3 refs) are persisted —
    // without the persists the plan would carry 5 parquet scans and
    // the df-cut shingle pipeline would run 3 full times. After the
    // persists, every reference is an InMemoryTableScan and NO
    // parquet scan remains outside the two cached lineages. (A
    // textual "Scan parquet" count is useless here: every cache
    // reference re-prints its cached lineage, so the tree walk stops
    // at cache boundaries instead.)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def walk(p: SparkPlan): (Int, Int) = p match {
      case _: InMemoryTableScanExec => (0, 1)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: FileSourceScanExec => (1, 0)
      case other =>
        val cs = other.children.map(walk)
        (cs.map(_._1).sum, cs.map(_._2).sum)
    }
    val df = Incremental.dedupIncremental(spark, sfDir)
    df.collect() // materialize so the caches fill and AQE finalizes
    val (parquetScans, memScans) = walk(df.queryExecution.executedPlan)
    assert(memScans >= 5,
      s"expected >=5 cache reads (2 hash + 3 shingle refs), got $memScans")
    assert(parquetScans == 0,
      s"expected 0 parquet scans outside the caches, got $parquetScans")
  }

  test("every batch doc appears exactly once; keep = !exact && !near") {
    val rows = Incremental.dedupIncremental(spark, sfDir).collect()
    val nBatch = graft.Tables(spark, sfDir).documents
      .filter(org.apache.spark.sql.functions.col("doc_id")
        % Incremental.BatchMod === Incremental.BatchRem).count()
    assert(rows.length.toLong == nBatch, "one verdict row per batch doc")
    rows.foreach { r =>
      assert(r.getBoolean(3) == (!r.getBoolean(1) && !r.getBoolean(2)))
    }
  }
}
