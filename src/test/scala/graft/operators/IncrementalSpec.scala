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
