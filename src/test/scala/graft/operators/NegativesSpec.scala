package graft.operators

import graft.SparkSuite

/** `sample_negatives` — label exclusion, per-anchor rank contract,
  * scaled batch dial, and the batch-assignment recompute. */
class NegativesSpec extends SparkSuite {

  test("negatives never share the anchor's label; ranks are dense <= k") {
    val rows = Sampling.sampleNegatives(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) != r.getInt(3),
        s"anchor ${r.getLong(0)} drew a same-label negative")
      assert(r.getLong(0) != r.getLong(2))
    }
    rows.groupBy(_.getLong(0)).foreach { case (a, g) =>
      val rns = g.map(_.getInt(5)).sorted.toSeq
      assert(rns === (1 to rns.length), s"anchor $a ranks $rns")
      assert(rns.length <= Sampling.NegK)
      // all negatives of one anchor come from the anchor's batch
      assert(g.map(_.getLong(4)).distinct.length === 1)
    }
  }

  test("batch dial scales with n and assignment matches the md5 recompute") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables(spark, sfDir).embeddings
    val n = e.count()
    val expectBatches = math.max(1L, n / Sampling.NegBatchTarget)
    val out = Sampling.sampleNegatives(spark, sfDir)
    val batches = out.select(col("batch")).distinct().collect()
      .map(_.getLong(0))
    assert(batches.forall(b => b >= 0 && b < expectBatches))
    assert(batches.length > 1, "dial must produce multiple batches")
    // recompute the anchor's batch from the published salt formula
    val re = e.select(col("vec_id").as("anchor"),
      (conv(substring(md5(concat(lit(Sampling.NegSeed),
          col("vec_id").cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("long") % expectBatches).as("expect_batch"))
    val mism = out.join(re, "anchor")
      .filter(col("batch") =!= col("expect_batch")).count()
    assert(mism === 0L)
  }

  test("most anchors are covered (every mixed-label batch yields pairs)") {
    val e = graft.Tables(spark, sfDir).embeddings
    val anchors = Sampling.sampleNegatives(spark, sfDir)
      .select("anchor").distinct().count()
    // an anchor misses only if its whole batch shares one label —
    // vanishingly rare at batch ~32 with 10 labels
    assert(anchors >= (e.count() * 9) / 10,
      s"only $anchors of ${e.count()} anchors drew negatives")
  }
}
