package graft.operators

import graft.SparkSuite

/** Error-bound contracts for the sketch-based scale-path variants of
  * the two heaviest relational queries (SURVEY §2B). Sketches are not
  * bit-reproducible across engines, so these are rows-only at the
  * oracle gate and tolerance-checked here against the exact forms. */
class ApproxSpec extends SparkSuite {

  test("approx percentiles within 1% of exact at every group/quantile") {
    val exact = Relational.q23Percentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val approx = Relational.q23ApproxPercentiles(spark, sfDir).collect()
    assert(approx.length === exact.size)
    approx.foreach { r =>
      val (e25, e50, e75) = exact(r.getString(0))
      for (((a, e), q) <- Seq(r.getDouble(1) -> e25, r.getDouble(2) -> e50,
          r.getDouble(3) -> e75).zip(Seq("p25", "p50", "p75"))) {
        assert(math.abs(a - e) <= 0.01 * math.abs(e),
          s"${r.getString(0)}/$q: approx $a vs exact $e")
      }
    }
  }

  test("approx count-distinct within 5% of exact (rsd = 2%)") {
    val exact = Relational.q12Distinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val approx = Relational.q12ApproxDistinct(spark, sfDir).collect()
    assert(approx.length === exact.size)
    approx.foreach { r =>
      val (e1, e2, e3) = exact(r.getString(0))
      for ((a, e) <- Seq(r.getLong(1) -> e1, r.getLong(2) -> e2,
          r.getLong(3) -> e3)) {
        assert(math.abs(a - e) <= math.max(1.0, 0.05 * e),
          s"${r.getString(0)}: approx $a vs exact $e")
      }
    }
  }

  test("neither count-distinct form plans an Expand") {
    // the exact form decomposes into three single-distinct branches
    // (round 11 — the multi-distinct agg would plan Expand ×3,
    // tripling and null-padding every input row); the HLL variant
    // aggregates sketches. Both must stay Expand-free.
    val exactPlan = Relational.q12Distinct(spark, sfDir)
      .queryExecution.executedPlan.toString
    val approxPlan = Relational.q12ApproxDistinct(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"),
      s"exact form must run single-distinct branches, not Expand:\n$exactPlan")
    assert(!approxPlan.contains("Expand"),
      s"HLL variant must aggregate sketches, not expand rows:\n$approxPlan")
  }
}
