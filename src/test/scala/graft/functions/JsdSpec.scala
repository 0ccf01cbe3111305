package graft.functions

import graft.SparkSuite

/** [[TextQueries.jsdOf]] — the JSD bounds (0 on identical
  * distributions, 1 on disjoint vocabularies), a driver-side
  * recompute on an asymmetric fixture, and corpus sanity. */
class JsdSpec extends SparkSuite {

  test("identical distributions → jsd 0; disjoint vocabularies → jsd 1") {
    val s = spark; import s.implicits._
    val d = Seq(
      ("a", "x x y z"), ("b", "x x y z"),     // identical token bags
      ("c", "p q r r")                        // disjoint from both
    ).toDF("source", "text")
    val rows = TextQueries.jsdOf(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(6), r.getDouble(9)))).toMap
    assert(rows.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ((sharedAb, jsdAb)) = rows(("a", "b"))
    assert(sharedAb === 3L && jsdAb === 0.0,
      s"identical sources must read jsd 0, got $jsdAb")
    val ((sharedAc, jsdAc)) = rows(("a", "c"))
    assert(sharedAc === 0L && jsdAc === 1.0,
      s"disjoint vocabularies must read jsd 1 (log2), got $jsdAc")
  }

  test("asymmetric fixture matches a driver-side recompute") {
    val s = spark; import s.implicits._
    // P: {x:3, y:1}; Q: {x:1, z:3} — overlapping on x only
    val d = Seq(("a", "x x x y"), ("b", "x z z z")).toDF("source", "text")
    val r = TextQueries.jsdOf(d).collect().head
    def h(ps: Seq[Double]) =
      -ps.filter(_ > 0).map(p => p * math.log(p) / math.log(2.0)).sum
    val p = Map("x" -> 0.75, "y" -> 0.25, "z" -> 0.0)
    val q = Map("x" -> 0.25, "y" -> 0.0, "z" -> 0.75)
    val words = Seq("x", "y", "z")
    val hm = h(words.map(w => (p(w) + q(w)) / 2.0))
    val expect = hm - (h(p.values.toSeq) + h(q.values.toSeq)) / 2.0
    assert(r.getLong(2) === 4L && r.getLong(3) === 4L, "token totals")
    assert(r.getLong(4) === 2L && r.getLong(5) === 2L, "vocab sizes")
    assert(r.getLong(6) === 1L, "one shared token")
    assert(math.abs(r.getDouble(9) - expect) < 1e-3,
      s"jsd ${r.getDouble(9)} vs $expect")
  }

  test("corpus: jsd in (0, 1), symmetric pair count, deterministic") {
    val r1 = TextQueries.corpusJsd(spark, sfDir).collect()
    val k = r1.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.length
    assert(r1.length === k * (k - 1) / 2, "every unordered source pair")
    r1.foreach { r =>
      val jsd = r.getDouble(9)
      assert(jsd >= 0.0 && jsd <= 1.0, s"jsd out of [0,1]: $jsd")
      assert(r.getString(0) < r.getString(1), "canonical pair order")
    }
    // token-soup corpus: all sources draw from one distribution —
    // the divergence must read LOW (the interchangeable-source case)
    assert(r1.map(_.getDouble(9)).max < 0.1,
      "same-distribution sources must read near-zero JSD")
    val r2 = TextQueries.corpusJsd(spark, sfDir).collect()
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq)
  }
}
