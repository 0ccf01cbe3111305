package graft.functions

import graft.SparkSuite

/** `text_bigram_lm` — exact hand-fixture algebra plus corpus
  * invariants for the conditional-typicality signal. */
class BigramLmSpec extends SparkSuite {

  test("fixture: integer sums, unique-bigram counter, exact ratio") {
    val s = spark; import s.implicits._
    // unigrams: a=3 b=3 c=1 x=1; bigrams: "a b"=3 "b c"=1 "x a"=1
    val docs = Seq(
      (0L, "a b c"),
      (1L, "a b"),
      (2L, "x a b"),
      (3L, "solo") // < 2 tokens: no bigrams, absent from the output
    ).toDF("doc_id", "text")
    val out = TextQueries.bigramLmOf(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4),
          r.getDouble(5)))).toMap
    // doc0: [a b, b c] → Σcnt2 = 3+1, Σcnt1(prefix a,b) = 3+3,
    // one corpus-unique bigram (b c)
    assert(out(0L) === ((2, 4L, 6L, 1, 0.666667)))
    // doc1: [a b] → 3/3 = 1.0, nothing unique
    assert(out(1L) === ((1, 3L, 3L, 0, 1.0)))
    // doc2: [x a, a b] → (1+3)/(1+3) = 1.0, x a is unique
    assert(out(2L) === ((2, 4L, 4L, 1, 1.0)))
    assert(!out.contains(3L), "a 1-token doc has no bigram rows")
  }

  test("corpus: ratios in (0, 1], order-signal discriminates") {
    val rows = TextQueries.textBigramLm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s2, s1, u, t) = (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getDouble(5))
      assert(n > 0 && s2 > 0 && s1 > 0)
      // a bigram's count can never exceed its prefix word's count
      assert(s2 <= s1, s"doc ${r.getLong(0)}: Σcnt2 $s2 > Σcnt1 $s1")
      assert(t > 0.0 && t <= 1.0)
      assert(u >= 0 && u <= n)
    }
    // the signal must actually discriminate between documents
    assert(rows.map(_.getDouble(5)).distinct.length > 1,
      "cond_typicality is constant across the corpus")
  }

  test("quality_lm_buckets: exact tercile recompute + ±1 balance per lang") {
    val rows = TextQueries.qualityLmBuckets(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      // recompute ntile(3) over (typicality desc, doc_id asc)
      val ordered = rs.sortBy(t => (-t._3, t._1))
      val n = ordered.length
      val expect = ordered.zipWithIndex.map { case (t, i) =>
        // SQL ntile: first (n mod 3) buckets get ceil(n/3) rows
        val big = n % 3; val base = n / 3
        val b = if (i < big * (base + 1)) i / (base + 1)
                else big + (i - big * (base + 1)) / base
        t._1 -> Seq("head", "middle", "tail")(b)
      }.toMap
      rs.foreach { t =>
        assert(t._4 == expect(t._1),
          s"$lang doc ${t._1}: got ${t._4}, want ${expect(t._1)}") }
      // tercile sizes differ by at most one
      val sizes = rs.groupBy(_._4).view.mapValues(_.length).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$lang sizes $sizes")
    }
  }
}
