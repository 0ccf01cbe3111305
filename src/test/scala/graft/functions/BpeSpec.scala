package graft.functions

import graft.SparkSuite

/** `bpe_train` / `bpe_apply` — merge-learning semantics on the
  * classic Sennrich fixture plus corpus invariants at sf0.001. */
class BpeSpec extends SparkSuite {

  import graft.functions.{BpeQueries => B}

  test("train recovers the textbook merge sequence with deterministic " +
    "tiebreaks (Sennrich fixture)") {
    // low×5 lower×2 newest×6 widest×3: (e,s) ties (s,t)/(t,</w>) at 9
    // and wins lexicographically; then (es,t), (est,</w>); then (l,o)
    // beats (o,w) at 7.
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = B.train(vocab, 4)
    assert(merges == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", B.EndMark, 9L),
      ("l", "o", 7L)))
  }

  test("mergeOnce is left-to-right non-overlapping") {
    assert(B.mergeOnce(Vector("a", "a", "a"), "a", "a") ==
      Vector("aa", "a"))
    assert(B.mergeOnce(Vector("a", "a", "a", "a"), "a", "a") ==
      Vector("aa", "aa"))
  }

  test("encode segments with learned merges and always reconstructs") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val table = B.train(vocab, 4).map(m => (m._1, m._2))
    assert(B.encode("newest", table) ==
      Vector("n", "e", "w", "est" + B.EndMark))
    assert(B.encode("lowest", table) ==
      Vector("lo", "w", "est" + B.EndMark))
    // out-of-vocab word still encodes and reconstructs
    for (w <- Seq("newest", "lowest", "zzz", ""))
      assert(B.encode(w, table).mkString == w + B.EndMark)
  }

  test("train stops before memorizing count-1 pairs") {
    // single word, count 1: no pair ever reaches 2 → zero merges
    assert(B.train(Seq(("abc", 1L)), 10).isEmpty)
  }

  test("bpe_apply at sf0.001 covers every document with pieces ≥ " +
    "tokens and a compression ratio sane for merged text") {
    val nDocs = graft.Tables(spark, sfDir).documents.count()
    val rows = B.bpeApply(spark, sfDir).collect()
    assert(rows.length.toLong == nDocs)
    rows.foreach { r =>
      val (t, p, ppt) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(p >= t, s"pieces < tokens: $r")
      assert(ppt >= 1.0)
    }
    // merges learned on this corpus must actually compress it:
    // average pieces/token strictly below chars+1 per token
    val table = B.trainedMerges(spark, sfDir).map(m => (m._1, m._2))
    assert(table.nonEmpty)
    val withMerges = rows.map(_.getLong(2)).sum
    val noMerges = graft.Tables(spark, sfDir).documents
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .map(_.getString(0).split("\\s+").map(_.length.toLong + 1L).sum).sum
    assert(withMerges < noMerges,
      s"merges do not compress: $withMerges !< $noMerges")
  }
}
