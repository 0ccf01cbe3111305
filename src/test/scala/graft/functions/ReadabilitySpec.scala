package graft.functions

import graft.SparkSuite

/** `text_readability` — hand-computed Flesch fixture plus corpus
  * band-consistency invariants. */
class ReadabilitySpec extends SparkSuite {

  test("fixture: exact vowel-run counts and formula") {
    val s = spark; import s.implicits._
    // "queue it now": vowel runs = [ueue, i, o] = 3; n_tok = 3
    // flesch = 206.835 - 1.015*3 - 84.6*(3/3) = 119.19
    val docs = Seq((1L, "queue it now"), (2L, "zzz qqq")).toDF("doc_id", "text")
    val out = TextQueries.readabilityOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getInt(1) === 3 && r1.getInt(2) === 3)
    assert(r1.getDouble(3) === 1.0)
    assert(r1.getDouble(4) === 119.19)
    assert(r1.getString(5) === "easy")
    // no vowels at all: flesch = 206.835 - 2.03 - 0 = 204.805
    val r2 = out(2L)
    assert(r2.getInt(2) === 0 && r2.getDouble(4) === 204.805)
  }

  test("corpus: bands consistent with score, all bands present") {
    val rows = TextQueries.textReadability(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, syl, f, band) =
        (r.getInt(1), r.getInt(2), r.getDouble(4), r.getString(5))
      assert(n > 0 && syl >= 0)
      // the rounded score must land in the band's interior unless it
      // sits within rounding distance of a boundary
      val ok = band match {
        case "easy"   => f >= 59.9999
        case "medium" => f >= 29.9999 && f < 60.0001
        case "hard"   => f < 30.0001
      }
      assert(ok, s"doc ${r.getLong(0)}: flesch $f band $band")
    }
    assert(rows.map(_.getString(5)).distinct.sorted.toSeq ===
      Seq("easy", "hard", "medium"), "expected all three bands")
  }
}
