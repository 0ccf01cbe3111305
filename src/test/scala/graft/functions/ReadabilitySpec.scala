package graft.functions

import graft.SparkSuite

/** `text_readability` — hand-computed Flesch fixture plus corpus
  * band-consistency invariants. Columns:
  * (doc_id, n_tok, n_sent, n_syllable_runs, syl_per_word, flesch,
  * band). */
class ReadabilitySpec extends SparkSuite {

  test("fixture: exact vowel-run counts and formula") {
    val s = spark; import s.implicits._
    // "queue it now": vowel runs = [ueue, i, o] = 3; n_tok = 3,
    // n_sent = 1 (no terminators → floor)
    // flesch = 206.835 - 1.015*(3/1) - 84.6*(3/3) = 119.19
    val docs = Seq((1L, "queue it now"), (2L, "zzz qqq")).toDF("doc_id", "text")
    val out = TextQueries.readabilityOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getInt(1) === 3 && r1.getInt(2) === 1 && r1.getInt(3) === 3)
    assert(r1.getDouble(4) === 1.0)
    assert(r1.getDouble(5) === 119.19)
    assert(r1.getString(6) === "easy")
    // no vowels at all: flesch = 206.835 - 2.03 - 0 = 204.805
    val r2 = out(2L)
    assert(r2.getInt(3) === 0 && r2.getDouble(5) === 204.805)
  }

  test("sentence terminators divide the words-per-sentence term") {
    val s = spark; import s.implicits._
    // 4 tokens over 2 sentences ("go on. do it!"): n_sent = 2 — the
    // '.'/'!' runs each count once. vowel runs: o, o, o, i = 4.
    // flesch = 206.835 - 1.015*(4/2) - 84.6*(4/4) = 120.205
    val docs = Seq((1L, "go on. do it!")).toDF("doc_id", "text")
    val r = TextQueries.readabilityOf(docs).collect().head
    assert(r.getInt(1) === 4 && r.getInt(2) === 2 && r.getInt(3) === 4)
    assert(r.getDouble(5) === 120.205)
    assert(r.getString(6) === "easy")
  }

  test("a 2000-token multi-sentence document lands outside 'hard'") {
    val s = spark; import s.implicits._
    // The r14 one-sentence model scored ANY 10³-token doc at
    // flesch ≈ −1.015·n_tok → every real document banded "hard" and
    // the signal was a constant. With sentences counted, a plain
    // 10-words-per-sentence document stays mid-scale at any length:
    // per sentence "this line has ten short plain words in it now."
    // n_tok=2000, n_sent=200, syl runs: this(1) line(2: i,e) has(1)
    // ten(1) short(1) plain(2: ai... wait a-i adjacent = one run "ai")
    // — the assertion below pins the band, not the raw count.
    val sent = "this line has ten short plain words in it now. "
    val docs = Seq((1L, sent * 200)).toDF("doc_id", "text")
    val r = TextQueries.readabilityOf(docs).collect().head
    assert(r.getInt(1) === 2000 && r.getInt(2) === 200)
    assert(r.getString(6) !== "hard",
      s"2000-token doc banded ${r.getString(6)} (flesch ${r.getDouble(5)})")
  }

  test("corpus: bands consistent with score, all bands present") {
    val rows = TextQueries.textReadability(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, syl, f, band) =
        (r.getInt(1), r.getInt(3), r.getDouble(5), r.getString(6))
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
    assert(rows.map(_.getString(6)).distinct.sorted.toSeq ===
      Seq("easy", "hard", "medium"), "expected all three bands")
  }
}
