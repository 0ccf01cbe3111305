package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** `text_sentences` + the shared sentence primitives
  * (TextFunctions.sentenceCount / sentences). */
class SentencesSpec extends SparkSuite {

  test("sentenceCount: terminator runs, floored at one") {
    val s = spark; import s.implicits._
    val got = Seq(
      ("no terminators at all", 1),
      ("one. two! three?", 3),
      ("ellipsis... counts once", 1),
      ("mixed?! runs. count", 2),
      ("", 1)
    ).toDF("text", "want")
      .select(TextFunctions.sentenceCount(col("text")).as("n"), col("want"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
  }

  test("sentences: chunks, trim, empty-drop, un-terminated tail") {
    val s = spark; import s.implicits._
    val got = Seq((1L, "first one.  second two! tail three"))
      .toDF("doc_id", "text")
      .select(TextFunctions.sentences(col("text")).as("s"))
      .collect().head.getSeq[String](0)
    assert(got === Seq("first one.", "second two!", "tail three"))
    // whitespace-only remainder after a terminator is dropped
    val tail = Seq((1L, "done. ")).toDF("doc_id", "text")
      .select(TextFunctions.sentences(col("text")).as("s"))
      .collect().head.getSeq[String](0)
    assert(tail === Seq("done."))
  }

  test("textSentences rows: positions, token counts, digest") {
    val s = spark; import s.implicits._
    val df = TextQueries.textSentences(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // this corpus has no terminators: exactly one sentence per doc,
    // sent_id 0, and the sentence's tokens = the doc's tokens
    assert(rows.forall(_.getInt(1) == 0))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.length.toLong === nDocs)
    rows.foreach(r => assert(r.getInt(2) > 0 && r.getString(3).length == 32))
  }

  test("readability, the ensemble and text_sentences share one count") {
    val s = spark; import s.implicits._
    // same doc through the count primitive and the segmentation:
    // len(sentences(text)) == sentenceCount(text) for terminator-
    // terminated docs and for terminator-free docs (the floor-1 vs
    // the whole-doc tail chunk). They diverge by design only on a
    // terminated doc with an extra un-terminated tail, which the
    // Flesch terminator-run count ignores and segmentation keeps.
    val docs = Seq("a. b! c?", "plain run no stop", "x.  ", "a?!b.")
      .toDF("text")
    val got = docs.select(
        TextFunctions.sentenceCount(col("text")).as("n"),
        size(TextFunctions.sentences(col("text"))).as("m"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
  }
}
