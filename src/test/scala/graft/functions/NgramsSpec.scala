package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[WordNgrams]] — bit-equality with the composed HOF reference it
  * replaces, eval/codegen parity, and the corpus_ngrams plan shape. */
class NgramsSpec extends SparkSuite {

  private val fixtures = Seq(
    "the quick brown fox",
    "  leading   and trailing   ",
    "single",
    "",
    "\t tabs\nand newlines \r mixed  here",
    "a a a a a",
    "unicode héllo wörld ✓ done")

  test("word bigrams equal the composed HOF reference") {
    val s = spark; import s.implicits._
    val df = fixtures.toDF("text")
    val rows = df.select(
        WordNgrams(col("text"), 2).as("fused"),
        // the HOF form needs BOTH the empty-token filter and the
        // descending-sequence guard WordNgrams makes unnecessary
        expr("""CASE WHEN size(filter(split(text, '\\s+'), w -> w != '')) >= 2
               |THEN transform(
               |  sequence(1, size(filter(split(text, '\\s+'), w -> w != '')) - 1),
               |  i -> concat_ws(' ',
               |    element_at(filter(split(text, '\\s+'), w -> w != ''), i),
               |    element_at(filter(split(text, '\\s+'), w -> w != ''), i + 1)))
               |ELSE array() END""".stripMargin).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
    // trigram sanity on the first fixture
    val tri = df.limit(1).select(WordNgrams(col("text"), 3)).head.getSeq[String](0)
    assert(tri === Seq("the quick brown", "quick brown fox"))
  }

  test("property: bigrams equal a sliding-window reference on arbitrary whitespace") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val s = spark; import s.implicits._
    val tok = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(5)).suchThat(_.nonEmpty),
      Gen.oneOf("héllo", "wörld", "✓", "a", "dup"))
    val ws = Gen.nonEmptyListOf(
      Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B')).map(_.mkString)
    val text = for {
      toks <- Gen.listOf(tok).map(_.take(20))
      lead <- Gen.option(ws)
      seps <- Gen.listOfN(toks.length, ws)
    } yield lead.getOrElse("") +
      toks.zip(seps).map { case (t, w) => t + w }.mkString
    val prop = Prop.forAll(Gen.listOf(text).map(_.take(10))) { texts =>
      texts.isEmpty || {
        val rows = texts.toDF("text")
          .select(WordNgrams(col("text"), 2)).collect()
          .map(_.getSeq[String](0))
        texts.zip(rows).forall { case (t, got) =>
          val ref = t.split("\\s+").filterNot(_.isEmpty)
            .sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
          got == ref
        }
      }
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("interpreted (eval) and codegen paths agree") {
    val s = spark; import s.implicits._
    val df = fixtures.toDF("text")
    def run() = df.select(WordNgrams(col("text"), 2)).collect()
      .map(_.getSeq[String](0))
    val byCodegen = run()
    val prevWs = s.conf.get("spark.sql.codegen.wholeStage")
    val prevFm = s.conf.get("spark.sql.codegen.factoryMode")
    try {
      s.conf.set("spark.sql.codegen.wholeStage", "false")
      s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val byEval = run()
      byCodegen.zip(byEval).foreach { case (a, b) => assert(a === b) }
    } finally {
      s.conf.set("spark.sql.codegen.wholeStage", prevWs)
      s.conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }

  test("corpus_ngrams ranks are dense and counts verified per lang") {
    val rows = TextQueries.corpusNgrams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length),
        s"$lang: ranks must be dense from 1")
      assert(sorted.length <= TextQueries.TopNgramsK)
      // ordered by (n desc, bigram asc)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
            s"$lang: tiebreak violated between $a and $b")
        case _ =>
      }
    }
  }

  test("the bigram table is never globally sorted: WindowGroupLimit plans") {
    val q = TextQueries.corpusNgrams(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limited window must plan a WindowGroupLimit:\n$plan")
  }
}
