package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{HashFunctions => H}

/** Bit-equality of the fused native [[ShingleHashes]] expression with
  * the HOF reference formulation it replaced, plus its edge cases. */
class ShingleSpec extends SparkSuite {

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e f g",
    "dup dup dup dup dup",                  // repeated shingles → distinct
    "  leading and   irregular   spaces ",  // empty-token handling
    "one two",                              // fewer than n tokens
    "solo",
    "tab\tand\nnewline separated tokens here")

  test("shingle hashes match xxhash64 over HOF wordShingles, in order") {
    val s = spark; import s.implicits._
    val df = texts.filter(_.split("\\s+").count(_.nonEmpty) >= 3)
      .toDF("text")
    val rows = df.select(
        transform(H.wordShingles(col("text"), 3), sh => xxhash64(sh))
          .as("hof"),
        H.shingleHashes(col("text"), 3).as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("modded variant matches pmod(xxhash64, p) of HOF shingles") {
    val s = spark; import s.implicits._
    val df = texts.filter(_.split("\\s+").count(_.nonEmpty) >= 3).toDF("text")
    val rows = df.select(
        transform(H.wordShingles(col("text"), 3),
          sh => pmod(xxhash64(sh), lit(H.MinHashPrime))).as("hof"),
        ShingleHashes.modded(col("text"), 3, H.MinHashPrime).as("native"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("tokenHashes matches per-token xxhash64 incl. duplicates") {
    val s = spark; import s.implicits._
    val rows = texts.toDF("text").select(
        transform(H.tokens(col("text")), t => xxhash64(t)).as("hof"),
        ShingleHashes.tokenHashes(col("text")).as("native"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("fewer than n tokens yields an empty array, not an error") {
    val s = spark; import s.implicits._
    val rows = Seq("one two", "solo", "", "   ").toDF("text")
      .select(H.shingleHashes(col("text"), 3).as("h"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0).isEmpty))
  }

  test("property: native equals HOF on random whitespace-riddled strings") {
    import org.scalacheck.{Gen, Prop}
    val s = spark; import s.implicits._
    val token = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val textGen = for {
      n <- Gen.choose(3, 30)
      toks <- Gen.listOfN(n, token)
      seps <- Gen.listOfN(n + 1, sep)
    } yield seps.head + toks.zip(seps.tail).map { case (t, x) => t + x }.mkString
    val prop = Prop.forAll(textGen) { text =>
      val r = Seq(text).toDF("text").select(
        transform(H.wordShingles(col("text"), 3), sh => xxhash64(sh)).as("hof"),
        H.shingleHashes(col("text"), 3).as("native")).head()
      r.getSeq[Long](0) == r.getSeq[Long](1)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("interpreted (eval) and codegen paths agree") {
    val s = spark; import s.implicits._
    val df = texts.toDF("text")
    val byCodegen = df
      .select(H.shingleHashes(col("text"), 3).as("h")).collect()
    val prevWs = s.conf.get("spark.sql.codegen.wholeStage")
    val prevFm = s.conf.get("spark.sql.codegen.factoryMode")
    try {
      s.conf.set("spark.sql.codegen.wholeStage", "false")
      s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val byEval = df
        .select(H.shingleHashes(col("text"), 3).as("h")).collect()
      byCodegen.zip(byEval).foreach { case (a, b) =>
        assert(a.getSeq[Long](0) === b.getSeq[Long](0))
      }
    } finally {
      // restore the SAVED values — the session is shared across every
      // suite in the JVM, and a hardcoded non-default mode would leak
      s.conf.set("spark.sql.codegen.wholeStage", prevWs)
      s.conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }
}
