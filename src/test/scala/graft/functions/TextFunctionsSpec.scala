package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.SparkSuite
import graft.functions.{TextFunctions => T}

class TextFunctionsSpec extends SparkSuite {

  private def fpRef(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % T.FpMod)

  test("token counts on known strings") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "the quick brown fox"), (2L, "a  b"), (3L, "x"))
      .toDF("id", "text")
      .select(col("id"), T.wsTokenCount(col("text")).as("ws"),
        T.bpeTokenCount(col("text")).as("bpe"))
    val rows = df.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(rows(1L) === ((4, 4)))
    assert(rows(2L) === ((2, 2))) // double space must not create a token
    assert(rows(3L) === ((1, 1)))
  }

  test("bpe counting splits digit runs and punctuation") {
    val s = spark; import s.implicits._
    val df = Seq("abc123, def!").toDF("text")
      .select(T.bpeTokenCount(col("text")).as("n"))
    // abc | 123 | , | def | ! → 5
    assert(df.head().getInt(0) === 5)
  }

  test("property: polyFingerprint matches the reference fold") {
    val s = spark; import s.implicits._
    val gen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val prop = Prop.forAll(gen) { str =>
      val got = Seq(str).toDF("text")
        .select(T.polyFingerprint(col("text"))).head().getLong(0)
      got == fpRef(str)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("fingerprint discriminates: permuted text hashes differently") {
    val s = spark; import s.implicits._
    val df = Seq("ab cd", "cd ab").toDF("text")
      .select(T.polyFingerprint(col("text")).as("fp"))
    val Array(f1, f2) = df.collect().map(_.getLong(0))
    assert(f1 !== f2)
  }

  test("regexp token counts equal the HOF forms on adversarial strings") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(23)
    val pieces = Seq("the", "a", "is", "of", "theo", "xa", "b", "", " ",
      "  ", "\t", "\n", "of.", ".a", "a")
    val texts = Seq("", " ", "a", " a ", "a a a", "the the", "of of of",
      "x\tthe\ny") ++
      Seq.fill(80)(Seq.fill(1 + rng.nextInt(12))(
        pieces(rng.nextInt(pieces.size))).mkString(" "))
    val rows = texts.toDF("t").select(
        T.wsTokenCount(col("t")).as("ws"),
        T.wsTokenCountRef(col("t")).as("wsRef"),
        T.tokenCountIn(col("t"), T.EnStopwords).as("in"),
        T.tokenCountInRef(col("t"), T.EnStopwords).as("inRef"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) === r.getInt(1), "wsTokenCount diverged")
      assert(r.getInt(2) === r.getInt(3), "tokenCountIn diverged")
    }
  }

  test("langid picks en on the synthetic corpus, tiebreaks kick in") {
    val out = TextQueries.textLangid(spark, sfDir)
    val preds = out.select("pred_lang").distinct().collect().map(_.getString(0))
    // synthetic vocab is analytics-English; every doc contains 'the'/'a'
    assert(preds.toSet === Set("en"))
  }

  test("quality score stays in [0,1]") {
    val out = TextQueries.textQuality(spark, sfDir)
    val bad = out.filter(col("quality") < 0 || col("quality") > 1).count()
    assert(bad === 0)
  }

  test("repetition ratios on known strings; zero-shuffle plan") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rep").toString
    Seq(
      (1L, "a a a a"),         // 4 words, 1 distinct; bigrams all "a a"
      (2L, "a b c d"),         // no repetition at all
      (3L, "a b a b a")        // 5 words, 2 distinct; bigrams {ab, ba}
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextQueries.textRepetition(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((4, 1, 0.75, 0.6667)))
    assert(out(2L) == ((4, 4, 0.0, 0.0)))
    assert(out(3L) == ((5, 2, 0.6, 0.5)))

    val plan = TextQueries.textRepetition(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.indexOf("Exchange") ==
      plan.lastIndexOf("Exchange"), // orderBy's range exchange only
      s"repetition scoring must not shuffle data:\n$plan")
  }

  test("boilerplate: cross-doc shingle overlap on fixtures; invariants at sf") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("boil").toString
    Seq(
      (1L, "x y z x y z"), // distinct shingles {xyz, yzx, zxy}
      (2L, "x y z q r"),   // {xyz, yzq, zqr} — shares xyz with doc 1
      (3L, "p q r s"),     // {pqr, qrs} — no overlap
      (4L, "x y")          // < 3 tokens → no shingles, excluded
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextQueries.textBoilerplate(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((3L, 1L, 0.3333)))
    assert(out(2L) == ((3L, 1L, 0.3333)))
    assert(out(3L) == ((2L, 0L, 0.0)))

    val sf = TextQueries.textBoilerplate(spark, sfDir).collect()
    assert(sf.nonEmpty)
    sf.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("quality_deciles: balanced dense buckets, ordered disjoint score ranges") {
    val rows = TextQueries.qualityDeciles(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val perLang = graft.Tables(spark, sfDir).documents
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (lang, ds) =>
      val sorted = ds.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length),
        s"$lang: decile ids must be dense from 1")
      assert(sorted.map(_._3).sum == perLang(lang),
        s"$lang: deciles must cover the corpus exactly")
      // ntile balance: bucket sizes differ by at most one
      val sizes = sorted.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang: unbalanced $sizes")
      // tiers are ordered and non-overlapping on the score
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 <= b._4 + 1e-9,
            s"$lang: decile ${a._2} max ${a._5} above decile ${b._2} min ${b._4}")
        case _ =>
      }
    }
  }

  test("text_rake scores the hand fixture exactly (ratio of sums)") {
    val s2 = spark; import s2.implicits._
    // stopwords: the, a, is, of
    // phrases: [quick brown fox], [quick fox], [speed]
    // freq: quick 2, brown 1, fox 2, speed 1
    // deg:  quick 3+2=5, brown 3, fox 3+2=5, speed 1
    // scores: 13/5=2.6, 10/4=2.5, 1/1=1.0
    val d = Seq((1L, "the quick brown fox is a quick fox of speed"))
      .toDF("doc_id", "text")
    val got = TextQueries.rakeOf(d).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getDouble(3))).toSeq
    assert(got === Seq(
      (1, "quick brown fox", 2.6),
      (2, "quick fox", 2.5),
      (3, "speed", 1.0)))
  }

  test("text_rake: duplicate phrases yield identical rows at distinct ranks") {
    val s2 = spark; import s2.implicits._
    val d = Seq((1L, "alpha beta the alpha beta the gamma"))
      .toDF("doc_id", "text")
    val got = TextQueries.rakeOf(d).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getDouble(3))).toSeq
    // "alpha beta" twice: freq a=2,b=2; deg a=4,b=4 -> 8/4 = 2.0 twice
    assert(got.map(t => (t._2, t._3)).toSet ===
      Set(("alpha beta", 2.0), ("gamma", 1.0)))
    assert(got.map(_._1).sorted === Seq(1, 2, 3))
    assert(got.count(_._2 == "alpha beta") == 2)
  }

  test("text_rake: one uncached corpus scan; three cache reads") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def walk(p: SparkPlan): (Int, Int) = p match {
      case _: InMemoryTableScanExec => (0, 1)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: FileSourceScanExec => (1, 0)
      case other =>
        val cs = other.children.map(walk)
        (cs.map(_._1).sum, cs.map(_._2).sum)
    }
    val df = TextQueries.textRake(spark, sfDir)
    df.collect() // materialize so the cache fills and AQE finalizes
    val (parquetScans, memScans) = walk(df.queryExecution.executedPlan)
    // the persisted token-run frame serves its three references from
    // ONE cache entry; the cache's own lineage is the only parquet
    // scan (Catalyst does not dedup repeated subtrees — without the
    // persist this query read documents three times)
    assert(memScans == 3, s"expected 3 cache reads, got $memScans")
    assert(parquetScans == 0,
      s"expected zero uncached corpus scans, got $parquetScans")
  }
}
