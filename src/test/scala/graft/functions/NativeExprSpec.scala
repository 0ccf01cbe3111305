package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The native codegen expressions must be drop-in bit-identical
  * replacements for the HOF formulations they optimize (the DuckDB
  * oracles mirror the HOF op order). */
class NativeExprSpec extends SparkSuite {

  test("MinHashSig equals the HOF formulation exactly") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(3)
    val docs = Seq.fill(50)(
      Seq.fill(1 + rng.nextInt(40))("s" + rng.nextInt(500))).toDF("shingles")
    val coeffs = HashFunctions.minhashCoeffs(64)
    val p = HashFunctions.MinHashPrime
    val shHashes = transform(col("shingles"),
      x => pmod(xxhash64(x), lit(p)))
    val hof = array(coeffs.map { case (a, b) =>
      array_min(transform(shHashes, h => pmod(h * lit(a) + lit(b), lit(p))))
    }: _*)
    val rows = docs.select(
      MinHashSig(shHashes, coeffs, p).as("native"), hof.as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("DotProductD is bit-identical to aggregate(zip_with(*), 0d, +)") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(5)
    val vecs = Seq.fill(100)((
      Seq.fill(64)(rng.nextGaussian()),
      Seq.fill(64)(rng.nextGaussian()))).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _)
    val rows = vecs.select(
      DotProductD(col("a"), col("b")).as("native"), hof.as("hof")).collect()
    rows.foreach { r =>
      // bitwise equality, not approximate: the tau filters depend on it
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("PolyHash equals the HOF fold on random ascii strings") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(11)
    val strs = Seq.fill(60)(
      Seq.fill(1 + rng.nextInt(200))((32 + rng.nextInt(95)).toChar).mkString)
    val df = strs.toDF("t")
    val hof = aggregate(transform(split(col("t"), ""), c => ascii(c)),
      lit(0L), (acc, x) => (acc * 31 + x) % TextFunctions.FpMod)
    val rows = df.select(
      PolyHash(col("t"), 31L, TextFunctions.FpMod).as("native"),
      hof.as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("SigMatchCount equals the zip_with/filter HOF, incl. length skew") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(17)
    val sigs = Seq.fill(60) {
      val n = 1 + rng.nextInt(64)
      val a = Seq.fill(n)(rng.nextLong(1000))
      // force real matches at random positions
      val b = a.zipWithIndex.map { case (v, i) =>
        if (rng.nextBoolean()) v else v + 1 + rng.nextInt(5)
      }
      (a, if (rng.nextInt(5) == 0) b.take(n / 2 + 1) else b)
    }.toDF("a", "b")
    val rows = sigs.select(
      HashFunctions.sigSimilarity(col("a"), col("b")).as("native"),
      HashFunctions.sigSimilarityRef(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native expressions survive both codegen and interpreted eval") {
    val s = spark; import s.implicits._
    // interpreted path: force eval through a literal-driven projection
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(DotProductD(col("a"), col("b"))).head().getDouble(0)
      === 32.0)
    val sig = df.select(MinHashSig(
      array(lit(7L), lit(11L)), Seq((3L, 1L), (5L, 2L)),
      HashFunctions.MinHashPrime)).head().getSeq[Long](0)
    assert(sig === Seq(22L, 37L)) // min(3*7+1, 3*11+1)=22; min(5*7+2, 5*11+2)=37
  }

  /** Driver-side winnowing replica: gram polyhashes → window minima
    * → the distinct fingerprint set. */
  private def winnowRef(text: String, n: Int, w: Int): Set[Long] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val m = toks.length - n + 1
    if (m < w) return Set.empty
    val hs = (0 until m).map { i =>
      toks.slice(i, i + n).mkString(" ")
        .foldLeft(0L)((a, c) => (a * 31L + c.toLong) % TextFunctions.FpMod)
    }
    (0 to m - w).map(p => hs.slice(p, p + w).min).toSet
  }

  test("WinnowStats matches the reference set reductions; guarantee holds") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def gen(n: Int) =
      Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // a shared run of exactly W+N-1 = 6 tokens: the winnowing
    // guarantee promises >= 1 common fingerprint
    val shared = "one two three four five six"
    val docs = Seq.tabulate(30)(i => (i.toLong, gen(2 + rnd.nextInt(40)))) ++
      Seq((100L, gen(10) + " " + shared + " " + gen(7)),
          (101L, gen(5) + " " + shared))
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        WinnowStats(col("text"), 3, 4, 31L, TextFunctions.FpMod).as("st"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    docs.foreach { case (id, text) =>
      val fps = winnowRef(text, 3, 4)
      val m = math.max(text.split("\\s+").count(_.nonEmpty) - 2, 0)
      val want =
        if (fps.isEmpty) Seq(m.toLong, 0L, 0L, 0L)
        else Seq(m.toLong, fps.size.toLong, fps.reduce(_ ^ _), fps.min)
      assert(got(id) === want, s"doc $id")
    }
    assert(winnowRef(docs.find(_._1 == 100L).get._2, 3, 4)
      .intersect(winnowRef(docs.find(_._1 == 101L).get._2, 3, 4)).nonEmpty,
      "a 6-token shared run must share a fingerprint")
  }

  test("text_winnow is a zero-shuffle map-only scan") {
    val plan = graft.functions.TextQueries.textWinnow(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"unexpected hash shuffle:\n$plan")
    assert(!plan.contains("HashAggregate"), s"unexpected agg:\n$plan")
  }
}
