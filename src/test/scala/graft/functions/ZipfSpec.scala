package graft.functions

import graft.SparkSuite

/** [[TextQueries.zipfOf]] — OLS algebra against a driver-side
  * recompute on a hand multiset, and corpus sanity bounds. */
class ZipfSpec extends SparkSuite {

  test("fixture: fit matches a driver-side OLS recompute exactly") {
    val s = spark; import s.implicits._
    // counts 8,4,2,1 -> ranks 1..4 (tokens tie-broken lexically)
    val words =
      Seq.fill(8)("aa") ++ Seq.fill(4)("bb") ++
        Seq.fill(2)("cc") ++ Seq.fill(1)("dd")
    val d = Seq(words.mkString(" ")).toDF("text")
    val r = TextQueries.zipfOf(d).collect().head
    assert(r.getInt(0) == 4 && r.getString(1) == "aa" && r.getLong(2) == 8L)

    val log2 = (v: Double) => math.log(v) / math.log(2.0)
    val xs = (1 to 4).map(i => log2(i.toDouble))
    val ys = Seq(8L, 4L, 2L, 1L).map(c => log2(c.toDouble))
    val k = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val syy = ys.map(y => y * y).sum
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    val icpt = (sy - slope * sx) / k
    val r2 = math.pow(k * sxy - sx * sy, 2) /
      ((k * sxx - sx * sx) * (k * syy - sy * sy))
    assert(math.abs(r.getDouble(3) - slope) < 1e-3)
    assert(math.abs(r.getDouble(4) - icpt) < 1e-3)
    assert(math.abs(r.getDouble(5) - r2) < 1e-3)
    // counts halve as rank doubles -> slope near -1.5 (3 decades of y
    // over 2 of x), r2 high but not 1 (x grid isn't geometric in rank)
    assert(r.getDouble(3) < 0.0 && r.getDouble(5) > 0.9)
  }

  test("degenerate corpus (one distinct token) emits NULL fit, not NaN") {
    val s = spark; import s.implicits._
    // k=1 rank: sx=sxx=0 ⇒ den=0 — the 0/0 case the heapsOf-style
    // eps guard (ADVICE r12) must turn into NULL in BOTH engines
    val d = Seq("aa aa aa", "aa aa").toDF("text")
    val r = TextQueries.zipfOf(d).collect().head
    assert(r.getInt(0) == 1 && r.getString(1) == "aa" && r.getLong(2) == 5L)
    assert(r.isNullAt(3), s"slope must be NULL, got ${r.get(3)}")
    assert(r.isNullAt(4), s"intercept must be NULL, got ${r.get(4)}")
    assert(r.isNullAt(5), s"r2 must be NULL, got ${r.get(5)}")
  }

  test("corpus: slope negative, r2 in (0,1], head is the rank-1 token") {
    val r = TextQueries.corpusZipf(spark, sfDir).collect().head
    assert(r.getInt(0) > 10)
    assert(r.getLong(2) > 0L)
    assert(r.getDouble(3) < 0.0, s"zipf slope ${r.getDouble(3)}")
    assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
  }

  test("heaps fixture: exact V = N^0.5 curve recovers beta 0.5, r2 1") {
    val s = spark; import s.implicits._
    // cumulative (tokens, vocab) = (4,2),(16,4),(64,8),(256,16):
    // every checkpoint sits exactly on log2 V = 0.5 · log2 N
    def doc(nToks: Int, vocab: Seq[String]) =
      (0 until nToks).map(i => vocab(i % vocab.size)).mkString(" ")
    val v = (0 until 16).map(i => s"w$i")
    val d = Seq(
      (0L, doc(4, v.slice(0, 2))),
      (1L, doc(12, v.slice(0, 4))),
      (2L, doc(48, v.slice(0, 8))),
      (3L, doc(192, v.slice(0, 16)))
    ).toDF("doc_id", "text")
    val r = TextQueries.heapsOf(spark, d).collect().head
    assert(r.getInt(0) == 10)
    assert(r.getLong(1) == 256L && r.getLong(2) == 16L)
    assert(r.getDouble(3) === 0.5, s"beta ${r.getDouble(3)}")
    assert(r.getDouble(5) === 1.0, s"r2 ${r.getDouble(5)}")
  }

  test("heaps corpus: saturating synthetic vocab reads a LOW beta") {
    val r = TextQueries.corpusHeaps(spark, sfDir).collect().head
    assert(r.getInt(0) > 0 && r.getLong(1) > 0 && r.getLong(2) > 0)
    val beta = r.getDouble(3)
    // token-soup corpus: vocabulary saturates in the first decile
    assert(beta >= 0.0 && beta < 0.3, s"beta $beta")
  }
}
