package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.HeavyHitters.{MgSummary, MisraGries}

/** [[HeavyHitters]] — the MG guarantee, summary bounds and
  * merge-order invariance under planted Zipf skew (keyspace ≫ cap),
  * which the near-uniform shipped corpus cannot exercise, plus the
  * corpus entry vs a brute-force recount. */
class HeavySpec extends SparkSuite {

  private val Cap = 64
  private val Denom = 50L // cut share 2%; guarantee needs denom ≤ cap+1

  /** Zipf-ish fixture: key i occurs max(1, 2000/(i+1)) times; each
    * occurrence is one two-token doc ⇒ exactly one bigram "ki ki". */
  private def zipfDocs = {
    val s = spark; import s.implicits._
    val rows = (0 until 2000).flatMap { i =>
      Seq.fill(math.max(1, 2000 / (i + 1)))(s"k$i k$i")
    }
    // interleave deterministically so heavy keys spread over partitions
    new scala.util.Random(7).shuffle(rows).toDF("text")
  }

  test("sketch candidates contain every gram above n/(cap+1); summary bounded") {
    val s = spark; import s.implicits._
    val docs = zipfDocs
    val grams = docs.select(
      explode(graft.functions.WordNgrams(col("text"), 2)).as("gram"))
    val exact = grams.groupBy("gram").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val sketch: MgSummary =
      grams.as[String].select(new MisraGries(Cap).toColumn).head()
    assert(sketch.n == n, "summary must carry the exact item total")
    assert(sketch.counts.size <= Cap, s"summary exceeded cap: ${sketch.counts.size}")
    val bound = n / (Cap + 1)
    exact.foreach { case (k, cnt) =>
      if (cnt > bound)
        assert(sketch.counts.contains(k),
          s"guarantee violated: $k has exact $cnt > $bound but was evicted")
    }
    // estimates never overcount and undercount by at most n/(cap+1)
    sketch.counts.foreach { case (k, est) =>
      assert(est <= exact(k), s"$k: MG estimate $est above exact ${exact(k)}")
      assert(exact(k) - est <= bound, s"$k: error ${exact(k) - est} > $bound")
    }
  }

  test("blocklist equals the exact full-count cut, under any partitioning") {
    val docs = zipfDocs
    val expected = {
      val grams = docs.select(
        explode(graft.functions.WordNgrams(col("text"), 2)).as("gram"))
      val n = grams.count()
      grams.groupBy("gram").count().collect()
        .collect { case r if r.getLong(1) * Denom > n =>
          r.getString(0) -> r.getLong(1) }
        .toMap
    }
    assert(expected.nonEmpty, "fixture must plant heavy grams")
    assert(expected.size < 20, "cut must discriminate")
    Seq(7, 31).foreach { p =>
      val got = HeavyHitters.blocklistOf(docs.repartition(p), Cap, Denom)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected,
        s"partitioning $p: sketch path must land on the exact cut")
    }
  }

  test("merge keeps the bound and is lossless below capacity") {
    import graft.operators.HeavyHitters.MgBuffer
    val mg = new MisraGries(4)
    val a = MgBuffer.from(Map("x" -> 10L, "y" -> 3L, "z" -> 2L), 15L, 4)
    val b = MgBuffer.from(Map("x" -> 5L, "w" -> 4L, "v" -> 2L), 11L, 4)
    val m = mg.merge(a, b).toSummary
    assert(m.n == 26L)
    assert(m.counts.size <= 4)
    // summed: x=15 y=3 z=2 w=4 v=2 → 5 keys; offset = 5th largest (2)
    assert(m.counts == Map("x" -> 13L, "y" -> 1L, "w" -> 2L))
    // below capacity nothing is lost
    val small = mg.merge(
      MgBuffer.from(Map("a" -> 2L), 2L, 4),
      MgBuffer.from(Map("b" -> 1L), 1L, 4)).toSummary
    assert(small.counts == Map("a" -> 2L, "b" -> 1L) && small.n == 3L)
  }

  test("mutable buffer reduce matches the textbook fold (evicting path)") {
    import graft.operators.HeavyHitters.MgBuffer
    // cap 2, stream: a a b c a d — the textbook fold:
    //   a:1 → a:2 → +b:1 → c decrements-all ({a:1}, b drops to zero,
    //   c itself NOT inserted) → a:2 → d inserts into the freed slot
    val buf = new MgBuffer(2)
    Seq("a", "a", "b", "c", "a", "d").foreach(buf.inc)
    val s = buf.toSummary
    assert(s.n === 6L)
    assert(s.counts === Map("a" -> 2L, "d" -> 1L),
      "decrement-all must drop zeros and NOT insert the evicting key")
  }

  test("corpus entry equals the brute-force recount at this SF") {
    val got = HeavyHitters.ngramBlocklist(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val docs = graft.Tables(spark, sfDir).documents
    val grams = docs.select(
      explode(graft.functions.WordNgrams(col("text"), 2)).as("gram"))
    val n = grams.count()
    val expected = grams.groupBy("gram").count().collect()
      .collect { case r if r.getLong(1) * HeavyHitters.ShareDenom > n =>
        (r.getString(0), r.getLong(1)) }
      .toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
