package graft.operators

import graft.SparkSuite

/** `events_autocorr` — exact period-3 fixture recompute, zero-fill
  * behavior, and corpus bounds. */
class AutocorrSpec extends SparkSuite {

  /** Reference Pearson over two aligned integer series. */
  private def pearson(x: Seq[Long], y: Seq[Long]): Double = {
    val n = x.length.toDouble
    val (sx, sy) = (x.sum.toDouble, y.sum.toDouble)
    val sxx = x.map(v => v.toDouble * v).sum
    val syy = y.map(v => v.toDouble * v).sum
    val sxy = x.zip(y).map { case (a, b) => a.toDouble * b }.sum
    (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
  }

  test("period-3 series reads r = 1 at lags 3 and 6, matches reference elsewhere") {
    val s = spark; import s.implicits._
    // counts per day 0..11 = 5,1,2 repeating: day d gets v(d) rows
    val v = (0 until 12).map(d => Seq(5L, 1L, 2L)((d % 3)))
    val obs = v.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c.toInt)(d.toLong) }.toDF("day")
    val rows = Lifecycle.autocorrOf(obs).collect()
      .map(r => r.getInt(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(rows.keySet === (1 to 7).toSet)
    (1 to 7).foreach { k =>
      val (n, r) = rows(k)
      assert(n === 12 - k)
      val x = v.drop(k); val y = v.dropRight(k)
      val expect = BigDecimal(pearson(x, y))
        .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      assert(math.abs(r - expect) < 2e-6, s"lag $k: got $r want $expect")
    }
    assert(rows(3)._2 === 1.0 && rows(6)._2 === 1.0)
  }

  test("gap days enter as zero observations, not missing rows") {
    val s = spark; import s.implicits._
    // observations only on days 0 and 2: day 1 must zero-fill, so
    // lag-1 pairs are (v1,v0)=(0,2) and (v2,v1)=(3,0) → n = 2
    val obs = Seq(0L, 0L, 2L, 2L, 2L).toDF("day")
    val rows = Lifecycle.autocorrOf(obs).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(rows(1) === 2)
    // lag 2 pairs only (v2, v0) — a single pair has zero variance,
    // so the guard drops it (r undefined at n = 1), as do lags
    // beyond the span
    assert(!rows.contains(2))
    assert(!rows.contains(7))
  }

  test("corpus: all lags present, |r| bounded") {
    val rows = Lifecycle.eventsAutocorr(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 7))
    rows.foreach { r =>
      assert(r.getInt(1) > 0)
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }
}
