package graft.multimodal

import graft.SparkSuite
import graft.multimodal.Multimodal.{colorStatsOf, MmBlob}

/** `mm_colorstats` — exact channel sums on hand-built BMP bytes
  * (stride padding excluded) plus corpus invariants. */
class ColorStatsSpec extends SparkSuite {

  /** Minimal 24bpp bottom-up BMP with per-byte pixel generator. */
  private def bmp(w: Int, h: Int, pix: Int => Byte): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val n = stride * h
    val buf = java.nio.ByteBuffer.allocate(54 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + n).putInt(0).putInt(54).putInt(40)
    buf.putInt(w).putInt(h)
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(n)
    buf.put(new Array[Byte](16))
    (0 until n).foreach(i => buf.put(pix(i)))
    buf.array()
  }

  test("hand image: exact sums, padding bytes invisible") {
    // 2×2, stride = 8 (2 pad bytes/row). Channels by position:
    // pixel bytes 10,20,30 | 40,50,60 per row; padding set to 0xFF —
    // if padding leaked into the sums these values would shift.
    val w = 2; val h = 2; val stride = 8
    def pix(i: Int): Byte = {
      val inRow = i % stride
      if (inRow >= 6) 0xFF.toByte
      else (10 * (inRow + 1)).toByte
    }
    val cs = colorStatsOf(MmBlob(1L, bmp(w, h, pix))).get
    assert(cs.width == 2 && cs.height == 2 && cs.n_px == 4L)
    // per row: c0 = 10+40, c1 = 20+50, c2 = 30+60; two rows
    assert(cs.sum_c0 == 100L && cs.sum_c1 == 140L && cs.sum_c2 == 180L)
    // grays: 10+20+30 = 60 and 40+50+60 = 150 alternate
    assert(cs.min_gray == 60 && cs.max_gray == 150)
  }

  test("flat image: zero dynamic range, means equal the fill byte") {
    val cs = colorStatsOf(MmBlob(2L, bmp(5, 3, _ => 77.toByte))).get
    assert(cs.min_gray == 231 && cs.max_gray == 231)
    assert(cs.sum_c0 == 77L * 15 && cs.sum_c1 == 77L * 15)
  }

  test("non-image blobs drop; corpus rows satisfy channel bounds") {
    assert(colorStatsOf(MmBlob(9L, "just text".getBytes("UTF-8"))).isEmpty)
    val rows = Multimodal.mmColorstats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nPx = r.getLong(3)
      assert(nPx == r.getInt(1).toLong * r.getInt(2))
      Seq(4, 5, 6).foreach { i =>
        val m = r.getDouble(i)
        assert(m >= 0.0 && m <= 255.0, s"doc ${r.getLong(0)} mean $m")
      }
      val (lo, hi) = (r.getInt(7), r.getInt(8))
      assert(lo >= 0 && hi <= 765 && lo <= hi)
      // the mean gray must sit inside [min_gray, max_gray]
      val meanG = r.getDouble(4) + r.getDouble(5) + r.getDouble(6)
      assert(meanG >= lo - 1e-6 && meanG <= hi + 1e-6)
    }
  }
}
