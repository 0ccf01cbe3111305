package graft.multimodal

import graft.SparkSuite
import graft.multimodal.Multimodal.{dhashOf, MmBlob}

/** `mm_dhash` — gradient-sign fixtures on real BMP bytes plus corpus
  * group invariants. */
class DhashSpec extends SparkSuite {

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

  /** Pixel byte whose gray value is a function of the column x. */
  private def colPix(stride: Int)(f: Int => Int)(i: Int): Byte = {
    val inRow = i % stride
    if (inRow >= 27) 0.toByte else f(inRow / 3).toByte
  }

  test("flat image hashes to all zeros; monotone ramps to all ones/zeros") {
    // 9×8 image = identity sampling grid
    val stride = (9 * 3 + 3) / 4 * 4
    val flat = dhashOf(MmBlob(1L, bmp(9, 8, _ => 77.toByte))).get
    assert(flat.dhash === "0" * 64 && flat.n_ones === 0)
    assert(flat.width === 9 && flat.height === 8)

    val inc = dhashOf(MmBlob(2L, bmp(9, 8, colPix(stride)(x => 10 * x)))).get
    assert(inc.dhash === "1" * 64 && inc.n_ones === 64)

    val dec = dhashOf(MmBlob(3L, bmp(9, 8, colPix(stride)(x => 90 - 10 * x)))).get
    assert(dec.dhash === "0" * 64 && dec.n_ones === 0)
  }

  test("uniform brightness shift leaves every gradient sign intact") {
    val stride = (9 * 3 + 3) / 4 * 4
    def zig(x: Int) = if (x % 2 == 0) 50 else 20 + 3 * x
    val a = dhashOf(MmBlob(1L, bmp(9, 8, colPix(stride)(zig)))).get
    val b = dhashOf(MmBlob(2L, bmp(9, 8, colPix(stride)(x => zig(x) + 40)))).get
    assert(a.n_ones > 0 && a.n_ones < 64, "fixture must mix signs")
    assert(a.dhash === b.dhash, "dhash must survive a +40 brightness shift")
  }

  test("non-image and raw blobs drop; corpus groups are consistent") {
    assert(dhashOf(MmBlob(9L, "just text".getBytes("UTF-8"))).isEmpty)
    val rows = Multimodal.mmDhash(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, hash, ones, rep, n) = (r.getLong(0), r.getString(3),
        r.getInt(4), r.getLong(5), r.getLong(6))
      assert(hash.length === 64)
      assert(ones === hash.count(_ == '1'))
      assert(rep <= id && n >= 1)
    }
    // rep_id is the min doc_id of its hash group
    rows.groupBy(_.getString(3)).foreach { case (_, g) =>
      val ids = g.map(_.getLong(0))
      assert(g.forall(_.getLong(5) == ids.min))
      assert(g.forall(_.getLong(6) == g.length.toLong))
    }
  }
}
