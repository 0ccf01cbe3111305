package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {

  test("decode output schema is typed and stable") {
    val out = Multimodal.mmDecode(spark, sfDir)
    assert(out.schema === StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("bit_depth", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("timescale", IntegerType, nullable = true),
      StructField("duration_s", DoubleType, nullable = true),
      StructField("mean_byte", DoubleType, nullable = true),
      StructField("ok", BooleanType, nullable = false))))
  }

  test("decode is deterministic; text blobs fall back to unknown/ok=false") {
    val a = Multimodal.mmDecode(spark, sfDir).collect()
    val b = Multimodal.mmDecode(spark, sfDir).collect()
    assert(a.sameElements(b))
    val nDocs = graft.Tables(spark, sfDir).documents.count()
    assert(a.length.toLong === nDocs)
    a.foreach { r =>
      assert(r.getString(1) === "unknown") // ASCII text is never media
      (2 to 8).foreach(i => assert(r.isNullAt(i)))
      assert(!r.getBoolean(10))
      assert(r.getDouble(9) > 0 && r.getDouble(9) < 256)
    }
  }

  /** Minimal valid PNG signature + IHDR prefix with the given
    * geometry — a real header, byte for byte. */
  private def pngHeader(w: Int, h: Int, depth: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(32)
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte))
    buf.putInt(13)                       // IHDR chunk length
    buf.put("IHDR".getBytes("US-ASCII")) // offsets 12..15
    buf.putInt(w).putInt(h)              // big-endian at 16 / 20
    buf.put(depth.toByte)                // bit depth at 24
    buf.put(6.toByte)                    // color type RGBA
    buf.array()
  }

  /** BITMAPFILEHEADER + start of BITMAPINFOHEADER with the given
    * geometry (little-endian, reserved zeros). */
  private def bmpHeader(w: Int, h: Int, bpp: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(32)          // file size
    buf.putInt(0)           // reserved zeros at 6..9
    buf.putInt(54)          // pixel offset
    buf.putInt(40)          // info header size
    buf.putInt(w).putInt(h) // little-endian at 18 / 22
    buf.putShort(1)         // planes
    buf.putShort(bpp.toShort) // bpp at 28
    buf.array()
  }

  /** RIFF/WAVE header with a 16-byte PCM fmt chunk. */
  private def wavHeader(channels: Int, rate: Int, bits: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16) // PCM fmt size
    buf.putShort(1)                                  // PCM
    buf.putShort(channels.toShort).putInt(rate)
    buf.putInt(rate * channels * bits / 8)           // byte rate
    buf.putShort((channels * bits / 8).toShort)      // block align
    buf.putShort(bits.toShort)                       // bits @34
    buf.array()
  }

  /** MP4 ftyp box (size 16: brand + one compatible brand). */
  private def mp4Header(brand: String): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(16)
    buf.putInt(16)
    buf.put("ftyp".getBytes("US-ASCII"))
    buf.put(brand.getBytes("US-ASCII")) // 4 bytes
    buf.putInt(0)                        // minor version
    buf.array()
  }

  test("real media headers parse to exact fields; junk stays unknown") {
    val cases = Seq(
      Multimodal.MmBlob(1L, pngHeader(640, 480, 8)),
      Multimodal.MmBlob(2L, bmpHeader(1920, 1080, 24)),
      Multimodal.MmBlob(3L, bmpHeader(16, -32, 32)), // top-down BMP
      Multimodal.MmBlob(4L, "BMlooks like a bitmap but is text!".getBytes),
      Multimodal.MmBlob(5L, Array.emptyByteArray),
      Multimodal.MmBlob(6L, pngHeader(1, 1, 16).take(20)), // truncated
      Multimodal.MmBlob(7L, wavHeader(2, 44100, 16)),
      Multimodal.MmBlob(8L, mp4Header("isom")),
      Multimodal.MmBlob(9L, "RIFFxxxxWAVEfmt looks like audio text"
        .getBytes)) // fmt size from ASCII bytes is never 16/18/40
    val got = cases.map(Multimodal.decodeHeader)
    assert(got(0) === Multimodal.Decoded(1L, "png",
      Some(640), Some(480), Some(8), None, None, None, None,
      meanOf(cases(0).content), ok = true))
    assert(got(1) === Multimodal.Decoded(2L, "bmp",
      Some(1920), Some(1080), Some(24), None, None, None, None,
      meanOf(cases(1).content), ok = true))
    assert(got(2).height === Some(-32), "signed little-endian height")
    assert(got(3).format === "unknown" && !got(3).ok,
      "reserved bytes must be zero for BMP — text cannot fake it")
    assert(got(4) === Multimodal.Decoded(5L, "unknown",
      None, None, None, None, None, None, None, 0.0, ok = false))
    assert(got(5).format === "unknown" && !got(5).ok, "truncated header")
    assert(got(6) === Multimodal.Decoded(7L, "wav",
      None, None, Some(16), Some(2), Some(44100), None, None,
      meanOf(cases(6).content), ok = true))
    assert(got(7) === Multimodal.Decoded(8L, "mp4",
      None, None, None, None, None, None, None,
      meanOf(cases(7).content), ok = true))
    assert(got(8).format === "unknown" && !got(8).ok,
      "NUL-guarded fmt size must reject RIFF-looking text")
  }

  private def meanOf(a: Array[Byte]): Double =
    if (a.isEmpty) 0.0 else a.map(_ & 0xFF).map(_.toLong).sum.toDouble / a.length

  /** ISO box with the given 4-char type and payload. */
  private def box(tp: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length)
    b.put(tp.getBytes("US-ASCII"))
    b.put(payload)
    b.array()
  }

  /** ftyp + a top-level `free` box + moov(free, mvhd) — real box
    * grammar with distractor boxes at both levels, so the parse must
    * actually walk, not assume fixed offsets. */
  private def mp4WithMoov(timescale: Int, duration: Long,
      v1: Boolean): Array[Byte] = {
    val mvhd =
      if (v1) {
        val p = java.nio.ByteBuffer.allocate(32)
        p.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1 + flags
        p.putLong(11L).putLong(22L)               // creation, modification
        p.putInt(timescale).putLong(duration)
        box("mvhd", p.array())
      } else {
        val p = java.nio.ByteBuffer.allocate(20)
        p.put(0.toByte).put(Array[Byte](0, 0, 0))
        p.putInt(11).putInt(22)
        p.putInt(timescale).putInt(duration.toInt)
        box("mvhd", p.array())
      }
    val free = box("free", Array[Byte](1, 2, 3, 4))
    mp4Header("isom") ++ free ++ box("moov", free ++ mvhd)
  }

  test("mp4 moov/mvhd walk yields timescale and duration (v0 and v1)") {
    val v0 = Multimodal.decodeHeader(
      Multimodal.MmBlob(10L, mp4WithMoov(600, 3000L, v1 = false)))
    assert(v0.format === "mp4" && v0.ok)
    assert(v0.timescale === Some(600) && v0.duration_s === Some(5.0))
    val v1 = Multimodal.decodeHeader(
      Multimodal.MmBlob(11L, mp4WithMoov(90000, 90000L * 7 + 45000,
        v1 = true)))
    assert(v1.timescale === Some(90000) && v1.duration_s === Some(7.5))
    // ftyp-only (fragmented/streaming): detection without duration
    val bare = Multimodal.decodeHeader(
      Multimodal.MmBlob(12L, mp4Header("isom")))
    assert(bare.format === "mp4" && bare.ok)
    assert(bare.timescale === None && bare.duration_s === None)
    // truncated moov (size exceeds blob): walk must bail, not read
    // garbage offsets
    val trunc = Multimodal.decodeHeader(
      Multimodal.MmBlob(13L, mp4WithMoov(600, 3000L, v1 = false)
        .dropRight(6)))
    assert(trunc.format === "mp4" && trunc.ok)
    assert(trunc.timescale === None && trunc.duration_s === None)
    // a size-8 mvhd ending flush with the blob has no version byte:
    // must degrade to None, not throw (regression: AIOOBE)
    val size8 = mp4Header("isom") ++ box("moov", box("mvhd", Array.emptyByteArray))
    val flush = Multimodal.decodeHeader(Multimodal.MmBlob(14L, size8))
    assert(flush.format === "mp4" && flush.ok)
    assert(flush.timescale === None && flush.duration_s === None)
  }

  test("decode preserves partitioning (no shuffle before map)") {
    val ds = Multimodal.blobs(spark, sfDir)
    val plan = Multimodal.mmDecode(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the mapPartitions stage must sit directly over the scan: the
    // only exchange allowed is the final orderBy's range partitioning
    val beforeSort = plan.split("Sort").last
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"decode path should not hash-shuffle blobs:\n$plan")
  }

  test("resize plans aspect-preserving integral dims; codec stub is deterministic") {
    import Multimodal.{MmBlob, resizeTo}
    def rz(b: Array[Byte]) = resizeTo(256)(MmBlob(1L, b))
    // downscale: long side pinned to 256, short side floored
    val big = rz(pngHeader(1024, 768, 8)).get
    assert((big.width, big.height, big.target_w, big.target_h)
      == ((1024, 768, 256, 192)))
    // no upscale below the cap
    val small = rz(pngHeader(100, 50, 8)).get
    assert((small.target_w, small.target_h) == ((100, 50)))
    // square, bmp arm
    val sq = rz(bmpHeader(300, 300, 24)).get
    assert((sq.target_w, sq.target_h) == ((256, 256)))
    // extreme ratio: floor would hit 0 — clamped to 1
    val thin = rz(pngHeader(10000, 1, 8)).get
    assert((thin.target_w, thin.target_h) == ((256, 1)))
    // top-down BMP (negative height): a real image — plan on |h|
    val topDown = rz(bmpHeader(16, -32, 32)).get
    assert((topDown.width, topDown.height, topDown.target_w, topDown.target_h)
      == ((16, 32, 16, 32)))
    // non-images route to None, not fake dims
    assert(rz(wavHeader(2, 44100, 16)).isEmpty)
    assert(rz("just text".getBytes("UTF-8")).isEmpty)
    // the stub is a pure function of (bytes, tw, th)
    val again = rz(pngHeader(1024, 768, 8)).get
    assert(again.resized_md5 == big.resized_md5)
    assert(rz(pngHeader(1024, 769, 8)).get.resized_md5 != big.resized_md5)
  }

  /** A complete, well-formed 24-bit uncompressed BMP: 14+40-byte
    * header (pixel offset 54, BI_RGB) + stride·|h| pixel bytes from
    * `pix(i)` (i indexes the packed pixel array including padding). */
  private def fullBmp(w: Int, h: Int, pix: Int => Byte): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val n = stride * math.abs(h)
    val buf = java.nio.ByteBuffer.allocate(54 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + n)      // file size
    buf.putInt(0)           // reserved zeros at 6..9
    buf.putInt(54)          // pixel offset
    buf.putInt(40)          // info header size
    buf.putInt(w).putInt(h) // little-endian dims (h may be negative)
    buf.putShort(1)         // planes
    buf.putShort(24)        // bpp
    buf.putInt(0)           // BI_RGB
    buf.putInt(n)           // image size
    buf.put(new Array[Byte](16)) // ppm/palette fields
    (0 until n).foreach(i => buf.put(pix(i)))
    buf.array()
  }

  private def md5HexLower(bytes: Array[Byte]): String = {
    val hx = bytes.map(b => f"${b & 0xFF}%02x").mkString
    java.security.MessageDigest.getInstance("MD5")
      .digest(hx.getBytes("UTF-8"))
      .map(b => f"${b & 0xFF}%02x").mkString
  }

  test("BMP resample is REAL nearest-neighbor over the pixel array") {
    import Multimodal.{MmBlob, resizeTo}
    // 4×2 @ maxSide 2 → 2×1: sy = 0·2/1 = 0, sx ∈ {0·4/2, 1·4/2} =
    // {0, 2} — output must be exactly pixels (row0,col0)+(row0,col2)
    val img = fullBmp(4, 2, i => (i * 7 + 3).toByte)
    val stride = (4 * 3 + 3) / 4 * 4
    val got = resizeTo(2)(MmBlob(1L, img)).get
    assert((got.target_w, got.target_h, got.resample) === ((2, 1, "nn")))
    val px = img.drop(54)
    val expected = Array(px(0), px(1), px(2), px(6), px(7), px(8))
    assert(got.resized_md5 === md5HexLower(expected))
    // identity size (≤ maxSide): output is the packed (unpadded)
    // pixel grid — still the real path, not the raw blob digest
    val small = fullBmp(2, 2, i => (i * 31 + 5).toByte)
    val s = resizeTo(16)(MmBlob(2L, small)).get
    assert((s.target_w, s.target_h, s.resample) === ((2, 2, "nn")))
    val sStride = (2 * 3 + 3) / 4 * 4 // 8: two padding bytes per row
    val sp = small.drop(54)
    val sExpected = Array(
      sp(0), sp(1), sp(2), sp(3), sp(4), sp(5),
      sp(sStride), sp(sStride + 1), sp(sStride + 2),
      sp(sStride + 3), sp(sStride + 4), sp(sStride + 5))
    assert(s.resized_md5 === md5HexLower(sExpected))
    assert(stride === 12)
  }

  test("resample digest follows STORED row order (top-down = bottom-up " +
      "bytes ⇒ same digest); ineligible BMPs fall back to the stub") {
    import Multimodal.{MmBlob, resizeTo}
    val up = fullBmp(3, 4, i => (i * 11).toByte)
    val down = fullBmp(3, -4, i => (i * 11).toByte)
    val (ru, rd) = (resizeTo(2)(MmBlob(1L, up)).get,
      resizeTo(2)(MmBlob(2L, down)).get)
    assert(ru.resample === "nn" && rd.resample === "nn")
    assert(ru.resized_md5 === rd.resized_md5,
      "same stored bytes must digest identically regardless of sign")
    // truncated pixel array → not eligible for the real path
    val trunc = resizeTo(2)(MmBlob(3L, up.dropRight(1))).get
    assert(trunc.resample === "stub")
    // compression ≠ BI_RGB → stub (flip the compression field)
    val rle = up.clone(); rle(30) = 1
    assert(resizeTo(2)(MmBlob(4L, rle)).get.resample === "stub")
    // a header-only PNG (no chunks to decode) is the codec stub
    val png = resizeTo(2)(MmBlob(5L, pngHeader(64, 64, 8))).get
    assert(png.resample === "stub")
  }

  /** Rewrite the chunk starting at `off` after mutating one data byte,
    * RECOMPUTING its CRC — produces a structurally valid PNG outside
    * the decodable profile (vs. corruption, which breaks the CRC). */
  private def patchChunk(png: Array[Byte], off: Int, rel: Int,
      value: Byte): Array[Byte] = {
    val out = png.clone()
    val len = java.nio.ByteBuffer.wrap(out, off, 4).getInt
    out(off + 8 + rel) = value
    val crc = new java.util.zip.CRC32
    crc.update(out, off + 4, 4 + len)
    java.nio.ByteBuffer.wrap(out, off + 8 + len, 4).putInt(crc.getValue.toInt)
    out
  }

  test("PNG roundtrip: encodePng → pngPixels recovers exact pixels " +
      "through all five scanline filters") {
    val rng = new scala.util.Random(97)
    // h = 7 with seed cycling → every filter type 0..4 appears
    for (seed <- 0L to 4L; (w, h) <- Seq((5, 7), (1, 1), (3, 1), (1, 6))) {
      val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
      val png = Multimodal.encodePng(w, h, rgb, seed)
      val got = Multimodal.pngPixels(png)
      assert(got.isDefined, s"decode failed for ${w}x$h seed $seed")
      val (gw, gh, gpx) = got.get
      assert((gw, gh) === ((w, h)))
      assert(gpx.toSeq === rgb.toSeq, s"pixels differ for ${w}x$h seed $seed")
    }
  }

  test("PNG resample is REAL: inflate + defilter + nearest-neighbor") {
    import Multimodal.{MmBlob, resizeTo}
    // 4×2 @ maxSide 2 → 2×1: same geometry as the BMP test but over
    // packed RGB rows recovered from a real zlib stream
    val rgb = Array.tabulate(4 * 2 * 3)(i => (i * 7 + 3).toByte)
    val png = Multimodal.encodePng(4, 2, rgb, seed = 3L)
    val got = resizeTo(2)(MmBlob(1L, png)).get
    assert((got.target_w, got.target_h, got.resample) === ((2, 1, "nn")))
    val expected = Array(rgb(0), rgb(1), rgb(2), rgb(6), rgb(7), rgb(8))
    assert(got.resized_md5 === md5HexLower(expected))
    // identity size: still the real path over the decoded array
    val s = resizeTo(16)(MmBlob(2L, png)).get
    assert((s.target_w, s.target_h, s.resample) === ((4, 2, "nn")))
    assert(s.resized_md5 === md5HexLower(rgb))
  }

  test("PNG decode degrades to the stub outside the profile: corrupt " +
      "CRC, truncated IDAT, interlaced, non-truecolor, 16-bit") {
    import Multimodal.{MmBlob, resizeTo}
    val rgb = Array.tabulate(6 * 4 * 3)(i => (i * 13 + 1).toByte)
    val good = Multimodal.encodePng(6, 4, rgb, seed = 1L)
    assert(resizeTo(3)(MmBlob(1L, good)).get.resample === "nn")
    // flip one IDAT byte WITHOUT fixing the CRC → corrupt → stub
    val ihdrLen = 12 + 13
    val corrupt = good.clone(); corrupt(8 + ihdrLen + 8 + 2) =
      (corrupt(8 + ihdrLen + 8 + 2) ^ 0x5A).toByte
    assert(resizeTo(3)(MmBlob(2L, corrupt)).get.resample === "stub")
    // drop the IEND tail → truncated chunk walk → stub
    assert(resizeTo(3)(MmBlob(3L, good.dropRight(6))).get.resample === "stub")
    // interlace=1 with a VALID recomputed CRC → outside profile → stub
    assert(resizeTo(3)(MmBlob(4L, patchChunk(good, 8, 12, 1)))
      .get.resample === "stub")
    // color type 0 (grayscale) with valid CRC → stub
    assert(resizeTo(3)(MmBlob(5L, patchChunk(good, 8, 9, 0)))
      .get.resample === "stub")
    // bit depth 16 with valid CRC → stub
    assert(resizeTo(3)(MmBlob(6L, patchChunk(good, 8, 8, 16)))
      .get.resample === "stub")
    // determinism of the real path
    val a = resizeTo(3)(MmBlob(7L, good)).get
    val b = resizeTo(3)(MmBlob(7L, good)).get
    assert(a === b)
  }

  /** Build one chunk (len + type + data + CRC over type+data). */
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    bb.putInt(crc.getValue.toInt).array()
  }

  test("PNG decode rejects structural supersets of the profile: " +
      "trailing bytes, non-contiguous IDAT, surplus deflate") {
    import Multimodal.pngPixels
    val rgb = Array.tabulate(6 * 4 * 3)(i => (i * 7 + 3).toByte)
    val good = Multimodal.encodePng(6, 4, rgb, seed = 2L)
    assert(pngPixels(good).isDefined)
    // trailing bytes after IEND → None
    assert(pngPixels(good ++ Array[Byte](0, 1, 2)).isEmpty)
    // rebuild from scratch: signature + IHDR + IDAT(s) + IEND, so the
    // structural variants below are valid-CRC PNGs differing ONLY in
    // the property under test
    val sig = good.take(8)
    val ihdrLen = java.nio.ByteBuffer.wrap(good, 8, 4).getInt
    val ihdr = good.slice(8, 8 + 12 + ihdrLen)
    val idatLen = java.nio.ByteBuffer.wrap(good, 8 + 12 + ihdrLen, 4).getInt
    val zdata = good.slice(8 + 12 + ihdrLen + 8, 8 + 12 + ihdrLen + 8 + idatLen)
    val iend = chunk("IEND", Array.emptyByteArray)
    def png(chunks: Array[Byte]*): Array[Byte] =
      sig ++ chunks.flatten ++ iend
    // split IDAT across two chunks is legal...
    val (z1, z2) = zdata.splitAt(zdata.length / 2)
    assert(pngPixels(png(ihdr, chunk("IDAT", z1), chunk("IDAT", z2))).isDefined)
    // ...but an ancillary chunk interleaved between them is not
    assert(pngPixels(png(ihdr, chunk("IDAT", z1),
      chunk("tEXt", "k v".getBytes("US-ASCII")),
      chunk("IDAT", z2))).isEmpty)
    // unconsumed compressed bytes after the zlib stream → None
    assert(pngPixels(png(ihdr, chunk("IDAT", zdata ++ Array[Byte](7, 7)))).isEmpty)
    // surplus deflate output beyond the header-claimed h·(1+3w) → None
    val raw = new Array[Byte](4 * (1 + 6 * 3) + 1) // one extra byte
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    val zn = defl.deflate(zbuf); defl.end()
    assert(pngPixels(png(ihdr, chunk("IDAT", zbuf.take(zn)))).isEmpty)
  }

  test("resize keeps the decode path's no-shuffle batch shape") {
    val plan = Multimodal.mmResize(spark, sfDir)
      .queryExecution.executedPlan.toString
    val beforeSort = plan.split("Sort").last
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"resize path should not hash-shuffle blobs:\n$plan")
  }

  test("mm_resize oracle entry: synthesized corpus stays shuffle-free " +
      "and routes raw rows out") {
    val q = Multimodal.mmResizeQuery(spark, sfDir)
    // header construction + resize are per-row scan work: no exchange
    // below the final orderBy's range partitioning
    val plan = q.queryExecution.executedPlan.toString
    val beforeSort = plan.split("Sort").last
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"synthesized-corpus resize should not hash-shuffle:\n$plan")
    // exactly the doc_id % 11 == 0 raw rows are dropped by routing
    // (derived from the data — no assumption that ids are contiguous)
    val docs = Multimodal.blobs(spark, sfDir).count()
    val raw = Multimodal.blobs(spark, sfDir)
      .filter(col("doc_id") % 11 === 0).count()
    assert(q.count() === docs - raw,
      "every non-raw doc must produce exactly one resized row")
  }

  test("framesample yields ceil(n_bytes/64) frames per doc, 16-byte frames") {
    val frames = Multimodal.mmFramesample(spark, sfDir)
    val meta = Multimodal.mmMeta(spark, sfDir)
    val byDoc = frames.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .join(meta.select(col("doc_id"), col("n_bytes")), "doc_id")
      .collect()
    byDoc.foreach { r =>
      val n = r.getLong(1); val bytes = r.getInt(2)
      assert(n === (bytes + 63) / 64, s"doc ${r.getLong(0)}: $n frames for $bytes bytes")
    }
    // every full frame is 16 bytes → 32 hex chars
    val lens = frames.select(length(col("frame_hex"))).distinct()
      .collect().map(_.getInt(0))
    assert(lens.max === 32)
  }

  test("FrameHex equals the sequence+transform HOF form, bit for bit") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(31)
    val blobs = Seq.fill(40)(
      Array.fill(1 + rng.nextInt(300))(rng.nextInt(256).toByte)) :+
      Array.emptyByteArray
    val df = blobs.map(Tuple1(_)).toDF("content")
    val rows = df
      .select(graft.functions.FrameHex(col("content"), 64, 16).as("native"),
        when(length(col("content")) > 0,
          transform(sequence(lit(1), length(col("content")), lit(64)),
            p => hex(col("content").substr(p, lit(16)))))
          .otherwise(array()).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("blobs round-trip: binary content decodes back to the text") {
    val s = spark; import s.implicits._
    val row = Multimodal.blobs(spark, sfDir).as[Multimodal.MmBlob].head()
    val text = graft.Tables(spark, sfDir).documents
      .filter(col("doc_id") === row.doc_id).select("text").head().getString(0)
    assert(new String(row.content, "UTF-8") === text)
  }

  // ----- mm_wavstats -----------------------------------------------

  test("wavStatsOf walks chunks: junk chunk between fmt and data is skipped") {
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val samples = Seq(3, -5, 0, 32767, -32768, 17)
    val pcm = samples.flatMap(s => le16(s & 0xFFFF)).toArray
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val data = "data".getBytes("US-ASCII") ++ le32(pcm.length) ++ pcm
    val junk = "LIST".getBytes("US-ASCII") ++ le32(5) ++
      "INFOx".getBytes("US-ASCII") ++ Array(0.toByte) // odd len: pad byte
    def wav(chunks: Array[Byte]*) = {
      val body = "WAVE".getBytes("US-ASCII") ++ chunks.flatten
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    val plain = Multimodal.wavStatsOf(
      Multimodal.MmBlob(1, wav(fmt, data)))
    val withJunk = Multimodal.wavStatsOf(
      Multimodal.MmBlob(1, wav(fmt, junk, data)))
    assert(plain.isDefined)
    assert(plain == withJunk, "junk chunk must not change the stats")
    val st = plain.get
    assert(st.n_samples == samples.length)
    assert(st.sum_s == samples.map(_.toLong).sum)
    assert(st.min_s == samples.min && st.max_s == samples.max)
    assert(st.sum_sq == samples.map(s => s.toLong * s).sum)
    // sign transitions: 3,-5 | -5,0 no | 0,32767 no | 32767,-32768 | -32768,17
    assert(st.n_zero_cross == 3)
  }

  test("wavStatsOf rejects raw text, truncation, and wrong formats") {
    assert(Multimodal.wavStatsOf(
      Multimodal.MmBlob(1, "hello world this is text".getBytes)).isEmpty)
    val good = Multimodal.synthWav(7, "some words here")
    assert(Multimodal.wavStatsOf(Multimodal.MmBlob(7, good)).isDefined)
    // truncated mid-data: chunk length now exceeds the array
    assert(Multimodal.wavStatsOf(
      Multimodal.MmBlob(7, good.take(good.length - 3))).isEmpty)
  }

  test("mm_wavstats matches a per-doc construction-rule recompute") {
    val texts = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Multimodal.mmWavStats(spark, sfDir).collect()
    val wavIds = texts.keySet.filter(_ % 9 != 4)
    assert(got.map(_.getLong(0)).toSet == wavIds)
    got.take(50).foreach { r =>
      val id = r.getLong(0)
      val t = texts(id) + " "
      val n = (1 + (id * 11) % 300).toInt
      val ss = (0 until n).map(i =>
        ((t.charAt(i % t.length).toInt * 167 + i * 31) % 32768) - 16384)
      assert(r.getInt(1) == (8000 * (1 + id % 4)).toInt)
      assert(r.getInt(2) == n)
      assert(r.getLong(3) == ss.map(_.toLong).sum)
      assert(r.getInt(4) == ss.min && r.getInt(5) == ss.max)
      assert(r.getLong(6) == ss.map(s => s.toLong * s).sum)
      assert(r.getInt(7) == ss.sliding(2).count(p =>
        p.length == 2 && p(0).toLong * p(1) < 0))
    }
  }

  test("wavSilenceOf run structure on a crafted sample stream") {
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    // loud | silent×2 | loud | silent×3 (tail run), τ = 4096
    val samples = Seq(5000, 100, -200, -5000, 0, 4095, -4095)
    val pcm = samples.flatMap(s => le16(s & 0xFFFF)).toArray
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val data = "data".getBytes("US-ASCII") ++ le32(pcm.length) ++ pcm
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ data
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val st = Multimodal.wavSilenceOf(Multimodal.MmBlob(1, wav)).get
    assert(st.n_samples == 7)
    assert(st.n_silent == 5L)
    assert(st.n_runs == 2)
    assert(st.max_run == 3)
    // raw text still rejected
    assert(Multimodal.wavSilenceOf(
      Multimodal.MmBlob(1, "just text".getBytes)).isEmpty)
  }

  test("mm_silence matches a per-doc construction-rule run recompute") {
    val texts = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Multimodal.mmSilence(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSet == texts.keySet.filter(_ % 9 != 4))
    var sawRun = false
    got.take(50).foreach { r =>
      val id = r.getLong(0)
      val t = texts(id) + " "
      val n = (1 + (id * 11) % 300).toInt
      val ss = (0 until n).map(i =>
        ((t.charAt(i % t.length).toInt * 167 + i * 31) % 32768) - 16384)
      val silent = ss.map(s => math.abs(s) < Multimodal.SilenceTau)
      val runs = silent.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      assert(r.getInt(2) == n)
      assert(r.getLong(3) == silent.count(identity).toLong)
      assert(r.getInt(4) == runs.length)
      assert(r.getInt(5) == (if (runs.isEmpty) 0 else runs.max))
      if (runs.length > 1) sawRun = true
    }
    assert(sawRun, "corpus must exercise multi-run docs")
  }

  test("phash: flat image hashes to zeros; a half-bright split hashes its half") {
    import graft.multimodal.Multimodal.{phashOf, MmBlob}
    // uniform gray: every sample equals the mean — strict > never
    // fires, all 64 bits are 0
    val flat = phashOf(MmBlob(1L, fullBmp(16, 16, _ => 100.toByte))).get
    assert(flat.phash == "0" * 64 && flat.n_ones == 0)
    assert(flat.width == 16 && flat.height == 16)
    // top half bright (BMP rows are stored bottom-up: stored first
    // half = image BOTTOM): rows 0..7 of the stored grid are dark,
    // 8..15 bright → 32 ones in the stored-order hash
    val stride = (16 * 3 + 3) / 4 * 4
    val split = phashOf(MmBlob(2L, fullBmp(16, 16,
      i => if (i / stride < 8) 10.toByte else 200.toByte))).get
    assert(split.n_ones == 32, s"got ${split.n_ones}")
    assert(split.phash.take(32) == "0" * 32 && split.phash.drop(32) == "1" * 32)
    // identical pixels ⇒ identical hash; brightness shift preserved
    val again = phashOf(MmBlob(3L, fullBmp(16, 16,
      i => if (i / stride < 8) 10.toByte else 200.toByte))).get
    assert(again.phash == split.phash)
  }

  test("mm_phash groups: rep_id is the min doc of each hash bucket at sf0.001") {
    val rows = Multimodal.mmPhash(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byHash = rows.groupBy(_.getString(3))
    byHash.foreach { case (_, rs) =>
      val ids = rs.map(_.getLong(0))
      rs.foreach { r =>
        assert(r.getLong(5) == ids.min, s"rep mismatch: $r")
        assert(r.getLong(6) == ids.length.toLong)
        assert(r.getInt(4) == r.getString(3).count(_ == '1'))
      }
    }
  }

  test("mm_neardup: planted fixture hits exactly the hamming<=3 pairs") {
    import spark.implicits._
    val base = ("01" * 32).toCharArray
    def flip(bits: Int*): String = {
      val c = base.clone(); bits.foreach(b => c(b) = if (c(b) == '0') '1' else '0')
      new String(c)
    }
    // 1: base; 2: d=1; 3: d=3 (spread over three bands); 4: d=4 (one
    // per band — shares NO band with base, correctly absent even
    // though pigeonhole can't see it); 5: exact dup of base;
    // 6: d=2 vs base => d=3 vs doc 2's flipped bit? keep simple: far hash
    val ph = Seq(
      (1L, new String(base)), (2L, flip(5)), (3L, flip(0, 17, 40)),
      (4L, flip(3, 19, 35, 51)), (5L, new String(base)),
      (6L, flip((0 until 16): _*))).toDF("doc_id", "phash")
    val got = Multimodal.neardupCore(ph)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force truth over all pairs
    val rows = Seq((1L, new String(base)), (2L, flip(5)),
      (3L, flip(0, 17, 40)), (4L, flip(3, 19, 35, 51)),
      (5L, new String(base)), (6L, flip((0 until 16): _*)))
    val want = (for {
      (a, pa) <- rows; (b, pb) <- rows if a < b
      d = pa.zip(pb).count { case (x, y) => x != y } if d <= 3
    } yield (a, b, d)).toSet
    assert(want.contains((1L, 2L, 1)) && want.contains((1L, 5L, 0)) &&
      want.contains((1L, 3L, 3)))
    assert(!want.exists(p => p._1 == 4L || p._2 == 4L))
    assert(got == want, s"got $got want $want")
  }

  test("mm_neardup corpus: complete vs all-pairs hamming<=3 over mm_phash at sf0.001") {
    val hashes = Multimodal.mmPhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val want = (for {
      (a, pa) <- hashes; (b, pb) <- hashes if a < b
      d = pa.zip(pb).count { case (x, y) => x != y } if d <= 3
    } yield (a, b, d)).toSet
    val got = Multimodal.mmNeardup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
    assert(got.nonEmpty, "corpus must produce at least the exact-dup pairs")
  }
}
