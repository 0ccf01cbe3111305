package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2F — multimodal columns: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata beside them. The test
  * corpus has no real media, so the blob is derived
  * (`cast(text as binary)`); the decode step parses real PNG/BMP
  * container headers from the bytes (dimensions need no codec), and
  * the resize step really resamples pixels for BOTH image formats:
  * 24-bit uncompressed BMP (nearest-neighbor is integer indexing)
  * and 8-bit truecolor PNG via a real decoder ([[pngPixels]]: chunk
  * walk with CRC validation, zlib inflate of the IDAT stream, and
  * all five scanline filters). Only genuinely codec-bound payloads
  * (MP4 video, paletted/compressed BMP, interlaced or non-truecolor
  * PNG) keep a documented stub digest. Everything Spark-side is
  * real: the binary schema, the per-partition batch shape, the typed
  * output rows, and the fact that only metadata (not blobs) crosses
  * any shuffle.
  *
  * Scale notes: blobs never enter a join/groupBy key; metadata
  * extraction is per-row scan work; decode runs `mapPartitions` so a
  * real codec would amortize init per partition (the same batch
  * contract as `mapInPandas` in PySpark). Frame sampling is pure
  * column algebra — no UDF at all.
  */
object Multimodal {

  /** Default longest-side bound for [[mmResize]]. */
  val ResizeMaxSide = 256

  /** Longest-side bound used by the ORACLE entry ([[mmResizeQuery]]) —
    * single-sourced into the DuckDB oracle (Oracles.scala) like
    * SubstrK/PackBudget/AnomalySpikeZ, so changing it here cannot
    * silently desync the hash gate. Small (16) on purpose: the
    * synthesized corpus keeps dims ≤ 40×32 so its BMP pixel arrays
    * are real (stride·h bytes actually present) and the DuckDB twin
    * can re-derive every output pixel; 16 < min(40,32) makes the
    * downscale, no-upscale, and clamp-to-1 paths all fire on real
    * data. */
  val ResizeOracleMaxSide = 16

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  final case class MmBlob(doc_id: Long, content: Array[Byte])
  final case class Decoded(doc_id: Long, format: String,
      width: Option[Int], height: Option[Int], bit_depth: Option[Int],
      channels: Option[Int], sample_rate: Option[Int],
      timescale: Option[Int], duration_s: Option[Double],
      mean_byte: Double, ok: Boolean)

  private def beU32(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xFF) << 24) | ((a(off + 1) & 0xFF) << 16) |
      ((a(off + 2) & 0xFF) << 8) | (a(off + 3) & 0xFF)
  private def beU64(a: Array[Byte], off: Int): Long =
    ((beU32(a, off).toLong & 0xFFFFFFFFL) << 32) |
      (beU32(a, off + 4).toLong & 0xFFFFFFFFL)
  private def leS32(a: Array[Byte], off: Int): Int =
    ((a(off + 3) & 0xFF) << 24) | ((a(off + 2) & 0xFF) << 16) |
      ((a(off + 1) & 0xFF) << 8) | (a(off) & 0xFF)
  private def leU16(a: Array[Byte], off: Int): Int =
    ((a(off + 1) & 0xFF) << 8) | (a(off) & 0xFF)

  private val PngMagic =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** MP4 A/V metadata: walk the top-level box sequence to `moov`,
    * then its children to `mvhd`, and read (timescale, duration
    * ticks) — version 0 (32-bit fields) and version 1 (64-bit
    * creation/modification/duration) layouts both handled. Every box
    * is validated before use (header fits, size ≥ 8, body fits), so
    * truncated or corrupt streams degrade to None instead of reading
    * garbage offsets. ISO/IEC 14496-12 box grammar; same byte-offset
    * idiom as the other container parses. */
  private[multimodal] def mvhdInfo(a: Array[Byte]): Option[(Int, Long)] = {
    def boxes(from: Int, until: Int): Iterator[(Int, String, Int)] =
      Iterator.unfold(from) { off =>
        if (off + 8 > until) None
        else {
          val size = beU32(a, off)
          if (size < 8 || off + size > until) None
          else Some(((off, new String(a, off + 4, 4, "US-ASCII"), size),
            off + size))
        }
      }
    for {
      (moff, _, msize) <- boxes(0, a.length).find(_._2 == "moov")
      (coff, _, csize) <- boxes(moff + 8, moff + msize).find(_._2 == "mvhd")
      // a size-8 "mvhd" ending flush with the blob has no version
      // byte — guard before reading or a truncated file would throw
      // instead of degrading to None
      if csize >= 9
      v = a(coff + 8) & 0xFF
      info <-
        if (v == 0 && csize >= 28)
          Some((beU32(a, coff + 20), beU32(a, coff + 24).toLong & 0xFFFFFFFFL))
        else if (v == 1 && csize >= 40)
          Some((beU32(a, coff + 28), beU64(a, coff + 32)))
        else None
    } yield info
  }

  /** Hard ceiling on a decoded PNG pixel array (64 MiB): an inflate
    * target is allocated from header-claimed dims, so a hostile IHDR
    * must not be able to demand an arbitrary allocation. */
  private val PngMaxPixelBytes: Long = 1L << 26

  /** REAL PNG pixel decode for the 8-bit truecolor profile (bit depth
    * 8, color type 2, no interlace) — the profile [[encodePng]]
    * writes and by far the most common wire form for photos:
    *  - chunk walk with per-chunk CRC32 validation (type+data, ISO
    *    3309 — the same polynomial `java.util.zip.CRC32` implements);
    *  - zlib inflate of the concatenated IDAT stream
    *    (`java.util.zip.Inflater`), output bounded to exactly
    *    h·(1+w·3) bytes so a zip-bomb stream cannot expand past the
    *    header-claimed geometry;
    *  - scanline defiltering, all five filter types (None/Sub/Up/
    *    Average/Paeth, RFC 2083 §6) at bpp=3.
    * Returns the packed w·h·3 RGB array in row order. Anything
    * outside the profile — paletted, 16-bit, interlaced, truncated,
    * CRC-corrupt, over-size, non-contiguous IDAT chunks, surplus
    * deflate output or unconsumed compressed bytes beyond the
    * header-claimed geometry, or trailing bytes after IEND — degrades
    * to None and the caller stubs; no partial reads, no exceptions
    * escape. */
  private[multimodal] def pngPixels(a: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (a.length < 20 || !(0 until 8).forall(i => a(i) == PngMagic(i)))
      return None
    var off = 8
    var w = 0; var h = 0
    var seenIhdr = false; var ended = false
    // PNG spec (RFC 2083 §4.1.3): IDAT chunks must be consecutive —
    // once the run is broken by any other chunk, a later IDAT is a
    // structural error, not data to splice in.
    var inIdat = false; var idatClosed = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32
    while (!ended) {
      if (off + 12 > a.length) return None // truncated chunk header
      val len = beU32(a, off)
      if (len < 0 || off + 12L + len > a.length) return None
      crc.reset(); crc.update(a, off + 4, 4 + len)
      if (crc.getValue != (beU32(a, off + 8 + len).toLong & 0xFFFFFFFFL))
        return None // corrupt chunk
      new String(a, off + 4, 4, "US-ASCII") match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          w = beU32(a, off + 8); h = beU32(a, off + 12)
          val depth = a(off + 16) & 0xFF; val color = a(off + 17) & 0xFF
          val comp = a(off + 18) & 0xFF; val filt = a(off + 19) & 0xFF
          val inter = a(off + 20) & 0xFF
          if (depth != 8 || color != 2 || comp != 0 || filt != 0 ||
              inter != 0 || w <= 0 || h <= 0 ||
              w.toLong * h * 3 > PngMaxPixelBytes) return None
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr || idatClosed) return None
          inIdat = true; idat.write(a, off + 8, len)
        case "IEND" =>
          if (len != 0) return None
          ended = true
        case _ => // ancillary chunks (tEXt, pHYs, …) skipped
          if (inIdat) idatClosed = true
      }
      off += 12 + len
    }
    if (!seenIhdr) return None
    if (off != a.length) return None // trailing bytes after IEND
    // Inflate the filtered scanlines: exactly h rows of 1 filter byte
    // + w·3 samples. Anything short (truncated stream) or a malformed
    // deflate stream → None.
    val rb = w * 3
    val raw = new Array[Byte](h * (rb + 1))
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var n = 0
      while (n < raw.length && !inf.finished()) {
        val k = inf.inflate(raw, n, raw.length - n)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        n += k
      }
      if (n < raw.length) return None
      // "exactly h·(1+w·3) bytes" means exactly: one probe inflate
      // must yield no surplus pixels, leave the stream finished (the
      // probe consumes the zlib trailer if the last data call didn't),
      // and leave no unconsumed compressed bytes after it.
      val probe = new Array[Byte](1)
      if (inf.inflate(probe, 0, 1) != 0) return None
      if (!inf.finished() || inf.getRemaining != 0) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // Defilter in place-ish: each row's predictor reads the already-
    // reconstructed previous row / left pixel (bpp = 3).
    val out = new Array[Byte](h * rb)
    var y = 0
    while (y < h) {
      val ft = raw(y * (rb + 1)) & 0xFF
      if (ft > 4) return None
      val src = y * (rb + 1) + 1
      val dst = y * rb
      var x = 0
      while (x < rb) {
        val cur = raw(src + x) & 0xFF
        val left = if (x >= 3) out(dst + x - 3) & 0xFF else 0
        val up = if (y > 0) out(dst - rb + x) & 0xFF else 0
        val ul = if (y > 0 && x >= 3) out(dst - rb + x - 3) & 0xFF else 0
        val rec = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case _ => // Paeth
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else ul)
        }
        out(dst + x) = rec.toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** PNG encoder for the same profile [[pngPixels]] decodes — used by
    * the synthesized oracle corpus ([[mmResizeQuery]]) and the specs,
    * NOT by the operator itself. Per-row filter type cycles through
    * all five ((seed+y) mod 5) so a decode bug in any filter breaks
    * the hash gate, and chunk CRCs are real so the decoder's CRC
    * validation must pass on the honest path. */
  private[multimodal] def encodePng(w: Int, h: Int, rgb: Array[Byte],
      seed: Long): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    val rb = w * 3
    val raw = new Array[Byte](h * (rb + 1))
    var y = 0
    while (y < h) {
      val ft = java.lang.Math.floorMod(seed + y, 5L).toInt
      raw(y * (rb + 1)) = ft.toByte
      val src = y * rb
      val dst = y * (rb + 1) + 1
      var x = 0
      while (x < rb) {
        val cur = rgb(src + x) & 0xFF
        val left = if (x >= 3) rgb(src + x - 3) & 0xFF else 0
        val up = if (y > 0) rgb(src - rb + x) & 0xFF else 0
        val ul = if (y > 0 && x >= 3) rgb(src - rb + x - 3) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case _ =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(dst + x) = (cur - pred).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    val zdat = try {
      defl.setInput(raw); defl.finish()
      val buf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val chunk = new Array[Byte](8192)
      while (!defl.finished()) buf.write(chunk, 0, defl.deflate(chunk))
      buf.toByteArray
    } finally defl.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + data.length)
      b.putInt(data.length)
      b.put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(b.array(), 4, 4 + data.length)
      b.putInt(crc.getValue.toInt)
      b.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte) // bit depth 8, truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    PngMagic ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zdat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Real container-header decode across the three modalities — no
    * codec library needed for container metadata:
    *  - PNG: big-endian IHDR (magic at 0, width/height/bit-depth at
    *    16/20/24);
    *  - BMP: little-endian BITMAPINFOHEADER (`BM` at 0, reserved
    *    zeros at 6–9, width/height/bpp at 18/22/28);
    *  - WAV: RIFF/WAVE/`fmt ` chunk (channels/sample-rate/bits at
    *    22/24/34, little-endian); the fmt-chunk size (16/18/40) is
    *    part of detection — its NUL high bytes mean ASCII text can
    *    never false-match;
    *  - MP4: `ftyp` box at 4 with a sane big-endian box size at 0
    *    (again NUL-guarded); A/V metadata comes from walking the
    *    top-level boxes to `moov`/`mvhd` ([[mvhdInfo]]) — timescale
    *    and duration_s when present, detection-only otherwise
    *    (fragmented/streaming files keep null duration).
    * Unknown magic → ok=false with null fields — pixel/sample
    * decoding (which WOULD need a codec) stays out of scope;
    * `mean_byte` summarizes the payload instead. The DuckDB oracle
    * performs the same parse in hex-string space, so mm_decode is
    * hash-gated end to end. */
  private[multimodal] def decodeHeader(b: MmBlob): Decoded = {
    val a = b.content
    val mean =
      if (a.isEmpty) 0.0
      else {
        var sum = 0L // exact integer sum — matches the oracle's fold
        a.foreach(x => sum += (x & 0xFF))
        sum.toDouble / a.length
      }
    def ascii(off: Int, s: String): Boolean =
      s.indices.forall(i => a(off + i) == s.charAt(i).toByte)
    val isPng = a.length >= 26 &&
      (0 until 8).forall(i => a(i) == PngMagic(i)) && ascii(12, "IHDR")
    val isBmp = !isPng && a.length >= 30 &&
      ascii(0, "BM") && (6 until 10).forall(a(_) == 0)
    val isWav = !isPng && !isBmp && a.length >= 36 &&
      ascii(0, "RIFF") && ascii(8, "WAVE") && ascii(12, "fmt ") &&
      Set(16, 18, 40).contains(leS32(a, 16))
    val isMp4 = !isPng && !isBmp && !isWav && a.length >= 12 && {
      val box = beU32(a, 0)
      ascii(4, "ftyp") && box >= 12 && box <= 64
    }
    if (isPng)
      Decoded(b.doc_id, "png", Some(beU32(a, 16)), Some(beU32(a, 20)),
        Some(a(24) & 0xFF), None, None, None, None, mean, ok = true)
    else if (isBmp)
      Decoded(b.doc_id, "bmp", Some(leS32(a, 18)), Some(leS32(a, 22)),
        Some(leU16(a, 28)), None, None, None, None, mean, ok = true)
    else if (isWav)
      Decoded(b.doc_id, "wav", None, None, Some(leU16(a, 34)),
        Some(leU16(a, 22)), Some(leS32(a, 24)), None, None, mean,
        ok = true)
    else if (isMp4) {
      val mv = mvhdInfo(a)
      Decoded(b.doc_id, "mp4", None, None, None, None, None,
        timescale = mv.map(_._1),
        duration_s = mv.collect {
          case (ts, dur) if ts > 0 => dur.toDouble / ts
        },
        mean, ok = true)
    } else Decoded(b.doc_id, "unknown", None, None, None, None, None,
      None, None, mean, ok = false)
  }

  /** Blob view of documents: (doc_id, content binary). */
  def blobs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("content"))

  /** F1: typed metadata over the opaque binary — byte length, 4-byte
    * magic, md5 checksum. Pure codegen'd builtins. */
  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    blobs(spark, dir).select(
        col("doc_id"),
        length(col("content")).as("n_bytes"),
        hex(substring(col("content"), 1, 4)).as("magic_hex"),
        md5(col("content")).as("checksum"))
      .orderBy(col("doc_id"))

  /** F2: header decode / feature-extract via `mapPartitions` — the
    * batch shape a *pixel* codec needs (init once per partition,
    * stream the blobs through); the header parse itself is real
    * ([[decodeHeader]]). Output is a typed Dataset[Decoded]. */
  def mmDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds: Dataset[MmBlob] = blobs(spark, dir).as[MmBlob]
    ds.mapPartitions { it =>
        // a pixel-codec handle would be created HERE, once per partition
        it.map(decodeHeader)
      }
      .toDF()
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("bit_depth"), col("channels"), col("sample_rate"),
        col("timescale"), round(col("duration_s"), 4).as("duration_s"),
        round(col("mean_byte"), 4).as("mean_byte"), col("ok"))
      .orderBy(col("doc_id"))
  }

  final case class Resized(doc_id: Long, width: Int, height: Int,
      target_w: Int, target_h: Int, resized_md5: String, resample: String)

  /** F4 core: resize for one image blob. REAL: the header parse
    * ([[decodeHeader]]), the aspect-preserving integral dims math
    * (long multiply before divide — no doubles, no overflow for any
    * s32 dims — floor, clamped to ≥ 1), and the pixel resample itself
    * for both image formats (`resample="nn"`, [[nnSample]]):
    *  - 24-bit uncompressed BMP whose full pixel array is present —
    *    nearest-neighbor over the stored rows, pure integer indexing;
    *  - 8-bit truecolor PNG — a REAL decode first ([[pngPixels]]:
    *    CRC-validated chunk walk, zlib inflate, all five scanline
    *    filters), then the same kernel over the packed RGB rows.
    * The output is the packed tw·th·3 byte array in stored row order
    * (BGR for BMP, RGB for PNG — no channel swap either side),
    * digested as md5 of its lowercase hex so a DuckDB oracle — whose
    * md5 only accepts VARCHAR — can re-derive it pixel for pixel.
    * STUBBED: payloads that genuinely need a codec library —
    * compressed/paletted BMPs, non-truecolor/interlaced/corrupt PNG,
    * MP4 — `resample="stub"`, digest md5(hex(content) ‖ "_tw_th"), a
    * deterministic function of exactly the codec's inputs. Non-image
    * blobs yield None (a real resize stage drops or routes them). */
  private val HexChars = "0123456789abcdef".toCharArray

  private def hexOf(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach { b =>
      sb.append(HexChars((b >> 4) & 0xF)).append(HexChars(b & 0xF))
    }
    sb.toString
  }

  /** Nearest-neighbor source index: floor(t·src/dst), exact in Long —
    * the same formula the DuckDB oracle runs as `(t * src) // dst`. */
  @inline private def nnIdx(t: Int, src: Int, dst: Int): Int =
    (t.toLong * src / dst).toInt

  /** The shared nearest-neighbor kernel: sample a w×h pixel grid
    * stored in `src` (3 bytes/pixel, rows of `rowBytes` starting at
    * `base` — BMP rows carry 4-byte-aligned stride padding, PNG rows
    * are packed) down to tw×th, returning the packed tw·th·3 output
    * array in ty,tx order. */
  private def nnSample(src: Array[Byte], base: Int, rowBytes: Int,
      w: Int, h: Int, tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th * 3)
    var ty = 0; var i = 0
    while (ty < th) {
      val rowOff = base + nnIdx(ty, h, th) * rowBytes
      var tx = 0
      while (tx < tw) {
        val s = rowOff + nnIdx(tx, w, tw) * 3
        out(i) = src(s); out(i + 1) = src(s + 1); out(i + 2) = src(s + 2)
        i += 3; tx += 1
      }
      ty += 1
    }
    out
  }

  private[multimodal] def resizeTo(maxSide: Int,
      md: java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5"))
      (b: MmBlob): Option[Resized] = {
    val d = decodeHeader(b)
    for {
      w <- d.width; h0 <- d.height
      // BMP height may legitimately be negative (top-down rows); the
      // pixel grid is |h| tall, so plan on the magnitude.
      h = math.abs(h0)
      if d.ok && w > 0 && h > 0
    } yield {
      val m = math.max(w, h)
      val (tw, th) =
        if (m <= maxSide) (w, h)
        else (math.max(1, (w.toLong * maxSide / m).toInt),
              math.max(1, (h.toLong * maxSide / m).toInt))
      val a = b.content
      // Real-resample eligibility: 24bpp, BI_RGB (compression 0 at
      // byte 30), pixel offset sane, and the WHOLE stride·h pixel
      // array inside the blob (all in Long — a hostile header cannot
      // overflow the bound check into a read past the array).
      val stride = (w.toLong * 3 + 3) / 4 * 4
      val pixOff = if (a.length >= 34) leS32(a, 10) else -1
      val isNN = d.format == "bmp" && d.bit_depth.contains(24) &&
        a.length >= 54 && leS32(a, 30) == 0 && pixOff >= 54 &&
        pixOff + stride * h <= a.length
      // PNG real path: full pixel decode (inflate + defilter). The
      // decoder re-reads dims from IHDR; they equal (w, h) whenever it
      // succeeds (same header bytes), so the planned tw/th stay valid.
      val pngPx: Option[Array[Byte]] =
        if (d.format == "png") pngPixels(a).map(_._3) else None
      md.reset()
      if (isNN || pngPx.isDefined) {
        val out = pngPx match {
          case Some(px) => nnSample(px, 0, w * 3, w, h, tw, th)
          case None     => nnSample(a, pixOff, stride.toInt, w, h, tw, th)
        }
        md.update(hexOf(out).getBytes("UTF-8"))
        Resized(b.doc_id, w, h, tw, th, hexOf(md.digest()), "nn")
      } else {
        // Stub digest runs over hex(content): same determinism, same
        // inputs (bytes, tw, th), but reproducible by a DuckDB oracle
        // whose md5 only accepts VARCHAR.
        md.update(hexOf(a).getBytes("UTF-8"))
        md.update(s"_${tw}_${th}".getBytes("UTF-8"))
        Resized(b.doc_id, w, h, tw, th, hexOf(md.digest()), "stub")
      }
    }
  }

  /** F4: aspect-preserving resize over the blob column — the same
    * per-partition codec-batch shape as [[mmDecode]] (a real decoder
    * handle would be created once per partition). Spec-gated
    * (MultimodalSpec: exact dims on synthesized headers, clamp and
    * no-upscale edges, checksum determinism, no-shuffle plan) — the
    * corpus has no image rows, so a Verify entry would gate zero
    * rows; the synthesized-blob spec is the honest check. */
  def mmResize(spark: SparkSession, dir: String,
      maxSide: Int = ResizeMaxSide): DataFrame = {
    import spark.implicits._
    resizeCore(blobs(spark, dir).as[MmBlob], maxSide)
  }

  /** The shared resize stage: per-partition codec-batch shape over any
    * blob frame. */
  private def resizeCore(ds: Dataset[MmBlob], maxSide: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
        // codec handle (and the digest for the stub) created once per
        // partition, not per row
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap(resizeTo(maxSide, md))
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  final case class SynthImg(doc_id: Long, kind: String, w: Int, h: Int,
      px_hex: String, content: Array[Byte])

  /** F4 oracle-gated entry: the corpus ships no image rows, so this
    * query synthesizes a deterministic image corpus FROM the documents
    * table and runs the REAL [[resizeCore]] over it:
    *  - BMP rows (the majority) are WELL-FORMED 24-bit uncompressed
    *    bitmaps — full 14+40-byte header (file size, pixel offset 54,
    *    BI_RGB) and a pixel array of exactly stride·h bytes built by
    *    cycling the doc's text bytes (‖ 0x00) — so the operator's
    *    nearest-neighbor path runs over REAL pixels and the digest is
    *    the md5 of the actually-resampled byte array;
    *  - PNG rows are FULL REAL PNGs: the packed w·h·3 pixel array
    *    comes from the same text-cycling rule (no stride), then
    *    [[encodePng]] wraps it — per-row filters cycling all five
    *    types, a real zlib IDAT stream, real chunk CRCs — so the
    *    operator must actually inflate, CRC-check, and defilter to
    *    recover the pixels. The DuckDB twin re-derives the expected
    *    pixels straight from the construction rule in hex space; it
    *    never needs zlib, which is exactly what makes a compressed
    *    format oracle-able;
    *  - ~1/5 of BMPs are top-down (negative height, two's-complement
    *    LE) and ~1/11 of docs stay raw non-image bytes (dropped).
    * Dims are ≤ 40×32 and the bound is [[ResizeOracleMaxSide]] (16),
    * so downscale, no-upscale, and clamp-to-1 all fire, and the
    * DuckDB twin can re-derive every output pixel in hex space.
    * Construction is codegen'd builtins (hex/lpad/repeat/unhex) for
    * the headers plus one per-partition map for the PNG encode. */
  def mmResizeQuery(spark: SparkSession, dir: String,
      maxSide: Int = ResizeOracleMaxSide): DataFrame =
    resizeCore(synthImageBlobs(spark, dir), maxSide)

  /** The synthesized image corpus of [[mmResizeQuery]] (and
    * [[mmPhash]]): deterministic well-formed BMP/PNG blobs derived
    * from the documents table by the construction rule both DuckDB
    * twins re-derive in hex space. */
  private[multimodal] def synthImageBlobs(spark: SparkSession,
      dir: String): Dataset[MmBlob] = {
    import spark.implicits._
    def le32(v: String): String =
      s"concat(lpad(hex(($v) % 256), 2, '0'), " +
        s"lpad(hex((($v) div 256) % 256), 2, '0'), " +
        s"lpad(hex((($v) div 65536) % 256), 2, '0'), " +
        s"lpad(hex((($v) div 16777216) % 256), 2, '0'))"
    val imgs = Tables(spark, dir).documents
      .selectExpr("doc_id", "text",
        "1 + (doc_id * 7) % 40 AS w",
        "1 + (doc_id * 13) % 32 AS h",
        "CASE WHEN doc_id % 11 = 0 THEN 'raw' " +
          "WHEN doc_id % 3 = 0 THEN 'png' ELSE 'bmp' END AS kind")
      // top-down BMPs store a negative height: two's-complement LE;
      // stride = rows padded to 4-byte boundaries (24bpp)
      .selectExpr("doc_id", "text", "w", "h", "kind",
        "CASE WHEN doc_id % 5 = 0 THEN 4294967296 - h ELSE h END AS hbmp",
        "((w * 3 + 3) div 4) * 4 AS stride")
      // the pixel array: text bytes (‖ 0x00 so empty text still
      // cycles) repeated and truncated — stride·h bytes for BMP,
      // packed w·h·3 for PNG
      .selectExpr("doc_id", "text", "w", "h", "kind", "hbmp", "stride",
        "concat(hex(cast(text AS binary)), '00') AS p2")
      .selectExpr("doc_id", "text", "w", "h", "kind", "hbmp", "stride",
        "CASE WHEN kind = 'bmp' THEN substring(" +
          "repeat(p2, cast((stride * h * 2 + length(p2) - 1) div length(p2) AS int)), " +
          "1, cast(stride * h * 2 AS int)) " +
        "WHEN kind = 'png' THEN substring(" +
          "repeat(p2, cast((w * h * 6 + length(p2) - 1) div length(p2) AS int)), " +
          "1, cast(w * h * 6 AS int)) ELSE '' END AS px_hex")
      .selectExpr("doc_id", "kind", "cast(w AS int) AS w",
        "cast(h AS int) AS h", "px_hex",
        "CASE kind " +
          // BMP: 'BM', LE file size, reserved zeros, pixel offset 54,
          // DIB size 40, LE dims, 1 plane, 24 bpp, BI_RGB, LE image
          // size, 16 zero bytes (ppm/palette fields), then the pixels
          s"WHEN 'bmp' THEN unhex(concat('424D', ${le32("54 + stride * h")}, " +
          s"  '00000000', '36000000', '28000000', " +
          s"  ${le32("w")}, ${le32("hbmp")}, '01001800', '00000000', " +
          s"  ${le32("stride * h")}, repeat('00', 16), px_hex)) " +
          // raw rows keep their plain text bytes — realistic
          // non-image payloads the routing must drop
          "WHEN 'raw' THEN cast(text AS binary) " +
          "ELSE cast(null AS binary) END AS content")
    imgs.as[SynthImg].mapPartitions { it =>
      it.map { r =>
        if (r.kind == "png")
          MmBlob(r.doc_id, encodePng(r.w, r.h, unhexBytes(r.px_hex), r.doc_id))
        else MmBlob(r.doc_id, r.content)
      }
    }
  }

  /** Average-hash grid side: 8×8 = 64 bits. */
  val PhashSide = 8

  /** One image's average-hash row. */
  final case class Phashed(doc_id: Long, width: Int, height: Int,
    phash: String, n_ones: Int)

  /** The per-blob decode→8×8 NN downsample→average-hash kernel:
    * gray(i) = r+g+b of the i-th grid sample (row-major), bit i set
    * iff gray(i)·64 > Σ gray — pure integer algebra on REAL decoded
    * pixels (same decode eligibility as [[resizeTo]]; ineligible or
    * non-image blobs drop). The hash is emitted as a 64-char '0'/'1'
    * string: exactly comparable cross-engine, no sign-bit contract. */
  private[multimodal] def phashOf(b: MmBlob): Option[Phashed] = {
    val d = decodeHeader(b)
    val out = for {
      w <- d.width; h0 <- d.height
      h = math.abs(h0)
      if d.ok && w > 0 && h > 0
    } yield {
      val a = b.content
      val stride = (w.toLong * 3 + 3) / 4 * 4
      val pixOff = if (a.length >= 34) leS32(a, 10) else -1
      val isNN = d.format == "bmp" && d.bit_depth.contains(24) &&
        a.length >= 54 && leS32(a, 30) == 0 && pixOff >= 54 &&
        pixOff + stride * h <= a.length
      val pngPx: Option[Array[Byte]] =
        if (d.format == "png") pngPixels(a).map(_._3) else None
      if (isNN || pngPx.isDefined) {
        val s = PhashSide
        val grid = pngPx match {
          case Some(px) => nnSample(px, 0, w * 3, w, h, s, s)
          case None     => nnSample(a, pixOff, stride.toInt, w, h, s, s)
        }
        val grays = Array.tabulate(s * s) { i =>
          (grid(3 * i) & 0xFF) + (grid(3 * i + 1) & 0xFF) +
            (grid(3 * i + 2) & 0xFF)
        }
        val total = grays.foldLeft(0L)(_ + _)
        val bits = grays.map(g => if (g.toLong * (s * s) > total) '1' else '0')
        Some(Phashed(b.doc_id, w, h, new String(bits),
          bits.count(_ == '1')))
      } else None
    }
    out.flatten
  }

  /** F5: perceptual image dedup — the average-hash (aHash) grouping
    * pass an image-corpus pipeline runs before training (exact
    * byte-level dedup misses re-encodes; aHash buckets visually
    * identical frames): decode REAL pixels, 8×8 NN downsample,
    * 64-bit brightness hash, then duplicate groups by exact hash
    * with a canonical min-id representative.
    *
    * Scale shape: the decode+hash is the same per-partition
    * codec-batch map as mmDecode (no shuffle), and the grouping is
    * ONE exchange on the 64-bit hash — at 100 TB this is exact-dedup
    * on a derived key, the C1 shape. A hamming-≤k band join
    * (dedup_simhash's pigeonhole) is the documented near-dup dial;
    * the exact-bucket form IS the oracle gate. */
  def mmPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ph = synthImageBlobs(spark, dir)
      .mapPartitions(it => it.flatMap(phashOf))
      .toDF()
    val w = Window.partitionBy("phash")
    ph.withColumn("rep_id", min(col("doc_id")).over(w))
      .withColumn("grp_n", count(lit(1)).over(w))
      .select(col("doc_id"), col("width"), col("height"), col("phash"),
        col("n_ones"), col("rep_id"), col("grp_n"))
      .orderBy(col("doc_id"))
  }

  /** Difference-hash grid: 9 samples per row × 8 rows → 64
    * horizontal-gradient bits. */
  val DhashW = 9
  val DhashH = 8

  /** One image's difference-hash row. */
  final case class Dhashed(doc_id: Long, width: Int, height: Int,
    dhash: String, n_ones: Int)

  /** The per-blob decode→9×8 NN downsample→difference-hash kernel:
    * bit (y,x) set iff gray(y,x) < gray(y,x+1) — the horizontal
    * GRADIENT sign, invariant to the global brightness/contrast
    * shifts that move every average-hash ([[phashOf]]) bit through
    * the shared mean at once. Same decode eligibility as phashOf;
    * pure integer algebra on real decoded pixels; emitted as a
    * 64-char '0'/'1' string (no sign-bit contract). */
  private[multimodal] def dhashOf(b: MmBlob): Option[Dhashed] = {
    val d = decodeHeader(b)
    val out = for {
      w <- d.width; h0 <- d.height
      h = math.abs(h0)
      if d.ok && w > 0 && h > 0
    } yield {
      val a = b.content
      val stride = (w.toLong * 3 + 3) / 4 * 4
      val pixOff = if (a.length >= 34) leS32(a, 10) else -1
      val isNN = d.format == "bmp" && d.bit_depth.contains(24) &&
        a.length >= 54 && leS32(a, 30) == 0 && pixOff >= 54 &&
        pixOff + stride * h <= a.length
      val pngPx: Option[Array[Byte]] =
        if (d.format == "png") pngPixels(a).map(_._3) else None
      if (isNN || pngPx.isDefined) {
        val grid = pngPx match {
          case Some(px) => nnSample(px, 0, w * 3, w, h, DhashW, DhashH)
          case None => nnSample(a, pixOff, stride.toInt, w, h, DhashW, DhashH)
        }
        val grays = Array.tabulate(DhashW * DhashH) { i =>
          (grid(3 * i) & 0xFF) + (grid(3 * i + 1) & 0xFF) +
            (grid(3 * i + 2) & 0xFF)
        }
        val bits = new Array[Char]((DhashW - 1) * DhashH)
        var y = 0; var i = 0
        while (y < DhashH) {
          var x = 0
          while (x < DhashW - 1) {
            bits(i) =
              if (grays(y * DhashW + x) < grays(y * DhashW + x + 1)) '1'
              else '0'
            i += 1; x += 1
          }
          y += 1
        }
        Some(Dhashed(b.doc_id, w, h, new String(bits),
          bits.count(_ == '1')))
      } else None
    }
    out.flatten
  }

  /** F9: gradient-hash image dedup — [[mmPhash]]'s grouping pass on
    * the difference hash: catches the re-encode class the
    * average-hash misses (uniform brightness/contrast shifts flip
    * aHash bits en masse but leave every horizontal gradient sign
    * intact). Same scale shape as mm_phash: per-partition
    * decode+hash map (no shuffle), ONE exchange on the 64-bit hash
    * for the duplicate groups. */
  def mmDhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val dh = synthImageBlobs(spark, dir)
      .mapPartitions(it => it.flatMap(dhashOf))
      .toDF()
    val w = Window.partitionBy("dhash")
    dh.withColumn("rep_id", min(col("doc_id")).over(w))
      .withColumn("grp_n", count(lit(1)).over(w))
      .select(col("doc_id"), col("width"), col("height"), col("dhash"),
        col("n_ones"), col("rep_id"), col("grp_n"))
      .orderBy(col("doc_id"))
  }

  /** One image's channel-statistics row. */
  final case class ColorStats(doc_id: Long, width: Int, height: Int,
    n_px: Long, sum_c0: Long, sum_c1: Long, sum_c2: Long,
    min_gray: Int, max_gray: Int)

  /** The per-blob decode→full-pixel channel-sum kernel: integer sums
    * of each byte-position channel (c0/c1/c2 — the file's channel
    * order; the synthetic corpus has no semantic RGB/BGR contract)
    * over EVERY pixel, plus min/max of the per-pixel gray (c0+c1+c2).
    * Same decode eligibility as [[phashOf]]/[[dhashOf]]; BMP stride
    * padding bytes are skipped; orientation (top-down negative-h
    * BMPs) cannot matter — the sums are whole-image. */
  private[multimodal] def colorStatsOf(b: MmBlob): Option[ColorStats] = {
    val d = decodeHeader(b)
    val out = for {
      w <- d.width; h0 <- d.height
      h = math.abs(h0)
      if d.ok && w > 0 && h > 0
    } yield {
      val a = b.content
      val stride = (w.toLong * 3 + 3) / 4 * 4
      val pixOff = if (a.length >= 34) leS32(a, 10) else -1
      val isNN = d.format == "bmp" && d.bit_depth.contains(24) &&
        a.length >= 54 && leS32(a, 30) == 0 && pixOff >= 54 &&
        pixOff + stride * h <= a.length
      val pngPx: Option[Array[Byte]] =
        if (d.format == "png") pngPixels(a).map(_._3) else None
      if (isNN || pngPx.isDefined) {
        val (px, off, rowBytes) = pngPx match {
          case Some(p) => (p, 0, w * 3)
          case None    => (a, pixOff, stride.toInt)
        }
        var s0 = 0L; var s1 = 0L; var s2 = 0L
        var gMin = Int.MaxValue; var gMax = Int.MinValue
        var y = 0
        while (y < h) {
          var x = 0
          val base = off + y * rowBytes
          while (x < w) {
            val c0 = px(base + 3 * x) & 0xFF
            val c1 = px(base + 3 * x + 1) & 0xFF
            val c2 = px(base + 3 * x + 2) & 0xFF
            s0 += c0; s1 += c1; s2 += c2
            val g = c0 + c1 + c2
            if (g < gMin) gMin = g
            if (g > gMax) gMax = g
            x += 1
          }
          y += 1
        }
        Some(ColorStats(b.doc_id, w, h, w.toLong * h, s0, s1, s2,
          gMin, gMax))
      } else None
    }
    out.flatten
  }

  /** F10: per-image channel statistics — the datasheet pass an
    * image-corpus pipeline runs before training: per-channel means
    * and the gray dynamic range (min/max of c0+c1+c2, 0..765), the
    * signals that flag black/blank frames (range ≈ 0), washed-out
    * captures, and channel-dead sensors before any model sees them.
    *
    * Scale shape: same per-partition codec-batch map as mmDecode —
    * NO shuffle at all on the stats path (the per-doc row is final
    * at decode time); the only exchange is the output sort. All
    * sums integers; each mean is ONE bigint/bigint division,
    * mirrored ⇒ full hash gate (the DuckDB twin re-derives every
    * pixel byte in hex space, as mm_phash/mm_dhash do). */
  def mmColorstats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cs = synthImageBlobs(spark, dir)
      .mapPartitions(it => it.flatMap(colorStatsOf))
      .toDF()
    cs.select(col("doc_id"), col("width"), col("height"), col("n_px"),
        round(col("sum_c0") / col("n_px"), 4).as("mean_c0"),
        round(col("sum_c1") / col("n_px"), 4).as("mean_c1"),
        round(col("sum_c2") / col("n_px"), 4).as("mean_c2"),
        col("min_gray"), col("max_gray"))
      .orderBy(col("doc_id"))
  }

  final case class GrayHist(doc_id: Long, width: Int, height: Int,
    n_px: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** Per-image 4-bin gray histogram — the same decode eligibility and
    * pixel walk as [[colorStatsOf]], binning g = c0+c1+c2 ∈ [0,765]
    * into quarters (g·4 div 768, clamped — non-negative operands, so
    * truncating and flooring division agree cross-engine). */
  private[multimodal] def grayHistOf(b: MmBlob): Option[GrayHist] = {
    val d = decodeHeader(b)
    val out = for {
      w <- d.width; h0 <- d.height
      h = math.abs(h0)
      if d.ok && w > 0 && h > 0
    } yield {
      val a = b.content
      val stride = (w.toLong * 3 + 3) / 4 * 4
      val pixOff = if (a.length >= 34) leS32(a, 10) else -1
      val isNN = d.format == "bmp" && d.bit_depth.contains(24) &&
        a.length >= 54 && leS32(a, 30) == 0 && pixOff >= 54 &&
        pixOff + stride * h <= a.length
      val pngPx: Option[Array[Byte]] =
        if (d.format == "png") pngPixels(a).map(_._3) else None
      if (isNN || pngPx.isDefined) {
        val (px, off, rowBytes) = pngPx match {
          case Some(p) => (p, 0, w * 3)
          case None    => (a, pixOff, stride.toInt)
        }
        val bins = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          val base = off + y * rowBytes
          while (x < w) {
            val g = (px(base + 3 * x) & 0xFF) +
              (px(base + 3 * x + 1) & 0xFF) + (px(base + 3 * x + 2) & 0xFF)
            bins(math.min(3, g * 4 / 768)) += 1L
            x += 1
          }
          y += 1
        }
        Some(GrayHist(b.doc_id, w, h, w.toLong * h,
          bins(0), bins(1), bins(2), bins(3)))
      } else None
    }
    out.flatten
  }

  /** F11 (round 13): per-image gray-luminance histogram — the
    * exposure-profile read beside mm_colorstats' means: a mass spike
    * in b0/b3 flags under/over-exposed captures that a mean alone
    * averages away (a half-black half-white frame has a perfectly
    * centered mean and an empty middle). Same zero-shuffle
    * per-partition codec-batch shape as mm_decode — the per-doc row
    * is final at decode time; the only exchange is the output sort.
    * Pure integer binning ⇒ full hash gate (the DuckDB twin
    * re-derives every pixel byte in hex space, the mm_colorstats
    * precedent). */
  def mmHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    synthImageBlobs(spark, dir)
      .mapPartitions(it => it.flatMap(grayHistOf))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Hamming radius for [[mmNeardup]] — with 4 bands of 16 bits, the
    * pigeonhole guarantees every pair at distance ≤ 3 shares a band,
    * so the banded join is COMPLETE for this τ (not LSH-approximate).
    * Shared with the DuckDB oracle. */
  val NeardupHamTau = 3

  /** F8: perceptual image NEAR-dup pairs — the hamming-≤τ band join
    * that [[mmPhash]]'s doc names as the near-dup dial, closed into a
    * first-class query: catches re-encodes and minor edits whose
    * average-hash differs in a few bits, which the exact-bucket
    * grouping of mm_phash misses by construction. Same decode+hash
    * per-partition map (no shuffle), then [[graft.operators.Dedup]]'s
    * simhash pigeonhole verbatim in bit-string space: the 64-bit hash
    * splits into 4×16-bit bands (substring equality = band equality),
    * candidates are a plain equi-join on (band, value), and the exact
    * verify is integer `bit_count(xor)` over the banded words — all
    * codegen'd builtins. Unlike dedup_simhash (whose native 64-bit
    * hash has no SQL twin → rows-only [R]), the phash is re-derivable
    * in hex space, so this is the repo's first FULLY hash-gated
    * hamming near-dup operator.
    *
    * SCALE ROUTE: identical routing note to dedup_simhash — the
    * pigeonhole colludes ~n²/2¹⁶ candidate pairs regardless of
    * similarity, and phash bits are brightness-correlated, so
    * degenerate bands (all-dark/all-light images) form the heavy
    * buckets. The production dial is a band-frequency cut (the
    * shingle df≤50 precedent) that trades the τ≤3 completeness
    * guarantee for linear growth; the complete form IS the oracle
    * gate here, and the phash frame is persisted once feeding both
    * join sides (no double decode — the no-subtree-dedup rule). */
  def mmNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ph = synthImageBlobs(spark, dir)
      .mapPartitions(it => it.flatMap(phashOf))
      .toDF()
      .select(col("doc_id"), col("phash"))
    neardupCore(ph)
  }

  /** Core banded-hamming pair join over any (doc_id, phash) frame —
    * split out so the spec can drive planted bit-string fixtures. */
  private[multimodal] def neardupCore(phashed: DataFrame): DataFrame = {
    val words = (0 until 4).map(b =>
      conv(substring(col("phash"), 1 + 16 * b, 16), 2, 10)
        .cast("long").as(s"w$b"))
    val ph = phashed
      .select(col("doc_id") +: words: _*)
      .persist()
    val banded = ph.select(col("doc_id"), col("w0"), col("w1"),
      col("w2"), col("w3"),
      posexplode(array(col("w0"), col("w1"), col("w2"), col("w3")))
        .as(Seq("band", "bv")))
    val ham = (0 until 4).map(b =>
      bit_count(col(s"a.w$b").bitwiseXOR(col(s"b.w$b"))))
      .reduce(_ + _)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        ham.cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= NeardupHamTau)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private def unhexBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((Character.digit(s.charAt(i * 2), 16) << 4) |
        Character.digit(s.charAt(i * 2 + 1), 16)).toByte
      i += 1
    }
    out
  }

  /** F3: every-4th 16-byte block ("frame") sampled from the blob —
    * one native loop ([[graft.functions.FrameHex]]; the
    * sequence+transform HOF form ran its lambda interpreted per
    * frame, which matters once blobs are real media, not 1 KB text).
    * Empty blobs yield an empty frame array and drop at the explode,
    * matching the oracle's unnest. */
  def mmFramesample(spark: SparkSession, dir: String): DataFrame =
    blobs(spark, dir).select(col("doc_id"),
        posexplode(graft.functions.FrameHex(col("content"), 64, 16))
          .as(Seq("frame_idx", "frame_hex")))
      .orderBy(col("doc_id"), col("frame_idx"))

  // ----- F5: WAV sample-domain statistics --------------------------

  final case class WavStats(doc_id: Long, sample_rate: Int,
      n_samples: Int, sum_s: Long, min_s: Int, max_s: Int,
      sum_sq: Long, n_zero_cross: Int)

  /** Synthesized sample count / rate / value rules — doc_id and text
    * integer algebra, single-sourced into the oracle. The sample rule
    * mixes the cycled text byte with the position so repeated chars
    * still produce sign-varying PCM (zero crossings occur). */
  private def wavN(id: Long): Int = (1 + (id * 11) % 300).toInt
  private def wavRate(id: Long): Int = (8000 * (1 + id % 4)).toInt
  private def wavSample(b: Int, i: Int): Int =
    ((b * 167 + i * 31) % 32768) - 16384

  /** LE helpers for the synthesized container. */
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32b(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Build one REAL RIFF/WAVE/PCM16 file for a doc: canonical fmt
    * chunk, an optional junk LIST chunk BETWEEN fmt and data (1/3 of
    * files — a parser that assumes data at byte 36 instead of walking
    * chunks reads garbage and fails the hash gate), then the PCM16 LE
    * sample stream derived from the doc's cycled text bytes. */
  private[multimodal] def synthWav(id: Long, text: String): Array[Byte] = {
    val t = text + " " // never-empty cycle source (the px_hex trick)
    val n = wavN(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = wavSample(t.charAt(i % t.length).toInt, i)
      val v = s & 0xFFFF // two's-complement LE int16
      pcm(i * 2) = (v & 0xFF).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val rate = wavRate(id)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32b(16) ++
      le16(1) ++ le16(1) ++ le32b(rate) ++ le32b(rate * 2) ++
      le16(2) ++ le16(16)
    val junk =
      if (id % 3 == 1)
        "LIST".getBytes("US-ASCII") ++ le32b(6) ++
          "INFO".getBytes("US-ASCII") ++
          Array((id % 256).toByte, ((id * 3) % 256).toByte)
      else Array.emptyByteArray
    val data = "data".getBytes("US-ASCII") ++ le32b(n * 2) ++ pcm
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ junk ++ data
    "RIFF".getBytes("US-ASCII") ++ le32b(body.length) ++ body
  }

  /** Locate the mono PCM16 payload by WALKING the RIFF chunk list
    * (fmt then data, arbitrary chunks in between, even-byte padding
    * honored): (sample_rate, data offset, n_samples). Non-WAV or
    * malformed payloads yield None. Shared by the stats and silence
    * folds — one chunk-walk definition. */
  private def wavPcmLocate(a: Array[Byte]): Option[(Int, Int, Int)] = {
    if (a.length < 12 ||
        !(a(0) == 'R' && a(1) == 'I' && a(2) == 'F' && a(3) == 'F') ||
        !(a(8) == 'W' && a(9) == 'A' && a(10) == 'V' && a(11) == 'E'))
      return None
    var off = 12
    var rate = -1
    var bits = -1
    var channels = -1
    while (off + 8 <= a.length) {
      val id = new String(a, off, 4, "US-ASCII")
      val len = leS32(a, off + 4)
      if (len < 0 || off + 8 + len > a.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        channels = leU16(a, off + 10)
        rate = leS32(a, off + 12)
        bits = leU16(a, off + 22)
      } else if (id == "data") {
        if (rate < 0 || bits != 16 || channels != 1) return None
        val n = len / 2
        if (n == 0) return None
        return Some((rate, off + 8, n))
      }
      off += 8 + len + (len & 1) // chunks are even-byte aligned
    }
    None
  }

  /** PCM16 LE sample i at payload offset `base`. */
  @inline private def pcm16(a: Array[Byte], base: Int, i: Int): Int =
    ((a(base + i * 2 + 1) << 8) | (a(base + i * 2) & 0xFF)).toShort.toInt

  /** Fold the located PCM16 stream into exact integer statistics in
    * one pass. */
  private[multimodal] def wavStatsOf(b: MmBlob): Option[WavStats] =
    wavPcmLocate(b.content).map { case (rate, base, n) =>
      val a = b.content
      var sum = 0L
      var sumSq = 0L
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var zc = 0
      var prev = 0
      var i = 0
      while (i < n) {
        val s = pcm16(a, base, i)
        sum += s
        sumSq += s.toLong * s
        if (s < mn) mn = s
        if (s > mx) mx = s
        if (i > 0 && prev.toLong * s < 0) zc += 1
        prev = s
        i += 1
      }
      WavStats(b.doc_id, rate, n, sum, mn, mx, sumSq, zc)
    }

  // ----- F7: silence segmentation (VAD-lite) -----------------------

  final case class WavSilence(doc_id: Long, sample_rate: Int,
      n_samples: Int, n_silent: Long, n_runs: Int, max_run: Int)

  /** Amplitude floor: |s| < τ ⇒ silent (≈ −12 dBFS on int16;
    * single-sourced into the oracle). */
  val SilenceTau = 4096

  /** Run-length silence fold over the located PCM16 stream: total
    * silent samples, maximal-run count, longest run — one pass,
    * exact integers. */
  private[multimodal] def wavSilenceOf(b: MmBlob): Option[WavSilence] =
    wavPcmLocate(b.content).map { case (rate, base, n) =>
      val a = b.content
      var nSil = 0L
      var nRuns = 0
      var maxRun = 0
      var cur = 0
      var i = 0
      while (i < n) {
        val s = pcm16(a, base, i)
        if (math.abs(s) < SilenceTau) {
          if (cur == 0) nRuns += 1
          cur += 1
          nSil += 1L
          if (cur > maxRun) maxRun = cur
        } else cur = 0
        i += 1
      }
      WavSilence(b.doc_id, rate, n, nSil, nRuns, maxRun)
    }

  /** F7 oracle-gated entry: silence/activity segmentation — the
    * VAD-lite pass an audio-curation pipeline runs to drop dead air
    * and window speech (run lengths are the segment boundaries).
    * Same synthesized REAL-container corpus and router as
    * [[mmWavStats]] (junk chunks must be walked, raw-text rows
    * dropped); the run fold is gaps-and-islands over the signal,
    * done in the same one-pass decode. The DuckDB twin re-derives
    * the runs from the construction rule (position islands over the
    * per-sample comprehension), so the real parse must land on the
    * same integers: full hash gate. Map-only, zero shuffles before
    * the presentation sort. */
  def mmSilence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feed = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
    feed.mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val blob =
            if (id % 9 == 4) MmBlob(id, text.getBytes("UTF-8")) // raw
            else MmBlob(id, synthWav(id, text))
          wavSilenceOf(blob)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** F5 oracle-gated entry: sample-domain audio statistics — the
    * first F operator past container metadata into the decoded
    * payload itself. The corpus ships no audio rows, so the query
    * synthesizes a deterministic WAV corpus ([[synthWav]] — real
    * containers, 1/3 with a junk chunk the walker must skip, ~1/9 of
    * docs staying raw text the router must drop) and runs the
    * per-partition codec-batch stage over it: chunk walk → PCM16
    * decode → one-pass integer fold (n, Σs, min, max, Σs², zero
    * crossings). Everything is exact integer algebra derived from
    * (doc_id, text), so the DuckDB twin re-derives every statistic
    * straight from the construction rule — per-sample list
    * comprehension, never a WAV parser — and the operator's real
    * parse must land on the same numbers: full hash gate. Scale
    * shape: map-only over blobs, zero shuffles before the
    * presentation sort. */
  def mmWavStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feed = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
    feed.mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val blob =
            if (id % 9 == 4) MmBlob(id, text.getBytes("UTF-8")) // raw
            else MmBlob(id, synthWav(id, text))
          wavStatsOf(blob)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }
}
