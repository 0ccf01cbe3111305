package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2F — multimodal columns: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata beside them. The test
  * corpus has no real media, so the blob is derived
  * (`cast(text as binary)`) and the *decode* step is a clearly-marked
  * deterministic stub — but everything Spark-side is real: the binary
  * schema, the per-partition batch shape, the typed output rows, and
  * the fact that only metadata (not blobs) crosses any shuffle.
  *
  * Scale notes: blobs never enter a join/groupBy key; metadata
  * extraction is per-row scan work; decode runs `mapPartitions` so a
  * real codec would amortize init per partition (the same batch
  * contract as `mapInPandas` in PySpark). Frame sampling is pure
  * column algebra — no UDF at all.
  */
object Multimodal {

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  final case class MmBlob(doc_id: Long, content: Array[Byte])
  final case class Decoded(doc_id: Long, width: Int, height: Int,
      channels: Int, mean_byte: Double, ok: Boolean)

  /** The decode stub. A production build swaps this for a real codec
    * (e.g. javax.imageio / ffmpeg via JNI) initialized once per
    * partition; the container has no media libraries, so this fake
    * derives deterministic "dimensions" from header bytes. STUB —
    * the values are fabricated; the batch contract is the product. */
  private[multimodal] def decodeStub(b: MmBlob): Decoded = {
    val bytes = b.content
    if (bytes.isEmpty) Decoded(b.doc_id, 0, 0, 0, 0.0, ok = false)
    else {
      val w = 1 + (bytes(0) & 0x3F)
      val h = 1 + (bytes(math.min(1, bytes.length - 1)) & 0x3F)
      val c = 1 + (bytes(math.min(2, bytes.length - 1)) & 0x03)
      var sum = 0L
      bytes.foreach(x => sum += (x & 0xFF))
      Decoded(b.doc_id, w, h, c, sum.toDouble / bytes.length, ok = true)
    }
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

  /** F2: decode / feature-extract via `mapPartitions` — the batch
    * shape a real codec needs (init once per partition, stream the
    * blobs through). Output is a typed Dataset[Decoded]. */
  def mmDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds: Dataset[MmBlob] = blobs(spark, dir).as[MmBlob]
    ds.mapPartitions { it =>
        // real codec handle would be created HERE, once per partition
        it.map(decodeStub)
      }
      .toDF()
      .select(col("doc_id"), col("width"), col("height"), col("channels"),
        round(col("mean_byte"), 4).as("mean_byte"), col("ok"))
      .orderBy(col("doc_id"))
  }

  /** F3: every-4th 16-byte block ("frame") sampled from the blob —
    * pure column algebra (sequence + dynamic substr + hex), no UDF:
    * frame extraction stays inside whole-stage codegen. */
  def mmFramesample(spark: SparkSession, dir: String): DataFrame = {
    // Spark's sequence(1, 0) throws (illegal when start > stop with a
    // positive step) where DuckDB's range(1, 1, 64) is just empty —
    // drop empty blobs up front; the oracle drops them via unnest.
    val b = blobs(spark, dir).filter(length(col("content")) > 0)
    b.select(col("doc_id"),
        posexplode(
          transform(
            sequence(lit(1), length(col("content")), lit(64)),
            p => hex(col("content").substr(p, lit(16)))))
          .as(Seq("frame_idx", "frame_hex")))
      .orderBy(col("doc_id"), col("frame_idx"))
  }
}
