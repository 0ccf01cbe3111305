package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {

  test("decode output schema is typed and stable") {
    val out = Multimodal.mmDecode(spark, sfDir)
    assert(out.schema === StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("mean_byte", DoubleType, nullable = true),
      StructField("ok", BooleanType, nullable = false))))
  }

  test("decode is deterministic and covers every doc") {
    val a = Multimodal.mmDecode(spark, sfDir).collect()
    val b = Multimodal.mmDecode(spark, sfDir).collect()
    assert(a.sameElements(b))
    val nDocs = graft.Tables(spark, sfDir).documents.count()
    assert(a.length.toLong === nDocs)
    assert(a.forall(_.getBoolean(5)), "all non-empty blobs decode ok")
    a.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 64)   // width
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 4)    // channels
      assert(r.getDouble(4) > 0 && r.getDouble(4) < 256)
    }
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

  test("blobs round-trip: binary content decodes back to the text") {
    val s = spark; import s.implicits._
    val row = Multimodal.blobs(spark, sfDir).as[Multimodal.MmBlob].head()
    val text = graft.Tables(spark, sfDir).documents
      .filter(col("doc_id") === row.doc_id).select("text").head().getString(0)
    assert(new String(row.content, "UTF-8") === text)
  }
}
