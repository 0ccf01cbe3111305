package graft.sources

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Contract of the offset-tracked replay log (the Kafka/NSQ-shaped
  * ingest double — reference mr/queue/backends/nsq_queue.py): the
  * two behaviors MemoryStream cannot exercise are (1) resuming from
  * a checkpointed offset after a full query restart (each record
  * seen exactly once across restarts) and (2) replaying the whole
  * log from offset 0 under a fresh checkpoint. */
class ReplayLogSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("append assigns contiguous global offsets across segments") {
    val dir = tmp("rlog")
    assert(ReplayLog.endOffset(dir) === 0L)
    assert(ReplayLog.append(dir, Seq("a", "b", "c")) === 3L)
    assert(ReplayLog.append(dir, Seq("d")) === 4L)
    assert(ReplayLog.append(dir, Seq("e", "f")) === 6L)
    assert(ReplayLog.endOffset(dir) === 6L)

    val got = spark.read.format("replaylog").load(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === Seq(0L -> "a", 1L -> "b", 2L -> "c", 3L -> "d",
      4L -> "e", 5L -> "f"))
  }

  test("restart on the same checkpoint resumes from the committed offset") {
    val dir = tmp("rlog")
    val cp = tmp("rlog-cp")
    val seen = mutable.ArrayBuffer.empty[(Long, Long, String)] // (batch, off, v)

    def run(): Unit = {
      val q = spark.readStream.format("replaylog").load(dir)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (df: DataFrame, id: Long) =>
          df.collect().foreach(r =>
            seen.synchronized {
              seen += ((id, r.getLong(0), r.getString(1))); ()
            })
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    ReplayLog.append(dir, Seq("m0", "m1"))
    run()
    assert(seen.map(t => (t._2, t._3)).sorted.toSeq ===
      Seq(0L -> "m0", 1L -> "m1"))

    // new records land while no query is running; the restarted query
    // must pick up at offset 2, not replay 0-1
    ReplayLog.append(dir, Seq("m2"))
    ReplayLog.append(dir, Seq("m3", "m4"))
    run()
    assert(seen.map(t => (t._2, t._3)).sorted.toSeq ===
      Seq(0L -> "m0", 1L -> "m1", 2L -> "m2", 3L -> "m3", 4L -> "m4"),
      s"expected exactly-once delivery across the restart, got $seen")
    assert(seen.map(_._2).distinct.size === seen.size,
      s"an offset was delivered twice: $seen")
  }

  test("a fresh checkpoint replays the whole log from offset 0") {
    val dir = tmp("rlog")
    ReplayLog.append(dir, Seq("x", "y"))
    ReplayLog.append(dir, Seq("z"))

    def drain(cp: String): Seq[(Long, String)] = {
      val seen = mutable.ArrayBuffer.empty[(Long, String)]
      val q = spark.readStream.format("replaylog").load(dir)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.collect().foreach(r =>
            seen.synchronized { seen += ((r.getLong(0), r.getString(1))); () })
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      seen.sorted.toSeq
    }

    val first = drain(tmp("rlog-cp1"))
    val second = drain(tmp("rlog-cp2"))
    assert(first === Seq(0L -> "x", 1L -> "y", 2L -> "z"))
    assert(second === first, "replay from scratch must be deterministic")
  }

  test("end-to-end exactly-once: replay source + idempotent sink across a " +
      "crash that re-delivers a batch") {
    val dir = tmp("rlog")
    val cp = tmp("rlog-cp")
    val out = tmp("rlog-out")

    def run(checkpoint: String): Unit = {
      val q = spark.readStream.format("replaylog").load(dir)
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (df: DataFrame, id: Long) =>
          Sinks.idempotentBatchWrite(df, id, out); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    ReplayLog.append(dir, Seq("a", "b"))
    run(cp)
    // CRASH SIMULATION: drop the last batch's commit marker — the
    // offsets/<n> file survives, so the restarted query re-EXECUTES
    // that batch (Structured Streaming's documented redelivery
    // window); foreachBatch hands the sink the same (df, id) twice.
    // The tampered checkpoint restarts under a COPIED path: a fresh
    // process would have no in-JVM metadata-log cache, but this
    // same-JVM test would otherwise trip Spark's
    // concurrent-checkpoint-use detection on the cached commit list.
    val commits = new java.io.File(s"$cp/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    assert(commits.last.delete())
    // drop the Hadoop checksum sibling too — a stale .crc makes the
    // local FS fail the redelivered commit's atomic rename
    val crc = new java.io.File(s"$cp/commits/.${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    val cp2 = tmp("rlog-cp2")
    import java.nio.file.{Files, Path, Paths}
    val (src, dst) = (Paths.get(cp), Paths.get(cp2))
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    ReplayLog.append(dir, Seq("c"))
    run(cp2)

    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(rows.toSeq === Seq(0L -> "a", 1L -> "b", 2L -> "c"),
      s"re-delivered batch must not duplicate rows: ${rows.toSeq}")

    // direct redelivery: a second publish of an already-published id
    // is a no-op and reports it did not write
    val dup = spark.range(5).selectExpr("id AS offset",
      "cast(id AS string) AS value")
    assert(!Sinks.idempotentBatchWrite(dup, 0L, out))
    assert(spark.read.parquet(out).count() === 3)
  }

  test("registry pipeline end-to-end: replay source -> stream_pii transform " +
      "-> idempotent sink, exactly-once across a crash redelivery") {
    // the full ingest path a production deploy runs — not a toy
    // projection: replaylog source feeding the REGISTRY transform
    // (stream_pii's detection+redaction core, TextQueries.piiScanOf)
    // into the idempotent parquet sink, with the same checkpoint
    // tamper as the exactly-once test above.
    import org.apache.spark.sql.functions.col
    val dir = tmp("rlog")
    val cp = tmp("rlog-cp")
    val out = tmp("rlog-out")

    val docs = Seq(
      "reach me at alice@example.com or 555-123-4567 today",
      "server 10.0.0.1 rotated; ping bob@test.org",
      "no pii in this one at all",
      "dual contact: c@d.io and 192.168.1.9")

    def pipeline(df: DataFrame): DataFrame =
      graft.functions.TextQueries.piiScanOf(
        df.select(col("offset").as("doc_id"), col("value").as("pii_text")))

    def run(checkpoint: String): Unit = {
      val q = spark.readStream.format("replaylog").load(dir)
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (df: DataFrame, id: Long) =>
          Sinks.idempotentBatchWrite(pipeline(df), id, out); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    ReplayLog.append(dir, docs.take(2))
    run(cp)
    // crash: drop the last commit marker (+ its .crc) so the batch is
    // re-delivered, restart from a copied checkpoint (same-JVM cache)
    val commits = new java.io.File(s"$cp/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    assert(commits.last.delete())
    val crc = new java.io.File(s"$cp/commits/.${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    val cp2 = tmp("rlog-cp2")
    import java.nio.file.{Files, Paths}
    val (src, dst) = (Paths.get(cp), Paths.get(cp2))
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    ReplayLog.append(dir, docs.drop(2))
    run(cp2)

    // exactly-once THROUGH the transform: output = the batch-side
    // piiScanOf over the full log, no duplicates, no gaps
    val batchSide = pipeline(spark.read.format("replaylog").load(dir))
    val expected = batchSide
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val got = spark.read.parquet(out)
      .select(batchSide.columns.map(col).toIndexedSeq: _*)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(got.length === docs.length,
      s"re-delivered batch must not duplicate transformed rows: ${got.length}")
    assert(got.toSeq === expected.toSeq)
    // and the transform actually fired: PII was detected and redacted
    val flags = spark.read.parquet(out)
      .select("doc_id", "has_pii").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(0L -> true, 1L -> true, 2L -> false, 3L -> true))
  }

  test("a micro-batch reads only its offset range, one partition per segment") {
    val stream = new ReplayLogMicroBatchStream("/nonexistent")
    val dir = tmp("rlog")
    ReplayLog.append(dir, Seq("a", "b", "c"))
    ReplayLog.append(dir, Seq("d", "e"))
    // range (1, 4] spans the tail of segment 0 and head of segment 1
    val parts = ReplayLogMicroBatchStream.partitionsFor(dir, 1L, 4L)
      .map(_.asInstanceOf[ReplayLogPartition])
    assert(parts.length === 2)
    assert(parts.map(p => (p.lo, p.hi)).toSeq === Seq((1L, 3L), (3L, 4L)))
    // offsets survive the slice: reader yields exactly records 1..3
    val factory = new ReplayLogReaderFactory
    val got = parts.flatMap { p =>
      val r = factory.createReader(p)
      val buf = mutable.ArrayBuffer.empty[(Long, String)]
      while (r.next()) {
        val row = r.get()
        buf += ((row.getLong(0), row.getUTF8String(1).toString))
      }
      buf
    }.sortBy(_._1)
    assert(got.toSeq === Seq(1L -> "b", 2L -> "c", 3L -> "d"))
    assert(stream.deserializeOffset("7") === ReplayLogOffset(7L))
  }
}
