package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY §2H — an offset-tracked, replayable ingest log: the
  * Kafka/NSQ-shaped streaming source MemoryStream cannot stand in for
  * (reference: mr/queue/backends/nsq_queue.py — jobs consume from a
  * durable topic and resume where they left off, not from a
  * same-process buffer). The log is an append-only directory of
  * segment files, each named by the global offset of its first record
  * (`%020d.log`, one UTF-8 line per record), so the absolute offset
  * of every record is reconstructible from the directory listing
  * alone — exactly a single-partition Kafka topic's contract.
  *
  * The Spark side is a full DataSourceV2 micro-batch source
  * (`spark.readStream.format("replaylog").load(dir)`): each batch is
  * the half-open offset range (start, latest]; offsets are serialized
  * into the query checkpoint, so a stopped query RESTARTED on the
  * same checkpoint resumes from its committed offset and sees each
  * record exactly once, while a fresh checkpoint replays the log from
  * offset 0 — the two behaviors that distinguish an offset-tracked
  * log from MemoryStream, both pinned in ReplayLogSpec. Scale shape:
  * a batch's work is bounded by its offset range, reads are
  * per-segment sequential scans (one InputPartition per touched
  * segment — segments read in parallel across executors), and the
  * driver never holds record data, only the (start, end) offsets.
  *
  * Output schema: (offset long, value string) — the payload stays an
  * opaque line; downstream queries parse/shape it (the G-section
  * twins all start from typed projections anyway).
  */
object ReplayLog {
  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  private def segName(startOffset: Long): String = f"$startOffset%020d.log"

  /** Append `records` as one new segment; returns the new end offset
    * (= total records ever appended). Single-writer by contract (the
    * producer side of a single-partition topic). */
  def append(dir: String, records: Seq[String]): Long = {
    require(records.nonEmpty, "empty append")
    require(records.forall(r => !r.contains("\n")),
      "records are lines: embedded newlines would corrupt offsets")
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val start = endOffset(dir)
    val body = records.mkString("", "\n", "\n")
    Files.write(d.resolve(segName(start)),
      body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    start + records.length
  }

  /** Segments as (startOffset, path), ascending. The listing stream
    * is closed in finally — this runs on every micro-batch trigger
    * (latestOffset/planInputPartitions), so a leaked stream is a
    * leaked directory fd per trigger. */
  private[sources] def segments(dir: String): Seq[(Long, String)] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val listing = Files.list(d)
    try {
      listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".log"))
        .map(p => (p.getFileName.toString.stripSuffix(".log").toLong,
          p.toString))
        .toSeq.sortBy(_._1)
    } finally listing.close()
  }

  /** Per-segment record counts. Segments are immutable once written
    * (CREATE_NEW, single-writer contract), so a length read once is
    * valid for the file's lifetime — caching makes per-trigger batch
    * planning listing-only driver I/O instead of re-reading every
    * segment's full bytes each trigger (O(log size) per batch
    * otherwise, which contradicts the "driver never holds record
    * data" scale shape). One long per segment ever planned — the
    * same order of driver state as Kafka topic metadata. */
  private val segLenCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Count of lines in a segment file (cached — see [[segLenCache]]). */
  private[sources] def segLen(path: String): Long =
    segLenCache.computeIfAbsent(path,
      p => Files.readAllBytes(Paths.get(p)).count(_ == '\n').toLong)

  /** Total records ever appended (the next record's offset). */
  def endOffset(dir: String): Long =
    segments(dir).lastOption
      .map { case (start, p) => start + segLen(p) }
      .getOrElse(0L)
}

/** `format("replaylog")` (registered via DataSourceRegister). */
class ReplayLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "replaylog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplayLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("replaylog requires .load(path)"))
    new ReplayLogTable(path)
  }
}

class ReplayLogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"replaylog(`$path`)"
  override def schema(): StructType = ReplayLog.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = ReplayLog.schema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream = new ReplayLogMicroBatchStream(path)
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          ReplayLogMicroBatchStream.partitionsFor(path, 0L,
            ReplayLog.endOffset(path))
        override def createReaderFactory(): PartitionReaderFactory =
          new ReplayLogReaderFactory
      }
    }
}

/** Offset = count of records before it (single ascending long, the
  * single-partition Kafka shape). */
case class ReplayLogOffset(offset: Long) extends Offset {
  override def json(): String = offset.toString
}

object ReplayLogMicroBatchStream {
  /** One InputPartition per segment slice intersecting [start, end). */
  def partitionsFor(path: String, start: Long, end: Long)
      : Array[InputPartition] =
    ReplayLog.segments(path).flatMap { case (segStart, segPath) =>
      val segEnd = segStart + ReplayLog.segLen(segPath)
      val lo = math.max(start, segStart)
      val hi = math.min(end, segEnd)
      if (lo < hi) Some(ReplayLogPartition(segPath, segStart, lo, hi))
      else None
    }.toArray
}

class ReplayLogMicroBatchStream(path: String) extends MicroBatchStream {
  override def initialOffset(): Offset = ReplayLogOffset(0L)
  override def latestOffset(): Offset =
    ReplayLogOffset(ReplayLog.endOffset(path))
  override def deserializeOffset(json: String): Offset =
    ReplayLogOffset(json.trim.toLong)
  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] =
    ReplayLogMicroBatchStream.partitionsFor(path,
      start.asInstanceOf[ReplayLogOffset].offset,
      end.asInstanceOf[ReplayLogOffset].offset)
  override def createReaderFactory(): PartitionReaderFactory =
    new ReplayLogReaderFactory
  /** The log is durable and replayable — commit retains everything
    * (retention policy is the operator's concern, as with Kafka). */
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** A half-open offset slice [lo, hi) of one segment file. */
case class ReplayLogPartition(segPath: String, segStart: Long,
    lo: Long, hi: Long) extends InputPartition

class ReplayLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ReplayLogPartition]
    new PartitionReader[InternalRow] {
      private val lines = Files.readAllLines(
        Paths.get(p.segPath), StandardCharsets.UTF_8)
      private var i = (p.lo - p.segStart).toInt
      private val end = (p.hi - p.segStart).toInt
      override def next(): Boolean = i < end
      override def get(): InternalRow = {
        val row = InternalRow(p.segStart + i,
          UTF8String.fromString(lines.get(i)))
        i += 1
        row
      }
      override def close(): Unit = ()
    }
  }
}
