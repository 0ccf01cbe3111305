package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.graftbridge.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measured data-movement audit over every registry query → one JSON
  * artifact (`SHUFFLE_AUDIT.json`, committed per round beside
  * `PLAN_AUDIT.json`). PLAN_AUDIT counts exchanges — the authored plan
  * SHAPE; this one WEIGHS them: per query, bytes actually read from
  * files, bytes written to and read back from shuffles, bytes served
  * from cached blocks, and bytes spilled to disk, summed over every
  * task the query ran (cache builds and fixpoint rounds included —
  * they are part of the query's true cost).
  *
  * The shuffle/file-read byte ratio is the 100 TB signal toy-scale
  * latency cannot show: a plan can carry three "shuffles" that move
  * 2 kB of aggregated state (fine at any scale) or one that moves
  * the whole fact table (the bottleneck at 1000 executors) — only
  * bytes tell them apart. An aggregation-shaped query whose ratio
  * approaches 1 has lost its map-side partial aggregate; a
  * metadata-join query whose ratio jumps round-over-round has lost a
  * broadcast. Diff this file against the previous round's copy the
  * same way PLAN_AUDIT is diffed.
  *
  * Metric sourcing (each field from the layer that actually sees it,
  * found the hard way — both obvious layers under-report scans):
  *  - `os_read_bytes`: `/proc/self/io` rchar delta — every byte any
  *    thread of this JVM read from the filesystem (parquet pages,
  *    shuffle files, checkpoint re-reads, spill-back). The only
  *    layer that sees parquet DATA pages at all: per-task input
  *    metrics report ~0.1% of a local parquet scan (Spark's polling
  *    of Hadoop per-thread statistics misses the vectorized reader),
  *    and even Hadoop's GLOBAL file-scheme statistics record only
  *    footers (parquet-java reads local data pages through its nio
  *    path, bypassing the Hadoop FileSystem — measured: 17.8 kB
  *    recorded for a 12.7 MB actual read; the probe is in the r15
  *    session log). Local-mode instrument by construction (one JVM
  *    holds all tasks).
  *  - `scan_read_bytes` = os_read − shuffle_read: the file bytes
  *    that are NOT shuffle traffic — source scans plus checkpoint
  *    re-reads (honest: an iterative operator that rereads its
  *    checkpoints IS moving those bytes). An estimate — page-cache
  *    hits still count (we want them: they are data the plan
  *    addressed), double-buffered shuffle reads can skew it a few
  *    percent — but stable and diffable.
  *  - `cache_read_bytes`: per-task input metrics, which in Spark are
  *    incremented by cached-BLOCK reads (and only negligibly by the
  *    broken file slice) — the iterative families' dominant term,
  *    kept separate because a memory-local cache hit is not a scan.
  *  - `shuffle_*`/`disk_spill_bytes`: per-task shuffle metrics —
  *    exact everywhere.
  *
  * Attribution: queries run SEQUENTIALLY and the listener bus is
  * drained (ListenerBridge — the private[spark] waitUntilEmpty)
  * before each snapshot, so every task-end lands in the right row.
  * Run at sf0.1 (the driver's bench scale): ratios are data-shaped,
  * and sf0.001 frames are too small for honest ones. Byte counts are
  * load-independent (unlike bench latency), so this can run
  * concurrently with other gates.
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_SHUFFLE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val entries = run(spark, sfDir, only)
    Files.writeString(Paths.get(outPath),
      entries.mkString("{", ",\n", "}\n"))
    println(s"[shuffleAudit] ${entries.size} queries measured -> $outPath")
    spark.stop()
  }

  /** One JSON object body line per selected query (the testable
    * core — the spec drives it on the shared suite session, which
    * `main` must not stop). */
  def run(spark: SparkSession, sfDir: String,
      only: Option[Set[String]] = None): Seq[String] = {
    val cacheIn = new AtomicLong
    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    val spill = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          cacheIn.addAndGet(m.inputMetrics.bytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          spill.addAndGet(m.diskBytesSpilled)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def osRead(): Long =
      scala.io.Source.fromFile("/proc/self/io").getLines()
        .find(_.startsWith("rchar"))
        .map(_.split(":")(1).trim.toLong).getOrElse(0L)
    def snap(): (Long, Long, Long, Long, Long) =
      (osRead(), cacheIn.get, shufWrite.get, shufRead.get, spill.get)

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    try selected.map { case (name, fn) =>
      ListenerBridge.drain(spark.sparkContext)
      val (f0, c0, w0, r0, s0) = snap()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ListenerBridge.drain(spark.sparkContext)
        val (f1, c1, w1, r1, s1) = snap()
        spark.catalog.clearCache()
        val osr = f1 - f0
        val sr = r1 - r0
        val sw = w1 - w0
        val scan = math.max(osr - sr, 0L)
        // ratio vs scan reads floored at 1 byte so a zero-scan
        // (literal grid) query can't divide by zero; 4 decimals
        val ratio = math.round(sw.toDouble / math.max(scan, 1L) * 1e4) / 1e4
        s""""$name":{"os_read_bytes":$osr,"scan_read_bytes":$scan,""" +
          s""""cache_read_bytes":${c1 - c0},""" +
          s""""shuffle_write_bytes":$sw,"shuffle_read_bytes":$sr,""" +
          s""""disk_spill_bytes":${s1 - s0},"shuffle_per_scan":$ratio}"""
      } catch { case e: Throwable =>
        spark.catalog.clearCache()
        s""""$name":{"error":"${e.getClass.getSimpleName}"}"""
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
