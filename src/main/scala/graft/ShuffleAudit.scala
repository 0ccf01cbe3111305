package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.graftbridge.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measured data-movement audit over every registry query → one JSON
  * artifact (`SHUFFLE_AUDIT.json`, committed per round beside
  * `PLAN_AUDIT.json`). PLAN_AUDIT counts exchanges — the authored plan
  * SHAPE; this one WEIGHS them: per query, bytes read from source
  * files, bytes written to and read back from shuffles, and bytes
  * spilled to disk, summed over every task the query ran (cache
  * builds and fixpoint rounds included — they are part of the
  * query's true cost).
  *
  * The shuffle/input byte ratio is the 100 TB signal toy-scale
  * latency cannot show: a plan can carry three "shuffles" that move
  * 2 kB of aggregated state (fine at any scale) or one that moves
  * the whole fact table (the bottleneck at 1000 executors) — only
  * bytes tell them apart. An aggregation-shaped query whose ratio
  * approaches 1 has lost its map-side partial aggregate; a
  * metadata-join query whose ratio jumps round-over-round has lost a
  * broadcast. Diff this file against the previous round's copy the
  * same way PLAN_AUDIT is diffed.
  *
  * Attribution: queries run SEQUENTIALLY and the listener bus is
  * drained (ListenerBridge — the private[spark] waitUntilEmpty)
  * before each snapshot, so every task-end lands in the right row.
  * Run at sf0.1 (the driver's bench scale): ratios are data-shaped,
  * and sf0.001 frames are too small for honest ones.
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

    val input = new AtomicLong
    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    val spill = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          input.addAndGet(m.inputMetrics.bytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          spill.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    def snap(): (Long, Long, Long, Long) =
      (input.get, shufWrite.get, shufRead.get, spill.get)

    val entries = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      ListenerBridge.drain(spark.sparkContext)
      val (i0, w0, r0, s0) = snap()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ListenerBridge.drain(spark.sparkContext)
        val (i1, w1, r1, s1) = snap()
        spark.catalog.clearCache()
        val in = i1 - i0
        val sw = w1 - w0
        // ratio vs input floored at 1 byte so a zero-input (literal
        // grid) query can't divide by zero; 4 decimals is plenty
        val ratio = math.round(sw.toDouble / math.max(in, 1L) * 1e4) / 1e4
        s""""$name":{"input_bytes":$in,"shuffle_write_bytes":$sw,""" +
          s""""shuffle_read_bytes":${r1 - r0},""" +
          s""""disk_spill_bytes":${s1 - s0},"shuffle_per_input":$ratio}"""
      } catch { case e: Throwable =>
        spark.catalog.clearCache()
        s""""$name":{"error":"${e.getClass.getSimpleName}"}"""
      }
    }
    Files.writeString(Paths.get(outPath),
      entries.mkString("{", ",\n", "}\n"))
    println(s"[shuffleAudit] ${entries.size} queries measured -> $outPath")
    spark.stop()
  }
}
