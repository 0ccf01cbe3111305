package graft.mr

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Sinks

/** Async job submission — the Spark re-expression of the reference's
  * HTTP job API (reference: mr/app/, dev/post_map_flat_async.py:
  * POST a job, poll/stream results, optionally kill it). Spark-first,
  * "submit" is launching the job's terminal action on a pooled thread
  * under a cancellable job group; "kill" is `cancelJobGroup` with
  * interrupt-on-cancel; "stream results" is whatever sink the action
  * writes ([[graft.sources.Sinks]] = the reference's result_writers).
  *
  * Result delivery: the reference pushes a finished job's results
  * through a pluggable writer (reference: mr/result_writers/http.py:11
  * POST with X-REQUEST-ID/X-JOB-NAME headers, email.py, file.py,
  * inline.py). [[ResultWriter]] is that surface re-expressed: a
  * [[submitJob]] binds a DataFrame to a writer, the writer runs
  * *inside* the cancellable job group on completion of the
  * computation, and failure surfaces through the handle's `Try` and
  * any [[JobHandle.onComplete]] callbacks.
  *
  * Handle lifecycle: completed handles are reaped from the registry
  * (reference: mr/request_cleanup.py:18 prunes finished-request
  * state) — a driver submitting jobs for months never accumulates
  * them. A reap runs on every submit; `reap()` is also explicit.
  */
object Jobs {

  final case class JobHandle(name: String, groupId: String,
      result: Future[Try[Unit]],
      private[mr] val cancelled: AtomicBoolean) {

    /** Run `cb` when the job finishes (delivery included), with its
      * outcome. Registering after completion fires immediately. */
    def onComplete(cb: Try[Unit] => Unit): Unit =
      result.foreach(cb)(Jobs.ec)

    def isCompleted: Boolean = result.isCompleted
  }

  /** Where a finished job's results go — the reference's
    * result_writers surface. Delivery runs inside the job group, so
    * cancelling the job also cancels an in-flight delivery. */
  trait ResultWriter {
    def deliver(jobName: String, df: DataFrame): Unit
  }

  /** Land results in a file sink: `<root>/<jobName>` in the given
    * format (reference result_writers/file.py; the http.py/email.py
    * pattern — push bytes at an external receiver keyed by job name —
    * maps to the same call shape with a custom [[ResultWriter]]). */
  final case class SinkWriter(root: String,
      format: Sinks.Format = Sinks.Parquet) extends ResultWriter {
    def deliver(jobName: String, df: DataFrame): Unit =
      Sinks.write(df, s"$root/$jobName", format)
  }

  /** Hand results to driver code (reference result_writers/inline.py:
    * results returned in the response body). */
  final case class CallbackWriter(f: (String, DataFrame) => Unit)
      extends ResultWriter {
    def deliver(jobName: String, df: DataFrame): Unit = f(jobName, df)
  }

  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** Live registry — bounded by construction: every submit reaps
    * completed entries first. Keyed by groupId (unique per submit). */
  private val registry = new ConcurrentHashMap[String, JobHandle]()

  /** Drop completed handles from the registry; returns live count. */
  def reap(): Int = {
    registry.forEach { (gid, h) =>
      if (h.isCompleted) registry.remove(gid)
    }
    registry.size()
  }

  /** Handles still running (or not yet reaped). */
  def active: Seq[JobHandle] = {
    import scala.jdk.CollectionConverters._
    registry.values().asScala.filterNot(_.isCompleted).toSeq
  }

  /** Launch `action` (typically: materialize a DataFrame into a sink)
    * asynchronously under its own job group. The group is set on the
    * worker thread (Spark job groups are thread-local). */
  def submitAsync(spark: SparkSession, name: String)(action: => Unit): JobHandle = {
    reap()
    val group = s"graft-job-$name-${UUID.randomUUID().toString.take(8)}"
    val cancelled = new AtomicBoolean(false)
    val fut = Future {
      // cancel() may land before this thread even starts — the group
      // would not exist yet and cancelJobGroup would be a silent
      // no-op, so the flag is checked here too.
      if (cancelled.get()) Try(throw new InterruptedException(
        s"job $name cancelled before start"))
      else {
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        try Try(action)
        finally spark.sparkContext.clearJobGroup()
      }
    }
    val handle = JobHandle(name, group, fut, cancelled)
    registry.put(group, handle)
    handle
  }

  /** Submit a job whose results are pushed to `writer` on success —
    * the async-POST-then-deliver flow of the reference's job API in
    * one call. The DataFrame is materialized by the writer itself
    * (one pass, no intermediate collect); computation and delivery
    * share the cancellable group. */
  def submitJob(spark: SparkSession, name: String, df: DataFrame,
      writer: ResultWriter): JobHandle =
    submitAsync(spark, name) { writer.deliver(name, df) }

  /** Cancel every Spark job launched under the handle's group (and
    * mark the handle so a not-yet-started action never runs). The
    * handle's future then completes with a failed Try. */
  def cancel(spark: SparkSession, handle: JobHandle): Unit = {
    handle.cancelled.set(true)
    spark.sparkContext.cancelJobGroup(handle.groupId)
  }

  /** Block for the job's outcome. */
  def await(handle: JobHandle, atMost: Duration = Duration.Inf): Try[Unit] =
    Await.result(handle.result, atMost)
}
