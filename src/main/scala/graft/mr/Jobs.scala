package graft.mr

import java.util.UUID

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.Try

import org.apache.spark.sql.SparkSession

/** Async job submission — the Spark re-expression of the reference's
  * HTTP job API (reference: mr/app/, dev/post_map_flat_async.py:
  * POST a job, poll/stream results, optionally kill it). Spark-first,
  * "submit" is launching the job's terminal action on a pooled thread
  * under a cancellable job group; "kill" is `cancelJobGroup` with
  * interrupt-on-cancel; "stream results" is whatever sink the action
  * writes ([[graft.sources.Sinks]] = the reference's result_writers).
  */
object Jobs {

  final case class JobHandle(name: String, groupId: String,
      result: Future[Try[Unit]],
      private[mr] val cancelled: java.util.concurrent.atomic.AtomicBoolean)

  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** Launch `action` (typically: materialize a DataFrame into a sink)
    * asynchronously under its own job group. The group is set on the
    * worker thread (Spark job groups are thread-local). */
  def submitAsync(spark: SparkSession, name: String)(action: => Unit): JobHandle = {
    val group = s"graft-job-$name-${UUID.randomUUID().toString.take(8)}"
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
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
    JobHandle(name, group, fut, cancelled)
  }

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
