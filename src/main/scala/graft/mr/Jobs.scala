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
      result: Future[Try[Unit]])

  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** Launch `action` (typically: materialize a DataFrame into a sink)
    * asynchronously under its own job group. The group is set on the
    * worker thread (Spark job groups are thread-local). */
  def submitAsync(spark: SparkSession, name: String)(action: => Unit): JobHandle = {
    val group = s"graft-job-$name-${UUID.randomUUID().toString.take(8)}"
    val fut = Future {
      spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
      try Try(action)
      finally spark.sparkContext.clearJobGroup()
    }
    JobHandle(name, group, fut)
  }

  /** Cancel every Spark job launched under the handle's group. The
    * handle's future then completes with a failed Try. */
  def cancel(spark: SparkSession, handle: JobHandle): Unit =
    spark.sparkContext.cancelJobGroup(handle.groupId)

  /** Block for the job's outcome. */
  def await(handle: JobHandle, atMost: Duration = Duration.Inf): Try[Unit] =
    Await.result(handle.result, atMost)
}
