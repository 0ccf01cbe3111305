package graft.mr

import java.nio.file.Files

import scala.concurrent.duration._

import graft.SparkSuite

class JobsSpec extends SparkSuite {

  test("async submit runs the job and lands the result in the sink") {
    val out = Files.createTempDirectory("graft-job").toString + "/res"
    val handle = Jobs.submitAsync(spark, "wordcount") {
      MrQueries.mrWordcount(spark, sfDir)
        .write.mode("overwrite").parquet(out)
    }
    val res = Jobs.await(handle, 120.seconds)
    assert(res.isSuccess, res.toString)
    assert(spark.read.parquet(out).count() > 0)
  }

  test("cancel kills an in-flight job group") {
    val handle = Jobs.submitAsync(spark, "runaway") {
      // unbounded work: would run ~forever if not cancelled
      spark.range(Long.MaxValue).selectExpr("sum(id * id)").collect()
      ()
    }
    Thread.sleep(1500) // let the job actually start
    Jobs.cancel(spark, handle)
    val res = Jobs.await(handle, 60.seconds)
    assert(res.isFailure, "cancelled job must not report success")
  }

  test("submitJob delivers results through a SinkWriter on completion") {
    import graft.sources.Sinks
    val root = Files.createTempDirectory("graft-delivery").toString
    val handle = Jobs.submitJob(spark, "wc_delivered",
      MrQueries.mrWordcount(spark, sfDir), Jobs.SinkWriter(root, Sinks.Parquet))
    assert(Jobs.await(handle, 120.seconds).isSuccess)
    val delivered = spark.read.parquet(s"$root/wc_delivered")
    assert(delivered.count() > 0, "delivered result must hold the rows")
    assert(delivered.columns.toSet === Set("word", "n"))
  }

  test("onComplete fires with the outcome; failures surface the error") {
    val p = scala.concurrent.Promise[scala.util.Try[Unit]]()
    val handle = Jobs.submitJob(spark, "will_fail",
      graft.Tables(spark, sfDir).documents
        .selectExpr("raise_error('delivery boom')"),
      Jobs.CallbackWriter((_, df) => { df.collect(); () }))
    handle.onComplete(p.success(_))
    val outcome = scala.concurrent.Await.result(p.future, 120.seconds)
    assert(outcome.isFailure, "failed delivery must not report success")
    assert(Jobs.await(handle, 1.second).isFailure)
  }

  test("completed handles are reaped; running ones are retained") {
    val done = Jobs.submitAsync(spark, "quick") { () }
    assert(Jobs.await(done, 60.seconds).isSuccess)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val running = Jobs.submitAsync(spark, "held") { gate.await() }
    Thread.sleep(100)
    Jobs.reap()
    assert(Jobs.active.exists(_.groupId == running.groupId),
      "running handle must survive the reap")
    assert(!Jobs.active.exists(_.groupId == done.groupId),
      "completed handle must be reaped")
    gate.countDown()
    assert(Jobs.await(running, 60.seconds).isSuccess)
    Jobs.reap()
    assert(!Jobs.active.exists(_.groupId == running.groupId))
  }

  test("two async jobs run concurrently under separate groups") {
    val outA = Files.createTempDirectory("graft-jobA").toString + "/a"
    val outB = Files.createTempDirectory("graft-jobB").toString + "/b"
    val a = Jobs.submitAsync(spark, "a") {
      MrQueries.mrSum(spark, sfDir).write.mode("overwrite").parquet(outA)
    }
    val b = Jobs.submitAsync(spark, "b") {
      MrQueries.mrNoop(spark, sfDir).write.mode("overwrite").parquet(outB)
    }
    assert(a.groupId !== b.groupId)
    assert(Jobs.await(a, 120.seconds).isSuccess)
    assert(Jobs.await(b, 120.seconds).isSuccess)
    assert(spark.read.parquet(outA).count() > 0)
    assert(spark.read.parquet(outB).count() > 0)
  }
}
