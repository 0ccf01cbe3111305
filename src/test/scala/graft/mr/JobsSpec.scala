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
