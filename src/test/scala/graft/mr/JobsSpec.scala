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

  test("progress: tasksDone grows monotonically; completed == 1.0") {
    val out = Files.createTempDirectory("graft-prog").toString + "/p"
    val handle = Jobs.submitAsync(spark, "progress_probe") {
      // several stages so progress has distinct points to tick through
      graft.Tables(spark, sfDir).events
        .groupBy("user_id").count()
        .orderBy("user_id")
        .write.mode("overwrite").parquet(out)
    }
    var lastDone = -1L
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (!handle.isCompleted) {
      val p = handle.progress
      assert(p.tasksDone >= lastDone,
        s"tasksDone went backwards: $lastDone -> ${p.tasksDone}")
      assert(p.fraction >= 0.0 && p.fraction <= 1.0)
      lastDone = p.tasksDone
      seen += p.tasksDone
      Thread.sleep(20)
    }
    assert(Jobs.await(handle, 120.seconds).isSuccess)
    val fin = handle.progress
    assert(fin.fraction === 1.0, s"completed handle must report 1.0: $fin")
    assert(fin.tasksDone > 0L, s"scheduler counters never ticked: $fin")
    assert(fin.jobsStarted > 0 && fin.jobsEnded === fin.jobsStarted, fin.toString)
  }

  test("a reaped handle keeps its final progress counters") {
    val out = Files.createTempDirectory("graft-reapprog").toString + "/p"
    val handle = Jobs.submitAsync(spark, "reap_probe") {
      graft.Tables(spark, sfDir).events.groupBy("user_id").count()
        .write.mode("overwrite").parquet(out)
    }
    assert(Jobs.await(handle, 120.seconds).isSuccess)
    val before = handle.progress
    assert(before.tasksDone > 0L)
    Jobs.reap() // retires the groupProgress entry
    val after = handle.progress
    assert(after.tasksDone === before.tasksDone &&
      after.tasksTotal === before.tasksTotal &&
      after.jobsStarted === before.jobsStarted,
      s"counters must survive the reap: $before -> $after")
    assert(after.fraction === 1.0)
  }

  test("progress counters attribute tasks to the right group") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val idle = Jobs.submitAsync(spark, "idle_group") { gate.await() }
    val out = Files.createTempDirectory("graft-attr").toString + "/a"
    val busy = Jobs.submitAsync(spark, "busy_group") {
      MrQueries.mrSum(spark, sfDir).write.mode("overwrite").parquet(out)
    }
    assert(Jobs.await(busy, 120.seconds).isSuccess)
    assert(busy.progress.tasksDone > 0L)
    assert(idle.progress.tasksDone === 0L,
      "a group that launched no Spark jobs must show zero tasks")
    gate.countDown()
    assert(Jobs.await(idle, 60.seconds).isSuccess)
  }

  test("more concurrent blocking jobs than cores all complete") {
    // ExecutionContext.global would starve here: every action parks
    // its thread on a latch, and the fork-join pool's parallelism is
    // the core count. The dedicated cached pool grows instead.
    val n = Runtime.getRuntime.availableProcessors() * 2 + 8
    val gate = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val handles = (1 to n).map { i =>
      Jobs.submitAsync(spark, s"blocker_$i") {
        started.incrementAndGet()
        gate.await()
      }
    }
    // every job must reach its blocking point — i.e. hold a live
    // thread — simultaneously
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (started.get() < n && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(started.get() === n,
      s"only ${started.get()}/$n blocking jobs got a thread")
    gate.countDown()
    handles.foreach(h => assert(Jobs.await(h, 60.seconds).isSuccess))
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

  test("HttpWriter POSTs the result JSON with identity headers") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val got = scala.concurrent.Promise[(String, String, String)]()
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      got.trySuccess((body,
        ex.getRequestHeaders.getFirst("X-JOB-NAME"),
        ex.getRequestHeaders.getFirst("X-REQUEST-ID")))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/hook"
      val handle = Jobs.submitJob(spark, "wc_http",
        MrQueries.mrWordcount(spark, sfDir), Jobs.HttpWriter(url))
      assert(Jobs.await(handle, 120.seconds).isSuccess)
      val (body, jobName, reqId) =
        scala.concurrent.Await.result(got.future, 10.seconds)
      assert(jobName === "wc_http")
      assert(reqId === handle.groupId,
        "X-REQUEST-ID must carry the request id the submit returned")
      assert(body.startsWith("[") && body.endsWith("]"))
      val expected = MrQueries.mrWordcount(spark, sfDir).count()
      assert(body.split("""\},\{""").length.toLong === expected,
        "one JSON object per result row")
    } finally server.stop(0)
  }

  test("HttpWriter fails the job on a non-2xx response") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", (ex: HttpExchange) => {
      ex.sendResponseHeaders(503, -1); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/hook"
      val handle = Jobs.submitJob(spark, "wc_http_503",
        MrQueries.mrWordcount(spark, sfDir), Jobs.HttpWriter(url))
      val res = Jobs.await(handle, 120.seconds)
      assert(res.isFailure, "a 503 from the receiver must fail delivery")
    } finally server.stop(0)
  }

  test("EmailWriter spools a complete MIME message with the result attached") {
    val dir = Files.createTempDirectory("graft-mail").toString
    val handle = Jobs.submitJob(spark, "wc_mail",
      MrQueries.mrWordcount(spark, sfDir),
      Jobs.EmailWriter(Seq("data@example.com"), "graft@example.com",
        Jobs.EmailWriter.spool(dir)))
    assert(Jobs.await(handle, 120.seconds).isSuccess)
    val emls = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).filter(_.endsWith(".eml"))
    assert(emls.length === 1, s"expected one spooled message, got $emls")
    val mime = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(emls.head)),
      "UTF-8")
    assert(mime.contains("Subject: graft result: wc_mail"))
    assert(mime.contains("To: data@example.com"))
    assert(mime.contains(s"request ${handle.groupId}"),
      "{request_id} must interpolate into the body")
    assert(mime.contains("""filename="result.json""""))
    assert(mime.contains("Content-Transfer-Encoding: base64"))
    // decode the base64 part back to the JSON array (strip the closing
    // boundary that shares the blank-line-delimited chunk)
    val b64 = mime.split("\r\n\r\n")
      .map(_.split("\r\n--").head.trim)
      .find(p => p.nonEmpty && p.matches("(?s)[A-Za-z0-9+/=\r\n]+"))
    assert(b64.isDefined, "base64 attachment part present")
    val attachment = new String(
      java.util.Base64.getMimeDecoder.decode(b64.get), "UTF-8")
    assert(attachment.startsWith("[") && attachment.endsWith("]"))
    // RFC 5322 line-length sanity over the whole message
    mime.split("\r\n").foreach(l => assert(l.length <= 998))
    val expected = MrQueries.mrWordcount(spark, sfDir).count()
    assert(attachment.split("""\},\{""").length.toLong === expected)
  }

  test("EmailWriter with no recipients fails delivery, not silently") {
    val handle = Jobs.submitJob(spark, "wc_mail_none",
      MrQueries.mrWordcount(spark, sfDir),
      Jobs.EmailWriter(Seq.empty, "graft@example.com", (_, _) => ()))
    assert(Jobs.await(handle, 120.seconds).isFailure)
  }

  test("writers reject CR/LF and non-ASCII header injection") {
    // a jobName/subject/address containing a newline would terminate
    // the header line and inject arbitrary headers into the message
    intercept[IllegalArgumentException] {
      Jobs.headerSafe("jobName", "evil\r\nX-Injected: 1")
    }
    intercept[IllegalArgumentException] {
      Jobs.headerSafe("subject", "smuggle\nBcc: x@y", asciiOnly = true)
    }
    intercept[IllegalArgumentException] {
      Jobs.headerSafe("from", "résumé@example.com", asciiOnly = true)
    }
    assert(Jobs.headerSafe("jobName", "wc_ok-1") === "wc_ok-1")
    // end-to-end: a delivery with a CR/LF jobName fails the job
    // instead of spooling a forged message
    val dir = Files.createTempDirectory("graft-mail-inj").toString
    val handle = Jobs.submitJob(spark, "wc\r\nX-Forged: yes",
      MrQueries.mrWordcount(spark, sfDir),
      Jobs.EmailWriter(Seq("data@example.com"), "graft@example.com",
        Jobs.EmailWriter.spool(dir)))
    assert(Jobs.await(handle, 120.seconds).isFailure)
    assert(!Files.list(java.nio.file.Paths.get(dir)).findAny().isPresent,
      "no message may be spooled for a rejected header")
  }

  test("submitCached: identical re-submit is a cache hit with zero recompute") {
    val root = Files.createTempDirectory("graft-cache").toString
    val cache = new InMemoryResultCache
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    Handlers.register(Handlers.HandlerDef("cached_wc", 1L,
      "wordcount for the cache spec", { df =>
        computes.incrementAndGet(); df
      }))
    try {
      val input = MrQueries.mrWordcount(spark, sfDir)
      val first = Jobs.submitCached(spark, "cached_wc", input,
        inputVersion = "snap-1", sinkRoot = root, cache = cache)
      assert(!first.hit)
      assert(Jobs.await(first.handle, 120.seconds).isSuccess)
      assert(spark.read.parquet(first.path).count() > 0)
      assert(computes.get() === 1)
      val again = Jobs.submitCached(spark, "cached_wc", input,
        inputVersion = "snap-1", sinkRoot = root, cache = cache)
      assert(again.hit, "identical submission must hit the cache")
      assert(again.path === first.path)
      assert(again.handle.isCompleted &&
        Jobs.await(again.handle, 1.second).isSuccess)
      assert(again.handle.progress.fraction === 1.0)
      assert(computes.get() === 1,
        "a cache hit must not re-run the handler transform")
      // a different input snapshot or different args must MISS
      val newSnap = Jobs.submitCached(spark, "cached_wc", input,
        inputVersion = "snap-2", sinkRoot = root, cache = cache)
      assert(!newSnap.hit && newSnap.path != first.path)
      assert(Jobs.await(newSnap.handle, 120.seconds).isSuccess)
      val newArgs = Jobs.submitCached(spark, "cached_wc", input,
        inputVersion = "snap-1", sinkRoot = root,
        args = Map("mode" -> "strict"), cache = cache)
      assert(!newArgs.hit && newArgs.path != first.path)
      assert(newArgs.path != newSnap.path)
      assert(Jobs.await(newArgs.handle, 120.seconds).isSuccess)
      assert(computes.get() === 3)
    } finally { Handlers.delete("cached_wc"); () }
  }

  test("submitCached: handler re-register (version bump) invalidates the key") {
    val root = Files.createTempDirectory("graft-cache-inv").toString
    val cache = new InMemoryResultCache
    val v1Runs = new java.util.concurrent.atomic.AtomicInteger(0)
    val v2Runs = new java.util.concurrent.atomic.AtomicInteger(0)
    Handlers.register(Handlers.HandlerDef("cached_inv", 1L, "v1",
      { df => v1Runs.incrementAndGet(); df }))
    try {
      val input = MrQueries.mrWordcount(spark, sfDir)
      val first = Jobs.submitCached(spark, "cached_inv", input,
        inputVersion = "snap-1", sinkRoot = root, cache = cache)
      assert(Jobs.await(first.handle, 120.seconds).isSuccess)
      // re-register at a newer version: same name, new content identity
      assert(Handlers.register(Handlers.HandlerDef("cached_inv", 2L, "v2",
        { df => v2Runs.incrementAndGet(); df })))
      val afterBump = Jobs.submitCached(spark, "cached_inv", input,
        inputVersion = "snap-1", sinkRoot = root, cache = cache)
      assert(!afterBump.hit,
        "a version bump must rotate the key and recompute")
      assert(afterBump.path !== first.path)
      assert(Jobs.await(afterBump.handle, 120.seconds).isSuccess)
      assert(v1Runs.get() === 1 && v2Runs.get() === 1,
        "the NEW handler version must have produced the recompute")
      // and the bumped result is itself cached now
      assert(Jobs.submitCached(spark, "cached_inv", input,
        inputVersion = "snap-1", sinkRoot = root, cache = cache).hit)
    } finally { Handlers.delete("cached_inv"); () }
  }

  test("submitCached: await-success happens-after cache visibility (x50 stress)") {
    // Pins the commit-ordering contract: the cache entry lands inside
    // the job body (after the sink write, before the future completes),
    // so a resubmit issued the instant await() returns MUST hit. The
    // old onComplete-side put was an unordered callback on the same
    // future await blocks on and lost this race under repetition.
    val root = Files.createTempDirectory("graft-cache-stress").toString
    val cache = new InMemoryResultCache
    Handlers.register(Handlers.HandlerDef("cached_stress", 1L, "id", df => df))
    try {
      val input = spark.range(8).toDF("n")
      (1 to 50).foreach { i =>
        val first = Jobs.submitCached(spark, "cached_stress", input,
          inputVersion = s"snap-$i", sinkRoot = root, cache = cache)
        assert(Jobs.await(first.handle, 120.seconds).isSuccess)
        val again = Jobs.submitCached(spark, "cached_stress", input,
          inputVersion = s"snap-$i", sinkRoot = root, cache = cache)
        assert(again.hit, s"iteration $i: resubmit after await missed the cache")
        assert(again.path === first.path)
      }
    } finally { Handlers.delete("cached_stress"); () }
  }

  test("submitCached: failed jobs leave no cache entry; unregistered handlers throw") {
    val root = Files.createTempDirectory("graft-cache-fail").toString
    val cache = new InMemoryResultCache
    intercept[NoSuchElementException] {
      Jobs.submitCached(spark, "never_registered",
        MrQueries.mrWordcount(spark, sfDir),
        inputVersion = "s", sinkRoot = root, cache = cache)
    }
    Handlers.register(Handlers.HandlerDef("cached_boom", 1L, "fails",
      df => df.selectExpr("raise_error('cache boom')")))
    try {
      val bad = Jobs.submitCached(spark, "cached_boom",
        graft.Tables(spark, sfDir).documents,
        inputVersion = "s", sinkRoot = root, cache = cache)
      assert(Jobs.await(bad.handle, 120.seconds).isFailure)
      assert(cache.size === 0, "a failed job must not feed the cache")
      // next submit misses and tries again (still failing, still no entry)
      val retry = Jobs.submitCached(spark, "cached_boom",
        graft.Tables(spark, sfDir).documents,
        inputVersion = "s", sinkRoot = root, cache = cache)
      assert(!retry.hit)
      assert(Jobs.await(retry.handle, 120.seconds).isFailure)
    } finally { Handlers.delete("cached_boom"); () }
  }

  test("submitCached: racing identical submits share one in-flight handle") {
    val root = Files.createTempDirectory("graft-cache-race").toString
    val cache = new InMemoryResultCache
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    Handlers.register(Handlers.HandlerDef("cached_race", 1L, "slow",
      { df => computes.incrementAndGet(); gate.await(); df }))
    try {
      val input = MrQueries.mrWordcount(spark, sfDir)
      val a = Jobs.submitCached(spark, "cached_race", input,
        inputVersion = "s", sinkRoot = root, cache = cache)
      // the transform runs inside the async action; whether or not it
      // has started yet, the second submit must attach, not re-launch
      val b = Jobs.submitCached(spark, "cached_race", input,
        inputVersion = "s", sinkRoot = root, cache = cache)
      assert(b.handle eq a.handle,
        "identical in-flight submissions must share the handle")
      assert(b.path === a.path)
      gate.countDown()
      assert(Jobs.await(a.handle, 120.seconds).isSuccess)
      assert(computes.get() === 1, "exactly one computation ran")
    } finally { Handlers.delete("cached_race"); () }
  }

  test("shared-stage accounting: foreign-attributed tasks leave the total") {
    // group B listed stage 7 (tasksTotal += 4 at onJobStart) but the
    // first-wins attribution gave it to group A — B can never be
    // credited those 4 tasks, so job end must subtract them (the
    // pre-fix asymmetry pinned B's fraction below 1 forever)
    val stages = Seq(5 -> 10L, 7 -> 4L, 9 -> 2L)
    val submitted = Set(5, 7) // 9 was skipped (reused lineage)
    val owner = Map(5 -> "B", 7 -> "A")
    val got = Jobs.uncreditedTasks(stages, Some("B"),
      submitted.contains, owner.get)
    assert(got === 4L + 2L,
      "foreign-owned (4) and skipped (2) tasks must both leave the total")
    // a stage that is both skipped and foreign-owned subtracts once
    val both = Jobs.uncreditedTasks(Seq(7 -> 4L), Some("B"),
      _ => false, Map(7 -> "A").get)
    assert(both === 4L)
    // own submitted stages stay counted
    assert(Jobs.uncreditedTasks(Seq(5 -> 10L), Some("B"),
      submitted.contains, owner.get) === 0L)
  }
}
