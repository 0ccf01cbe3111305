package graft.mr

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.SparkSuite

class HttpApiSpec extends SparkSuite {

  private val client = HttpClient.newHttpClient()

  private def send(method: String, url: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .method(method, HttpRequest.BodyPublishers.noBody()).build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  private def field(body: String, name: String): String = {
    val m = s""""$name":("[^"]*"|[^,}]*)""".r.findFirstMatchIn(body)
    m.map(_.group(1).stripPrefix("\"").stripSuffix("\"")).getOrElse(
      fail(s"no field $name in $body"))
  }

  private def withApi(f: (String, String) => Unit): Unit = {
    val sinkRoot = Files.createTempDirectory("graft-http").toString
    val api = HttpApi.start(spark, sfDir, sinkRoot, Map(
      "wordcount" -> (MrQueries.mrWordcount _),
      "chain" -> (MrQueries.mrChain _),
      "runaway" -> ((s: org.apache.spark.sql.SparkSession, _: String) =>
        s.range(Long.MaxValue).selectExpr("sum(id * id)"))))
    try f(s"http://127.0.0.1:${api.port}", sinkRoot)
    finally api.stop()
  }

  test("POST submits, GET polls to completion, results land in the sink") {
    withApi { (base, sinkRoot) =>
      val (code, body) = send("POST", s"$base/job/wordcount")
      assert(code === 202, body)
      val id = field(body, "request_id")
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      var last = ""
      while ({
        val (c, b) = send("GET", s"$base/request/$id")
        assert(c === 200, b)
        last = b
        field(b, "succeeded") == "null" && System.nanoTime() < deadline
      }) Thread.sleep(100)
      assert(field(last, "succeeded") === "true", last)
      assert(field(last, "fraction") === "1.0", last)
      assert(field(last, "tasks_done").toLong > 0, last)
      assert(spark.read.parquet(s"$sinkRoot/wordcount").count() > 0,
        "delivered results must be readable from the sink")
    }
  }

  test("index, job browser and request listing expose the engine state") {
    withApi { (base, _) =>
      val (ic, ib) = send("GET", s"$base/")
      assert(ic === 200 && field(ib, "service") === "graft", ib)
      val (jc, jb) = send("GET", s"$base/jobs")
      assert(jc === 200 && jb === """["chain","runaway","wordcount"]""", jb)

      // empty before any submit…
      assert(send("GET", s"$base/requests") === ((200, "[]")))
      val (_, body) = send("POST", s"$base/job/wordcount")
      val id = field(body, "request_id")
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while ({
        val (_, b) = send("GET", s"$base/request/$id")
        field(b, "succeeded") == "null" && System.nanoTime() < deadline
      }) Thread.sleep(100)
      // …then lists the completed-but-unreaped request with progress
      val (lc, lb) = send("GET", s"$base/requests")
      assert(lc === 200, lb)
      assert(field(lb, "request_id") === id, lb)
      assert(field(lb, "name") === "wordcount", lb)
      assert(field(lb, "completed") === "true", lb)
      // reaping empties the listing again
      send("POST", s"$base/reap")
      assert(send("GET", s"$base/requests")._2 === "[]")
    }
  }

  test("HTML UI: browser lists jobs, form submit redirects to a live " +
      "request page, requests table shows the outcome") {
    withApi { (base, _) =>
      // job browser renders every submittable job with its submit form
      val browseRes = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/ui")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(browseRes.statusCode() === 200)
      assert(browseRes.headers().firstValue("Content-Type")
        .orElse("").startsWith("text/html"))
      assert(browseRes.body().contains("wordcount"))
      assert(browseRes.body().contains("runaway"))
      assert(browseRes.body().contains("""action="/ui/job/wordcount""""))

      // the HTML submit is a POST + See Other to the request page
      // (HttpClient's default NEVER-follow leaves the 303 visible)
      val submitRes = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/ui/job/wordcount"))
          .POST(HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(submitRes.statusCode() === 303, submitRes.body())
      val loc = submitRes.headers().firstValue("Location").orElse("")
      assert(loc.startsWith("/ui/request/"), loc)
      val id = loc.stripPrefix("/ui/request/")

      // the detail page is live — poll the JSON twin to completion,
      // then the HTML must report the terminal state with no refresh
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while ({
        val (_, b) = send("GET", s"$base/request/$id")
        field(b, "succeeded") == "null" && System.nanoTime() < deadline
      }) Thread.sleep(100)
      val (dc, db) = send("GET", s"$base$loc")
      assert(dc === 200)
      assert(db.contains("succeeded"), db)
      assert(!db.contains("http-equiv"),
        s"completed request page must not auto-refresh: $db")

      // and the requests table links it
      val (lc, lb) = send("GET", s"$base/ui/requests")
      assert(lc === 200)
      assert(lb.contains(id) && lb.contains("wordcount"), lb)
    }
  }

  test("invocation-tree trace: a chained mr_chain request serves its " +
      "step/plan tree as JSON and DOT (reference mr/trace.py surface)") {
    withApi { (base, _) =>
      val (code, body) = send("POST", s"$base/job/chain")
      assert(code === 202, body)
      val id = field(body, "request_id")
      // the trace is recorded at SUBMIT time — readable immediately,
      // no need to wait for completion
      val (tc, tb) = send("GET", s"$base/request/$id/trace")
      assert(tc === 200, tb)
      // the three chained steps, in execution order
      assert(field(tb, "job") === "chain", tb)
      assert(tb.contains(""""steps":["split","scatter","gather"]"""), tb)
      // the tree itself carries the markers on plan nodes with output
      // schemas (the per-node payload analog)
      assert(tb.contains(""""step":"gather""""), tb)
      assert(tb.contains(""""out":["""), tb)
      assert(tb.contains(""""children":["""), tb)
      // DOT source: digraph with request/job header nodes and the
      // step-labeled plan nodes, edges in data-flow direction
      val (dc, db) = send("GET", s"$base/request/$id/trace.dot")
      assert(dc === 200, db)
      assert(db.startsWith("// Trace of request"), db.take(120))
      assert(db.contains("digraph trace {") && db.contains("Q -> J"), db)
      for (s <- Seq("split", "scatter", "gather"))
        assert(db.contains(s"""S \\"$s\\""""), s"step $s missing in dot:\n$db")
      assert(db.contains("[label=\"feeds\"]"), db)
      // a raw submitAsync-style request has no trace → 404 on the
      // trace routes but 200 on the request itself
      val (_, rb) = send("POST", s"$base/job/runaway")
      val rid = field(rb, "request_id")
      assert(send("GET", s"$base/request/$rid")._1 === 200)
      send("DELETE", s"$base/request/$rid")
      // runaway was built from a DataFrame too, so it DOES have a
      // trace; unknown ids are the 404 path
      assert(send("GET", s"$base/request/nope/trace")._1 === 404)
      assert(send("GET", s"$base/request/nope/trace.dot")._1 === 404)
    }
  }

  test("unknown job name, request id, and route are 404") {
    withApi { (base, _) =>
      assert(send("POST", s"$base/job/nope")._1 === 404)
      assert(send("GET", s"$base/request/nope")._1 === 404)
      assert(send("DELETE", s"$base/request/nope")._1 === 404)
      assert(send("GET", s"$base/whatever")._1 === 404)
      assert(send("POST", s"$base/ui/job/nope")._1 === 404)
      assert(send("GET", s"$base/ui/request/nope")._1 === 404)
    }
  }

  test("DELETE cancels an in-flight request") {
    withApi { (base, _) =>
      val (code, body) = send("POST", s"$base/job/runaway")
      assert(code === 202, body)
      val id = field(body, "request_id")
      Thread.sleep(1500) // let the job actually start
      assert(send("DELETE", s"$base/request/$id")._1 === 200)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var last = ""
      while ({
        val (_, b) = send("GET", s"$base/request/$id")
        last = b
        field(b, "completed") == "false" && System.nanoTime() < deadline
      }) Thread.sleep(100)
      assert(field(last, "succeeded") === "false",
        s"cancelled job must not report success: $last")
    }
  }

  test("reap drops completed requests but keeps them pollable before") {
    withApi { (base, _) =>
      val (_, body) = send("POST", s"$base/job/wordcount")
      val id = field(body, "request_id")
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while ({
        val (_, b) = send("GET", s"$base/request/$id")
        field(b, "succeeded") == "null" && System.nanoTime() < deadline
      }) Thread.sleep(100)
      // still pollable after completion…
      assert(send("GET", s"$base/request/$id")._1 === 200)
      // …until an explicit reap
      val (rc, rb) = send("POST", s"$base/reap")
      assert(rc === 200 && field(rb, "live") === "0", rb)
      assert(send("GET", s"$base/request/$id")._1 === 404)
    }
  }

  test("restart recovery: a new server over the same FileRequestStore " +
      "still serves completed requests; stale running records retire") {
    val sinkRoot = Files.createTempDirectory("graft-http-restart").toString
    val store = new FileRequestStore(
      Files.createTempDirectory("graft-reqstore"))
    val jobsMap = Map("wordcount" -> (MrQueries.mrWordcount _))
    val api1 = HttpApi.start(spark, sfDir, sinkRoot, jobsMap, store = store)
    val (code, body) =
      send("POST", s"http://127.0.0.1:${api1.port}/job/wordcount")
    assert(code === 202, body)
    val id = field(body, "request_id")
    // wait for the DURABLE outcome record (the completion record lands
    // asynchronously after the job finishes; a bounce inside that
    // window truthfully retires the request as interrupted)
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!store.get(id).exists(_.status == RequestRecord.Succeeded) &&
        System.nanoTime() < deadline) Thread.sleep(100)
    assert(store.get(id).exists(_.status == RequestRecord.Succeeded))
    api1.stop() // driver bounce

    val api2 = HttpApi.start(spark, sfDir, sinkRoot, jobsMap, store = store)
    try {
      val base2 = s"http://127.0.0.1:${api2.port}"
      val (c, b) = send("GET", s"$base2/request/$id")
      assert(c === 200, b)
      assert(field(b, "name") === "wordcount", b)
      assert(field(b, "status") === "succeeded", b)
      assert(field(b, "succeeded") === "true", b)
      assert(field(b, "recovered") === "true", b)
      assert(field(b, "sink") === s"$sinkRoot/wordcount", b)
      val (lc, lb) = send("GET", s"$base2/requests")
      assert(lc === 200 && lb.contains(id), lb)

      // a record still `running` at adoption time belonged to the dead
      // JVM: the restart sweep retires it as interrupted
      store.put(RequestRecord("req-dead", "wordcount",
        s"$sinkRoot/wordcount", 1L, RequestRecord.Running, None))
      val api3 = HttpApi.start(spark, sfDir, sinkRoot, jobsMap, store = store)
      try {
        val (c3, b3) =
          send("GET", s"http://127.0.0.1:${api3.port}/request/req-dead")
        assert(c3 === 200 && field(b3, "status") === "interrupted", b3)
        assert(field(b3, "succeeded") === "false", b3)
        assert(field(b3, "completed") === "true", b3)
      } finally api3.stop()

      // reap prunes the durable records too (request_cleanup semantics)
      val (rc, rb) = send("POST", s"$base2/reap")
      assert(rc === 200, rb)
      assert(send("GET", s"$base2/request/$id")._1 === 404)
      assert(store.load().isEmpty, "reap must sweep the store")
    } finally api2.stop()
  }

  test("recovered-record JSON escapes quotes/backslashes/control chars " +
      "in user-controlled fields (ADVICE r14)") {
    val store = new FileRequestStore(
      Files.createTempDirectory("graft-reqstore-esc"))
    store.put(RequestRecord("req-esc", "wo\"rd\\count",
      "/tmp/si\"nk\npath", 1L, RequestRecord.Succeeded, Some(2L)))
    val api = HttpApi.start(spark, sfDir,
      Files.createTempDirectory("graft-http-esc").toString,
      Map("wordcount" -> (MrQueries.mrWordcount _)), store = store)
    try {
      val (c, b) =
        send("GET", s"http://127.0.0.1:${api.port}/request/req-esc")
      assert(c === 200, b)
      // must be machine-parseable JSON with the original strings back
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(b)
      assert(node.get("name").asText === "wo\"rd\\count")
      assert(node.get("sink").asText === "/tmp/si\"nk\npath")
      assert(node.get("status").asText === "succeeded")
    } finally api.stop()
  }
}
