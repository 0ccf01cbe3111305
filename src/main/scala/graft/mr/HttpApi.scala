package graft.mr

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, Executors}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin REST veneer over [[Jobs]] — the reference's HTTP front door
  * re-expressed (reference: mr/app/main.py boots the Flask app;
  * mr/views/job.py:33 `POST /job/<workflow>/<job>` submits;
  * mr/views/request.py lets a client poll its request id and watch
  * steps tick over; mr/request_cleanup.py prunes finished-request
  * state). The data plane stays 100 % Spark: a POST only *launches* a
  * registered query (DataFrame → sink through [[Jobs.submitJob]]),
  * polling reads the SparkListener-backed [[Jobs.Progress]] counters,
  * and results land in the sink — no row ever crosses HTTP. Built on
  * the JDK's `com.sun.net.httpserver` — zero added dependencies.
  *
  * Routes (`{name}` = a key of the `jobs` map; `{id}` = the
  * `request_id` a POST returned):
  *  - `GET /` → 200 service banner + live counts (reference
  *    mr/views/index.py's index route)
  *  - `GET /jobs` → 200 sorted array of submittable job names — the
  *    reference's job browser (mr/views/ui/job.py: navigate the
  *    submittable workflows/jobs)
  *  - `GET /requests` → 200 array of every tracked request (active
  *    AND completed-but-unreaped), each with its `request_id` and the
  *    same progress fields as `GET /request/{id}` — the operator's
  *    "what is this engine doing" surface
  *  - `POST /job/{name}` → 202 `{"request_id":"…"}`; 404 unknown name
  *  - `GET /request/{id}` → 200 `{"name":…,"jobs_started":…,
  *    "jobs_ended":…,"tasks_total":…,"tasks_done":…,"fraction":…,
  *    "completed":…,"succeeded":true|false|null}`; 404 unknown id
  *  - `GET /request/{id}/trace` → 200 the request's invocation-tree
  *    trace as a step/plan JSON tree (reference: mr/views/job.py
  *    serving mr/trace.py's per-request graph); 404 unknown id or a
  *    request with no recorded trace
  *  - `GET /request/{id}/trace.dot` → 200 the same graph as graphviz
  *    DOT source, `text/vnd.graphviz` (the reference's `get_source`;
  *    rendering is the caller's `dot` binary, as in mr/trace.py:320)
  *  - `DELETE /request/{id}` → 200 `{"cancelled":"…"}`; 404 unknown
  *  - `POST /reap` → 200 `{"live":N}` — drop completed request state
  *
  * Human HTML surface (the reference's job-browser UI —
  * mr/views/ui/job.py routes Jinja templates under
  * mr/resources/templates/; here the pages render server-side from
  * the same live registries the JSON routes read, with inline CSS
  * instead of the reference's CDN Bootstrap — this engine assumes
  * zero egress):
  *  - `GET /ui` → job browser: every submittable job with a one-click
  *    submit form (reference ui_job_get_browser)
  *  - `POST /ui/job/{name}` → submit + `303 See Other` to the new
  *    request's page (the HTML twin of `POST /job/{name}`)
  *  - `GET /ui/requests` → live request table (id, job, progress,
  *    outcome), each linking to its detail page
  *  - `GET /ui/request/{id}` → request detail with a progress bar;
  *    auto-refreshes while incomplete
  *
  * Lifecycle: completed requests stay pollable until an explicit
  * `/reap` (the reference equivalently keeps request trees until
  * request_cleanup runs) — a long-lived server should reap on its
  * own cadence. `stop()` shuts the listener down; in-flight Spark
  * jobs keep running under [[Jobs]] and remain cancellable there.
  */
final class HttpApi private (spark: SparkSession, dataDir: String,
    sinkRoot: String, jobs: Map[String, (SparkSession, String) => DataFrame],
    server: HttpServer, store: RequestStore) {

  /** Request-id → handle; unlike [[Jobs]]' own registry this keeps
    * completed handles pollable until [[reap]]. */
  private val requests = new ConcurrentHashMap[String, Jobs.JobHandle]()

  // Restart adoption sweep (reference: a rebooted front-end reads its
  // requests back from etcd): any record still `running` belonged to
  // a JVM that died with the job — nothing can ever complete it (jobs
  // are process-local), so it is retired as `interrupted` rather than
  // reported running forever. One front-end per store by contract.
  store.load().filter(_.status == RequestRecord.Running).foreach { r =>
    store.put(r.copy(status = RequestRecord.Interrupted,
      completedAtMs = Some(System.currentTimeMillis())))
  }

  /** Submit + persist: the `running` record lands BEFORE the 202 (a
    * crash right after the response still leaves the id resolvable),
    * the outcome record on completion. */
  private def submitTracked(name: String,
      q: (SparkSession, String) => DataFrame): Jobs.JobHandle = {
    val handle = Jobs.submitJob(spark, name, q(spark, dataDir),
      Jobs.SinkWriter(sinkRoot))
    val rec = RequestRecord(handle.groupId, name, s"$sinkRoot/$name",
      System.currentTimeMillis(), RequestRecord.Running, None)
    store.put(rec)
    requests.put(handle.groupId, handle)
    handle.onComplete { outcome =>
      store.put(rec.copy(
        status =
          if (outcome.isSuccess) RequestRecord.Succeeded
          else RequestRecord.Failed,
        completedAtMs = Some(System.currentTimeMillis())))
    }
    handle
  }

  /** Bound port (useful with `port = 0` = ephemeral). */
  def port: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)

  /** Drop completed request state — live handles AND their durable
    * records (the reference's request_cleanup prunes the persisted
    * request models too, mr/request_cleanup.py:18); recovered records
    * from a previous incarnation fall to the same sweep. Returns the
    * live count. */
  def reap(): Int = {
    requests.forEach { (id, h) =>
      if (h.isCompleted) {
        requests.remove(id)
        // The terminal record write rides the completion callback,
        // which can lag isCompleted (ADVICE r14): deleting before it
        // runs lets the late put resurrect an orphan record. Wait
        // (bounded) for the terminal status so the delete always
        // happens-after the final write; if the callback is somehow
        // stuck past the bound, the next reap's stale-record sweep
        // below retires the orphan.
        val deadline = System.nanoTime() + 2_000_000_000L
        while (store.get(id).exists(_.status == RequestRecord.Running) &&
            System.nanoTime() < deadline) Thread.sleep(1)
        store.delete(id)
        ()
      }
    }
    store.load().filterNot(r => requests.containsKey(r.requestId))
      .filter(_.status != RequestRecord.Running)
      .foreach(r => store.delete(r.requestId))
    requests.size()
  }

  private def json(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    try ex.getResponseBody.write(bytes)
    finally ex.close()
  }

  private def notFound(ex: HttpExchange, what: String): Unit =
    json(ex, 404, s"""{"error":"unknown $what"}""")

  // ---- HTML UI -----------------------------------------------------

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;")
    .replace(">", "&gt;").replace("\"", "&quot;")

  /** The one shared layout (the reference's layouts/base.html). CSS is
    * inline: this engine assumes zero egress, so no CDN stylesheets. */
  private def htmlPage(ex: HttpExchange, status: Int, title: String,
      body: String, refreshSec: Option[Int] = None): Unit = {
    val refresh = refreshSec
      .map(s => s"""<meta http-equiv="refresh" content="$s">""")
      .getOrElse("")
    val doc =
      s"""<!DOCTYPE html>
         |<html><head><title>graft — ${esc(title)}</title>$refresh
         |<meta name="viewport" content="width=device-width, initial-scale=1.0">
         |<style>
         |body{font-family:sans-serif;margin:2em;color:#222}
         |table{border-collapse:collapse}
         |td,th{border:1px solid #ccc;padding:.35em .7em;text-align:left}
         |th{background:#f4f4f4}
         |.bar{width:12em;background:#eee;height:1em;display:inline-block}
         |.bar>div{background:#4a8;height:1em}
         |nav a{margin-right:1em}
         |</style></head>
         |<body><nav><a href="/ui">jobs</a>
         |<a href="/ui/requests">requests</a></nav>
         |<h1>${esc(title)}</h1>$body</body></html>""".stripMargin
    val bytes = doc.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    try ex.getResponseBody.write(bytes)
    finally ex.close()
  }

  private def seeOther(ex: HttpExchange, location: String): Unit = {
    ex.getResponseHeaders.set("Location", location)
    ex.sendResponseHeaders(303, -1L)
    ex.close()
  }

  private def uiJobBrowser(ex: HttpExchange): Unit = {
    val rows = jobs.keys.toSeq.sorted.map { name =>
      s"""<tr><td>${esc(name)}</td><td><form method="post"
         | action="/ui/job/${esc(name)}"><button>submit</button>
         |</form></td></tr>""".stripMargin
    }
    htmlPage(ex, 200, "jobs",
      s"""<table><tr><th>job</th><th></th></tr>${rows.mkString}</table>""")
  }

  private def uiRequests(ex: HttpExchange): Unit = {
    import scala.jdk.CollectionConverters._
    val rows = requests.asScala.toSeq.sortBy(_._1).map { case (id, h) =>
      val p = h.progress
      val outcome = h.result.value match {
        case Some(scala.util.Success(t)) =>
          if (t.isSuccess) "succeeded" else "failed"
        case Some(scala.util.Failure(_)) => "failed"
        case None => "running"
      }
      s"""<tr><td><a href="/ui/request/${esc(id)}">${esc(id)}</a></td>
         |<td>${esc(h.name)}</td><td>${"%.0f".format(p.fraction * 100)}%</td>
         |<td>$outcome</td></tr>""".stripMargin
    }
    htmlPage(ex, 200, "requests",
      s"""<table><tr><th>request</th><th>job</th><th>progress</th>
         |<th>state</th></tr>${rows.mkString}</table>""".stripMargin)
  }

  private def uiRequestDetail(ex: HttpExchange, id: String,
      h: Jobs.JobHandle): Unit = {
    val p = h.progress
    val pct = math.round(p.fraction * 100).toInt
    val outcome = h.result.value match {
      case Some(scala.util.Success(t)) =>
        if (t.isSuccess) "succeeded" else "failed"
      case Some(scala.util.Failure(_)) => "failed"
      case None => "running"
    }
    // the reference's job view links the request's invocation graph
    // (mr/views/job.py); here: chained step names + the raw trace
    val traceRow = h.trace.map { t =>
      val steps =
        if (t.steps.nonEmpty) esc(t.steps.mkString(" → ")) else "(no steps)"
      s"""<tr><th>steps</th><td>$steps
         | — <a href="/request/${esc(id)}/trace">trace</a>
         | <a href="/request/${esc(id)}/trace.dot">dot</a></td></tr>"""
        .stripMargin
    }.getOrElse("")
    val body =
      s"""<table>
         |<tr><th>request</th><td>${esc(id)}</td></tr>
         |<tr><th>job</th><td>${esc(h.name)}</td></tr>
         |<tr><th>progress</th><td><span class="bar">
         |<div style="width:$pct%"></div></span> $pct%
         |(${p.tasksDone}/${p.tasksTotal} tasks)</td></tr>
         |<tr><th>state</th><td>$outcome</td></tr>
         |$traceRow
         |</table>""".stripMargin
    // poll-by-refresh while running (the reference's UI leaned on
    // client JS; a meta refresh needs no script assets at all)
    htmlPage(ex, 200, s"request ${h.name}", body,
      refreshSec = if (p.completed) None else Some(2))
  }

  /** What a restarted front-end can truthfully serve for a request
    * whose JVM is gone: persisted lifecycle state, no live counters.
    * Shares field names with [[progressJson]] where the meaning
    * matches (`name`, `completed`, `succeeded`) and adds the durable
    * extras (`status`, `sink`, timestamps); `"recovered":true` marks
    * the source so a poller can tell the two shapes apart. */
  /** JSON string escape for the builder-free endpoints: job names and
    * sinkPath are user-controlled — a quote/backslash/control char
    * would otherwise emit invalid JSON (ADVICE r14). */
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def recordJson(r: RequestRecord): String = {
    val succeeded = r.status match {
      case RequestRecord.Succeeded => "true"
      case RequestRecord.Running => "null"
      case _ => "false"
    }
    s"""{"name":${jstr(r.job)},"completed":${r.status != RequestRecord.Running}""" +
      s""","succeeded":$succeeded,"status":${jstr(r.status)}""" +
      s""","sink":${jstr(r.sinkPath)},"submitted_at_ms":${r.submittedAtMs}""" +
      s""","completed_at_ms":${r.completedAtMs.map(_.toString).getOrElse("null")}""" +
      s""","recovered":true}"""
  }

  private def progressJson(h: Jobs.JobHandle): String = {
    val p = h.progress
    // completed-but-outcome-pending is a real window (future callbacks
    // run after the action returns): succeeded is null until known
    val succeeded = h.result.value match {
      case Some(scala.util.Success(t)) => t.isSuccess.toString
      case Some(scala.util.Failure(_)) => "false"
      case None => "null"
    }
    s"""{"name":${jstr(h.name)},"jobs_started":${p.jobsStarted}""" +
      s""","jobs_ended":${p.jobsEnded},"tasks_total":${p.tasksTotal}""" +
      s""","tasks_done":${p.tasksDone},"fraction":${p.fraction}""" +
      s""","completed":${p.completed},"succeeded":$succeeded}"""
  }

  private def route(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath
    (method, path.split("/").toList.filter(_.nonEmpty)) match {
      case ("GET", Nil) =>
        json(ex, 200,
          s"""{"service":"graft","jobs":${jobs.size},"requests":${requests.size()}}""")
      case ("GET", "jobs" :: Nil) =>
        json(ex, 200, jobs.keys.toSeq.sorted
          .map("\"" + _ + "\"").mkString("[", ",", "]"))
      case ("GET", "requests" :: Nil) =>
        // snapshot under the map's weak consistency: live entries
        // render from their handles; store records whose JVM is gone
        // (a restarted front-end) render from their persisted state,
        // ordered for determinism
        val items = {
          import scala.jdk.CollectionConverters._
          val live = requests.asScala.toSeq.sortBy(_._1).map { case (id, h) =>
            s"""{"request_id":"$id",""" + progressJson(h).tail
          }
          val recovered = store.load()
            .filterNot(r => requests.containsKey(r.requestId))
            .map(r => s"""{"request_id":"${r.requestId}",""" +
              recordJson(r).tail)
          live ++ recovered
        }
        json(ex, 200, items.mkString("[", ",", "]"))
      case ("POST", "job" :: name :: Nil) =>
        jobs.get(name) match {
          case None => notFound(ex, "job")
          case Some(q) =>
            val handle = submitTracked(name, q)
            json(ex, 202, s"""{"request_id":"${handle.groupId}"}""")
        }
      case ("GET", "request" :: id :: Nil) =>
        Option(requests.get(id)) match {
          case None =>
            // driver-bounce recovery: the live handle is gone but the
            // durable record still resolves the id (reference:
            // mr/views/request.py over the persisted request model)
            store.get(id) match {
              case None => notFound(ex, "request")
              case Some(r) => json(ex, 200, recordJson(r))
            }
          case Some(h) => json(ex, 200, progressJson(h))
        }
      case ("GET", "request" :: id :: "trace" :: Nil) =>
        Option(requests.get(id)).flatMap(_.trace) match {
          case None => notFound(ex, "trace")
          case Some(t) => json(ex, 200, t.toJson)
        }
      case ("GET", "request" :: id :: "trace.dot" :: Nil) =>
        Option(requests.get(id)).flatMap(_.trace) match {
          case None => notFound(ex, "trace")
          case Some(t) =>
            val bytes = t.toDot.getBytes(StandardCharsets.UTF_8)
            ex.getResponseHeaders.set("Content-Type",
              "text/vnd.graphviz; charset=utf-8")
            ex.sendResponseHeaders(200, bytes.length.toLong)
            try ex.getResponseBody.write(bytes)
            finally ex.close()
        }
      case ("DELETE", "request" :: id :: Nil) =>
        Option(requests.get(id)) match {
          case None => notFound(ex, "request")
          case Some(h) =>
            Jobs.cancel(spark, h)
            json(ex, 200, s"""{"cancelled":"$id"}""")
        }
      case ("POST", "reap" :: Nil) =>
        json(ex, 200, s"""{"live":${reap()}}""")
      case ("GET", "ui" :: Nil) => uiJobBrowser(ex)
      case ("GET", "ui" :: "requests" :: Nil) => uiRequests(ex)
      case ("POST", "ui" :: "job" :: name :: Nil) =>
        jobs.get(name) match {
          case None => notFound(ex, "job")
          case Some(q) =>
            val handle = submitTracked(name, q)
            seeOther(ex, s"/ui/request/${handle.groupId}")
        }
      case ("GET", "ui" :: "request" :: id :: Nil) =>
        Option(requests.get(id)) match {
          case None => notFound(ex, "request")
          case Some(h) => uiRequestDetail(ex, id, h)
        }
      case _ => notFound(ex, "route")
    }
  }
}

object HttpApi {

  /** Start the server. `jobs` is the submittable query surface (e.g.
    * [[graft.SparkEntry.queries]]); `dataDir` is the parquet root the
    * queries read; results land under `sinkRoot/<jobName>`. Handlers
    * run on a cached daemon pool — submission itself never blocks (a
    * POST returns as soon as the action thread is launched).
    *
    * `store` is the durable request-record seam (reference:
    * mr/models/kv/request.py — requests survive a front-end bounce):
    * pass a [[FileRequestStore]] (or a shared backend) and a
    * RESTARTED server with the same store still resolves
    * `GET /request/{id}` and lists completed requests under
    * `GET /requests`. The in-memory default keeps single-process use
    * dependency-free. One front-end per store at a time. */
  def start(spark: SparkSession, dataDir: String, sinkRoot: String,
      jobs: Map[String, (SparkSession, String) => DataFrame],
      port: Int = 0,
      store: RequestStore = new InMemoryRequestStore): HttpApi = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(Executors.newCachedThreadPool(
      Jobs.namedDaemonFactory("graft-http")))
    val api = new HttpApi(spark, dataDir, sinkRoot, jobs, server, store)
    server.createContext("/", (ex: HttpExchange) =>
      try api.route(ex)
      catch {
        case scala.util.control.NonFatal(e) =>
          // route may already have sent headers (write failure
          // mid-response) — json would then throw IllegalStateException
          // from sendResponseHeaders. Close the exchange on every path
          // so a failed response is never abandoned.
          try api.json(ex, 500, s"""{"error":"${e.getClass.getSimpleName}"}""")
          catch { case scala.util.control.NonFatal(_) => () }
          finally ex.close()
      })
    server.start()
    api
  }
}
