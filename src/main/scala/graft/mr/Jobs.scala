package graft.mr

import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors, ThreadFactory}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.Try

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
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
  * Progress introspection: the reference exposes per-request
  * invocation-tree state for polling (reference: mr/views/request.py,
  * mr/models/kv/trees/ — a client GETs the request id and watches
  * map/reduce steps tick over). [[JobHandle.progress]] is that
  * surface re-expressed over Spark's own scheduler events: a shared
  * [[SparkListener]] attributes every job/stage/task start and finish
  * to the submitting job group, so a poller sees live task counts
  * for exactly its job, not the whole cluster.
  *
  * Handle lifecycle: completed handles are reaped from the registry
  * (reference: mr/request_cleanup.py:18 prunes finished-request
  * state) — a driver submitting jobs for months never accumulates
  * them. A reap runs on every submit; `reap()` is also explicit.
  *
  * Threading: job actions block on Spark (collect/save), so they run
  * on a dedicated unbounded cached pool of named daemon threads —
  * NOT `ExecutionContext.global`, whose fork-join pool is sized for
  * CPU-bound work and can be starved by N long-blocking actions
  * (starving everything else that shares it, including callbacks).
  */
object Jobs {

  /** Point-in-time view of a running job's scheduler progress.
    * `tasksDone` is monotone non-decreasing for the handle's
    * lifetime; `tasksTotal` grows as the action launches further
    * Spark jobs (a multi-stage action is many jobs), so
    * `fraction` may step back when new work is discovered —
    * poll `tasksDone` for a strictly monotone signal. `fraction`
    * is pinned to 1.0 once the handle completes (success OR
    * failure — it reports "finished", not "succeeded"). */
  final case class Progress(jobsStarted: Int, jobsEnded: Int,
      tasksTotal: Long, tasksDone: Long, completed: Boolean) {
    def fraction: Double =
      if (completed) 1.0
      else if (tasksTotal <= 0L) 0.0
      else math.min(0.99, tasksDone.toDouble / tasksTotal)
  }

  final case class JobHandle(name: String, groupId: String,
      result: Future[Try[Unit]],
      private[mr] val cancelled: AtomicBoolean,
      /** Submit-time invocation-tree trace (reference: mr/trace.py's
        * per-request graph; mr/views/job.py serves it). Present for
        * DataFrame-bearing submissions ([[submitJob]]); None for raw
        * [[submitAsync]] actions and cache-hit handles, whose work is
        * opaque to the planner. */
      trace: Option[Trace.RequestTrace] = None) {

    /** Final counters, captured when reap() retires this handle's
      * groupProgress entry — a poller holding the handle (e.g.
      * HttpApi until an explicit /reap) keeps seeing the completed
      * job's numbers instead of zeros. */
    private[mr] val retired =
      new java.util.concurrent.atomic.AtomicReference[GroupCounters](null)

    /** Run `cb` when the job finishes (delivery included), with its
      * outcome. Registering after completion fires immediately. */
    def onComplete(cb: Try[Unit] => Unit): Unit =
      result.foreach(cb)(Jobs.ec)

    def isCompleted: Boolean = result.isCompleted

    /** Live scheduler progress for this job's group (the
      * reference's request-polling surface). */
    def progress: Progress = {
      val c = Option(groupProgress.get(groupId))
        .orElse(Option(retired.get()))
      Progress(
        jobsStarted = c.map(_.jobsStarted.get()).getOrElse(0),
        jobsEnded = c.map(_.jobsEnded.get()).getOrElse(0),
        tasksTotal = c.map(_.tasksTotal.get()).getOrElse(0L),
        tasksDone = c.map(_.tasksDone.get()).getOrElse(0L),
        completed = isCompleted)
    }
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

  /** Header-injection guard: HTTP and MIME header VALUES must not
    * contain CR/LF — a newline in a job name or subject would
    * terminate the header and inject arbitrary headers (or, in MIME,
    * body content). Rejects rather than strips: a silently mangled
    * job name is harder to debug than a loud submit-time failure.
    * With `asciiOnly` (MIME headers) it also rejects non-ASCII and
    * control characters — these writers do not implement RFC 2047
    * encoded-words, so a non-ASCII subject would be relay-mangled. */
  private[mr] def headerSafe(field: String, v: String,
      asciiOnly: Boolean = false): String = {
    if (v.exists(c => c == '\r' || c == '\n'))
      throw new IllegalArgumentException(
        s"$field must not contain CR/LF: '${v.take(64)}'")
    if (asciiOnly && v.exists(c => c < 0x20 || c > 0x7e))
      throw new IllegalArgumentException(
        s"$field must be printable ASCII in a MIME header: '${v.take(64)}'")
    v
  }

  /** One shared client: connection pooling across deliveries, no
    * per-writer socket churn. */
  private[mr] lazy val httpClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .build()

  /** Resolve the request id of the job group this delivery runs
    * under ([[submitAsync]] set it on this thread before launching
    * the action) — the reference's `request.request_id`. */
  private def requestId(df: DataFrame): String =
    Option(df.sparkSession.sparkContext
      .getLocalProperty("spark.jobGroup.id")).getOrElse("")

  /** POST the result as one JSON array to a webhook (reference
    * result_writers/http.py:11: `requests.<verb>(url, headers,
    * json.dumps(list(results)))` then `raise_for_status`). Identity
    * headers mirror the reference's `X-REQUEST-ID`/`X-JOB-NAME`.
    *
    * Result-plane, not data-plane: like the reference, the whole
    * result is serialized into one request body, so this is for the
    * small aggregate outputs jobs end in — never a raw table dump.
    * `maxRows` fails delivery loudly rather than ship a silently
    * truncated result; a non-2xx response fails the job the same way
    * `raise_for_status` does. */
  final case class HttpWriter(url: String, verb: String = "POST",
      maxRows: Int = 100000) extends ResultWriter {
    def deliver(jobName: String, df: DataFrame): Unit = {
      val rows = df.toJSON.take(maxRows + 1)
      if (rows.length > maxRows)
        throw new IllegalStateException(
          s"HttpWriter: result of '$jobName' exceeds maxRows=$maxRows; " +
            "use SinkWriter for bulk output")
      val body = rows.mkString("[", ",", "]")
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(url))
        .header("Content-Type", "application/json")
        .header("X-REQUEST-ID", headerSafe("request id", requestId(df)))
        .header("X-JOB-NAME", headerSafe("jobName", jobName))
        .method(verb,
          java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = httpClient.send(req,
        java.net.http.HttpResponse.BodyHandlers.discarding())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"HttpWriter: $verb $url returned ${resp.statusCode()}")
    }
  }

  /** Render the result as an RFC-822 MIME message — text body plus a
    * JSON attachment — and hand it to `transport` (reference
    * result_writers/email.py: EmailTemplate with a json attachment,
    * `{request_id}`/`{job_name}` replacements, send). This container
    * has no SMTP relay, so transport is pluggable: [[EmailWriter.spool]]
    * drops `.eml` files in a sendmail-style pickup directory; a real
    * deployment points transport at its relay. */
  final case class EmailWriter(to: Seq[String], from: String,
      transport: (String, String) => Unit,
      subject: String = "graft result: {job_name}",
      body: String = "Results of job {job_name} (request {request_id}) attached.",
      attachmentName: String = "result.json",
      maxRows: Int = 100000) extends ResultWriter {
    def deliver(jobName: String, df: DataFrame): Unit = {
      if (to.isEmpty)
        throw new IllegalStateException(
          "EmailWriter: at least one TO address is required")
      val rows = df.toJSON.take(maxRows + 1)
      if (rows.length > maxRows)
        throw new IllegalStateException(
          s"EmailWriter: result of '$jobName' exceeds maxRows=$maxRows")
      def fill(t: String): String = t
        .replace("{job_name}", jobName)
        .replace("{request_id}", requestId(df))
      val boundary = s"graft-${UUID.randomUUID()}"
      // base64 (76-char CRLF lines, JDK MIME encoder): the JSON array
      // is one arbitrarily long line of arbitrary UTF-8 — raw it would
      // blow RFC 5322's 998-octet line limit and invite relay
      // re-wrapping that corrupts the payload
      val attachment = java.util.Base64.getMimeEncoder.encodeToString(
        rows.mkString("[", ",", "]")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // every interpolated header value is injection-guarded: jobName
      // reaches Subject via fill(), addresses and the attachment name
      // are caller input — one CR/LF in any of them would forge headers
      val mime = new StringBuilder()
        .append(s"From: ${headerSafe("from", from, asciiOnly = true)}\r\n")
        .append(s"To: ${to.map(headerSafe("to", _, asciiOnly = true)).mkString(", ")}\r\n")
        .append(s"Subject: ${headerSafe("subject", fill(subject), asciiOnly = true)}\r\n")
        .append("MIME-Version: 1.0\r\n")
        .append(s"""Content-Type: multipart/mixed; boundary="$boundary"\r\n""")
        .append("\r\n")
        .append(s"--$boundary\r\n")
        .append("Content-Type: text/plain; charset=utf-8\r\n\r\n")
        .append(fill(body)).append("\r\n")
        .append(s"--$boundary\r\n")
        .append(s"""Content-Type: application/json; charset=utf-8; name="${headerSafe("attachmentName", attachmentName, asciiOnly = true)}"\r\n""")
        .append("Content-Transfer-Encoding: base64\r\n")
        .append(
          s"""Content-Disposition: attachment; filename="${headerSafe("attachmentName", attachmentName, asciiOnly = true)}"\r\n\r\n""")
        .append(attachment).append("\r\n")
        .append(s"--$boundary--\r\n")
        .toString()
      transport(jobName, mime)
    }
  }

  object EmailWriter {
    /** Sendmail-style pickup-directory transport: each delivery is
      * one `<dir>/<jobName>-<uuid>.eml`. */
    def spool(dir: String): (String, String) => Unit = { (jobName, mime) =>
      val d = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(
        d.resolve(s"$jobName-${UUID.randomUUID()}.eml"),
        mime.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
  }

  /** Named daemon-thread factory — shared with [[HttpApi]]'s server
    * pool so thread policy lives in one place. */
  private[mr] def namedDaemonFactory(prefix: String): ThreadFactory =
    new ThreadFactory {
      private val n = new AtomicInteger(0)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"$prefix-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    }

  /** Unbounded cached pool of named daemon threads: each submitted
    * job parks one thread on its blocking Spark action, however many
    * are in flight; idle threads die after 60 s (Executors default),
    * so a quiet driver holds zero. */
  private val pool =
    Executors.newCachedThreadPool(namedDaemonFactory("graft-job"))
  private implicit val ec: ExecutionContext =
    ExecutionContext.fromExecutorService(pool)

  /** Live registry — bounded by construction: every submit reaps
    * completed entries first. Keyed by groupId (unique per submit). */
  private val registry = new ConcurrentHashMap[String, JobHandle]()

  /** Per-group scheduler counters, fed by [[groupListener]]. */
  private[mr] final class GroupCounters {
    val jobsStarted = new AtomicInteger(0)
    val jobsEnded = new AtomicInteger(0)
    val tasksTotal = new AtomicLong(0L)
    val tasksDone = new AtomicLong(0L)
  }
  private val groupProgress = new ConcurrentHashMap[String, GroupCounters]()
  private val stageToGroup = new ConcurrentHashMap[Int, String]()
  private val jobToGroup = new ConcurrentHashMap[Int, String]()
  private val jobToStages = new ConcurrentHashMap[Int, Seq[(Int, Long)]]()
  private val submittedStages = ConcurrentHashMap.newKeySet[Int]()

  /** One listener per SparkContext (keyed by applicationId),
    * installed lazily on first submit. Only groups in
    * [[groupProgress]] — i.e. groups this object created — are
    * tracked; foreign jobs are ignored. */
  private val listenerInstalled = ConcurrentHashMap.newKeySet[String]()
  private object groupListener extends SparkListener {
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val group = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      group.flatMap(g => Option(groupProgress.get(g))).foreach { c =>
        c.jobsStarted.incrementAndGet()
        c.tasksTotal.addAndGet(js.stageInfos.map(_.numTasks.toLong).sum)
        val g = group.get
        jobToGroup.put(js.jobId, g)
        jobToStages.put(js.jobId,
          js.stageInfos.map(si => si.stageId -> si.numTasks.toLong))
        // putIfAbsent: a stage listed by concurrent jobs from two
        // tracked groups (shared/reused lineage) keeps its first
        // attribution instead of being silently re-pointed — task
        // counts for that stage stay with one group for its lifetime.
        // (Job-level counters resolve through jobToGroup, never through
        // this map, so a shared head stage can't misattribute them.)
        js.stageInfos.foreach(si => stageToGroup.putIfAbsent(si.stageId, g))
      }
    }
    override def onStageSubmitted(
        ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
      if (stageToGroup.containsKey(ss.stageInfo.stageId))
        submittedStages.add(ss.stageInfo.stageId)
      ()
    }
    // Only successful attempts count: a failed/killed/speculative
    // attempt would push tasksDone past tasksTotal.
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (te.reason == org.apache.spark.Success)
        Option(stageToGroup.get(te.stageId))
          .flatMap(g => Option(groupProgress.get(g)))
          .foreach(_.tasksDone.incrementAndGet())
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      Option(jobToStages.remove(je.jobId)).foreach { stages =>
        // the ended job's OWN group — resolving via a (possibly shared,
        // first-wins) stage would credit jobsEnded and the skipped-task
        // subtraction to whichever group claimed the stage first
        val ownGroup = Option(jobToGroup.remove(je.jobId))
        val counters = ownGroup.flatMap(g => Option(groupProgress.get(g)))
        counters.foreach(_.jobsEnded.incrementAndGet())
        counters.foreach { c =>
          val uncredited = uncreditedTasks(stages, ownGroup,
            submittedStages.contains, s => Option(stageToGroup.get(s)))
          if (uncredited > 0) c.tasksTotal.addAndGet(-uncredited)
          ()
        }
        stages.foreach { case (s, _) =>
          // keep the mapping while any still-running job lists this
          // stage (shared-stage edge): removing it here would drop the
          // other job's remaining onTaskEnd counts.
          val stillListed = {
            var found = false
            jobToStages.forEach { (_, ss) =>
              if (!found && ss.exists(_._1 == s)) found = true
            }
            found
          }
          if (!stillListed) {
            stageToGroup.remove(s); submittedStages.remove(s)
          }
          ()
        }
      }
    }
  }
  /** Tasks a just-ended job listed in its group's tasksTotal
    * (onJobStart) that will never be credited to THAT group's
    * tasksDone — subtracted at job end so `fraction` can reach 1:
    * (a) stages Spark skipped entirely (cached/reused lineage) never
    * ran their tasks; (b) shared stages whose first-wins attribution
    * ([[stageToGroup]] putIfAbsent) belongs to a DIFFERENT group —
    * onTaskEnd credits those tasks there, and before this clause a
    * group that merely listed such a stage counted tasks it could
    * never complete. A stage that is both (a skipped, foreign-owned
    * stage) subtracts once — the clauses are ORed, not summed. */
  private[mr] def uncreditedTasks(stages: Seq[(Int, Long)],
      ownGroup: Option[String], submitted: Int => Boolean,
      attributedTo: Int => Option[String]): Long =
    stages.collect { case (s, n) if !submitted(s) ||
        attributedTo(s).exists(g => !ownGroup.contains(g)) => n }.sum

  private def installListener(spark: SparkSession): Unit = {
    val appId = spark.sparkContext.applicationId
    if (listenerInstalled.add(appId))
      spark.sparkContext.addSparkListener(groupListener)
  }

  /** Drop completed handles (and their progress counters) from the
    * registry; returns live count. */
  def reap(): Int = {
    registry.forEach { (gid, h) =>
      if (h.isCompleted) {
        registry.remove(gid)
        // hand the counters to the handle before dropping the map
        // entry: anyone still holding the handle (HttpApi polls
        // until an explicit /reap) reads the final numbers, not 0s
        Option(groupProgress.remove(gid)).foreach(h.retired.compareAndSet(null, _))
      }
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
  def submitAsync(spark: SparkSession, name: String)(action: => Unit): JobHandle =
    submitWithTrace(spark, name, groupId => None)(action)

  /** Single construction point: the handle enters the registry fully
    * formed (trace included) — registering an untraced handle and
    * swapping a traced copy in afterwards would race [[reap]], whose
    * retired-counters handoff writes to whichever handle object the
    * registry holds at that instant. */
  private def submitWithTrace(spark: SparkSession, name: String,
      traceOf: String => Option[Trace.RequestTrace])(
      action: => Unit): JobHandle = {
    reap()
    installListener(spark)
    val group = s"graft-job-$name-${UUID.randomUUID().toString.take(8)}"
    groupProgress.put(group, new GroupCounters)
    val cancelled = new AtomicBoolean(false)
    // trace BEFORE the action launches: analysis shares lazy state
    // with the action's own execution — do not interleave them
    val tr = traceOf(group)
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
    val handle = JobHandle(name, group, fut, cancelled, tr)
    registry.put(group, handle)
    handle
  }

  /** Submit a job whose results are pushed to `writer` on success —
    * the async-POST-then-deliver flow of the reference's job API in
    * one call. The DataFrame is materialized by the writer itself
    * (one pass, no intermediate collect); computation and delivery
    * share the cancellable group.
    *
    * The submit also records the request's invocation-tree trace
    * (driver-side analysis only — no job runs): [[trace]] serves it
    * by request id for the life of the handle. A plan that fails
    * analysis will fail identically in the action thread, so trace
    * capture swallows nothing — it just defers the error to where
    * the job's `Try` reports it. */
  def submitJob(spark: SparkSession, name: String, df: DataFrame,
      writer: ResultWriter): JobHandle =
    submitWithTrace(spark, name, group =>
      Try(Trace.RequestTrace(group, name, Trace.ofDataset(df))).toOption) {
      writer.deliver(name, df)
    }

  /** The invocation-tree trace of a live (or completed-but-unreaped)
    * request — the reference's `GET` of a request's graph
    * (mr/views/job.py over mr/trace.py). Gone once the handle is
    * reaped, exactly as the reference's request trees are pruned by
    * request_cleanup.py. */
  def trace(requestId: String): Option[Trace.RequestTrace] =
    Option(registry.get(requestId)).flatMap(_.trace)

  // ----- content-keyed result cache (reference: mr/cache/) --------

  /** One cached submission: the job handle (pre-completed on a hit),
    * the sink path holding the result, and whether it was a hit. */
  final case class CachedSubmit(handle: JobHandle, path: String, hit: Boolean)

  /** Process-local default backend; deployments pass a shared
    * [[ResultCache]] to [[submitCached]] (the redis.py axis). */
  val defaultResultCache: InMemoryResultCache = new InMemoryResultCache

  /** Identical submissions in flight RIGHT NOW share one handle —
    * without this, two racing submits would both miss and write the
    * same sink concurrently. Entries leave after the cache is fed. */
  private val inflight = new ConcurrentHashMap[String, CachedSubmit]()

  /** Content key for a cached job: handler name + its REGISTERED
    * version + canonicalized args + the caller's input snapshot
    * version + the requested sink (root and format — a Csv request
    * must never be satisfied by a landed Parquet result under a
    * different root). Re-registering the handler (version bump),
    * changing an arg, advancing the input snapshot, or pointing at a
    * different sink rotates the key — that IS the invalidation
    * (nothing is purged; stale entries just stop being addressed, as
    * with the reference's Redis keys). Throws if the handler is not
    * registered: an unversioned transform has no stable content
    * identity to cache under. */
  def cacheKey(handler: String, args: Map[String, String],
      inputVersion: String, sinkRoot: String,
      format: Sinks.Format): String = {
    val ver = Handlers.resolve(handler).map(_.version).getOrElse(
      throw new NoSuchElementException(
        s"no handler registered under '$handler'"))
    val argStr = args.toSeq.sorted
      .map { case (k, v) => s"$k=$v" }.mkString("&")
    s"$handler@v$ver?$argStr!$inputVersion>$sinkRoot#${format.name}"
  }

  private[mr] def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Already-landed results complete instantly: the handle reports
    * completed=true / fraction 1.0 with zero scheduler counters. */
  private def completedHandle(name: String): JobHandle =
    JobHandle(name, s"graft-cachehit-$name-${UUID.randomUUID().toString.take(8)}",
      Future.successful(scala.util.Success(())), new AtomicBoolean(false))

  /** Submit `handler(input)` → `<sinkRoot>/<keyDigest>` unless an
    * identical submission already landed (then: pre-completed handle,
    * existing path, zero Spark work) or is in flight (then: the
    * in-flight submission's own handle). The handler is resolved at
    * submit time, so its version pins the key; the cache is only fed
    * on SUCCESS — a failed or cancelled job leaves no entry and the
    * next submit recomputes. Deleting a sink without rotating
    * `inputVersion` is operator error (the backend is authoritative),
    * same contract as the reference's Redis-held results. */
  def submitCached(spark: SparkSession, handler: String, input: DataFrame,
      inputVersion: String, sinkRoot: String,
      args: Map[String, String] = Map.empty,
      format: Sinks.Format = Sinks.Parquet,
      cache: ResultCache = defaultResultCache): CachedSubmit = {
    val key = cacheKey(handler, args, inputVersion, sinkRoot, format)
    cache.get(key) match {
      case Some(path) => CachedSubmit(completedHandle(handler), path, hit = true)
      case None =>
        // get + computeIfAbsent is not atomic: a completing twin can
        // cache.put + inflight.remove between them, and recomputing
        // here would mode("overwrite") the sink while cache-hit
        // readers are on it. So the cache is RE-CHECKED inside the
        // mapping (any entry visible now is complete — put happens
        // before remove) and a hit is returned pre-completed; it is
        // taken back out of inflight below since nothing will land.
        val sub = inflight.computeIfAbsent(key, { _ =>
          cache.get(key) match {
            case Some(path) =>
              CachedSubmit(completedHandle(handler), path, hit = true)
            case None =>
              val path = s"$sinkRoot/${sha256Hex(key).take(16)}"
              val hd = submitAsync(spark, handler) {
                Sinks.write(Handlers.run(handler, input), path, format)
                // the cache entry lands INSIDE the job body, after the
                // sink write and before the future completes: await()
                // returning success therefore happens-after the put,
                // so an immediate identical resubmit always hits. An
                // onComplete callback is unordered vs await and was
                // measured to lose that race (JobsSpec invalidation
                // stress). A throw above skips the put — failed or
                // cancelled jobs still leave no entry.
                cache.put(key, path)
              }
              hd.onComplete { _ =>
                // remove-after-complete only; the put already happened
                // in-body (so put-before-remove still holds for the
                // re-check above).
                inflight.remove(key)
                ()
              }
              CachedSubmit(hd, path, hit = false)
          }
        })
        if (sub.hit) inflight.remove(key, sub)
        sub
    }
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
