package graft.mr

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Durable handler persistence — the re-expression of the reference's
  * KV-backed model store (reference: mr/models/kv/data_layer.py:93
  * `DataLayerKv.create_only/update_only` with CAS preconditions;
  * mr/models/kv/model.py persists handler definitions in etcd so a
  * restarted process recovers its full handler library).
  *
  * Compiled Scala cannot durably persist a closure, and the reference
  * never persists live objects either — it persists *source code* and
  * recompiles on load. The durable unit here is the same idea: a
  * serializable [[HandlerSpec]] (SQL text over a named input view, or
  * an out-of-process pipe command) from which the executable
  * `DataFrame => DataFrame` is REBUILT at restore time. Closure
  * handlers registered directly via [[Handlers.register]] stay
  * process-local by construction — the store tracks the durable
  * (spec-backed) population.
  *
  * Concurrency: [[FileHandlerStore]] is a single-writer seam
  * (per-instance lock + temp-file-then-atomic-rename, version CAS on
  * put — the same accepted-iff-strictly-newer rule as
  * [[Handlers.register]], so the store and the in-memory library
  * converge on identical verdicts). A multi-process deployment swaps
  * in a shared backend behind the same trait, exactly like
  * [[ResultCache]]'s redis.py axis.
  */
sealed trait HandlerSpec {
  /** Rebuild the executable transform from the persisted spec. */
  private[mr] def transform: DataFrame => DataFrame
}

object HandlerSpec {

  /** SQL-text handler: `{input}` in the statement resolves to the
    * handler's input frame (registered as a uniquely-named temp view
    * for the duration of analysis, then dropped — `spark.sql`
    * resolves eagerly, so the returned frame keeps no catalog
    * dependency). */
  final case class Sql(sql: String) extends HandlerSpec {
    private[mr] def transform: DataFrame => DataFrame = { df =>
      val view = "graft_handler_input_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      df.createOrReplaceTempView(view)
      try df.sparkSession.sql(sql.replace("{input}", view))
      finally { df.sparkSession.catalog.dropTempView(view); () }
    }
  }

  /** Out-of-process handler: rows piped through `cmd` as JSON lines
    * ([[Processors.pipe]]). */
  final case class Pipe(cmd: Seq[String],
      env: Map[String, String] = Map.empty) extends HandlerSpec {
    private[mr] def transform: DataFrame => DataFrame =
      Processors.pipe(cmd, env)
  }
}

/** One durable handler: metadata + rebuildable spec. */
final case class StoredHandler(name: String, version: Long,
    description: String, spec: HandlerSpec) {
  def toDef: Handlers.HandlerDef =
    Handlers.HandlerDef(name, version, description, spec.transform)
}

/** Pluggable durability backend for the handler registry. */
trait HandlerStore {
  /** CAS put: accepted iff the name is new or `h.version` is strictly
    * newer than the stored one — the reference's `update_only`
    * precondition, and the same rule as [[Handlers.register]]. */
  def put(h: StoredHandler): Boolean
  def delete(name: String): Boolean
  /** Every stored handler, name-sorted. */
  def load(): Seq[StoredHandler]
}

/** Process-local default — durable across [[Handlers.clear]] (a
  * library wipe/restart simulation) but not across the JVM. */
final class InMemoryHandlerStore extends HandlerStore {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[String, StoredHandler]()
  override def put(h: StoredHandler): Boolean =
    m.merge(h.name, h,
      (old, neu) => if (neu.version > old.version) neu else old) eq h
  override def delete(name: String): Boolean = m.remove(name) != null
  override def load(): Seq[StoredHandler] =
    m.values().asScala.toSeq.sortBy(_.name)
}

/** File-backed store: one `.properties` file per handler (JDK-native
  * escaping — no parser to get wrong), written temp-then-atomic-rename
  * so a crashed put never leaves a torn definition, version-CAS'd
  * under a per-instance lock. */
final class FileHandlerStore(root: Path) extends HandlerStore {
  Files.createDirectories(root)
  private val lock = new Object

  private def fileOf(name: String): Path =
    root.resolve(
      java.net.URLEncoder.encode(name, "UTF-8") + ".properties")

  private def write(h: StoredHandler): Unit = {
    val p = new Properties()
    p.setProperty("name", h.name)
    p.setProperty("version", h.version.toString)
    p.setProperty("description", h.description)
    h.spec match {
      case HandlerSpec.Sql(sql) =>
        p.setProperty("kind", "sql")
        p.setProperty("sql", sql)
      case HandlerSpec.Pipe(cmd, env) =>
        p.setProperty("kind", "pipe")
        cmd.zipWithIndex.foreach { case (c, i) =>
          p.setProperty(s"cmd.$i", c) }
        env.foreach { case (k, v) => p.setProperty(s"env.$k", v) }
    }
    val tmp = Files.createTempFile(root, ".put-", ".tmp")
    val out = Files.newOutputStream(tmp)
    try p.store(out, null) finally out.close()
    Files.move(tmp, fileOf(h.name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private def read(f: Path): StoredHandler = {
    val p = new Properties()
    val in = Files.newInputStream(f)
    try p.load(in) finally in.close()
    val spec = p.getProperty("kind") match {
      case "sql" => HandlerSpec.Sql(p.getProperty("sql"))
      case "pipe" =>
        val cmd = Iterator.from(0)
          .map(i => Option(p.getProperty(s"cmd.$i")))
          .takeWhile(_.isDefined).flatten.toSeq
        val env = p.stringPropertyNames().asScala
          .filter(_.startsWith("env.")).map(k =>
            k.stripPrefix("env.") -> p.getProperty(k)).toMap
        HandlerSpec.Pipe(cmd, env)
      case k => throw new IllegalStateException(
        s"unknown handler kind '$k' in $f")
    }
    StoredHandler(p.getProperty("name"), p.getProperty("version").toLong,
      p.getProperty("description"), spec)
  }

  override def put(h: StoredHandler): Boolean = lock.synchronized {
    val f = fileOf(h.name)
    val accept = !Files.exists(f) || read(f).version < h.version
    if (accept) write(h)
    accept
  }

  override def delete(name: String): Boolean = lock.synchronized {
    Files.deleteIfExists(fileOf(name))
  }

  override def load(): Seq[StoredHandler] = lock.synchronized {
    val s = Files.list(root)
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".properties"))
      .map(read).toSeq.sortBy(_.name)
    finally s.close()
  }
}

// ----- durable request records (reference: mr/models/kv/request.py,
// job.py — every request/job/invocation persists in etcd so a
// restarted front-end still serves GET /request/{id} and the cleanup
// sweep) -------------------------------------------------------------

/** One durable request record: what a restarted front-end can still
  * truthfully say about a request — identity, job name, sink path,
  * lifecycle status and timestamps. Live scheduler counters are
  * process-local by nature and are NOT persisted (the reference
  * likewise persists request/job/step state, not executor metrics). */
final case class RequestRecord(requestId: String, job: String,
    sinkPath: String, submittedAtMs: Long, status: String,
    completedAtMs: Option[Long])

object RequestRecord {
  val Running = "running"
  val Succeeded = "succeeded"
  val Failed = "failed"
  /** A record still `running` when a NEW front-end adopts the store:
    * the previous JVM died with the job — nothing will ever complete
    * it (jobs are process-local), so the restart sweep retires it. */
  val Interrupted = "interrupted"
}

/** Pluggable durability backend for request records — the same seam
  * shape as [[HandlerStore]]/[[Jobs.ResultCache]]: file default here,
  * a shared KV in a multi-process deployment. */
trait RequestStore {
  /** Upsert by requestId (submit writes `running`, completion
    * overwrites with the outcome — last write wins; there is exactly
    * one writer per request, the front-end that launched it). */
  def put(r: RequestRecord): Unit
  def get(id: String): Option[RequestRecord]
  /** Every stored record, requestId-sorted. */
  def load(): Seq[RequestRecord]
  def delete(id: String): Boolean
}

/** Process-local default — keeps [[HttpApi]] dependency-free when no
  * durability is asked for. */
final class InMemoryRequestStore extends RequestStore {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[String, RequestRecord]()
  override def put(r: RequestRecord): Unit = { m.put(r.requestId, r); () }
  override def get(id: String): Option[RequestRecord] = Option(m.get(id))
  override def load(): Seq[RequestRecord] =
    m.values().asScala.toSeq.sortBy(_.requestId)
  override def delete(id: String): Boolean = m.remove(id) != null
}

/** File-backed store: one `.properties` file per request, written
  * temp-then-atomic-rename (the [[FileHandlerStore]] discipline — a
  * crash mid-put never leaves a torn record). */
final class FileRequestStore(root: Path) extends RequestStore {
  Files.createDirectories(root)
  private val lock = new Object

  private def fileOf(id: String): Path =
    root.resolve(java.net.URLEncoder.encode(id, "UTF-8") + ".properties")

  override def put(r: RequestRecord): Unit = lock.synchronized {
    val p = new Properties()
    p.setProperty("requestId", r.requestId)
    p.setProperty("job", r.job)
    p.setProperty("sinkPath", r.sinkPath)
    p.setProperty("submittedAtMs", r.submittedAtMs.toString)
    p.setProperty("status", r.status)
    r.completedAtMs.foreach(t => p.setProperty("completedAtMs", t.toString))
    val tmp = Files.createTempFile(root, ".req-", ".tmp")
    val out = Files.newOutputStream(tmp)
    try p.store(out, null) finally out.close()
    Files.move(tmp, fileOf(r.requestId), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private def read(f: Path): RequestRecord = {
    val p = new Properties()
    val in = Files.newInputStream(f)
    try p.load(in) finally in.close()
    RequestRecord(p.getProperty("requestId"), p.getProperty("job"),
      p.getProperty("sinkPath"), p.getProperty("submittedAtMs").toLong,
      p.getProperty("status"),
      Option(p.getProperty("completedAtMs")).map(_.toLong))
  }

  override def get(id: String): Option[RequestRecord] = lock.synchronized {
    val f = fileOf(id)
    if (Files.exists(f)) Some(read(f)) else None
  }

  override def load(): Seq[RequestRecord] = lock.synchronized {
    val s = Files.list(root)
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".properties"))
      .map(read).toSeq.sortBy(_.requestId)
    finally s.close()
  }

  override def delete(id: String): Boolean = lock.synchronized {
    Files.deleteIfExists(fileOf(id))
  }
}
