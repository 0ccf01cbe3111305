package graft.mr

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Versioned runtime handler registry — the re-expression of the
  * reference's runtime-updatable handler library (reference:
  * mr/handlers/general.py:26-33 `HANDLER_DEFINITION_CLS(name,
  * version, description, source_code, …)`; general.py:158
  * `__update_handlers` syncs NEW/UPDATED/DELETED definitions from a
  * source without redeploying workers).
  *
  * Compiled Scala swaps *source code* for *closures*: a handler is a
  * named, versioned `DataFrame => DataFrame` transform registered at
  * runtime. Updates atomically shadow the previous version for new
  * resolutions, while jobs that already resolved a definition keep
  * the instance they hold — exactly the reference's staged-handler
  * behavior. Interactive redefinition (spark-shell, Livy-style REPL
  * sessions, or a plugin jar loaded at runtime) is the operational
  * path that replaces JobX's source-code push.
  */
object Handlers {

  final case class HandlerDef(name: String, version: Long,
      description: String, transform: DataFrame => DataFrame)

  final case class SyncDelta(created: Int, updated: Int, deleted: Int)

  private val library = new ConcurrentHashMap[String, HandlerDef]()

  /** All writes share one lock so [[sync]]'s put-then-delete pass is
    * atomic with respect to concurrent [[register]]/[[delete]] calls:
    * without it, a registration landing between sync's two loops
    * could be clobbered or deleted even though its version is newer,
    * breaking register()'s monotonic-version guarantee. Reads
    * ([[resolve]]/[[run]]/[[list]]) stay lock-free on the concurrent
    * map — a resolve during a sync sees either the old or the new
    * definition, never a torn state. */
  private val writeLock = new Object

  /** Register a definition. Accepted iff the name is new or the
    * version is strictly newer than the registered one (stale
    * re-registrations lose — registration order across threads then
    * cannot matter). Returns whether it was accepted. */
  def register(hd: HandlerDef): Boolean = writeLock.synchronized {
    val merged = library.merge(hd.name, hd,
      (old, neu) => if (neu.version > old.version) neu else old)
    merged eq hd
  }

  /** Latest registered definition, if any. */
  def resolve(name: String): Option[HandlerDef] =
    Option(library.get(name))

  /** Resolve and apply in one step. */
  def run(name: String, df: DataFrame): DataFrame =
    resolve(name) match {
      case Some(hd) => hd.transform(df)
      case None => throw new NoSuchElementException(
        s"no handler registered under '$name'")
    }

  def delete(name: String): Boolean = writeLock.synchronized {
    library.remove(name) != null
  }

  /** (name, version) of every registered handler, name-sorted. */
  def list: Seq[(String, Long)] =
    library.values().asScala.map(hd => (hd.name, hd.version))
      .toSeq.sortBy(_._1)

  /** Converge the library onto `source` exactly — the reference's
    * update loop (general.py:158): definitions new in the source are
    * created, same-name-different-version definitions are replaced
    * (the source is authoritative, unlike [[register]]'s monotonic
    * guard), and definitions absent from the source are deleted.
    * Atomic with respect to concurrent register/delete (see
    * [[writeLock]]). Returns the applied delta, as the reference
    * logs it. NOTE: the source's closure always wins — a same-version
    * put with a *different* closure still replaces the registered one
    * but is counted as unchanged in the delta (closures admit no
    * logical equality to report it by; keep versions honest). */
  def sync(source: Seq[HandlerDef]): SyncDelta = writeLock.synchronized {
    require(source.map(_.name).distinct.size == source.size,
      "duplicate handler names in source")
    val byName = source.map(hd => hd.name -> hd).toMap
    var created = 0
    var updated = 0
    var deleted = 0
    byName.foreach { case (name, hd) =>
      Option(library.put(name, hd)) match {
        case None => created += 1
        case Some(old) if old.version != hd.version => updated += 1
        case _ => () // same version: unchanged (closure still replaced)
      }
    }
    library.keySet().asScala.toSeq.foreach { name =>
      if (!byName.contains(name) && library.remove(name) != null)
        deleted += 1
    }
    SyncDelta(created, updated, deleted)
  }

  // ----- durable seam (reference: mr/models/kv/data_layer.py) ------

  /** Process-local default backend, mirroring
    * [[Jobs.defaultResultCache]]; deployments pass a
    * [[FileHandlerStore]] (or a shared backend behind the same trait)
    * to [[registerDurable]]/[[restore]]. */
  val defaultHandlerStore: InMemoryHandlerStore = new InMemoryHandlerStore

  /** Register a DURABLE handler: the serializable spec is CAS-put to
    * the store and, iff the store accepted it (name new or version
    * strictly newer — the same monotonic rule as [[register]]), the
    * rebuilt transform is registered in the live library. A restarted
    * process recovers it via [[restore]]. Closure handlers registered
    * via [[register]] stay process-local; the store tracks the
    * spec-backed population only. */
  def registerDurable(h: StoredHandler,
      store: HandlerStore = defaultHandlerStore): Boolean =
    writeLock.synchronized {
      val accepted = store.put(h)
      if (accepted) { register(h.toDef); () }
      accepted
    }

  /** Rebuild the live library from the store — the restart-recovery
    * path (reference: model.py's load-from-etcd). Each stored spec is
    * re-registered under the monotonic guard, so a restore can never
    * downgrade a definition the process already holds. Returns how
    * many definitions the library accepted. */
  def restore(store: HandlerStore = defaultHandlerStore): Int =
    writeLock.synchronized {
      store.load().count(h => register(h.toDef))
    }

  /** Test hook: empty the library. */
  private[mr] def clear(): Unit = library.clear()
}
