package graft.mr

import java.util.concurrent.ConcurrentHashMap

/** Cross-session job-result cache — the Spark re-expression of the
  * reference's pluggable result cache (reference: mr/cache/cache.py:1
  * `Cache.set/get`; mr/cache/redis.py:7 the Redis-backed deployment
  * impl). The data plane already has Spark's CacheManager; this layer
  * is for the JOB surface: a driver (or several, sharing a backend)
  * re-submitting an identical job should get the already-landed sink
  * back instead of recomputing it.
  *
  * The key is CONTENT-derived ([[Jobs.cacheKey]]): handler name +
  * registered handler version + canonicalized args + an input
  * snapshot version. Invalidation is therefore key rotation — a
  * handler re-registered at a newer version, a changed arg, or a new
  * input snapshot simply misses and recomputes; nothing needs to be
  * purged for correctness (stale entries age out of a bounded
  * backend, exactly how the reference treats Redis).
  *
  * The default backend is process-local (the reference's non-Redis
  * dev mode). A cluster deployment plugs in a shared store by
  * implementing these two calls against it (the redis.py axis) and
  * passing it to [[Jobs.submitCached]] — values are plain strings
  * (sink paths), so any KV with get/set fits.
  */
trait ResultCache {
  /** The landed value for `key`, if present. (The reference raises
    * KeyError; an Option is the idiomatic Scala surface.) */
  def get(key: String): Option[String]
  def put(key: String, value: String): Unit
}

/** Process-local default backend. Unbounded by design at this scope:
  * one entry per distinct (handler, version, args, input) actually
  * computed by this driver — bounded by work done, not by data. */
final class InMemoryResultCache extends ResultCache {
  private val m = new ConcurrentHashMap[String, String]()
  def get(key: String): Option[String] = Option(m.get(key))
  def put(key: String, value: String): Unit = { m.put(key, value); () }
  private[mr] def clear(): Unit = m.clear()
  private[mr] def size: Int = m.size()
}
