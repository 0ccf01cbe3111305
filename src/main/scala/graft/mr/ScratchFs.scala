package graft.mr

/** Where task scratch directories come from — the Spark re-expression
  * of the reference's pluggable FS backend (reference:
  * mr/fs/backend/fs_factory.py:1 `FilesystemFactory.get_instance`;
  * mr/fs/backend/tahoe.py:15 the remote Tahoe-LAFS impl wired in by
  * config). The Spark-first default is executor-LOCAL disk: scratch
  * IO then never crosses the network and needs zero coordination,
  * which is what per-task temp space wants at 1000 executors. A
  * deployment whose handlers genuinely need cross-task scratch (the
  * reference's Tahoe case) implements these two calls against its
  * shared mount (NFS path, FUSE-mounted object store, …) and installs
  * it with [[ScratchFs.use]] before building jobs.
  *
  * Serialization contract: the ACTIVE backend is captured into the
  * [[Ctx]] at construction on the driver and ships inside it to
  * executors — implementations must therefore be Serializable and
  * must not capture a live connection (open lazily per task, like
  * the factory's get_instance). */
trait ScratchBackend extends Serializable {
  /** Create and return a fresh, empty scratch directory for one task. */
  def newScratchDir(): java.nio.file.Path
  /** Best-effort removal when the task completes. */
  def release(dir: java.nio.file.Path): Unit
}

/** Default: a temp dir on the executor's local disk, recursively
  * deleted at task completion. */
object LocalScratchBackend extends ScratchBackend {
  def newScratchDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-scratch-")
  def release(dir: java.nio.file.Path): Unit = {
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); ()
    }
    rm(dir.toFile)
  }
}

/** The factory seam (fs_factory.py): driver-side registry of the
  * active backend, read once per job at [[Ctx]] construction. */
object ScratchFs {
  @volatile private var active: ScratchBackend = LocalScratchBackend
  def backend: ScratchBackend = active
  /** Install a backend for subsequently-built jobs (in-flight jobs
    * keep the backend their Ctx captured). */
  def use(b: ScratchBackend): Unit = { active = b }
  /** Restore the local default. */
  def reset(): Unit = { active = LocalScratchBackend }
}
