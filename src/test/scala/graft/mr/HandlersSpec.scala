package graft.mr

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.mr.Handlers.{HandlerDef, SyncDelta}

class HandlersSpec extends SparkSuite {

  private def docs: DataFrame =
    graft.Tables(spark, sfDir).documents

  private def count1(name: String) =
    HandlerDef(name, 1L, "count rows", df => df.agg(count(lit(1)).as("n")))
  private def count2(name: String) =
    HandlerDef(name, 2L, "count ids", df =>
      df.agg(countDistinct(col("doc_id")).as("n")))

  test("register / resolve / run a versioned handler") {
    Handlers.clear()
    assert(Handlers.register(count1("h")))
    val out = Handlers.run("h", docs)
    assert(out.head().getLong(0) === docs.count())
    assert(Handlers.resolve("h").map(_.version) === Some(1L))
  }

  test("newer version shadows; stale re-registration is rejected") {
    Handlers.clear()
    assert(Handlers.register(count1("h")))
    assert(Handlers.register(count2("h")), "v2 must shadow v1")
    assert(!Handlers.register(count1("h")), "v1 re-registration is stale")
    assert(Handlers.resolve("h").map(_.version) === Some(2L))
  }

  test("jobs holding a resolved definition keep it across updates") {
    Handlers.clear()
    Handlers.register(count1("h"))
    val resolved = Handlers.resolve("h").get
    Handlers.register(count2("h"))
    // the in-flight job still runs the definition it staged …
    assert(resolved.version === 1L)
    assert(resolved.transform(docs).head().getLong(0) === docs.count())
    // … while new resolutions see the update
    assert(Handlers.resolve("h").map(_.version) === Some(2L))
  }

  test("sync converges the library onto the source (new/updated/deleted)") {
    Handlers.clear()
    Handlers.register(count1("keep"))
    Handlers.register(count1("stale"))
    Handlers.register(count1("gone"))
    val delta = Handlers.sync(Seq(
      count1("keep"),     // same version → unchanged
      count2("stale"),    // version bump → updated
      count1("brandnew")  // absent → created
    ))                    // "gone" absent from source → deleted
    assert(delta === SyncDelta(created = 1, updated = 1, deleted = 1))
    assert(Handlers.list === Seq(
      ("brandnew", 1L), ("keep", 1L), ("stale", 2L)))
  }

  test("run on an unregistered name fails loudly; delete removes") {
    Handlers.clear()
    Handlers.register(count1("h"))
    assert(Handlers.delete("h"))
    assert(!Handlers.delete("h"))
    intercept[NoSuchElementException] { Handlers.run("h", docs) }
  }

  // ----- durable seam (Store.scala) --------------------------------

  private def tmpDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  private def sqlHandler(name: String, version: Long) =
    StoredHandler(name, version, "rows per lang",
      HandlerSpec.Sql(
        "SELECT lang, count(*) AS n FROM {input} GROUP BY lang"))

  test("registerDurable → restart → restore → resolve round-trip " +
      "(file-backed store)") {
    Handlers.clear()
    val store = new FileHandlerStore(tmpDir("graft-store"))
    assert(Handlers.registerDurable(sqlHandler("langs", 1L), store))
    val before = Handlers.run("langs", docs).orderBy("lang").collect()
    assert(before.nonEmpty)
    // "restart": the live library dies with the process, the store
    // survives — a fresh FileHandlerStore on the same directory is
    // the recovery path
    Handlers.clear()
    intercept[NoSuchElementException] { Handlers.run("langs", docs) }
    assert(Handlers.resolve("langs").isEmpty)
    assert(Handlers.restore(store) === 1)
    assert(Handlers.resolve("langs").map(_.version) === Some(1L))
    val after = Handlers.run("langs", docs).orderBy("lang").collect()
    assert(after.sameElements(before),
      "the rebuilt transform must compute the same result")
  }

  test("version monotonicity survives reload; pipe specs round-trip") {
    Handlers.clear()
    val dir = tmpDir("graft-store")
    val store = new FileHandlerStore(dir)
    assert(Handlers.registerDurable(sqlHandler("h", 2L), store))
    // stale durable put: rejected by the store CAS AND absent from
    // the library
    assert(!Handlers.registerDurable(sqlHandler("h", 1L), store))
    assert(Handlers.resolve("h").map(_.version) === Some(2L))
    // restart + reload from a COLD store instance on the same dir
    Handlers.clear()
    assert(Handlers.restore(new FileHandlerStore(dir)) === 1)
    assert(Handlers.resolve("h").map(_.version) === Some(2L))
    // …and the monotonic guard still holds after the reload
    assert(!Handlers.registerDurable(sqlHandler("h", 1L), store))
    assert(Handlers.resolve("h").map(_.version) === Some(2L))
    // a pipe spec round-trips cmd + env through the properties file
    val pipe = StoredHandler("catter", 7L, "cat passthrough",
      HandlerSpec.Pipe(Seq("cat", "-u"), Map("K" -> "v v", "X" -> "=:#")))
    assert(store.put(pipe))
    val loaded = store.load().find(_.name == "catter").get
    assert(loaded === pipe)
  }

  test("file store CAS: same version rejected, newer accepted, " +
      "delete removes the file") {
    val store = new FileHandlerStore(tmpDir("graft-store"))
    assert(store.put(sqlHandler("h", 1L)))
    assert(!store.put(sqlHandler("h", 1L)), "same version is stale")
    assert(store.put(sqlHandler("h", 2L)))
    assert(store.load().map(h => (h.name, h.version)) === Seq(("h", 2L)))
    assert(store.delete("h"))
    assert(!store.delete("h"))
    assert(store.load().isEmpty)
  }

  // ----- filesystem handler-source sync (Sync.scala) ---------------

  private def writeSrc(root: java.nio.file.Path, rel: String,
      text: String): Unit = {
    val f = root.resolve(rel)
    java.nio.file.Files.createDirectories(f.getParent)
    java.nio.file.Files.write(f,
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  test("HandlerSync walks the tree: create/update/delete deltas, " +
      "subdir name prefixing, ignored files") {
    Handlers.clear()
    val root = tmpDir("graft-src")
    writeSrc(root, "langs.sql",
      "-- rows per lang\nSELECT lang, count(*) AS n FROM {input} GROUP BY lang")
    writeSrc(root, "text/clean.sql",
      "-- strip short docs\nSELECT * FROM {input} WHERE length(text) > 10")
    writeSrc(root, "_draft.sql", "SELECT 1")      // _-prefixed: ignored
    writeSrc(root, "notes.txt", "not a handler")  // unknown ext: skipped
    val sync = new HandlerSync(root)
    val first = sync.run()
    assert(first.delta === Some(SyncDelta(created = 2, updated = 0,
      deleted = 0)))
    assert(Handlers.list.map(_._1) === Seq("langs", "text_clean"),
      "subdir path folds into the handler name; ignored files absent")
    val out = Handlers.run("langs", docs)
    assert(out.count() > 0, "the synced SQL handler must execute")
    // update one file → its content hash (= version) changes
    writeSrc(root, "langs.sql",
      "-- rows per lang v2\nSELECT lang, count(*) AS n FROM {input} " +
        "GROUP BY lang HAVING count(*) > 0")
    val second = sync.run()
    assert(second.delta === Some(SyncDelta(created = 0, updated = 1,
      deleted = 0)))
    assert(second.stateHash !== first.stateHash)
    // delete a source file → converge removes the handler
    java.nio.file.Files.delete(root.resolve("text/clean.sql"))
    val third = sync.run()
    assert(third.delta === Some(SyncDelta(created = 0, updated = 0,
      deleted = 1)))
    assert(Handlers.list.map(_._1) === Seq("langs"))
  }

  test("HandlerSync state hash short-circuits a no-op sync") {
    Handlers.clear()
    val root = tmpDir("graft-src")
    writeSrc(root, "langs.sql",
      "-- rows per lang\nSELECT lang, count(*) AS n FROM {input} GROUP BY lang")
    val sync = new HandlerSync(root)
    assert(!sync.run().skipped, "first converge must run")
    val again = sync.run()
    assert(again.skipped && again.delta.isEmpty,
      "unchanged tree must short-circuit without touching the library")
    // an out-of-band library change is NOT detected by the fast path
    // (hash covers the SOURCE STATE, like the reference's per-handler
    // version check) — touching the tree re-converges
    writeSrc(root, "more.sql", "SELECT 1 AS one FROM {input} LIMIT 1")
    assert(!sync.run().skipped)
    assert(Handlers.list.map(_._1) === Seq("langs", "more"))
  }
}
