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
}
