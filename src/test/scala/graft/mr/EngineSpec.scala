package graft.mr

import org.apache.spark.sql.functions.col
import org.scalacheck.Prop.forAll

import graft.SparkSuite

object EngineSpec {
  // Spy state for the SharedMountBackend double. Static so the
  // serialized backend instances running inside local-mode tasks and
  // the asserting test thread see the same sets.
  val created = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val released = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Test double proving a remote-path backend slots into the
    * [[ScratchFs]] seam: scratch dirs live under one externally-given
    * mount root (stand-in for an NFS/Tahoe-style shared FS), and
    * every hand-out/release is recorded. Serializable with only the
    * root string captured, per the ScratchBackend contract. */
  final class SharedMountBackend(root: String) extends ScratchBackend {
    def newScratchDir(): java.nio.file.Path = {
      val d = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(root), "mount-")
      created.add(d.toString)
      d
    }
    def release(dir: java.nio.file.Path): Unit = {
      LocalScratchBackend.release(dir)
      released.add(dir.toString)
      ()
    }
  }
}

class EngineSpec extends SparkSuite {

  private def sc = spark // force session init before implicits

  test("wordcount step: map/combine/reduce over a tiny dataset") {
    val s = sc; import s.implicits._
    val docs = Seq("a b b", "b c", "").toDS()
    val step = Step[String, String, Long, (String, Long)](
      "wc",
      mapper = (_, t) => t.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L),
      reducer = (_, k, vs) => Iterator((k, vs.sum)),
      combiner = Some(_ + _))
    val out = Engine.run(docs, step).collect().toMap
    assert(out === Map("a" -> 1L, "b" -> 3L, "c" -> 1L))
  }

  test("combiner path runs as a partial (map-side) aggregate") {
    val s = sc; import s.implicits._
    val ds = Seq((1L, 2.0), (1L, 3.0), (2L, 5.0)).toDS()
    val step = Step[(Long, Double), Long, Double, (Long, Double)](
      "sum",
      mapper = (_, kv) => Iterator(kv),
      reducer = (_, k, vs) => Iterator((k, vs.sum)),
      combiner = Some(_ + _))
    val out = Engine.run(ds, step)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial"),
      s"expected a partial aggregate in the physical plan:\n$plan")
    assert(out.collect().toMap === Map(1L -> 5.0, 2L -> 5.0))
  }

  test("no-combiner reducer sees the full grouped value list") {
    val s = sc; import s.implicits._
    val ds = Seq((1L, 3), (1L, 1), (2L, 9)).toDS()
    val step = Step[(Long, Int), Long, Int, (Long, String)](
      "noop",
      mapper = (_, kv) => Iterator(kv),
      reducer = (_, k, vs) => Iterator((k, vs.sorted.mkString(","))))
    val out = Engine.run(ds, step).collect().toMap
    assert(out === Map(1L -> "1,3", 2L -> "9"))
  }

  test("session KV reaches mapper and reducer on executors") {
    val s = sc; import s.implicits._
    val ds = Seq(1L, 2L, 3L).toDS()
    val step = Step[Long, Long, Long, (Long, Long)](
      "scaled",
      mapper = (ctx, v) => {
        val m = ctx.sessionGet("multiplier").get.toLong
        Iterator((v % 2, v * m))
      },
      reducer = (ctx, k, vs) => {
        val o = ctx.sessionGet("offset").get.toLong
        Iterator((k, vs.sum + o))
      },
      combiner = Some(_ + _))
    val out = Engine.run(ds, step,
      session = Map("multiplier" -> "10", "offset" -> "1")).collect().toMap
    assert(out === Map(0L -> 21L, 1L -> 41L))
  }

  test("chained MapSteps add no shuffle: exactly one exchange in plan") {
    val s = sc; import s.implicits._
    val ds = Seq((1L, 100L), (2L, 17L)).toDS()
    val split = MapStep[(Long, Long), Long, Long]("split",
      (_, kv) => { val (k, v) = kv; val h = v / 2; Iterator((k, h), (k, v - h)) })
    val gather = Step[(Long, Long), Long, Long, (Long, Long)]("gather",
      mapper = (_, kv) => Iterator(kv),
      reducer = (_, k, vs) => Iterator((k, vs.sum)),
      combiner = Some(_ + _))
    val wf = Workflow.start[(Long, Long)]("chain")
      .andThenMap(split).andThenMap(split).andThen(gather)
    val out = wf.run(ds)
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly 1 shuffle:\n$plan")
    assert(out.collect().toMap === Map(1L -> 100L, 2L -> 17L))
  }

  test("mr_grep is shuffle-free and matches a driver regex recompute") {
    val out = MrQueries.mrGrep(sc, "/root/testdata/sf0.001")
    // map-only job: no Exchange anywhere except the final orderBy's
    // range partitioning (presentation sort, not the pipeline)
    val core = out.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(core).size <= 1, core)
    val got = out.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val pat = java.util.regex.Pattern.quote(MrQueries.GrepPattern)
    val exact = graft.Tables(sc, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> (r.getString(1).split(pat, -1).length - 1L))
      .filter(_._2 > 0L).toMap
    assert(got === exact)
  }

  test("property: gather(scatter(x)) == x for any non-negative cents") {
    val s = sc; import s.implicits._
    val prop = forAll { (xs0: List[Long]) =>
      val xs = xs0.take(20).map(v => math.abs(v % 1000000L))
      xs.isEmpty || {
        val ds = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDS()
        val split = MapStep[(Long, Long), Long, Long]("split",
          (_, kv) => { val (k, v) = kv; val h = v / 2
            Iterator((k, h), (k, v - h)) })
        val scatter = MapStep[(Long, Long), Long, Long]("scatter",
          (_, kv) => { val (k, v) = kv; val q = v / 4
            Iterator((k, q), (k, q), (k, q), (k, v - 3 * q)) })
        val gather = Step[(Long, Long), Long, Long, (Long, Long)]("gather",
          mapper = (_, kv) => Iterator(kv),
          reducer = (_, k, vs) => Iterator((k, vs.sum)),
          combiner = Some(_ + _))
        val out = Workflow.start[(Long, Long)]("chain")
          .andThenMap(split).andThenMap(scatter).andThen(gather)
          .run(ds).collect().toMap
        out === xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toMap
      }
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(10)
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("FS scope: handlers get task-local scratch-file IO") {
    val s = sc; import s.implicits._
    val ds = Seq(1L, 2L, 3L).toDS()
    val step = Step[Long, Long, String, (Long, String)](
      "scratch",
      mapper = (ctx, v) => {
        // write then read back through the task-local scratch dir
        val f = ctx.scratch.resolve(s"work-$v.txt")
        java.nio.file.Files.writeString(f, s"payload-$v")
        Iterator((v, java.nio.file.Files.readString(f)))
      },
      reducer = (_, k, vs) => Iterator((k, vs.sorted.mkString("|"))))
    val out = Engine.run(ds, step).collect().toMap
    assert(out === Map(1L -> "payload-1", 2L -> "payload-2", 3L -> "payload-3"))
  }

  test("ScratchFs seam: a shared-mount backend slots in for Ctx.scratch") {
    val s = sc; import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-mount-").toString
    EngineSpec.created.clear(); EngineSpec.released.clear()
    ScratchFs.use(new EngineSpec.SharedMountBackend(root))
    try {
      val ds = Seq(1L, 2L, 3L).toDS()
      val step = Step[Long, Long, String, (Long, String)](
        "scratch_mount",
        mapper = (ctx, v) => {
          val f = ctx.scratch.resolve(s"w-$v.txt")
          java.nio.file.Files.writeString(f, s"p-$v")
          Iterator((v, s"${java.nio.file.Files.readString(f)}@${ctx.scratch}"))
        },
        reducer = (_, k, vs) => Iterator((k, vs.head)))
      val out = Engine.run(ds, step).collect().toMap
      assert(out.size === 3)
      out.foreach { case (k, v) =>
        val Array(payload, dir) = v.split("@", 2)
        assert(payload === s"p-$k")
        assert(dir.startsWith(root),
          s"scratch must live under the installed backend's mount: $dir")
      }
      import scala.jdk.CollectionConverters._
      assert(EngineSpec.created.asScala.nonEmpty)
      assert(EngineSpec.created.asScala.toSet ===
        EngineSpec.released.asScala.toSet,
        "every scratch dir the backend handed out must be released at task end")
    } finally ScratchFs.reset()
    // after reset, new jobs are back on executor-local temp dirs
    val after = Engine.run(Seq(9L).toDS(),
      Step[Long, Long, String, (Long, String)]("scratch_local",
        mapper = (ctx, v) => Iterator((v, ctx.scratch.toString)),
        reducer = (_, k, vs) => Iterator((k, vs.head)))).collect()
    assert(!after.head._2.startsWith(root),
      "reset() must restore the local default for subsequent jobs")
  }

  test("fanOut routes records to named branches") {
    val s = sc; import s.implicits._
    val mapped = Seq(("a", (1L, 10L)), ("b", (2L, 20L)), ("a", (3L, 30L)))
      .toDS()
    val branches = Engine.fanOut(mapped, Seq("a", "b"))
    assert(branches("a").collect().toSet === Set((1L, 10L), (3L, 30L)))
    assert(branches("b").collect().toSet === Set((2L, 20L)))
  }
}
