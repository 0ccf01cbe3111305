package graft.mr

import graft.SparkSuite

/** The invocation-tree trace surface (reference: mr/trace.py) — step
  * markers in the analyzed plan, trace capture on submit, lifecycle
  * with reap, and the zero-runtime-cost guarantee. */
class TraceSpec extends SparkSuite {

  private def chain() = {
    import spark.implicits._
    val in = spark.range(50).as[Long].map(i => (i % 7, i))
    val double = MapStep[(Long, Long), Long, Long]("double",
      (_, kv) => Iterator((kv._1, kv._2 * 2)))
    val sum = Step[(Long, Long), Long, Long, (Long, Long)]("sum",
      mapper = (_, kv) => Iterator(kv),
      reducer = (_, k, vs) => Iterator((k, vs.sum)),
      combiner = Some(_ + _))
    (in, Workflow.start[(Long, Long)]("wf")
      .andThenMap(double)
      .andThen(sum))
  }

  test("runTraced: steps in execution order, markers on the tree, " +
      "result unchanged") {
    val (in, wf) = chain()
    val (out, trace) = wf.runTraced(in, "req-1")
    assert(trace.requestId === "req-1" && trace.job === "wf")
    assert(trace.steps === Seq("double", "sum"))
    // the marked nodes carry output schemas (per-node payload analog)
    def find(n: Trace.Node, s: String): Option[Trace.Node] =
      if (n.step.contains(s)) Some(n)
      else n.children.flatMap(find(_, s)).headOption
    val sumNode = find(trace.root, "sum").getOrElse(fail("no sum node"))
    assert(sumNode.out.nonEmpty, "step node must list output columns")
    assert(find(sumNode, "double").isDefined,
      "upstream step must sit beneath the downstream one")
    // tracing is observation only: same rows as an untraced run
    val expected = wf.run(in).collect().sortBy(_._1).toSeq
    assert(out.collect().sortBy(_._1).toSeq === expected)
    assert(expected.map(_._2).sum === (0L until 50L).map(_ * 2).sum)
  }

  test("step aliases are erased before physical planning — markers " +
      "cost nothing at runtime") {
    val (in, wf) = chain()
    val out = wf.run(in)
    out.collect()
    assert(!out.queryExecution.executedPlan.toString.contains("step:"),
      "SubqueryAlias markers must not survive into the physical plan")
  }

  test("toJson and toDot carry the full chain") {
    val (in, wf) = chain()
    val (_, trace) = wf.runTraced(in, "req-2")
    val js = trace.toJson
    assert(js.contains(""""steps":["double","sum"]"""), js)
    assert(js.contains(""""request_id":"req-2""""), js)
    val dot = trace.toDot
    assert(dot.contains("digraph trace {"), dot)
    assert(dot.contains("""S \"double\""""), dot)
    assert(dot.contains("""S \"sum\""""), dot)
  }

  test("Jobs.trace serves the trace by request id for the handle's " +
      "life; reap drops it (reference request_cleanup semantics)") {
    val (in, wf) = chain()
    val sink = java.nio.file.Files.createTempDirectory("graft-trace").toString
    val handle = Jobs.submitJob(spark, "wf", wf.run(in).toDF("k", "v"),
      Jobs.SinkWriter(sink))
    val got = Jobs.trace(handle.groupId)
    assert(got.isDefined, "trace must be readable right after submit")
    assert(got.get.steps === Seq("double", "sum"))
    assert(Jobs.await(handle).isSuccess)
    Jobs.reap()
    assert(Jobs.trace(handle.groupId).isEmpty,
      "reaped request must drop its trace")
    // the handle itself still carries it for anyone who kept it
    assert(handle.trace.exists(_.steps === Seq("double", "sum")))
  }
}
