package graft.mr

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}

/** Per-request invocation-tree trace — the Spark re-expression of the
  * reference's forensic request graph (reference: mr/trace.py:63
  * `invocation_graph_gen` walks a request's map/reduce invocation
  * relationships breadth-first; mr/trace.py:186 `InvocationGraph`
  * renders them as graphviz DOT with per-node step/handler labels;
  * mr/views/job.py exposes it per request id).
  *
  * In graft the invocation tree IS the Catalyst plan: every step a
  * [[Workflow]] chains becomes plan nodes, and [[Workflow]] marks each
  * stage boundary with a `SubqueryAlias step:<name>` (zero runtime
  * cost — the optimizer erases aliases before physical planning, so
  * the markers exist exactly where forensics reads them: the analyzed
  * plan). A trace node carries the plan-node name, the step marker if
  * one starts there, and the node's output columns — the analog of the
  * reference's per-invocation argument/post-combine/post-reduce
  * payload listing (mr/trace.py:23 `_get_child_info`), except schemas
  * rather than row payloads: at 100 TB the data does not fit in a
  * debug artifact, and Spark's own UI serves row-level sampling.
  *
  * The walk happens ONCE at submit time on the driver (analysis only,
  * no job runs); the result is an immutable tree carried on the
  * [[Jobs.JobHandle]], so polling it is free and reaping the handle
  * reaps the trace.
  */
object Trace {

  /** One node of the invocation tree. `step` is the workflow step
    * marker when this node is a stage boundary. */
  final case class Node(name: String, step: Option[String],
      out: Seq[String], children: Seq[Node]) {

    /** Steps present in this subtree, outermost (= last-applied)
      * first — the chain order a forensics reader expects is input →
      * output, so [[RequestTrace.steps]] reverses this. */
    def stepsPreOrder: Seq[String] =
      step.toSeq ++ children.flatMap(_.stepsPreOrder)
  }

  /** The trace of one submitted request (reference: one request id's
    * invocation graph). `steps` lists workflow stage markers in
    * execution order (first chained step first). */
  final case class RequestTrace(requestId: String, job: String,
      root: Node) {

    def steps: Seq[String] = root.stepsPreOrder.reverse

    /** JSON step/plan tree (the `Jobs.trace(requestId)` surface —
      * reference mr/views/job.py returns the graph for a request). */
    def toJson: String = {
      def esc(s: String): String = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      def node(n: Node): String = {
        val step = n.step.map(s => s""""step":"${esc(s)}",""").getOrElse("")
        s"""{"node":"${esc(n.name)}",$step""" +
          s""""out":${n.out.map(c => "\"" + esc(c) + "\"").mkString("[", ",", "]")},""" +
          s""""children":${n.children.map(node).mkString("[", ",", "]")}}"""
      }
      s"""{"request_id":"${esc(requestId)}","job":"${esc(job)}",""" +
        s""""steps":${steps.map(s => "\"" + esc(s) + "\"").mkString("[", ",", "]")},""" +
        s""""tree":${node(root)}}"""
    }

    /** Graphviz DOT source (reference: mr/trace.py:291 `draw_graph`
      * emits Request→Workflow→Job header nodes then the invocation
      * edges; `get_source` returns the DOT text). Rendering to an
      * image is left to the caller's `dot` binary exactly as the
      * reference shells out (mr/trace.py:320 `get_image_data`) — this
      * library ships no graphviz dependency. Edges point data-flow
      * direction (child feeds parent), labeled like the reference's
      * "mapped to"/"reduced by" with the honest Spark vocabulary. */
    def toDot: String = {
      def esc(s: String): String =
        s.replace("\\", "\\\\").replace("\"", "\\\"")
      val sb = new StringBuilder
      sb.append(s"// Trace of request ${esc(requestId)}\n")
      sb.append("digraph trace {\n")
      sb.append(s"""  Q [label="Request (${esc(requestId.take(24))})"];\n""")
      sb.append(s"""  J [label="Job (${esc(job)})"];\n""")
      sb.append("  Q -> J [label=\"resolve job\"];\n")
      var next = 0
      def walk(n: Node): Int = {
        val id = next; next += 1
        val stepLbl = n.step.map(s => s"""S \\"${esc(s)}\\" """).getOrElse("")
        sb.append(s"""  N$id [label="$stepLbl${esc(n.name)}"];\n""")
        n.children.foreach { c =>
          val cid = walk(c)
          sb.append(s"""  N$cid -> N$id [label="feeds"];\n""")
        }
        id
      }
      val rootId = walk(root)
      sb.append(s"  J -> N$rootId;\n")
      sb.append("}\n")
      sb.toString
    }
  }

  /** Step-boundary marker prefix ([[Workflow]] aliases each chained
    * stage's output `step:<name>`). */
  val StepAliasPrefix = "step:"

  /** Build the invocation tree of a dataset from its ANALYZED logical
    * plan — before the optimizer erases the step aliases and collapses
    * projections; the analyzed plan is the faithful "what was asked"
    * lineage (the reference likewise records the request's invocation
    * structure, not the scheduler's physical execution). */
  def ofDataset(ds: Dataset[_]): Node = ofPlan(ds.queryExecution.analyzed)

  private def ofPlan(p: LogicalPlan): Node = {
    val (step, core) = p match {
      case SubqueryAlias(ident, child)
          if ident.name.startsWith(StepAliasPrefix) =>
        (Some(ident.name.stripPrefix(StepAliasPrefix)), child)
      case other => (None, other)
    }
    Node(core.nodeName, step,
      core.output.map(a => s"${a.name}: ${a.dataType.simpleString}"),
      core.children.map(ofPlan))
  }
}
