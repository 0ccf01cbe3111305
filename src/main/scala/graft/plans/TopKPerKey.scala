package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

/** Whole-operator top-k-per-key — the one semantics Spark's built-in
  * surface can only express as `row_number() OVER (PARTITION BY k
  * ORDER BY s) <= k` + filter, which plans as a full sort of every key
  * group (WindowGroupLimit prunes rows but both its partial and final
  * passes still SORT each partition). At 100 TB "top 5 per key" is a
  * selection problem, not a sorting problem: a bounded heap per key is
  * O(n log k) with NO sort before, inside, or after the exchange, and
  * the map-side (partial) heap pass shrinks the shuffle to ≤ k rows
  * per (key, input partition) — the aggregate-style two-phase shape,
  * applied to row selection.
  *
  * This is the library's preference-(c) operator (SURVEY §3): a custom
  * [[TopKPerKeyNode]] logical node + [[TopKPerKeyStrategy]] planner
  * rule + partial/final [[UnaryExecNode]]s, registered either through
  * `spark.sql.extensions=graft.plans.GraftExtensions` or lazily by the
  * [[TopK.perKey]] API (experimental.extraStrategies). The typed twin
  * is Similarity.TopKByScore (an Aggregator doing the same two-phase
  * heap for a fixed (score, id) payload); this node works on ANY row
  * schema with ANY SortOrder, with no Encoder round-trip.
  *
  * Semantics: for each distinct key, emit the first k rows of the
  * group in `order`. Callers provide a TOTAL order (tiebreak to a
  * unique column) for deterministic output — same contract as a
  * window rank filter.
  */
final case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Shared heap pass: one bounded min-heap per key (head = worst of
    * the kept k), rows and keys copied out of their reused buffers.
    * Emits each surviving group best-first (deterministic within a
    * task). Runs on executors; the codegen'd ordering/projection are
    * generated per-task, never serialized. */
  def topKIterator(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      inputSchema: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, inputSchema)
    val ord = GenerateOrdering.generate(order, inputSchema)
    // java PriorityQueue keeps its SMALLEST on top; reversed ordering
    // puts the worst kept row there, so eviction is O(log k)
    val worstFirst: java.util.Comparator[InternalRow] = ord.reversed()
    val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var h = heaps.get(key)
      if (h == null) {
        h = new java.util.PriorityQueue[InternalRow](k, worstFirst)
        heaps.put(key.copy(), h)
      }
      if (h.size < k) h.add(row.copy())
      else if (ord.compare(row, h.peek()) < 0) {
        h.poll(); h.add(row.copy())
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.values.asScala.iterator.flatMap { h =>
      val arr = new Array[InternalRow](h.size)
      var i = arr.length - 1
      while (i >= 0) { arr(i) = h.poll(); i -= 1 } // drain worst→best
      arr.iterator
    }
  }
}

/** Map-side phase: per input partition, ≤ k rows per key survive into
  * the exchange (the partial-aggregate shape for selection). */
final case class TopKPerKeyPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, schema) = (keys, order, k, child.output)
    child.execute().mapPartitions(
      it => TopKPerKeyExec.topKIterator(it, ks, os, kk, schema),
      preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Reduce-side phase: requires clustering on the keys (EnsureRequirements
  * inserts the hash exchange), then the same heap pass merges the
  * per-partition survivors into the exact per-key top k. */
final case class TopKPerKeyFinalExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, schema) = (keys, order, k, child.output)
    child.execute().mapPartitions(
      it => TopKPerKeyExec.topKIterator(it, ks, os, kk, schema),
      preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as partial → (exchange) → final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyFinalExec(keys, order, k,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — the cluster
  * registration path (spark-defaults / session builder): the planner
  * strategy plus the [[RankFilterToTopK]] rewrite, so the idiomatic
  * window-rank-filter form plans as the heap operator automatically. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => RankFilterToTopK)
    ()
  }
}

object TopK {
  /** Top-k rows per key group, in `order` (give a total order — last
    * sort column unique — for deterministic output, same contract as
    * a window rank filter). Registers the planner strategy on the
    * session lazily, so the API works without the extensions conf. */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    ensureRegistered(spark)
    // Harvest ANALYZER-resolved catalyst expressions: a raw
    // Column→Expression bridge would hand the node tree lazy adapters
    // wrapping sql.internal column nodes (measured: a NotSerializable
    // internal SortOrder$NullsLast$ inside the task closure). A
    // throwaway sortWithinPartitions().select() runs those Columns
    // through analysis; its Project/Sort carry clean, serializable
    // catalyst SortOrder/NamedExpression over the SAME child the node
    // will execute.
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    val analyzed = PlanBridge.logicalPlan(
      df.sortWithinPartitions(order: _*).select(keys: _*))
    val proj = analyzed.asInstanceOf[Project]
    val sort = proj.child.asInstanceOf[Sort]
    val keyExprs: Seq[Expression] = proj.projectList.map {
      case Alias(c, _) => c
      case a => a
    }
    PlanBridge.ofRows(spark,
      TopKPerKeyNode(keyExprs, sort.order, k, sort.child))
  }

  private def ensureRegistered(spark: SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }

  /** B: registry demonstration — top-3 orders by price per order
    * priority through the custom operator (the window-free plan:
    * heap partial → one hash exchange → heap final; zero SortExec
    * until the presentation orderBy). Oracle = the equivalent
    * row_number window SQL. */
  def topkPerKey(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val o = graft.Tables(spark, dir).orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    perKey(o,
      keys = Seq(col("o_orderpriority")),
      order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
        col("o_orderkey"))
  }
}
