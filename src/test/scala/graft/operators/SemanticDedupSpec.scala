package graft.operators

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

import graft.SparkSuite

/** `dedup_semantic` — SemDeDup cell-bounded near-dup semantics and
  * the one-scan cache contract. */
class SemanticDedupSpec extends SparkSuite {

  test("drops are a subset of the exact C5 pair graph, reps are " +
      "same-cell smaller-id neighbors, structure is total") {
    val out = Dedup.dedupSemantic(spark, sfDir).collect()
    val all = graft.Tables(spark, sfDir).embeddings.count()
    assert(out.length.toLong === all, "every vector must appear once")

    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getBoolean(2), r.getLong(3), r.getInt(4)))).toMap
    // kept ⇔ self-rep ⇔ zero smaller near neighbors
    byId.foreach { case (id, (_, kept, rep, n)) =>
      if (kept) assert(rep === id && n === 0)
      else { assert(rep < id); assert(n > 0) }
    }
    // some drops must exist (the corpus has planted near-dups) and
    // some keeps (it is not degenerate)
    assert(out.exists(!_.getBoolean(2)), "no vector was dropped")
    assert(out.exists(_.getBoolean(2)), "every vector was dropped")

    // every (rep, dropped) pair is a genuine cos ≥ τ pair: it must
    // appear in the exhaustive C5 pair list (τ values are equal), and
    // both endpoints must share a cell
    val exact = Dedup.dedupEmbedCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dropped = out.filter(!_.getBoolean(2))
    dropped.foreach { r =>
      val (id, cell, rep) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(exact.contains((rep, id)),
        s"($rep,$id) not in the exact pair graph")
      assert(byId(rep)._1 === cell, s"rep $rep not in $id's cell $cell")
    }
    // and the cell cut is real: strictly fewer drops than C5 pairs
    // would imply if every pair were considered (some exact pairs
    // straddle cells)
    val crossCell = exact.exists { case (a, b) => byId(a)._1 != byId(b)._1 }
    assert(crossCell,
      "fixture must contain cross-cell exact pairs for the cut to matter")
  }

  test("assignment frame is computed once: both join sides read the " +
      "cache, exactly one uncached parquet scan materializes it") {
    val q = Dedup.dedupSemantic(spark, sfDir)
    q.collect()
    // IncrementalSpec pattern: walk the executed tree, stop at cache
    // boundaries, unwrap AQE wrappers
    def walk(p: SparkPlan): (Int, Int) = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      case _: InMemoryTableScanExec => (0, 1)
      case f: FileSourceScanExec => (1, 0)
      case other =>
        other.children.map(walk).foldLeft((0, 0)) {
          case ((a1, b1), (a2, b2)) => (a1 + a2, b1 + b2)
        }
    }
    val (uncached, cachedReads) = walk(q.queryExecution.executedPlan)
    assert(uncached === 0,
      s"all data-plane reads must come from the persisted assignment, " +
        s"saw $uncached uncached scans")
    assert(cachedReads >= 3,
      s"lo side, hi side and the spine must read the cache, saw $cachedReads")
  }
}
