package graft.operators

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

import graft.SparkSuite

/** `dedup_semantic` — SemDeDup multi-probed cell-bounded near-dup
  * semantics, the multi-probe shrink property, and the one-scan
  * cache contract. */
class SemanticDedupSpec extends SparkSuite {

  test("drops are a subset of the exact C5 pair graph, reps share a " +
      "probed cell with their drop, structure is total") {
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
    // the endpoints must share at least one PROBED cell (the
    // candidate-generation contract)
    val exact = Dedup.dedupEmbedCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probesOf = Dedup.semanticAssigned(spark, sfDir, Dedup.SemProbe)
      .select("vec_id", "probes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val dropped = out.filter(!_.getBoolean(2))
    dropped.foreach { r =>
      val (id, rep) = (r.getLong(0), r.getLong(3))
      assert(exact.contains((rep, id)),
        s"($rep,$id) not in the exact pair graph")
      assert(probesOf(rep).intersect(probesOf(id)).nonEmpty,
        s"rep $rep shares no probed cell with $id")
    }
    // and the cell cut is real: some exact pairs straddle argmax
    // cells, which is exactly what multi-probe exists to recover
    val crossCell = exact.exists { case (a, b) => byId(a)._1 != byId(b)._1 }
    assert(crossCell,
      "fixture must contain cross-cell exact pairs for the cut to matter")
  }

  test("multi-probe strictly shrinks cross-cell exact-pair misses " +
      "vs the argmax-only (p=1) form") {
    // Σ n_smaller_near counts exactly the exact-τ pairs the candidate
    // cut covered (candidates are deduped and the τ/cosine algebra
    // matches C5 bit-for-bit), so misses = |exact| − Σ n_smaller_near.
    val nExact = Dedup.dedupEmbedCosine(spark, sfDir).count()
    def misses(p: Int): Long = {
      val covered = Dedup.dedupSemanticProbed(spark, sfDir, p)
        .agg(org.apache.spark.sql.functions.sum("n_smaller_near"))
        .head().getLong(0)
      nExact - covered
    }
    val miss1 = misses(1)
    val missP = misses(Dedup.SemProbe)
    assert(miss1 > 0,
      "fixture must make the argmax-only form miss cross-cell pairs")
    assert(missP < miss1,
      s"multi-probe (p=${Dedup.SemProbe}) must strictly shrink misses: " +
        s"p=1 missed $miss1, p=${Dedup.SemProbe} missed $missP")
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
      s"probe sides, vector sides and the spine must read the cache, " +
        s"saw $cachedReads")
  }
}
