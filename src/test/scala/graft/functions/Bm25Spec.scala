package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** text_bm25's plan and ranking contracts (correctness is the DuckDB
  * hash gate — verified at sf0.01, sf0.1 AND sf1). */
class Bm25Spec extends SparkSuite {

  test("plan: one doc-keyed exchange + distributed top-k, never a " +
      "token-keyed shuffle or global sort") {
    val q = TextQueries.textBm25(spark, sfDir)
    q.collect() // finalize AQE before walking
    import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def collectNodes[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] =
      p match {
        case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)(f)
        case qs: QueryStageExec => collectNodes(qs.plan)(f)
        case other =>
          f.lift(other).toSeq ++ other.children.flatMap(collectNodes(_)(f))
      }
    val exec = q.queryExecution.executedPlan
    // the k-row cut is TakeOrderedAndProject (per-partition top-k +
    // k-row gather), not a global Sort feeding a Limit
    assert(collectNodes(exec) {
      case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"top-k must be TakeOrderedAndProject:\n$exec")
    // exchanges: the doc-keyed agg (hash), the 1-row stats agg
    // (single partition), and TakeOrdered's k-row gather if planned
    // as one — but NEVER a token-keyed exchange (the corpus never
    // shuffles by term) and never a range (global sort) exchange
    val exchanges = collectNodes(exec) { case e: ShuffleExchangeLike => e }
    exchanges.foreach { e =>
      val part = e.outputPartitioning.toString
      assert(!part.contains("term"),
        s"corpus must not shuffle by token: $part\n$exec")
      assert(!part.toLowerCase.startsWith("rangepartitioning"),
        s"no global sort exchange allowed: $part\n$exec")
    }
  }

  test("ranking: every hit contains a query term, tf/dl consistent, " +
      "the cut keeps the globally best scores, rerun deterministic") {
    val rows = TextQueries.textBm25(spark, sfDir).collect()
    assert(rows.length > 0 && rows.length <= TextQueries.Bm25TopK)
    val scores = rows.map(_.getDouble(5)).toSeq
    assert(scores.forall(_ > 0))
    rows.foreach { r =>
      val tfs = (1 to 3).map(r.getLong(_))
      assert(tfs.sum > 0, s"hit without any query term: $r")
      assert(r.getLong(4) >= tfs.sum, s"dl must bound the term tfs: $r")
    }
    // the cut keeps the globally best: recompute every doc's score
    // independently (naive tf over a full token scan, same rational
    // algebra in driver-side Scala) and check no excluded doc beats
    // the worst kept ROUNDED score (strictly — rounded ties at the
    // boundary are cut by doc_id, which a rounded replica can't see)
    val docs = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum / n
    val dfs = TextQueries.Bm25Terms.map(t =>
      t -> docs.count(_._2.contains(t)).toDouble).toMap
    def scoreOf(toks: Array[String]): Double =
      TextQueries.Bm25Terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        val df = dfs(t)
        ((n - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * (toks.length / avgdl)))
      }.sum
    val kept = rows.map(_.getLong(0)).toSet
    val minKept = scores.min
    docs.filterNot(d => kept(d._1)).foreach { case (id, toks) =>
      val s = math.floor(math.abs(scoreOf(toks)) * 1e4 + 0.5) / 1e4
      assert(s <= minKept,
        s"doc $id (score $s) excluded but beats the worst kept $minKept")
    }
    val again = TextQueries.textBm25(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(again === kept, "rerun must be deterministic")
  }
}
