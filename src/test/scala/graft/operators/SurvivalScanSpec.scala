package graft.operators

import graft.SparkSuite

/** `events_survival` plan contract: ONE events parquet scan (the r14
  * form read the fact table three times — signup aggregate, purchase
  * aggregate, corpus max; the rewrite computes all three off one
  * user_id window + aggregate, persisted). Walk pattern from
  * IncrementalSpec: textual "Scan parquet" counts are useless on
  * cached plans, so the tree walk stops at cache boundaries and then
  * audits the DISTINCT cached lineages separately. */
class SurvivalScanSpec extends SparkSuite {

  test("events parquet is scanned exactly once") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def walk(p: SparkPlan): (Int, Seq[SparkPlan]) = p match {
      case m: InMemoryTableScanExec => (0, Seq(m.relation.cachedPlan))
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: FileSourceScanExec => (1, Nil)
      case other =>
        val cs = other.children.map(walk)
        (cs.map(_._1).sum, cs.flatMap(_._2))
    }
    val df = Lifecycle.eventsSurvival(spark, sfDir)
    df.collect() // materialize so the cache fills and AQE finalizes
    val (outer, caches) = walk(df.queryExecution.executedPlan)
    assert(outer == 0, s"parquet scans outside the per-user cache: $outer")
    val distinct = caches.map(_.canonicalized).distinct
    assert(distinct.size == 1,
      s"expected ONE cached per-user frame, got ${distinct.size}")
    val inner = distinct.map(c => walk(c)._1).sum
    assert(inner == 1, s"events parquet scanned $inner times in the cache")
  }
}
