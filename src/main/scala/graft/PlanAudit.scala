package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Static physical-plan audit over EVERY registry query → one JSON
  * artifact (`PLAN_AUDIT.json`, committed per round). Round-over-round
  * diffs of this file surface plan regressions (a new exchange, a
  * lost pushdown, a scan-count jump from an unpersisted
  * multi-reference) that toy-scale latency hides — the same signal
  * the per-query scan-count specs pin, but repo-wide and diffable.
  *
  * Counts come from the PRE-EXECUTION plan (AdaptiveSparkPlanExec's
  * initial plan): stable, and the shape AQE starts from — runtime
  * AQE conversions (e.g. shuffle→broadcast where a frame fits) are
  * deliberately not captured, because they are data-size-dependent
  * choices, not authored plan shape. "Static" means the audit never
  * EXECUTES the returned frame — but CONSTRUCTING a query may run
  * jobs (the iterative fixpoints materialize rounds at build time)
  * and may persist frames (Curate.survivors), so some subtrees ARE
  * cached when we walk. The walk therefore truncates at
  * InMemoryTableScanExec exactly like the IncrementalSpec walker
  * (counting it in `cached_scans`), so every count consistently
  * means "work outside cached lineage as authored" — a textual or
  * descend-through count would re-print each cache reference's
  * lineage once per reference (ADVICE r11; measured 20 phantom
  * scans on a zero-uncached-scan plan).
  *
  * Fields per query: parquet scan count, shuffle/broadcast exchange
  * counts, authored broadcast JOIN HINTS in the optimized logical
  * plan (the GraphIterSpec contract, repo-wide), and cartesian/BNLJ
  * presence (the PlanContractSpec contract, recorded not asserted).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case c: InMemoryTableScanExec => Seq(c) // stop: cached lineage
      case a: AdaptiveSparkPlanExec => a +: walk(a.initialPlan)
      case other => other +: other.children.flatMap(walk)
    }

    val entries = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val nodes = walk(df.queryExecution.executedPlan)
        val scans = nodes.count(_.isInstanceOf[FileSourceScanExec])
        val cachedScans = nodes.count(_.isInstanceOf[InMemoryTableScanExec])
        val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
        val bcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec])
        val planStr = nodes.map(_.nodeName).mkString(" ")
        val cartesian = planStr.contains("CartesianProduct")
        val bnlj = planStr.contains("BroadcastNestedLoopJoin")
        val hints = df.queryExecution.optimizedPlan.collect {
          case j: Join
              if j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) ||
                j.hint.rightHint.exists(_.strategy.contains(BROADCAST)) => j
        }.size
        // cache may hold frames persisted during query construction
        // (Curate.survivors pattern) — clear so the NEXT query's audit
        // sees its own uncached lineage
        spark.catalog.clearCache()
        s""""$name":{"scans":$scans,"cached_scans":$cachedScans,""" +
          s""""shuffles":$shuffles,""" +
          s""""broadcast_exchanges":$bcasts,"broadcast_hints":$hints,""" +
          s""""cartesian":$cartesian,"bnlj":$bnlj}"""
      } catch { case e: Throwable =>
        spark.catalog.clearCache()
        s""""$name":{"error":"${e.getClass.getSimpleName}"}"""
      }
    }
    Files.writeString(Paths.get(outPath),
      entries.mkString("{", ",\n", "}\n"))
    println(s"[planAudit] ${entries.size} queries audited -> $outPath")
    spark.stop()
  }
}
