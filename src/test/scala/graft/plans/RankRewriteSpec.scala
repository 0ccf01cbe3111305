package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, rank, row_number}

import graft.SparkSuite

/** The RankFilterToTopK optimizer rewrite: the idiomatic window-rank
  * form plans as the heap operator when (and only when) the rewrite
  * is provably equivalent. */
class RankRewriteSpec extends SparkSuite {

  private def orders = graft.Tables(spark, sfDir).orders
    .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))

  private val w = Window.partitionBy(col("o_orderpriority"))
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  private def windowForm: DataFrame =
    orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).drop("rk")

  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)(f)
      case q: QueryStageExec => walk(q.plan)(f)
      case other => other.children.foreach(walk(_)(f))
    }
  }

  private def withRule[T](body: => T): T = {
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerKeyStrategy
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RankFilterToTopK
    }
    try body
    finally spark.experimental.synchronized {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RankFilterToTopK)
    }
  }

  test("window-rank idiom plans as the heap operator, same rows") {
    val baseline = windowForm
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
        col("o_orderkey")).collect()
    withRule {
      val df = windowForm
      df.count() // finalize AQE
      var (topk, windows) = (0, 0)
      walk(df.queryExecution.executedPlan) {
        case _: TopKPerKeyFinalExec => topk += 1
        case _: WindowExec => windows += 1
        case _ =>
      }
      assert(topk == 1, "rewrite did not produce the heap operator")
      assert(windows == 0, "the Window survived the rewrite")
      val got = df.orderBy(col("o_orderpriority"),
        col("o_totalprice").desc, col("o_orderkey")).collect()
      assert(got.toSeq == baseline.toSeq)
    }
  }

  test("does not fire when the rewrite would change semantics") {
    def nodes(df: DataFrame): Seq[TopKPerKeyNode] =
      RankFilterToTopK(df.queryExecution.optimizedPlan)
        .collect { case n: TopKPerKeyNode => n }
    // rank survives into the output → Window must stay
    val keepRk = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
    assert(nodes(keepRk).isEmpty, "fired with the rank still consumed")
    // compound predicate → leave alone
    val compound = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3 && col("o_orderkey") > 10).drop("rk")
    assert(nodes(compound).isEmpty, "fired on a compound filter")
    // rank() admits >k rows on ties — different semantics
    val rnk = orders.withColumn("rk", rank().over(w))
      .filter(col("rk") <= 3).drop("rk")
    assert(nodes(rnk).isEmpty, "fired on rank()")
    // the positive shape DOES match at the logical level
    assert(nodes(windowForm).size == 1, "control: idiom should match")
  }
}
