package graft.plans

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** The custom TopKPerKey operator: semantics vs the window-rank form
  * it replaces, edge cases, and the plan contract it exists for
  * (partial → ONE exchange → final, ZERO sorts). */
class TopKSpec extends SparkSuite {

  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)(f)
      case q: QueryStageExec => walk(q.plan)(f)
      case other => other.children.foreach(walk(_)(f))
    }
  }

  test("equals the window-rank form on lineitem (top-5 per returnflag)") {
    val li = graft.Tables(spark, sfDir).lineitem
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val order = Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val got = TopK.perKey(li, Seq(col("l_returnflag")), order, 5)
      .orderBy(col("l_returnflag") +: order: _*).collect()
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(order: _*)
    val exp = li.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).drop("rk")
      .orderBy(col("l_returnflag") +: order: _*).collect()
    assert(got.toSeq == exp.toSeq)
  }

  test("groups smaller than k, duplicates, and total-order ties (hand fixture)") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 9.0),
      ("b", 5L, 1.0),
      ("c", 6L, 2.0), ("c", 7L, 3.0)
    ).toDF("k", "id", "v")
    val got = TopK.perKey(df, Seq(col("k")),
        Seq(col("v").desc, col("id").asc), 3)
      .orderBy(col("k"), col("v").desc, col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), // tie → id order
      ("b", 5L, 1.0),                                    // group < k intact
      ("c", 7L, 3.0), ("c", 6L, 2.0)))
  }

  test("plan contract: partial then final around ONE exchange, zero sorts") {
    val o = graft.Tables(spark, sfDir).orders
    val df = TopK.perKey(o, Seq(col("o_orderpriority")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    df.count() // finalize AQE
    var (partial, fin, exchanges, sorts) = (0, 0, 0, 0)
    walk(df.queryExecution.executedPlan) {
      case _: TopKPerKeyPartialExec => partial += 1
      case _: TopKPerKeyFinalExec => fin += 1
      case _: ShuffleExchangeLike => exchanges += 1
      case _: SortExec => sorts += 1
      case _ =>
    }
    assert(partial == 1 && fin == 1,
      s"expected one partial + one final, got $partial/$fin")
    assert(exchanges == 1, s"expected exactly one exchange, got $exchanges")
    assert(sorts == 0, s"the heap operator must not sort, got $sorts")
    // the map-side heap really bounds what crosses the wire:
    // ≤ k · |keys| rows per input partition
    val inParts = o.rdd.getNumPartitions
    val nKeys = o.select(col("o_orderpriority")).distinct().count()
    val shuffled = df.count()
    assert(shuffled <= 3L * nKeys,
      s"final output must be ≤ k·keys, got $shuffled (parts=$inParts)")
  }

  test("strategy registration is idempotent across calls") {
    val o = graft.Tables(spark, sfDir).orders
    TopK.perKey(o, Seq(col("o_orderpriority")),
      Seq(col("o_orderkey").asc), 1).count()
    TopK.perKey(o, Seq(col("o_orderpriority")),
      Seq(col("o_orderkey").asc), 1).count()
    val n = spark.experimental.extraStrategies
      .count(_ eq TopKPerKeyStrategy)
    assert(n == 1, s"strategy registered $n times")
  }
}
