package graft.operators

import graft.SparkSuite

/** The scan-efficiency contract (SURVEY §4): filters reach the
  * parquet reader as PushedFilters, projections prune ReadSchema.
  * At 100 TB these two lines in the plan are the difference between
  * reading terabytes and reading gigabytes.
  */
class ScanSpec extends SparkSuite {

  private def scanString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6 pushes all three predicates into the parquet scan") {
    val plan = scanString(Relational.q6FilterAgg(spark, sfDir))
    assert(plan.contains("PushedFilters: ["), plan)
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(plan.contains(s"IsNotNull($c)") || plan.contains(s"GreaterThan($c")
        || plan.contains(s"LessThan($c"), s"missing pushed filter on $c:\n$plan")
  }

  test("q1 prunes the lineitem scan to only the referenced columns") {
    val plan = scanString(Relational.q1Agg(spark, sfDir))
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse(fail(s"no ReadSchema:\n$plan"))
    for (c <- Seq("l_quantity", "l_extendedprice", "l_returnflag"))
      assert(readSchema.contains(c), s"$c should be read:\n$readSchema")
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey", "l_comment"))
      assert(!readSchema.contains(c), s"$c should be pruned:\n$readSchema")
  }

  test("q2 runs a partial WindowGroupLimit before the window exchange") {
    // q2's rank<=3 relies on Spark 4's RewriteWindowGroupLimit: each
    // map task keeps only its per-group top-3 before shuffling to the
    // 5-value o_orderpriority partitioning. Without it, 5 tasks sort
    // the whole table — silent optimizer dependency, so lock it in.
    val plan = scanString(Relational.q2TopkWindow(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"),
      s"WindowGroupLimit rewrite did not fire:\n$plan")
    val partialIdx = plan.indexOf("WindowGroupLimit")
    assert(plan.lastIndexOf("WindowGroupLimit") != partialIdx,
      s"expected both partial and final WindowGroupLimit:\n$plan")
  }

  test("text queries read only doc_id and text, not the whole table") {
    for (q <- Seq(
        graft.functions.TextQueries.textFingerprint(spark, sfDir),
        graft.functions.TextQueries.textBm25(spark, sfDir))) {
      val plan = scanString(q)
      val readSchema = plan.linesIterator
        .find(_.contains("ReadSchema")).getOrElse(fail(s"no ReadSchema:\n$plan"))
      assert(readSchema.contains("doc_id") && readSchema.contains("text"))
      assert(!readSchema.contains("lang") && !readSchema.contains("source"),
        s"unused columns not pruned:\n$readSchema")
    }
  }
}
