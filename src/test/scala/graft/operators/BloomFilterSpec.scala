package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Runtime bloom-filter join pruning: for a shuffle join where one
  * side carries a selective filter, Catalyst injects a
  * `bloom_filter_agg` on the filtered side and a
  * `BloomFilterMightContain` predicate on the big side's SCAN — rows
  * that cannot match are dropped before the exchange, the 100 TB
  * semi-join-reduction path. This suite locks in that the injection
  * actually fires for our join shape (thresholds permitting), so a
  * future conf or shape change that silently disables it fails here.
  */
class BloomFilterSpec extends SparkSuite {

  test("selective fact-fact join injects a runtime bloom filter") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // Force a shuffle join (no broadcast) and allow injection at
      // local data sizes — at cluster scale the default thresholds
      // (10 MB creation side / 10 GB application side) gate it.
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

      val t = Tables(spark, sfDir)
      val bigOrders = t.orders.filter(col("o_totalprice") > 450000)
      val joined = t.lineitem
        .join(bigOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloomfilter") ||
             optimized.contains("bloom_filter"),
        s"expected an injected runtime bloom filter:\n$optimized")

      // And the pruned result is still the plain join's result.
      val n = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = t.lineitem
        .join(bigOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(n == plain)
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
  }
}
