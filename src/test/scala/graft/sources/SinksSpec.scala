package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SinksSpec extends SparkSuite {

  private lazy val tmp = Files.createTempDirectory("graft-sinks").toString

  private def orders = graft.Tables(spark, sfDir).orders
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate")

  test("csv / json / orc / parquet round-trip losslessly") {
    val src = orders
    val expected = src.orderBy("o_orderkey").collect().toSeq
    for (fmt <- Seq(Sinks.Csv, Sinks.Json, Sinks.Orc, Sinks.Parquet)) {
      val path = s"$tmp/rt-${fmt.name}"
      Sinks.write(src, path, fmt)
      val back = Sinks.read(spark, path, fmt, src.schema)
      assert(back.schema === src.schema, s"${fmt.name}: schema drift")
      assert(back.orderBy("o_orderkey").collect().toSeq === expected,
        s"${fmt.name}: data drift")
    }
  }

  test("partitioned write produces hive layout and prunes on read") {
    val path = s"$tmp/part"
    Sinks.writePartitioned(orders, path, Sinks.Parquet, Seq("o_orderstatus"))
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("o_orderstatus=")).sorted
    assert(dirs.nonEmpty, s"expected partition dirs, got ${dirs.mkString(",")}")

    val back = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    val scan = back.queryExecution.executedPlan.toString
    // partition pruning: the scan must carry a partition filter, and
    // the result must match an unpartitioned filter exactly
    assert(scan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"no partition pruning in:\n$scan")
    val expected = orders.filter(col("o_orderstatus") === "F")
      .drop("o_orderstatus").orderBy("o_orderkey").collect().toSeq
    assert(back.drop("o_orderstatus").orderBy("o_orderkey").collect().toSeq
      === expected)
  }

  test("co-bucketed tables join with zero exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Sinks.writeBucketed(orders, "orders_b", nBuckets = 4, "o_custkey")
      Sinks.writeBucketed(
        graft.Tables(spark, sfDir).customer.select("c_custkey", "c_name"),
        "customer_b", nBuckets = 4, "c_custkey")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      joined.collect() // materialize through AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")

      // same rows as the plain (shuffling) join
      val expected = orders.join(
          graft.Tables(spark, sfDir).customer.select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .orderBy("o_orderkey").collect().toSeq
      assert(joined.orderBy("o_orderkey").collect().toSeq === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
