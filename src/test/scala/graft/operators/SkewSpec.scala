package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SkewSpec extends SparkSuite {

  test("salted sum equals plain sum on a skewed key distribution") {
    val s = spark; import s.implicits._
    // 90% of rows on one hot key, exact long values
    val df = ((1 to 9000).map(i => (1L, i.toLong)) ++
      (1 to 1000).map(i => (2L + i % 7, i.toLong))).toDF("k", "v")
    val salted = Skew.saltedSum(df, col("k"), col("v"), salts = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = df.groupBy("k").agg(sum("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    // and the salted plan really has the two aggregation phases
    val plan = Skew.saltedSum(df, col("k"), col("v"), 8)
      .queryExecution.optimizedPlan.toString
    assert("Aggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("salted join equals plain join, row for row") {
    val s = spark; import s.implicits._
    val probe = ((1 to 5000).map(_ => 1L) ++ Seq(2L, 3L, 4L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("pk", "row_id")
    val build = Seq((1L, "hot"), (2L, "b"), (3L, "c"), (9L, "unmatched"))
      .toDF("bk", "label")
    val salted = Skew.saltedJoin(probe, build, "pk", "bk", salts = 4)
      .select("row_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val plain = probe.join(build, col("pk") === col("bk"))
      .select("row_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(salted === plain)
  }
}
