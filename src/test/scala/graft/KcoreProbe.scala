package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: kcore round trajectory at a given sf dir. */
object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val (df, rounds) = graft.operators.Graph.kcoreWithRounds(
      Tables(spark, args(0)).lineitem
        .select(col("l_orderkey").as("k"), col("l_partkey").as("p")))
    val n = df.count()
    println(s"[kcore-probe] rounds=$rounds rows=$n " +
      f"secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
