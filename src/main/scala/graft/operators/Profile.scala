package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2H adjunct — generic per-column table profiling (the
  * datasheet pass a pipeline runs before trusting any new dataset):
  * row count, null count, exact distinct count, min/max per column,
  * one row per column.
  *
  * Scale shape: one aggregation branch PER COLUMN, unioned — not one
  * wide agg with N count(distinct)s, which Catalyst plans as an
  * Expand multiplying every input row by N before the exchange. Each
  * branch's scan is column-pruned to exactly its one column
  * (ProfileSpec asserts ReadSchema per scan), so on a columnar store
  * the N branches together read the same bytes as one full-width
  * scan — and each branch is an independent two-phase
  * partial-distinct aggregate, the shape that survives 100 TB.
  * min/max surface as strings so one long-format frame carries every
  * column type; profiled columns here are integer/varchar, whose
  * string forms are engine-identical (doubles/timestamps would need
  * a formatting contract, deliberately out of this entry's scope).
  */
object Profile {

  /** The profiled lineitem columns — integer + varchar only (exact
    * cross-engine string forms; single-sourced into the oracle). */
  val LineitemCols: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_linenumber",
    "l_returnflag", "l_linestatus")

  /** H query entry: profile the biggest table. */
  def tableProfile(spark: SparkSession, dir: String): DataFrame =
    profileOf(Tables(spark, dir).lineitem, LineitemCols)

  /** Generic long-format profile of `cols` over any frame. */
  def profileOf(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(col(c)) // explicit prune: the branch sees ONE column
        .agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_.unionAll(_)).orderBy(col("col_name"))
}
