package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY §2H — Z-order (Morton-curve) data layout for
  * multi-dimensional scan pruning.
  *
  * A 100 TB fact table is usually filtered on more than one column
  * (user × time, key × date). Sorting the files by ONE column makes
  * its min/max row-group stats selective and leaves every other
  * column's stats useless; interleaving the bits of TWO bucketized
  * columns into a Morton z-value and range-partitioning + sorting by
  * it makes a 2-d box predicate touch only the few files whose
  * z-range intersects the box — both columns' parquet min/max stats
  * become selective at once. This is a LAYOUT operator: it changes
  * where rows land, never what they are (round-trip equality in
  * ZOrderSpec), and the reader needs no cooperation — pruning falls
  * out of ordinary parquet row-group stats + pushed filters.
  *
  * Everything is pure Column algebra (shifts/masks/ors — codegen, no
  * UDF, no HOF); the only driver-side state is the 4-long min/max
  * frame of the stats pass (layout-job state, the ann_ivf
  * quantizer-state exception).
  */
object ZOrder {

  /** Morton z-value: interleave the low `bits` bits of two bucket
    * ids (each must already be in [0, 2^bits)); a takes the even bit
    * positions, b the odd. bits ≤ 31 keeps the result in a positive
    * long. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Linear bucketization of a long column (by name) onto
    * [0, 2^bits): (x−mn)·2^bits div (mx−mn+1). Integer algebra only
    * (`div`, never FP); monotone, so range predicates on x map to
    * range predicates on the bucket. Span·2^bits must fit a long —
    * true for epoch seconds / surrogate keys with bits ≤ 31. */
  def bucketize(name: String, mn: Long, mx: Long, bits: Int): Column = {
    require(mx >= mn && bits >= 1 && bits <= 31)
    expr(s"((cast(`$name` as bigint) - ${mn}L) * ${1L << bits}L) " +
      s"div (${mx - mn + 1L}L)")
  }

  /** Default key width for [[zorderKey]] (single-sourced into the
    * oracle). 2·16 = 32 z-bits: 65 536 buckets per dimension. */
  val KeyBits = 16

  /** H query (round 10): the z-key computation as a FIRST-CLASS
    * oracle-gated query — for every event, its (user_id, event-second)
    * bucket ids and the interleaved Morton z-value that
    * [[writeZOrdered]] lays files out by. This is the inspectable
    * core of the layout operator: a layout job debugger looks at
    * exactly this frame ("which z-range does this row land in, and
    * are the buckets balanced") before paying for a rewrite.
    *
    * Fully declarative: the min/max stats pass stays IN the plan as a
    * 1-row aggregate crossJoin-broadcast (the writer variant collects
    * it driver-side because the write API needs literals; the query
    * form needs nothing outside Catalyst). Everything downstream is
    * integer algebra — `div` bucketization, shift/mask/or interleave
    * — bit-identical in DuckDB (`//`, `>>`, `&`, `|` on BIGINT), so
    * the whole 32-bit key hash-gates exactly. One scan, one 1-row
    * aggregate exchange, zero other shuffles before the output sort. */
  def zorderKey(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val e = graft.Tables(spark, dir).events
      .select(col("event_id"), col("user_id").cast("bigint").as("ua"),
        graft.Tables.tsNsToSec("ts").as("sec"))
    val stats = e.agg(
      min(col("ua")).as("mna"), max(col("ua")).as("mxa"),
      min(col("sec")).as("mnb"), max(col("sec")).as("mxb"))
    val n = 1L << KeyBits
    e.crossJoin(broadcast(stats))
      .withColumn("bucket_user",
        expr(s"((ua - mna) * ${n}L) div (mxa - mna + 1L)"))
      .withColumn("bucket_sec",
        expr(s"((sec - mnb) * ${n}L) div (mxb - mnb + 1L)"))
      .select(col("event_id"), col("bucket_user"), col("bucket_sec"),
        zValue(col("bucket_user"), col("bucket_sec"), KeyBits).as("z"))
      .orderBy(col("event_id"))
  }

  /** Write `df` z-ordered by two long columns into `nFiles` files:
    * stats pass (min/max of both columns) → z-value → range
    * repartition (contiguous z-ranges per file) → sort within file →
    * plain parquet. Per-file z-ranges are disjoint, so a 2-d box
    * touches only the files its z-intervals intersect. */
  def writeZOrdered(df: DataFrame, ca: String, cb: String,
      path: String, bits: Int = 16, nFiles: Int = 16): Unit = {
    val r = df.agg(min(col(ca)).cast("long"), max(col(ca)).cast("long"),
        min(col(cb)).cast("long"), max(col(cb)).cast("long")).head()
    val (mna, mxa, mnb, mxb) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    df.withColumn("_z",
        zValue(bucketize(ca, mna, mxa, bits),
          bucketize(cb, mnb, mxb, bits), bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
