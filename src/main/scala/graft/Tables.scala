package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each loader is a plain parquet scan — column pruning and predicate
  * pushdown are left to Catalyst (verify with `.explain`: `ReadSchema`
  * / `PushedFilters` must reflect the query, not the full table). At
  * cluster scale these would be external-catalog tables; the API shape
  * (one `DataFrame` per table, no eager caching) is the same.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** `events.ts` — normalized to **epoch-nanoseconds long** whatever
    * the parquet physical type, so every downstream operator and
    * DuckDB oracle keeps one contract:
    *
    *   - TIMESTAMP(NANOS) parquet: Spark 4 has no ns timestamp type
    *     and throws PARQUET_TYPE_ILLEGAL unless the legacy
    *     nanos-as-long conf is on (set here; runtime SQL conf, safe to
    *     set repeatedly) — `ts` then loads as epoch-nanos long
    *     directly.
    *   - timestamp[us] parquet (what the driver generates as of
    *     2026-08-13): loads as TIMESTAMP_NTZ (isAdjustedToUTC=false).
    *     Converted with `timestampdiff(MICROSECOND, epoch, ts) *
    *     1000L` — pure NTZ wall-clock integer arithmetic, exact and
    *     independent of `spark.sql.session.timeZone` (an NTZ→LTZ
    *     cast or `to_utc_timestamp` would shift by the session zone).
    *     This matches the oracles, which read the same naive value in
    *     DuckDB (`epoch(date_trunc('second', ts))`).
    *   - timestamp[us/ms] with isAdjustedToUTC=true (TIMESTAMP_LTZ):
    *     `unix_micros` — already zone-independent.
    *
    * The projection means ts predicates no longer push to the parquet
    * scan as timestamp filters; at catalog scale you would partition
    * by event date and prune on the partition column instead (the
    * sf* testdata is a single unpartitioned file, so nothing is
    * lost here). Use [[Tables.tsNsToSec]] to get the epoch seconds
    * the DuckDB oracles use. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType =>
        df.withColumn("ts", expr(
          "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) * 1000L"))
      case TimestampType =>
        df.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other (expected long epoch-nanos or a timestamp type)")
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.expr

  /** Epoch-nanos long → epoch seconds (floor), matching the oracles'
    * `epoch(date_trunc('second', ts))`. Integral `div` — no double
    * round-trip, exact for any 2024-era ns value. */
  def tsNsToSec(colName: String): Column =
    expr(s"$colName div 1000000000L").cast("long")
}
