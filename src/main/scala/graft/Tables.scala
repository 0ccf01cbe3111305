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

  /** `events.ts` is parquet TIMESTAMP(NANOS); Spark 4 has no ns
    * timestamp type and throws PARQUET_TYPE_ILLEGAL unless the legacy
    * nanos-as-long conf is on. Set it on the session here (runtime SQL
    * conf, safe to set repeatedly) so every code path that touches
    * events — entry, Verify, Bench, tests — reads `ts` as epoch
    * nanoseconds (long). Use [[Tables.tsNsToSec]] to get the epoch
    * seconds the DuckDB oracles use. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events")
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
