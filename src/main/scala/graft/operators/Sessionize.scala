package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Gap-based sessionization (batch form). The streaming form with
  * `flatMapGroupsWithState` lives in [[graft.streaming.Streams]]; this
  * window-function version is its batch oracle and scales as one
  * shuffle on user_id + per-partition sort.
  */
object Sessionize {

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  val GapSeconds = 1800L

  /** Sessions per user with a 30-minute inactivity gap. Timestamps are
    * reduced to epoch seconds first so Spark (µs) and DuckDB (ns)
    * agree on the arithmetic. */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"),
              Tables.tsNsToSec("ts").as("ep"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ep"), col("event_id"))
    val flagged = ev
      .withColumn("prev_ep", lag(col("ep"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ep").isNull ||
             col("ep") - col("prev_ep") > GapSeconds, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ep")).as("session_start"),
           max(col("ep")).as("session_end"),
           round(sum(col("value")), 4).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }
}
