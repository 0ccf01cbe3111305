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

  /** B: session-level datasheet over [[sessions]] — the one-row
    * engagement report an analyst reads before slicing sessions
    * (volume, breadth, depth, bounce share, duration distribution).
    * Everything derives from the session frame: integer counts and
    * sums, two exact long/long divisions (correctly-rounded doubles),
    * and ONE `percentile(duration, array(¼,½,¾))` aggregate — q23's
    * shared-buffer discipline (three separate percentile calls would
    * each build their own per-group value map) — whose interpolation
    * is bit-equal to DuckDB's quantile_cont (the mix_curriculum
    * proof). Scale shape: the sessionize exchange is the whole cost;
    * the stats pass is one global aggregate over the (much smaller)
    * session frame. Full hash gate. */
  def sessionsStats(spark: SparkSession, dir: String): DataFrame = {
    val sess = sessions(spark, dir)
      .select(col("user_id"), col("n_events"),
        (col("session_end") - col("session_start")).as("d"))
    sess.agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("n_events")).as("total_events"),
        max(col("d")).as("max_duration_s"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
        percentile(col("d"),
          array(lit(0.25), lit(0.5), lit(0.75))).as("q"))
      .select(col("n_sessions"), col("n_users"), col("total_events"),
        round(col("total_events") / col("n_sessions"), 4).as("avg_events"),
        round(col("n_bounce") / col("n_sessions"), 4).as("bounce_share"),
        round(element_at(col("q"), 1), 4).as("p25_duration_s"),
        round(element_at(col("q"), 2), 4).as("p50_duration_s"),
        round(element_at(col("q"), 3), 4).as("p75_duration_s"),
        col("max_duration_s"))
  }
}
