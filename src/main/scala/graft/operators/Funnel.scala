package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2B adjunct — ordered funnel + cohort retention over
  * `events`, the two staple product-analytics operators a JobX-style
  * analytics user runs daily.
  *
  * Both are chains of user_id-keyed aggregates/joins: one shuffle
  * establishes the user_id partitioning and every subsequent
  * `groupBy`/`join` in the chain reuses it (no window over the raw
  * event stream, no per-user collect). Timestamps are reduced to
  * epoch seconds (`Tables.tsNsToSec`) and week indexes to integral
  * `div` — all arithmetic is exact integer math, so the DuckDB gate
  * is a full hash match.
  */
object Funnel {

  val WeekSeconds = 604800L

  /** Ordered 3-step funnel view → click → purchase per user:
    * t1 = first view, t2 = first click strictly after t1, t3 = first
    * purchase strictly after t2; `stage` = furthest step reached. */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(Tables(spark, dir).events
      .select(col("user_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep")))

  /** Core funnel over an (user_id, event_type, ep) frame. */
  def funnelOf(ev: DataFrame): DataFrame = {
    val base = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ep"))).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(base, "user_id")
      .filter(col("ep") > col("t1"))
      .groupBy("user_id").agg(min(col("ep")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id")
      .filter(col("ep") > col("t2"))
      .groupBy("user_id").agg(min(col("ep")).as("t3"))
    base
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1"), col("t2"), col("t3"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0).as("stage"))
      .orderBy(col("user_id"))
  }

  /** Weekly cohort retention: cohort = integral week of the user's
    * first signup; a user counts as retained in `week_offset` w if
    * they have ANY event in cohort_week + w (offsets < 0, i.e.
    * pre-signup activity, excluded). */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame =
    retentionOf(Tables(spark, dir).events
      .select(col("user_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep")))

  /** Core retention over an (user_id, event_type, ep) frame. */
  def retentionOf(ev: DataFrame): DataFrame = {
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ep")).as("sep"))
      .withColumn("cohort_week", expr(s"sep div $WeekSeconds"))
      .select("user_id", "cohort_week")
    ev.join(cohort, "user_id")
      .withColumn("week_offset",
        expr(s"ep div $WeekSeconds") - col("cohort_week"))
      .filter(col("week_offset") >= 0)
      .select("user_id", "cohort_week", "week_offset")
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
