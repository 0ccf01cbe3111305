package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time as-of join: for each left row, the most recent right row
  * with `right.ts <= left.ts` for the same key.
  *
  * Spark has no AS OF join operator; rather than a custom `SparkPlan`
  * we express it as a union + ordered window (`last(_, ignoreNulls)`
  * over rows-unbounded-preceding). That is ONE shuffle on the key and
  * a per-partition sort — the same cost profile as a sort-merge as-of
  * join — and it stays inside Catalyst (codegen window, AQE sizing).
  * A naive inequality-join (`l.key = r.key AND r.ts <= l.ts` + max)
  * would explode to O(|L|·|R|) per key at 100 TB; this stays
  * O((|L|+|R|) log) per key.
  */
object AsOfJoin {

  /** Purchases as-of joined to the user's latest prior signup.
    * `ts` arrives as epoch-nanos long (see [[graft.Tables.events]]);
    * the merge orders on the raw nanos and only the output columns are
    * reduced to epoch seconds. */
  def purchasesAsOfSignup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
              lit(null).cast("long").as("s_ts"), lit(1).as("is_left"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(lit(null).cast("long").as("event_id"), col("user_id"),
              col("ts"), col("ts").as("s_ts"), lit(0).as("is_left"))

    // Right rows sort before left rows at equal ts so ties count as
    // "prior" (matches ASOF ... ON left.ts >= right.ts semantics).
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    signups.unionByName(purchases)
      .withColumn("asof_ts", last(col("s_ts"), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(col("event_id"), col("user_id"),
              Tables.tsNsToSec("ts").as("p_sec"),
              Tables.tsNsToSec("asof_ts").as("signup_sec"))
      .orderBy(col("event_id"))
  }

  /** FORWARD as-of join — the time-to-convert read: for each view,
    * the user's NEXT purchase (ties at the same timestamp count as
    * "next", matching the backward entry's ties-count-as-prior
    * mirror). Same union + ordered-window merge, opposite frame:
    * `first(_, ignoreNulls)` over rows-1-following→unbounded, so the
    * cost stays ONE user_id exchange + per-partition sort at any
    * scale (a `p.ts >= v.ts` inequality join would be O(|V|·|P|)
    * per user). Both `first` calls share one window spec → one
    * Window node. DuckDB's ASOF is backward-only, so the oracle runs
    * the identical window algebra instead — which also pins the tie
    * rule explicitly. */
  /** NEAREST as-of join — the third member of the family
    * (backward / forward / nearest): for each view, the user's
    * closest purchase in EITHER direction. A same-instant purchase
    * counts as prior (gap 0), and an exact |Δ| tie resolves to the
    * prior side — one total rule, pinned in the oracle. Same
    * union + ordered-window merge, both frames over ONE
    * (partition, order) spec, so Catalyst plans a single Window
    * node and the cost stays ONE user_id exchange + per-partition
    * sort (two inequality joins + argmin would be O(|V|·|P|) per
    * user). The direction choice compares raw epoch-nano gaps —
    * integer algebra, and order-equivalent to the oracle's µs
    * comparisons (×1000 preserves order and ties). */
  def viewsAsOfNearestPurchase(spark: SparkSession, dir: String): DataFrame =
    nearestOf(Tables(spark, dir).events)

  /** Nearest merge over any normalized (event_id, user_id, ts-nanos,
    * event_type) frame. */
  def nearestOf(ev: DataFrame): DataFrame = {
    // purchases sort BEFORE views at equal ts → a same-instant
    // purchase lands in the view's preceding frame (counts as prior)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"),
        lit(null).cast("long").as("p_id"),
        lit(null).cast("long").as("p_ts"), lit(1).as("tag"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_id").as("p_id"), col("ts").as("p_ts"), lit(0).as("tag"))
    val wb = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val m = views.unionByName(purchases)
      .withColumn("prev_id", last(col("p_id"), ignoreNulls = true).over(wb))
      .withColumn("prev_ts", last(col("p_ts"), ignoreNulls = true).over(wb))
      .withColumn("next_id", first(col("p_id"), ignoreNulls = true).over(wf))
      .withColumn("next_ts", first(col("p_ts"), ignoreNulls = true).over(wf))
      .filter(col("tag") === 1)
    val pickPrev = col("prev_ts").isNotNull &&
      (col("next_ts").isNull ||
        (col("ts") - col("prev_ts")) <= (col("next_ts") - col("ts")))
    m.withColumn("near_ts",
        when(pickPrev, col("prev_ts")).otherwise(col("next_ts")))
      .withColumn("near_id",
        when(pickPrev, col("prev_id")).otherwise(col("next_id")))
      .withColumn("direction",
        when(pickPrev, lit("prev"))
          .when(col("next_ts").isNotNull, lit("next"))
          .otherwise(lit(null).cast("string")))
      .select(col("event_id").as("view_id"), col("user_id"),
        Tables.tsNsToSec("ts").as("view_sec"),
        col("near_id").as("nearest_purchase_id"),
        Tables.tsNsToSec("near_ts").as("nearest_sec"),
        abs(Tables.tsNsToSec("near_ts") - Tables.tsNsToSec("ts"))
          .as("gap_s"),
        col("direction"))
      .orderBy(col("view_id"))
  }

  def viewsAsOfNextPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    // tag: views sort BEFORE purchases at equal ts, so a same-instant
    // purchase lands in the view's following frame
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"),
              lit(null).cast("long").as("p_id"),
              lit(null).cast("long").as("p_ts"), lit(0).as("tag"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
              col("event_id").as("p_id"), col("ts").as("p_ts"),
              lit(1).as("tag"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    views.unionByName(purchases)
      .withColumn("next_p_id", first(col("p_id"), ignoreNulls = true).over(w))
      .withColumn("next_p_ts", first(col("p_ts"), ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .select(col("event_id").as("view_id"), col("user_id"),
              Tables.tsNsToSec("ts").as("view_sec"),
              col("next_p_id").as("next_purchase_id"),
              Tables.tsNsToSec("next_p_ts").as("purchase_sec"),
              (Tables.tsNsToSec("next_p_ts") - Tables.tsNsToSec("ts"))
                .as("lag_s"))
      .orderBy(col("view_id"))
  }
}
