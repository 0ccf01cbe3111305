package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Interval (range) join: points joined into intervals with NO equi
  * key — `start <= point < end`.
  *
  * Spark has no range-join operator; a direct inequality join plans as
  * BroadcastNestedLoopJoin (or a cartesian), O(|P|·|I|) comparisons —
  * the reference's scan-per-request model has the same blowup
  * (`mr/job_engine.py` mappers see the full argument list). The
  * scalable Spark-first shape is BINNED: quantize time into buckets of
  * the window width W, explode each interval to the (≤2) buckets it
  * overlaps, map each point to its single bucket, equi-join on the
  * bucket id, then apply the exact range predicate as a residual
  * filter. Cost drops to O(|P| + 2|I|) shuffled rows and only
  * within-bucket pairs are ever compared; the join is a plain shuffle
  * hash/sort-merge join, so AQE splits hot (skewed) time buckets.
  * Because a point lands in exactly ONE bucket, no post-join dedup is
  * needed. All bucket math is integral `div` on epoch seconds (no
  * double round-trip — see CLAUDE.md).
  */
object RangeJoin {

  /** DuckDB-exact binary rounding — never Spark's `round` (CLAUDE.md). */
  private def round(c: Column, scale: Int): Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  /** Window width: one hour, in seconds. */
  val WindowSec: Long = 3600L

  /** Anchor filter: purchases above this value open a window. */
  val AnchorMinValue: Double = 150.0

  /** Core binned range join + per-interval aggregate.
    *
    * @param anchors (anchor_id: long, a_sec: long) — each row opens the
    *                half-open window `[a_sec, a_sec + w)`
    * @param points  (event_id: long, user_id: long, value: double,
    *                e_sec: long)
    * @param w       window width in seconds (= bin width)
    * @return per-anchor aggregate over the points inside its window
    */
  def rangeJoinAgg(anchors: DataFrame, points: DataFrame, w: Long): DataFrame = {
    // An interval of length exactly w overlaps bin a_sec div w and, unless
    // it starts on a bin boundary, the next one; sequence() emits both.
    val binnedAnchors = anchors.select(
      col("anchor_id"), col("a_sec"),
      explode(sequence(expr(s"a_sec div ${w}L"),
                       expr(s"(a_sec + ${w - 1}L) div ${w}L"))).as("bin"))
    val binnedPoints = points.withColumn("bin", expr(s"e_sec div ${w}L"))

    binnedAnchors
      .join(binnedPoints, Seq("bin"))
      .filter(col("e_sec") >= col("a_sec") &&
              col("e_sec") < col("a_sec") + lit(w))
      .groupBy(col("anchor_id"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"),
           round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("anchor_id"))
  }

  /** `range_join` query entry: every event falling inside the 1-hour
    * window opened by any high-value purchase (the anchor's own event
    * included — it satisfies `a_sec <= e_sec`). */
  def eventsInWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("value"), Tables.tsNsToSec("ts").as("e_sec"))
    val anchors = ev
      .filter(col("event_type") === "purchase" &&
              col("value") > AnchorMinValue)
      .select(col("event_id").as("anchor_id"), col("e_sec").as("a_sec"))
    rangeJoinAgg(anchors, ev.drop("event_type"), WindowSec)
  }

  /** Band half-width for [[eventsBandJoin]]: ±5 minutes. */
  val BandSec: Long = 300L

  /** Keyed symmetric band join + per-anchor aggregate: for each left
    * row, every right row of the SAME key within `|Δt| <= w`,
    * folded to (count, min |Δt|). The three variants of "join on
    * time proximity" now cover: asof_join (nearest one side),
    * range_join (all in a one-sided window, unkeyed), and this —
    * all within a symmetric band, keyed, zero-match rows retained.
    *
    * Scale shape: same binned equi-join discipline as
    * [[rangeJoinAgg]] — a direct `abs(l−r) <= w` join is a BNLJ.
    * Left rows explode to the ≤3 width-w bins covering
    * `[t−w, t+w]`; right rows map to their single bin, so each
    * true pair meets EXACTLY once (no post-join dedup) and the join
    * is a plain (key, bin) shuffle equi-join AQE can skew-split.
    * Zero-match anchors come back via one left join of the
    * aggregate onto the anchor frame (anchor_id equi-join). All
    * integer algebra ⇒ full hash gate.
    *
    * @param anchors (anchor_id: long, key: long, a_sec: long)
    * @param points  (key: long, p_sec: long)
    */
  def bandJoinAgg(anchors: DataFrame, points: DataFrame, w: Long): DataFrame = {
    val binnedAnchors = anchors.select(
      col("anchor_id"), col("key"), col("a_sec"),
      explode(sequence(expr(s"(a_sec - ${w}L) div ${w}L"),
                       expr(s"(a_sec + ${w}L) div ${w}L"))).as("bin"))
    val binnedPoints = points
      .select(col("key"), col("p_sec"), expr(s"p_sec div ${w}L").as("bin"))
    val matched = binnedAnchors
      .join(binnedPoints, Seq("key", "bin"))
      .filter(abs(col("p_sec") - col("a_sec")) <= lit(w))
      .groupBy(col("anchor_id"))
      .agg(count(lit(1)).as("n_in_band"),
           min(abs(col("p_sec") - col("a_sec"))).as("min_gap_sec"))
    anchors.join(matched, Seq("anchor_id"), "left")
      .select(col("anchor_id"), col("key"),
        coalesce(col("n_in_band"), lit(0L)).as("n_in_band"),
        col("min_gap_sec"))
      .orderBy(col("anchor_id"))
  }

  /** `events_band_join` query entry: for every purchase, the error
    * events of the same user within ±5 minutes — the "what went
    * wrong around this conversion" proximity scan. */
  def eventsBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("event_type"),
              Tables.tsNsToSec("ts").as("sec"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("anchor_id"), col("user_id").as("key"),
        col("sec").as("a_sec"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("key"), col("sec").as("p_sec"))
    bandJoinAgg(purchases, errors, BandSec)
      .select(col("anchor_id").as("purchase_id"), col("key").as("user_id"),
        col("n_in_band").as("n_errors"), col("min_gap_sec"))
  }
}
