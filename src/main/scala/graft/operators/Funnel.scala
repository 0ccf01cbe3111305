package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2B adjunct — ordered funnel, cohort retention, and event
  * pathing over `events`: the staple product-analytics operators a
  * JobX-style analytics user runs daily.
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

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  val WeekSeconds = 604800L

  /** Ordered 3-step funnel view → click → purchase per user:
    * t1 = first view, t2 = first click strictly after t1, t3 = first
    * purchase strictly after t2; `stage` = furthest step reached. */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(Tables(spark, dir).events
      .select(col("user_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep")))

  /** Core funnel over an (user_id, event_type, ep) frame.
    *
    * Shape: ONE hash exchange on user_id, then three chained
    * whole-partition `min` windows (t2's predicate reads the
    * partition-constant t1, t3's reads t2) and a final groupBy that
    * reuses the same partitioning — Catalyst plans scan → Exchange →
    * Sort → 3×Window → Aggregate with no further shuffle. The naive
    * aggregate-join formulation (t1-agg ⋈ click-agg ⋈ purchase-agg)
    * reads clean but Catalyst does NOT dedup repeated DataFrame
    * subtrees, so it re-scanned events six times and re-computed the
    * t1 aggregate three times (measured; FunnelSpec pins the 2-
    * exchange bound so it cannot regress). */
  def funnelOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    val staged = ev
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ep"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ep") > col("t1"),
          col("ep"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ep") > col("t2"),
          col("ep"))).over(w))
    staged.groupBy("user_id")
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"),
        min(col("t3")).as("t3"))
      .select(col("user_id"), col("t1"), col("t2"), col("t3"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0).as("stage"))
      .orderBy(col("user_id"))
  }

  /** Event pathing: first-order Markov transition counts between
    * consecutive event types per user (ordered by (ep, event_id)),
    * with the row-conditional transition probability. One scan + one
    * user_id exchange (the lead window), then a tiny (from, to) agg;
    * `p` is a long/long division (correctly-rounded IEEE, so the
    * oracle hash is exact — same argument as text_tfidf). */
  def eventsPathing(spark: SparkSession, dir: String): DataFrame =
    pathingOf(Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep")))

  /** Core pathing over an (user_id, event_id, event_type, ep) frame. */
  def pathingOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ep"), col("event_id"))
    val trans = ev
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy("from_type")
    trans
      .withColumn("n_from", sum(col("n")).over(wf))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("n_from"), 4).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Top-k sequence mining: the most common 3-step event-type
    * sequences over each user's (ep, event_id)-ordered stream. Same
    * single-scan + single-user_id-exchange shape as [[pathingOf]]
    * (two leads over one window), then a tiny (t1,t2,t3) aggregate
    * and a global top-k — the candidate space is |event_types|³
    * (125 here), so the final agg/sort is metadata-sized at any data
    * scale. */
  def eventsSequences(spark: SparkSession, dir: String): DataFrame =
    sequencesOf(Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep")))

  /** Core over an (user_id, event_id, event_type, ep) frame. */
  def sequencesOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ep"), col("event_id"))
    ev
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  /** Weekly cohort retention: cohort = integral week of the user's
    * first signup; a user counts as retained in `week_offset` w if
    * they have ANY event in cohort_week + w (offsets < 0, i.e.
    * pre-signup activity, excluded). */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame =
    retentionOf(Tables(spark, dir).events
      .select(col("user_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep")))

  /** Core retention over an (user_id, event_type, ep) frame.
    *
    * Shape: like [[funnelOf]], the user's signup epoch is a
    * whole-partition window `min` instead of a separate aggregate
    * joined back — one scan of events, one user_id exchange (the
    * window), then the distinct/count aggregates (the first reuses
    * the user_id partitioning; the tiny (cohort, offset) re-shuffle
    * is over the already-collapsed distinct set). */
  def retentionOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    ev
      .withColumn("sep",
        min(when(col("event_type") === "signup", col("ep"))).over(w))
      .filter(col("sep").isNotNull)
      .withColumn("cohort_week", expr(s"sep div $WeekSeconds"))
      .withColumn("week_offset",
        expr(s"ep div $WeekSeconds") - col("cohort_week"))
      .filter(col("week_offset") >= 0)
      .select("user_id", "cohort_week", "week_offset")
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Baseline hours required before an anomaly score is emitted, and
    * the spike threshold (|z| > 3). Single-sourced into the oracle. */
  val AnomalyMinBaseline = 12
  val AnomalySpikeZ = 3.0

  /** Trailing-window anomaly (spike) detection: per (event_type,
    * hour), the z-score of the hour's event count against the
    * trailing 24 hours (current hour excluded).
    *
    * Reproducibility design — why this is NOT `stddev` over a window:
    * two engines' Welford/merge orders differ in the last ulp on
    * doubles, so a windowed stddev is not cross-engine bit-stable.
    * Here every window aggregate is an EXACT integer: count, Σx and
    * Σx² over per-hour counts are long sums (≤ 2⁵³, no FP at all),
    * and mean/variance/z are then derived in one identical double
    * expression tree on both engines — bit-equality by construction,
    * full hash gate. Same trick as the funnel's integral epochs.
    *
    * Shape: one groupBy (event_type, hour) collapse — the RANGE-frame
    * window then runs over ~24·365 rows per type per year, thousands
    * of times smaller than the event stream; partitions by type are
    * independent. */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables(spark, dir).events
      .select(col("event_type"), Tables.tsNsToSec("ts").as("ep"))
      .withColumn("h", expr("ep div 3600L"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rangeBetween(-24, -1)
    hourly
      .withColumn("nw", count(col("cnt")).over(w))
      .withColumn("sumx", sum(col("cnt")).over(w))
      .withColumn("sumx2", sum(col("cnt") * col("cnt")).over(w))
      .filter(col("nw") >= AnomalyMinBaseline)
      .withColumn("mean", col("sumx").cast("double") / col("nw"))
      .withColumn("varr",
        (col("sumx2").cast("double") -
          col("sumx").cast("double") * col("sumx") / col("nw")) /
          (col("nw") - 1))
      .filter(col("varr") > 0)
      .withColumn("z",
        (col("cnt").cast("double") - col("mean")) / sqrt(col("varr")))
      // epoch seconds, not a constructed timestamp: integral output
      // like stream_window_agg's win_start (timestamp construction
      // semantics differ across engines; integers cannot)
      .select(col("event_type"),
        (col("h") * 3600).as("hour_ep"),
        col("cnt").cast("int").as("n_events"),
        round(col("z"), 4).as("z"),
        (abs(col("z")) > AnomalySpikeZ).as("is_spike"))
      .orderBy(col("event_type"), col("hour_ep"))
  }

  /** Iglewicz–Hoaglin constant and cut for [[eventsAnomalyMad]]
    * (single-sourced into the oracle). */
  val MadZConst = 0.6745
  val MadOutlierCut = 3.5

  /** B (round 13): robust daily anomaly flags — the
    * median/MAD twin of events_anomaly's rolling mean/σ z-score:
    * per event type, each day's count scored as the modified
    * z-score 0.6745·(x − median)/MAD (Iglewicz–Hoaglin, |z| > 3.5
    * flags). The robust detector a pipeline runs when the series
    * itself contains the spikes it hunts — one burst day inflates a
    * mean/σ baseline (masking), but moves a median/MAD baseline by
    * at most one rank. Complements, not replaces, B9: B9 is the
    * trailing-window ONLINE shape, this is the full-series batch
    * sweep.
    *
    * Exactness: counts are exact integers; median and MAD are
    * percentile(0.5) interpolations (bit-equal to DuckDB's
    * quantile_cont — the events_rfm precedent), the z assembly is
    * one mirrored IEEE expression, MAD = 0 (constant series) ⇒ NULL
    * z via the same CASE both engines ⇒ full hash gate. Scale:
    * daily counts are one map-side-combined groupBy; both
    * percentile aggregates run per TYPE over day-count rows
    * (series-length-sized, not event-sized); daily and deviation
    * frames are persisted (each feeds two consumers —
    * no-subtree-dedup). */
  def eventsAnomalyMad(spark: SparkSession, dir: String): DataFrame =
    madScore(Tables(spark, dir).events
      .select(col("event_type"), Tables.tsNsToSec("ts").as("ep"))
      .withColumn("day", expr("ep div 86400L"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt")))

  /** The read-side scorer over any (event_type, day, cnt) daily
    * count frame — shared by the batch sweep and the streaming
    * twin's snapshot read (one definition, one oracle). */
  def madScore(dailyIn: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val daily = dailyIn.persist(StorageLevel.MEMORY_AND_DISK)
    val med = daily.groupBy(col("event_type"))
      .agg(percentile(col("cnt"), lit(0.5)).as("med"))
    val dev = daily.join(med, Seq("event_type"))
      .withColumn("adev", abs(col("cnt").cast("double") - col("med")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val mad = dev.groupBy(col("event_type"))
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    val z = lit(MadZConst) * (col("cnt").cast("double") - col("med")) /
      col("mad")
    dev.join(mad, Seq("event_type"))
      .select(col("event_type"), col("day"), col("cnt").as("n_events"),
        round(col("med"), 4).as("med"),
        round(col("mad"), 4).as("mad"),
        when(col("mad") > 0.0, round(z, 4)).as("robust_z"),
        when(col("mad") > 0.0, abs(z) > MadOutlierCut).as("is_outlier"))
      .orderBy(col("event_type"), col("day"))
  }

  /** B35: first/last-touch attribution — for every purchase, the
    * earliest and the most recent strictly-preceding touch event
    * (view/click) by the same user, plus the touch count. The other
    * canonical event-stream join after funnel/retention/pathing:
    * "which interaction gets credit for this conversion".
    *
    * Shape: ONE hash exchange on user_id, then five aggregates over a
    * single running ROWS frame (one Window node — same spec), filter
    * to purchases afterwards (the window must see full history).
    * first/last with ignoreNulls skip non-touch rows instead of a
    * self-join per purchase — the naive "join each purchase to its
    * preceding touches and re-aggregate" form is quadratic in a
    * user's history; this is linear and partition-local after the one
    * exchange. Purchases with no prior touch keep NULL credit —
    * honest, not dropped. Ties: (ts, event_id) is a total order, so
    * first/last are deterministic and the hash gate is exact. */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame =
    attributionOf(Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts")))

  /** Core attribution over an (event_id, user_id, event_type, ts)
    * frame — ts any totally-ordered type (epoch-nanos long from
    * [[Tables.events]]; specs plant plain longs). */
  def attributionOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val touch = col("event_type").isin("view", "click")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("touch_type", when(touch, col("event_type")))
      .withColumn("touch_id", when(touch, col("event_id")))
      .withColumn("first_touch_type",
        first(col("touch_type"), ignoreNulls = true).over(w))
      .withColumn("first_touch_id",
        first(col("touch_id"), ignoreNulls = true).over(w))
      .withColumn("last_touch_type",
        last(col("touch_type"), ignoreNulls = true).over(w))
      .withColumn("last_touch_id",
        last(col("touch_id"), ignoreNulls = true).over(w))
      .withColumn("n_touches", count(col("touch_id")).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        Tables.tsNsToSec("ts").as("ep"),
        col("first_touch_type"), col("first_touch_id"),
        col("last_touch_type"), col("last_touch_id"),
        col("n_touches").cast("int").as("n_touches"))
      .orderBy(col("purchase_id"))
  }

  /** B: event-type co-occurrence — for every unordered pair of event
    * types, how many users do both, with per-type user reach and the
    * Jaccard overlap (the "which behaviors travel together" /
    * market-basket read over the event log). All integer counts plus
    * one exact division ⇒ full hash gate.
    *
    * Shape: one distinct (user_id, event_type) shuffle — per-user
    * type sets are bounded by the tiny event-type vocabulary, so the
    * user_id self-join fans out ≤ T²/2 pairs per user and the pair
    * agg map-side-combines into |T|²/2 rows; per-type reach counts
    * re-join as broadcasts. No window over the event stream, no
    * collect — at 100 TB everything keys on user_id or on the
    * T²-row pair table. */
  def eventsCooccurrence(spark: SparkSession, dir: String): DataFrame =
    cooccurrenceOf(Tables(spark, dir).events
      .select(col("user_id"), col("event_type")))

  /** Core co-occurrence over any (user_id, event_type) frame. */
  def cooccurrenceOf(ev: DataFrame): DataFrame = {
    val ut = ev.select(col("user_id"), col("event_type")).distinct()
    val pairs = ut.select(col("user_id"), col("event_type").as("type_a"))
      .join(ut.select(col("user_id"), col("event_type").as("type_b")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users_both"))
    val reach = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    pairs
      .join(broadcast(reach.select(col("event_type").as("type_a"),
        col("n").as("n_users_a"))), Seq("type_a"))
      .join(broadcast(reach.select(col("event_type").as("type_b"),
        col("n").as("n_users_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_users_both"),
        col("n_users_a"), col("n_users_b"),
        round(col("n_users_both") /
          (col("n_users_a") + col("n_users_b") - col("n_users_both")), 6)
          .as("jaccard"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** MAU lookback window in days (the industry-standard 28 —
    * single-sourced into the oracle). */
  val MauWindowDays = 28L

  /** B-section (round 10): DAU / MAU / stickiness — the product-
    * analytics engagement datasheet: per day, the distinct active
    * users that day (DAU), the distinct users active in the trailing
    * [[MauWindowDays]]-day window (MAU), and DAU/MAU (the
    * "stickiness" ratio every growth dashboard tracks). Early days
    * carry a partial lookback (standard dashboard semantics).
    *
    * The sliding-window DISTINCT is the classic hard shape — a naive
    * day×window range join is a non-equi join, and a window-function
    * distinct over users doesn't exist. Exact scale shape here:
    * CONTRIBUTION EXPLODE — each (day, user) activity row contributes
    * to exactly [[MauWindowDays]] observation days
    * (`explode(sequence(day, day+27))`), turning the range join into
    * a plain groupBy(obs_day) distinct-count: bounded 28× row
    * amplification of the already-deduplicated user-day frame (NOT
    * raw events), map-side combined, AQE-handled skew — linear,
    * shuffle-only-on-equi-keys, at any corpus size. (At extreme
    * scale the dial is an HLL sketch merge per day — q12's
    * approx-distinct pattern; the exact form IS the oracle gate.)
    * Partial windows past the data's edge drop out via the inner
    * join with the DAU frame (only observed days report). */
  def eventsEngagement(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    // epoch-day from the epoch-nanos contract: two integral divs,
    // mirroring the oracle's epoch(...) // 86400 exactly
    val ud = ev.select(
        expr("(ts div 1000000000L) div 86400L").as("day"), col("user_id"))
      .distinct()
      .persist() // feeds DAU and the contribution explode (Catalyst
                 // does not dedup the two subtrees)
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val mau = ud
      .withColumn("obs_day",
        explode(sequence(col("day"), col("day") + lit(MauWindowDays - 1))))
      .groupBy("obs_day")
      .agg(countDistinct(col("user_id")).as("mau"))
    dau.join(mau, dau("day") === mau("obs_day"))
      .select(col("day"), col("dau"), col("mau"),
        round(col("dau") / col("mau"), 4).as("stickiness"))
      .orderBy(col("day"))
  }

  /** Fixed-point scale for [[eventsAttributionLinear]]'s credit
    * fractions (1.0 ≡ 1e9; single-sourced into the oracle). Headroom:
    * nv·scale must stay in long range, so a single user may carry up
    * to ~9.2e9 preceding touches before overflow (Spark would wrap
    * silently where DuckDB errors — the mix_tokens_budget headroom
    * discipline); at 1e12 that bound was ~9.2e6, reachable by one
    * pathological bot user. 1e9 still quantizes each purchase's
    * fraction 1000× finer than the round(6) output grain, and the
    * fixed-point value is the SAME integer in both engines, so the
    * gate is unaffected. */
  val AttrScale = 1000000000L

  /** B (round 13): LINEAR (multi-touch) attribution — every purchase
    * splits one unit of credit EQUALLY across all its strictly-
    * preceding view/click touches; per touch type the total credit,
    * touch volume, and purchases credited. The position-free model
    * between B35's first/last extremes — the three together are the
    * standard attribution panel, and the gap between last-touch and
    * linear credit is the classic over/under-crediting read.
    *
    * Exactness: per-purchase credit enters FIXED-POINT before the
    * sum — (nv·[[AttrScale]]) div (nv+nc) is an order-free integer (a double
    * Σ of fractions would drift with partition merge order — the
    * pagerank discipline); the one output division is mirrored.
    * Scale: ONE hash exchange on user_id, two conditional running
    * counts over a single ROWS window (same spec ⇒ one Window
    * node — the B35 shape), a global 1-row aggregate, and the 2
    * output rows EXPLODE from one projection. The totals aggregate
    * reuses the persisted projection (no-subtree-dedup). */
  def eventsAttributionLinear(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val ev = Tables(spark, dir).events
      .select(col("user_id"), Tables.tsNsToSec("ts").as("ep"),
        col("event_id"), col("event_type"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ep"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val n = col("nv") + col("nc")
    val credited = ev
      .withColumn("nv",
        count(when(col("event_type") === "view", 1)).over(w))
      .withColumn("nc",
        count(when(col("event_type") === "click", 1)).over(w))
      .filter(col("event_type") === "purchase" && n > 0L)
    val fp = credited.agg(
      sum(expr(s"(nv * $AttrScale) div (nv + nc)")).as("view_fp"),
      sum(expr(s"(nc * $AttrScale) div (nv + nc)")).as("click_fp"),
      count(lit(1)).as("n_purch"))
    val tot = ev.agg(
      sum(when(col("event_type") === "view", 1L).otherwise(0L))
        .as("n_views"),
      sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("n_clicks"))
    fp.crossJoin(tot)
      .select(explode(array(
        struct(lit("click").as("touch_type"), col("n_clicks").as("n_touches"),
          col("n_purch").as("n_purchases_credited"),
          col("click_fp").as("fp")),
        struct(lit("view").as("touch_type"), col("n_views").as("n_touches"),
          col("n_purch").as("n_purchases_credited"),
          col("view_fp").as("fp")))).as("e"))
      .select(col("e.touch_type").as("touch_type"),
        col("e.n_touches").as("n_touches"),
        col("e.n_purchases_credited").as("n_purchases_credited"),
        round(col("e.fp").cast("double") / lit(AttrScale.toDouble), 6)
          .as("credit"))
      .orderBy(col("touch_type"))
  }

  /** B (round 13): per-user behavioral entropy — Shannon entropy
    * (bits) of each user's event-type mix plus the log2(n_types)-
    * normalized evenness ∈ [0,1]: the behavioral-diversity read
    * (bots/scrapers sit near 0 — one repeated action; engaged users
    * spread mass) that segments beside events_rfm's value axes and
    * feeds bot filtering before any engagement metric.
    *
    * Exactness (the table_entropy/mutual-info discipline): counts are
    * exact integers off ONE two-phase (user, type) groupBy; H =
    * log2(n) − Σ c·log2(c) / n where the Σ is a STRICT sequential
    * fold over the type-sorted per-user terms (sort_array∘aggregate
    * here, list_reduce over list(... ORDER BY ...) there), so the
    * only cross-engine bits are log2 ulps: round(4). Arrays are
    * bounded by the GLOBAL type vocabulary (a handful) — never a
    * per-user row explosion; single-type users read exactly 0.0 (the
    * two log2(n) terms cancel identically). Per-user output rows,
    * shuffle-on-natural-key. */
  def eventsEntropy(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val cnt = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    entropyScore(cnt)
  }

  /** The read-side scorer over any (user_id, event_type, c) count
    * frame — shared by the batch entry and the streaming twin's
    * snapshot read (one definition, one oracle). */
  def entropyScore(cnt: DataFrame): DataFrame = {
    val one = cnt.groupBy(col("user_id"))
      .agg(sum(col("c")).as("n_events"),
        count(lit(1)).as("n_types"),
        sort_array(collect_list(struct(col("event_type"), col("c"))))
          .as("terms"))
    val sTerm = aggregate(
      transform(col("terms"), s =>
        s.getField("c").cast("double") *
          log2(s.getField("c").cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val h = log2(col("n_events").cast("double")) -
      sTerm / col("n_events").cast("double")
    one.select(col("user_id"), col("n_events"),
        col("n_types").cast("int").as("n_types"),
        round(h, 4).as("entropy_bits"),
        when(col("n_types") > 1,
          round(h / log2(col("n_types").cast("double")), 4)).as("evenness"))
      .orderBy(col("user_id"))
  }

  /** B: RFM customer segmentation — the classic recency / frequency /
    * monetary scoring over purchase events, ending in named segments
    * (champions / loyal / big_spender / at_risk / churned / casual).
    *
    * Exactness discipline: monetary is Σ floor(value·100) — CENTS as
    * exact integers, order-free (a raw double Σ would differ in the
    * last ulp by partition merge order and could flip a boundary);
    * recency/frequency are integral. Scores come from quintile
    * BOUNDARIES — ONE aggregate computing three
    * `percentile(x, array(.2,.4,.6,.8))` sketches broadcast as a
    * 1-row frame, then pure per-row boundary comparisons
    * (mix_curriculum's pattern; interpolation bit-equal to DuckDB's
    * quantile_cont) — NOT a global ntile, which would serialize the
    * user frame through one sort at 100 TB. Quantile-boundary
    * buckets are not exactly equal-sized (ties cross boundaries);
    * that is the documented, scalable trade. Score 5 = most
    * recent / most frequent / highest spend. */
  def eventsRfm(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), Tables.tsNsToSec("ts").as("ep"),
        floor(col("value") * 100).cast("long").as("cents"))
    val perUser = purchases.groupBy(col("user_id"))
      .agg(max(col("ep")).as("last_ep"),
        count(lit(1)).as("freq"),
        sum(col("cents")).as("cents"))
    rfmScore(perUser)
  }

  /** The scoring stage over any per-user (user_id, last_ep, freq,
    * cents) metrics frame — shared by the batch entry and the
    * streaming twin's batch mode (one scoring definition, one
    * oracle). max_ep derives from the metrics frame (= the corpus
    * max purchase epoch, since every user's last_ep is a max over
    * their purchases). */
  def rfmScore(perUser: DataFrame): DataFrame = {
    val maxEp = perUser.agg(max(col("last_ep")).as("max_ep"))
    val u = perUser.crossJoin(broadcast(maxEp))
      .select(col("user_id"),
        // integral div on BOTH engines: Spark's / on longs is double
        // division and DuckDB's ::bigint cast ROUNDS, so a double
        // round-trip could disagree at day boundaries
        expr("(max_ep - last_ep) div 86400").as("recency_days"),
        col("freq"), col("cents"))
    val qs = array(lit(0.2), lit(0.4), lit(0.6), lit(0.8))
    val bounds = u.agg(
      percentile(col("recency_days"), qs).as("qr"),
      percentile(col("freq"), qs).as("qf"),
      percentile(col("cents"), qs).as("qm"))
    // score = 1 + #boundaries strictly below (ascending metric);
    // recency inverts (smaller = better)
    def scoreAsc(x: Column, q: Column): Column =
      (1 to 4).map(i => when(x > element_at(q, i), 1).otherwise(0))
        .reduce(_ + _) + 1
    val r = lit(6) - scoreAsc(col("recency_days"), col("qr"))
    val f = scoreAsc(col("freq"), col("qf"))
    val m = scoreAsc(col("cents"), col("qm"))
    u.crossJoin(broadcast(bounds))
      .select(col("user_id"), col("recency_days"), col("freq"),
        round(col("cents") / 100.0, 2).as("monetary"),
        r.as("r"), f.as("f"), m.as("m"))
      .withColumn("segment",
        when(col("r") >= 4 && col("f") >= 4 && col("m") >= 4, "champions")
          .when(col("f") >= 4, "loyal")
          .when(col("m") >= 4, "big_spender")
          .when(col("r") <= 2 && col("f") >= 3, "at_risk")
          .when(col("r") === 1, "churned")
          .otherwise("casual"))
      .orderBy(col("user_id"))
  }
}
