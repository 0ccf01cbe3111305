package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2B adjunct — user-lifecycle and time-structure analytics
  * over `events`/`orders`: growth accounting, activity heatmap,
  * behavior transition matrix, interval-union coverage, and revenue
  * cohorts. (Reference surface: JobX users run these as chained
  * map/reduce steps over event logs — e.g. `mr/handlers` word/sum
  * pipelines keyed by user/day; here each is one declarative plan.)
  *
  * All arithmetic is exact integer math on the epoch-nanos `ts`
  * contract (money in cents), so every query here is full hash-gated
  * against the DuckDB oracle. Every operator is one hash exchange on
  * its natural key (user_id / o_custkey) followed by re-partitioned
  * aggregates — no windows over undefined partitions, no collects.
  */
object Lifecycle {

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: Column, scale: Int): Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  /** Interval half-width for [[intervalCoverage]]: each event covers
    * [ep, ep+1800) seconds (single-sourced into the oracle). */
  val CoverageWindowSec = 1800L

  /** B: growth accounting — per active day, how many users are new
    * (first-ever activity), retained (also active the previous day),
    * resurrected (returning after a gap), and how many churned INTO
    * the day (active the day before, absent that day and possibly
    * later resurrected). dau = new + retained + resurrected.
    *
    * Shape: dedup to (user, day) once, ONE exchange on user_id for
    * the lag/lead windows (same spec → one sort), then a
    * contribution EXPLODE — each row emits its own-day status plus,
    * when its next active day is not day+1, a churn contribution to
    * day+1 — so the day-grain aggregate is a single groupBy over one
    * pass (Catalyst does NOT dedup a twice-referenced tagged frame;
    * the explode keeps the lineage single-scan, LifecycleSpec pins
    * it). Churn rows landing on silent days (incl. corpus-end+1)
    * drop via the dau>0 filter, mirrored in the oracle. */
  def eventsLifecycle(spark: SparkSession, dir: String): DataFrame =
    lifecycleOf(Tables(spark, dir).events
      .select(expr("(ts div 1000000000L) div 86400L").as("day"),
        col("user_id")))

  /** Core growth accounting over a (day, user_id) activity frame. */
  def lifecycleOf(act: DataFrame): DataFrame = {
    val ud = act.select(col("day"), col("user_id")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val tagged = ud
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .withColumn("next_day", lead(col("day"), 1).over(w))
    val status = when(col("prev_day").isNull, "new")
      .when(col("prev_day") === col("day") - 1, "retained")
      .otherwise("resurrected")
    val churn = when(col("next_day").isNull ||
      col("next_day") > col("day") + 1, lit("churned"))
    val contrib = tagged
      .select(explode(array(
        struct(col("day"), status.as("kind")),
        struct((col("day") + lit(1L)).as("day"), churn.as("kind"))))
        .as("c"))
      .select(col("c.day").as("day"), col("c.kind").as("kind"))
      .filter(col("kind").isNotNull)
    def cnt(k: String): Column =
      sum(when(col("kind") === k, 1L).otherwise(0L))
    contrib.groupBy("day")
      .agg(cnt("new").as("new_users"), cnt("retained").as("retained"),
        cnt("resurrected").as("resurrected"), cnt("churned").as("churned"))
      .withColumn("dau",
        col("new_users") + col("retained") + col("resurrected"))
      .filter(col("dau") > 0)
      .orderBy(col("day"))
  }

  /** B: activity heatmap — events bucketed by (day-of-week, hour),
    * with distinct users and cents-exact average value. Pure integer
    * epoch algebra (epoch day 0 = Thursday → dow 0 = Sunday), one
    * 168-group aggregate: partial map-side combine does all the work
    * at any scale; value sums are Σ floor(value·100) longs, so the
    * average is order-free exact (a raw double Σ could flip the 4dp
    * round by partition merge order). */
  def eventsHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    ev.select(
        expr("((((ts div 1000000000L) div 86400L) % 7) + 4) % 7")
          .cast("int").as("dow"),
        expr("((ts div 1000000000L) div 3600L) % 24").cast("int").as("hour"),
        col("user_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("cents")).as("cents"))
      .select(col("dow"), col("hour"), col("n_events"), col("n_users"),
        round((col("cents") / 100.0) / col("n_events"), 4).as("avg_value"))
      .orderBy(col("dow"), col("hour"))
  }

  /** B: transition dwell times — for each src→dst event-type
    * transition, how long users linger before making it (count, mean
    * gap, p90 gap, max gap in seconds): the "time to convert"
    * companion to events_pathing's pure transition COUNTS/probability
    * matrix (which this deliberately does not duplicate).
    *
    * ONE exchange on user_id for the lag window (raw-ns `ts` order,
    * event_id tiebreak — gaps then reduce to exact epoch-second
    * integers), then a tiny (types²) aggregate: mean is an integer
    * Σ/n correctly-rounded division, p90 one percentile sketch per
    * group (interpolation bit-equal to quantile_cont — the
    * mix_curriculum proof). */
  def eventsDwell(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = ev
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .withColumn("gap", col("ep") - lag(col("ep"), 1).over(w))
      .filter(col("src").isNotNull)
    pairs.groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("gap")) / count(lit(1)), 4).as("avg_gap_sec"),
        round(percentile(col("gap"), lit(0.9)), 4).as("p90_gap_sec"),
        max(col("gap")).as("max_gap_sec"))
      .orderBy(col("src"), col("dst"))
  }

  /** B: interval-union coverage — per user, the total seconds covered
    * by the union of [ep, ep+1800) event intervals plus the merged
    * segment count: the "how much wall-clock was this user actually
    * engaged" metric that a naive duration Σ double-counts.
    *
    * Classic sweep-line as ONE window: order each user's intervals,
    * take the running max end over STRICTLY PRECEDING rows, and the
    * new coverage each interval contributes is end − max(start,
    * prev_max_end), clamped at 0 (containment). All integer seconds,
    * one exchange on user_id, groupBy reuses the partitioning. */
  def intervalCoverage(spark: SparkSession, dir: String): DataFrame =
    intervalCoverageOf(Tables(spark, dir).events
      .select(col("user_id"), Tables.tsNsToSec("ts").as("ep"),
        col("event_id")), CoverageWindowSec)

  /** Core sweep over a (user_id, ep, event_id) frame. */
  def intervalCoverageOf(iv: DataFrame, winSec: Long): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ep"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    iv.withColumn("prev_end", max(col("ep") + lit(winSec)).over(w))
      .withColumn("contrib",
        greatest(lit(0L), col("ep") + lit(winSec) -
          greatest(col("ep"), coalesce(col("prev_end"), col("ep")))))
      .withColumn("seg_start",
        when(col("prev_end").isNull || col("ep") >= col("prev_end"), 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("contrib")).as("covered_sec"),
        sum(col("seg_start")).as("n_segments"))
      .orderBy(col("user_id"))
  }

  /** B: revenue cohorts — customers grouped by first-order month,
    * tracked across month indexes since that cohort month: customers
    * active, orders placed, cents-exact revenue. The month key is
    * pure integer algebra (year·12+month−1), the cohort assignment is
    * a min window on the SAME o_custkey exchange the per-cohort
    * aggregate then reuses, and revenue Σ floor(price·100) is
    * order-free exact. cohort_month renders as yyyymm. */
  def ordersCohort(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders.select(
      col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .as("mk"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val g = o.withColumn("cohort_mk",
      min(col("mk")).over(Window.partitionBy("o_custkey")))
    g.groupBy(col("cohort_mk"), (col("mk") - col("cohort_mk")).as("month_index"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum(col("cents")).as("cents"))
      .select(
        (expr("cohort_mk div 12") * 100 + col("cohort_mk") % 12 + 1)
          .cast("int").as("cohort_month"),
        col("month_index"), col("n_customers"), col("n_orders"),
        round(col("cents") / 100.0, 2).as("revenue"))
      .orderBy(col("cohort_month"), col("month_index"))
  }

  /** B: Pareto / ABC revenue concentration — customers ranked by
    * lifetime revenue, cumulative share of total, classified A
    * (first half of revenue), B (up to 80%), C (tail). The classic
    * "which 20% of customers drive 80% of revenue" datasheet
    * (reference users chain a sum-by-customer job into a sort step;
    * here it is one plan).
    *
    * Exactness: revenue in integer cents (Σ bigint is order-free), and
    * the A/B/C cut compares `2·cum ≤ total` / `5·cum ≤ 4·total` in
    * pure integer algebra — no double threshold can flake. The
    * cumulative sum is an ordered integer fold over the aggregated
    * per-customer frame (|customers| rows, thousands — the global
    * window runs on the post-agg frame, never on raw orders; at 100 TB
    * the orders scan is the only big stage and it aggregates
    * map-side). Total joins back via a 1-row broadcast. */
  /** B: one-step-ahead EWMA forecast per event type — daily counts
    * smoothed with α = 1/2 (`e_d = (n_d + e_{d-1})/2`, seeded with the
    * first day), plus the forecast residual `n_d − e_{d-1}` — the
    * classic "is today's volume off trend" monitor a pipeline runs per
    * source/type (events_anomaly is the z-score twin; this is the
    * trend-following one).
    *
    * Exactness: α = 1/2 makes every smoothing step an exact double
    * halving, and the fold runs over the day-sorted count list (a
    * strict sequential fold, the CLAUDE.md contract), so each e_d and
    * the reconstruction `e_{d-1} = 2·e_d − n_d` (exact: `2·e_d` IS
    * `e_{d-1} + n_d`) are bit-identical cross-engine. The O(D²)
    * per-position prefix folds run over the per-type aggregated
    * series (D ≈ days, tiny); the only data-sized stage is the ONE
    * map-side-combined groupBy(type, day) of the scan. */
  def eventsEwma(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .select(col("event_type"),
        expr("(ts div 1000000000L) div 86400L").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val series = daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("s"))
      .withColumn("ns",
        transform(col("s"), x => x.getField("n").cast("double")))
    series
      .select(col("event_type"), col("ns"),
        posexplode(col("s")).as(Seq("i", "dn")))
      .select(col("event_type"), col("ns"), col("i"),
        col("dn.day").as("day"), col("dn.n").as("n"))
      .withColumn("ewma",
        aggregate(slice(col("ns"), lit(2), col("i")),
          element_at(col("ns"), 1),
          (acc, x) => (acc + x) / lit(2.0)))
      .select(col("event_type"), col("day"), col("n"),
        round(col("ewma"), 4).as("ewma"),
        when(col("i") === 0, lit(null).cast("double"))
          .otherwise(round(
            col("n").cast("double") -
              (col("ewma") * 2 - col("n").cast("double")), 4))
          .as("resid"))
      .orderBy(col("event_type"), col("day"))
  }

  /** B: the correlated-subquery idiom, decorrelated — "orders above
    * the CUSTOMER'S OWN average" (`WHERE price > (SELECT avg(price)
    * ... WHERE same customer)`). The classic way users write it is a
    * correlated scalar subquery; the scalable plan is ONE exchange on
    * o_custkey with a window aggregate and a per-row flag — this
    * entry pins that decorrelation.
    *
    * Exactness: the above-average compare is `cents·n > Σcents` —
    * pure integer algebra (a `price > avg` double compare can flip on
    * rows equal to a non-representable mean). Share divides the same
    * integers. */
  def ordersAboveAvg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(col("o_custkey").as("cust_key"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("cust_key"))
    o.withColumn("n", count(lit(1)).over(w))
      .withColumn("tot", sum(col("cents")).over(w))
      .groupBy(col("cust_key"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("cents") * col("n") > col("tot"), 1L).otherwise(0L))
          .as("n_above"),
        max(round(col("tot") / (col("n") * 100.0), 4)).as("avg_price"))
      .select(col("cust_key"), col("n_orders"), col("n_above"),
        col("avg_price"),
        round(col("n_above") / col("n_orders"), 4).as("share_above"))
      .orderBy(col("cust_key"))
  }

  /** B (round 15): year-over-year revenue growth per calendar month —
    * the first chart every revenue dashboard draws (seasonality-free
    * growth: each month against the SAME month one year earlier, so
    * December compares to December, not November). Months with no
    * prior-year counterpart report NULL growth, never 0 — "no
    * baseline" and "flat" are different answers.
    *
    * Exactness: revenue aggregates in integer cents (the
    * [[ordersPareto]] discipline — a double Σprice is
    * association-order-dependent); growth is
    * ((rev − prev)·100)::double / prev::double — exact bigint
    * numerator, ONE division each side of the mirror, round(4).
    *
    * Shape: ONE orders scan into a (yr, mo) two-phase hash agg,
    * persisted (referenced as both join sides) — the month frame is
    * CALENDAR-sized (rows = span in months, ~80 here) at any data
    * scale, so the prior-year self-join is a metadata-sized exchange
    * AQE broadcasts on its own (no authored hint — the GraphIterSpec
    * discipline). */
  def ordersYoy(spark: SparkSession, dir: String): DataFrame = {
    // persisted: referenced as both the current and the shifted
    // prior-year side (Catalyst does not dedup repeated subtrees —
    // unpersisted, orders would be scanned twice)
    val m = Tables(spark, dir).orders
      .select(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("yr"), col("mo"))
      .agg(sum(col("cents")).as("rev_cents"),
        count(lit(1)).as("n_orders"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prev = m.select((col("yr") + 1).as("yr"), col("mo"),
      col("rev_cents").as("prev_cents"))
    m.join(prev, Seq("yr", "mo"), "left")
      .select(col("yr"), col("mo"),
        round(col("rev_cents") / 100.0, 2).as("revenue"),
        col("n_orders"),
        round(((col("rev_cents") - col("prev_cents")) * 100).cast("double") /
          col("prev_cents").cast("double"), 4).as("yoy_pct"))
      .orderBy(col("yr"), col("mo"))
  }

  /** B: gaps-and-islands — per customer, runs of CONSECUTIVE months
    * with at least one order (the "streak" datasheet: engagement
    * continuity, churn risk). The classic island key `mk − rank` is
    * constant within a run of consecutive months; everything is
    * integer algebra on the same yyyymm-free month key as
    * [[ordersCohort]], and the rank window + island rollup + customer
    * rollup all ride ONE o_custkey exchange. */
  def ordersStreaks(spark: SparkSession, dir: String): DataFrame = {
    val months = Tables(spark, dir).orders
      .select(col("o_custkey").as("cust_key"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .as("mk"))
      .distinct()
    val w = Window.partitionBy(col("cust_key")).orderBy(col("mk"))
    months
      .withColumn("isl", col("mk") - row_number().over(w))
      .groupBy(col("cust_key"), col("isl"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("cust_key"))
      .agg(sum(col("len")).as("n_months"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("max_streak"))
      .orderBy(col("cust_key"))
  }

  /** B: time-weighted average value per user (TWAP) — each event's
    * value holds until the next event; the duration-weighted mean is
    * the honest "average level" for irregular telemetry (a plain avg
    * over-weights bursts). Σ cents·dur and Σ dur are exact integers
    * (cents = floor(value·100), dur = epoch-second gaps off ONE
    * user_id window exchange); the final division is the only double.
    * Single-event users have no dwell time → NULL twap. */
  def eventsTwap(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .select(col("user_id"), Tables.tsNsToSec("ts").as("ep"),
        col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ep"), col("event_id"))
    e.withColumn("dur", lead(col("ep"), 1).over(w) - col("ep"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        coalesce(sum(col("dur")), lit(0L)).as("dur_sec"),
        sum(col("cents") * col("dur")).as("wsum"))
      .select(col("user_id"), col("n_events"), col("dur_sec"),
        when(col("dur_sec") === 0L, lit(null).cast("double"))
          .otherwise(round(col("wsum") / (col("dur_sec") * 100.0), 4))
          .as("twap"))
      .orderBy(col("user_id"))
  }

  /** Rolling-uniques window width in days (single-sourced into the
    * oracle): wau = distinct users over the trailing week. */
  val RollingWindowDays = 7

  /** B: rolling distinct users — per active day, DAU plus the
    * trailing-7-day distinct-user count (WAU) and the DAU/WAU
    * stickiness ratio. Distinct-over-sliding-window does NOT
    * decompose into window sums (uniques don't add), so the exact
    * form is the contribute-forward explode: each (user, day)
    * activity row feeds the 7 target days it is visible to, then ONE
    * distinct count per target day. 7× amplification of the
    * |users|·|days|-deduped frame (not of raw events) is the honest
    * exact cost; the approximate scale path is an HLL sketch per day
    * merged over the window (q12_approx_distinct's family). All
    * counts integer; the ratio divides the same integers. */
  def eventsRollingUniques(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables(spark, dir).events
      .select(col("user_id"),
        expr("(ts div 1000000000L) div 86400L").as("day"))
      .distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"),
          col("day") + (RollingWindowDays - 1))).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau_7"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau_7"),
        round(col("dau") / col("wau_7"), 4).as("stickiness"))
      .orderBy(col("day"))
  }

  /** B: two-variant experiment readout — users deterministically
    * split by id parity, metric = purchases per user, one datasheet
    * row with per-variant exposure/total counts, means, and the
    * two-sample (Welch) z statistic on the mean difference. The "did
    * the experiment move the metric" read every product analytics
    * stack ships. (A binary-conversion variant is degenerate on this
    * corpus — every user purchases, so the pooled variance is 0 and
    * z is 0/0, which ANSI mode rightly rejects; a count metric never
    * collapses.)
    *
    * Exactness: per-variant n, Σc and Σc² are exact integers; the
    * means, sample variances and z mirror the oracle's expression
    * tree operation-for-operation — every step (÷, ×, −, and
    * IEEE-correctly-rounded sqrt) is deterministic cross-engine, so
    * even the z statistic full hash-gates. One scan → per-user count
    * (map-side combined) → a 1-row conditional aggregate. */
  def eventsAbtest(spark: SparkSession, dir: String): DataFrame =
    abtestScore(Tables(spark, dir).events
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("c")))

  /** The experiment-scoring stage over any (user_id, c) per-user
    * metric frame — shared verbatim by the batch entry above and the
    * G23 online twin ([[graft.streaming.Streams.streamAbtest]]),
    * which maintains c in per-user state and scores the snapshot on
    * read. */
  def abtestScore(users0: DataFrame): DataFrame = {
    val users = users0.withColumn("va", col("user_id") % 2 === 0)
    val row = users.agg(
      sum(when(col("va"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("va"), col("c")).otherwise(0L)).as("s_a"),
      sum(when(col("va"), col("c") * col("c")).otherwise(0L)).as("q_a"),
      sum(when(!col("va"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("va"), col("c")).otherwise(0L)).as("s_b"),
      sum(when(!col("va"), col("c") * col("c")).otherwise(0L)).as("q_b"))
    val meanA = col("s_a").cast("double") / col("n_a")
    val meanB = col("s_b").cast("double") / col("n_b")
    // sample variance via the exact integer moments: (Σc² − (Σc)²/n)/(n−1)
    val varA = (col("q_a") - col("s_a").cast("double") * col("s_a") /
      col("n_a")) / (col("n_a") - 1)
    val varB = (col("q_b") - col("s_b").cast("double") * col("s_b") /
      col("n_b")) / (col("n_b") - 1)
    val z = (meanA - meanB) /
      sqrt(varA / col("n_a") + varB / col("n_b"))
    row.select(col("n_a"), col("s_a").as("purchases_a"),
      round(meanA, 4).as("mean_a"),
      col("n_b"), col("s_b").as("purchases_b"),
      round(meanB, 4).as("mean_b"),
      round(z, 4).as("z"))
  }

  /** B: resample each user's irregular event stream onto a dense
    * daily grid with last-observation-carried-forward gap-fill — the
    * regularization pass that turns raw telemetry into the
    * fixed-step series every downstream model/forecast consumes
    * (events_twap integrates the irregular stream; this EMITS the
    * regular one). Per user × calendar day from their first to last
    * active day: that day's event count (0 on gap days) and the
    * carried last sample in exact integer cents, tiebroken by
    * (ep, event_id).
    *
    * Shape: one (user, day) groupBy picks each active day's last
    * sample as max(struct(ep, event_id, cents)) — lexicographic
    * struct order == DuckDB's row order, no second pass; the grid
    * explode is bounded by span/user (30 days here, never a row
    * explosion); the LOCF is one ignoreNulls last() window per user
    * over ≤ span rows. Every exchange keys on user_id (+day) — the
    * natural key at any scale. `agg` is persisted (2 refs: range +
    * join — the no-subtree-dedup trap). All integers ⇒ full hash
    * gate. */
  def eventsResample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val ev = Tables(spark, dir).events.select(
        col("user_id"),
        Tables.tsNsToSec("ts").as("ep"),
        col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      .withColumn("day", expr("ep div 86400"))
    val agg = ev.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("ep"), col("event_id"), col("cents"))).as("lastE"))
      .select(col("user_id"), col("day"), col("n_events"),
        col("lastE.cents").as("last_cents"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val grid = agg.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("last_cents"), ignoreNulls = true).over(w)
          .as("locf_cents"))
      .orderBy(col("user_id"), col("day"))
  }

  /** On-time threshold for [[ordersSla]], in days (single-sourced
    * into the oracle). */
  val SlaDays = 30

  /** B: fulfilment-SLA datasheet — per order priority, line-level
    * ship latency (l_shipdate − o_orderdate, integer days): volume,
    * on-time share against the [[SlaDays]] threshold, and the exact
    * p50/p90 latency (the array-percentile form — ONE per-group
    * value map, the q23 lesson). The ops "which priority class is
    * breaching" read.
    *
    * Shape: one fact-fact equi-join on the natural orderkey (both
    * sides shuffle on it — at warehouse scale both tables are
    * bucketed by orderkey and this is exchange-free), then one
    * map-side-combined groupBy over the 5-value priority key. Counts
    * and the threshold are integers; the percentile interpolation is
    * the proven q23 cross-engine contract ⇒ full hash gate. */
  def ordersSla(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val lat = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
          .as("lat"))
    lat.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("lat") <= SlaDays, 1L).otherwise(0L)).as("n_ontime"),
        expr("percentile(lat, array(0.5D, 0.9D))").as("ps"))
      .select(col("o_orderpriority"), col("n_lines"), col("n_ontime"),
        round(col("n_ontime").cast("double") / col("n_lines"), 4)
          .as("ontime_frac"),
        round(element_at(col("ps"), 1), 4).as("p50_days"),
        round(element_at(col("ps"), 2), 4).as("p90_days"))
      .orderBy(col("o_orderpriority"))
  }

  /** B: seasonality profile — per event_type, the day-of-week and
    * hour-of-day shape of the volume: peak bin (earliest-bin
    * tiebreak) and the χ² uniformity statistic per dimension (χ² ≈ 0
    * = flat traffic; large = strongly diurnal/weekly — the signal a
    * scheduler or anomaly baseline reads before assuming uniform
    * arrival).
    *
    * Exactness: with uniform expected e = N/k, χ² = Σ(o−e)²/e
    * algebraically reduces to (k·Σo² − N²)/N — integer numerator,
    * ONE division (the only double, mirrored op-for-op); the peak is
    * max(struct(cnt, −bin)), no FP anywhere else. Zero-count bins
    * drop out of Σo² unchanged, so the sparse groupBy IS the dense
    * answer — no grid fill needed.
    *
    * Shape: ONE event scan → one (type, dow, hour) groupBy (≤ 5·7·24
    * rows — the cube trick: both marginal profiles re-aggregate the
    * tiny cube instead of re-scanning events, the no-subtree-dedup
    * discipline), then two marginal rollups and a 1-row-per-type
    * join. */
  def eventsSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val cube0 = Tables(spark, dir).events
      .select(col("event_type"), Tables.tsNsToSec("ts").as("ep"))
      .withColumn("dow", expr("((ep div 86400) + 3) % 7"))
      .withColumn("hour", expr("(ep div 3600) % 24"))
      .groupBy(col("event_type"), col("dow"), col("hour"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    seasonalityScore(
      cube0.groupBy(col("event_type"), col("dow")).agg(sum(col("c")).as("c")),
      cube0.groupBy(col("event_type"), col("hour")).agg(sum(col("c")).as("c")))
  }

  /** The seasonality scoring stage over the two marginal count
    * frames — dw = (event_type, dow, c), hr = (event_type, hour, c),
    * zero-count bins optional (they drop out of Σo²) — shared
    * verbatim by the batch entry above and the G25 online twin
    * ([[graft.streaming.Streams.streamSeasonality]]), which
    * maintains the 31 marginal counters in per-type state and scores
    * the snapshot on read. */
  def seasonalityScore(dw: DataFrame, hr: DataFrame): DataFrame = {
    def scoreOf(m: DataFrame, bin: String, k: Int) = m
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("s2"),
        max(struct(col("c"), (-col(bin)).as("negb"))).as("pk"))
      .select(col("event_type"), col("n"),
        (-col("pk.negb")).cast("int").as(s"peak_$bin"),
        round((lit(k.toLong) * col("s2") - col("n") * col("n"))
          .cast("double") / col("n"), 4).as(s"chi2_$bin"))
    scoreOf(dw, "dow", 7).as("d")
      .join(scoreOf(hr, "hour", 24).drop("n").as("h"), Seq("event_type"))
      .select(col("event_type"), col("n"), col("peak_dow"),
        col("chi2_dow"), col("peak_hour"), col("chi2_hour"))
      .orderBy(col("event_type"))
  }

  /** B: open-order backlog time series — per calendar day's
    * END-OF-DAY snapshot, how many orders have been placed but not
    * yet fully shipped (an order closes on its LAST l_shipdate, so
    * it leaves the backlog in that day's snapshot; orders with no
    * lineitems never close — the honest unshipped semantics).
    * The ops "are we falling behind" read, and the classic
    * interval-stabbing problem: emit +1 at each start day and −1
    * after each close day, then one prefix sum over the dense day
    * grid — never a per-day × per-order join (which is O(days·orders)
    * and the naive formulation's trap).
    *
    * Shape: one orders groupBy(day) for starts; one lineitem
    * groupBy(orderkey) max-ship + groupBy(day) for closes; the dense
    * grid is a 1-row sequence explode bounded by the calendar span.
    * The cumulative window is GLOBAL-ordered — safe by construction
    * because the frame is one row per day (the span, ~2.4k rows,
    * NOT the data size); at warehouse scale the same prefix runs as
    * a two-phase per-partition scan. All integers ⇒ full hash gate. */
  def ordersBacklog(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val starts = t.orders
      .select(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
        .as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("opened"))
    val closes = t.lineitem
      .select(col("l_orderkey"),
        datediff(col("l_shipdate"), lit("1970-01-01")).cast("long")
          .as("sday"))
      .groupBy(col("l_orderkey")).agg(max(col("sday")).as("cday"))
      .groupBy(col("cday")).agg(count(lit(1)).as("closed"))
    backlogScore(starts.join(closes, col("day") === col("cday"), "full")
      .select(coalesce(col("day"), col("cday")).as("day"),
        coalesce(col("opened"), lit(0L)).as("opened"),
        coalesce(col("closed"), lit(0L)).as("closed")))
  }

  /** Shared read-side prefix scorer over a `(day, opened, closed)`
    * delta frame — the batch stabbing deltas above or the online
    * lifecycle snapshot ([[graft.streaming.Streams.streamBacklog]]).
    * Persists its input (referenced by the grid agg AND the dense
    * join — no-subtree-dedup). */
  def backlogScore(deltasIn: DataFrame): DataFrame = {
    val deltas = deltasIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grid = deltas.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(deltas, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("opened"), lit(0L)).as("opened"),
        coalesce(col("closed"), lit(0L)).as("closed"))
      .withColumn("backlog",
        sum(col("opened")).over(w) - sum(col("closed")).over(w))
      .orderBy(col("day"))
  }

  /** B: CUSUM change-point detection — for each event_type, the
    * calendar day where the cumulative deviation of the daily count
    * from its span mean peaks (the "when did the regime shift"
    * read over telemetry volume: level changes, launch days,
    * outages). Classic CUSUM_d = Σ_{i≤d}(c_i − μ) evaluated over the
    * type's dense day span (gap days count 0), argmax |CUSUM| with
    * earliest-day tiebreak.
    *
    * Exactness: μ = S/N is rational, so the scan maximizes
    * N·CUSUM_d = N·prefix_d − i_d·S — pure integer algebra, no FP in
    * the argmax; only the REPORTED magnitude divides back by N
    * (mirrored op-for-op). The argmax is max(struct(dev, −day)) —
    * lexicographic struct order == DuckDB row order, no second pass.
    *
    * Shape: one (type, day) count groupBy, the dense-grid explode
    * (bounded by span), ONE type-partitioned window chain for
    * prefix/total, one 1-row-per-type struct-max agg. Keys on
    * event_type — alphabet-sized here; the identical plan partitions
    * naturally when the key is high-cardinality (per-metric streams,
    * per-tenant logs). */
  def eventsChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_type"), Tables.tsNsToSec("ts").as("ep"))
      .withColumn("day", expr("ep div 86400"))
      .select(col("event_type"), col("day"))
    changepointScore(ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c")))
  }

  /** Shared read-side CUSUM scorer over a `(event_type, day, c)`
    * daily-count frame — the batch history above or the online
    * counter snapshot ([[graft.streaming.Streams.streamChangepoint]]).
    * Persists its input (referenced by the grid agg AND the dense
    * join — no-subtree-dedup). */
  def changepointScore(dailyIn: DataFrame): DataFrame = {
    val daily = dailyIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grid = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val dense = grid.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("c"), lit(0L)).as("c"))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scanned = dense
      .withColumn("i", count(lit(1)).over(wRun))
      .withColumn("prefix", sum(col("c")).over(wRun))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("c")).over(wAll))
      .withColumn("ncusum",
        col("n_days") * col("prefix") - col("i") * col("total"))
      .withColumn("dev", abs(col("ncusum")))
    scanned.groupBy(col("event_type"))
      .agg(max(col("n_days")).as("n_days"), max(col("total")).as("total"),
        max(struct(col("dev"), (-col("day")).as("negday"),
          col("ncusum").as("nc"))).as("best"))
      .select(col("event_type"), col("n_days"), col("total"),
        (-col("best.negday")).as("cp_day"),
        signum(col("best.nc")).cast("int").as("side"),
        round(col("best.dev").cast("double") / col("n_days"), 4)
          .as("cusum_dev"))
      .orderBy(col("event_type"))
  }

  /** Pair min-support for [[ordersBasket]] (items AND pairs must hit
    * it — the A-priori downward-closure prune, single-sourced into
    * the oracle). */
  val BasketMinOrders = 2

  /** B: market-basket association mining — part pairs co-purchased in
    * ≥ [[BasketMinOrders]] orders, with both confidences and lift
    * (the "customers who bought A also bought B" rule miner; lift > 1
    * = genuinely coupled, not just both popular). events_cooccurrence
    * reads the 5-type event alphabet; this is the same algebra at
    * CATALOG scale where the item set itself is huge — hence the
    * A-priori prune: a pair in ≥ s orders needs both items in ≥ s
    * orders, so infrequent items drop BEFORE the self-join and the
    * pair fan-out is bounded by frequent-basket width, not raw width.
    * Joins shuffle on natural keys (k, then the pair); the item
    * support table re-joins for the metrics (broadcast-eligible at
    * these SFs, plain equi-join at catalog scale — NOT forced).
    * Baskets persisted (4 refs). All counts exact integers; the
    * confidences and lift are single divisions of integer products,
    * mirrored op-for-op ⇒ full hash gate. */
  def ordersBasket(spark: SparkSession, dir: String): DataFrame =
    basketOf(Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")))

  /** Core pair miner over any (k, p) membership frame. */
  def basketOf(li: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val b = li.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nOrders = b.select(col("k")).distinct().count()
    val supp = b.groupBy(col("p")).agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= BasketMinOrders)
    val fb = b.join(supp.select(col("p")), Seq("p")).select("k", "p")
    val pairs = fb.select(col("k"), col("p").as("pa"))
      .join(fb.select(col("k"), col("p").as("pb")), Seq("k"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= BasketMinOrders)
    pairs
      .join(supp.select(col("p").as("pa"), col("n_item").as("n_a")), Seq("pa"))
      .join(supp.select(col("p").as("pb"), col("n_item").as("n_b")), Seq("pb"))
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("n_a"), 4).as("conf_ab"),
        round(col("n_ab").cast("double") / col("n_b"), 4).as("conf_ba"),
        round((col("n_ab") * lit(nOrders)).cast("double") /
          (col("n_a") * col("n_b")), 4).as("lift"))
      .orderBy(col("part_a"), col("part_b"))
  }

  /** B: per-supplier fulfilment scorecard — orders touched, lines
    * shipped, exact-cents revenue, average discount, returned-line
    * share and late-ship share (shipped > [[ScorecardLateDays]] days
    * after the order date), with the supplier's nation — the vendor
    * review datasheet.
    *
    * Shape: ONE fact-fact equi-join (lineitem ⋈ orders on orderkey —
    * both sides shuffle on the key; no broadcast pretence, orders is
    * a fact at catalog scale), then a TWO-LEVEL aggregate: first at
    * the finer (suppkey, orderkey) grain, then per supplier with
    * count(*) as the distinct-order count — a mixed
    * countDistinct+sum single agg would plan an Expand doubling
    * every fact row map-side; the two-level form is plain partial
    * aggregation twice. The supplier/nation dims broadcast onto the
    * AGGREGATED frame (supplier-count rows), never the fact stream.
    * Counts/cents are integers; shares are single divisions mirrored
    * op-for-op (round 4). */
  val ScorecardLateDays = 90

  def supplierScorecard(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val f = t.lineitem
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey"), col("l_orderkey"))
      .agg(count(lit(1)).as("lines"),
        sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("cents"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("rets"),
        sum(when(datediff(col("l_shipdate"), col("o_orderdate"))
          > ScorecardLateDays, 1L).otherwise(0L)).as("lates"),
        // discount in integer basis points — a double sum re-associates
        // differently per engine and flips the 4dp round on half
        // boundaries (measured at sf0.1: 5/1000 suppliers off by 1e-4)
        sum(floor(col("l_discount") * 10000 + 0.5).cast("long")).as("dbp"))
    val s = f.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("lines")).as("n_lines"),
        sum(col("cents")).as("cents"), sum(col("rets")).as("rets"),
        sum(col("lates")).as("lates"), sum(col("dbp")).as("dbp"))
    s.join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"),
        col("s_nationkey"))), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("n_orders"), col("n_lines"),
        round(col("cents") / 100.0, 2).as("revenue"),
        round(col("dbp") / (col("n_lines") * 10000.0), 4).as("avg_discount"),
        round(col("rets").cast("double") / col("n_lines"), 4)
          .as("return_share"),
        round(col("lates").cast("double") / col("n_lines"), 4)
          .as("late_share"))
      .orderBy(col("s_suppkey"))
  }

  /** Revenue-bucket width (cents) for [[ordersPareto]]'s two-level
    * cumulative scan. The bucket key is PER-CUSTOMER revenue — a
    * domain-fixed quantity (order sizes don't grow with the customer
    * count), so a fixed width keeps the per-bucket summary
    * metadata-sized at any SF (the SkylineBucketCents class of dial,
    * not the √n LSH/IVF class). */
  val ParetoBucketCents = 1000000L

  def ordersPareto(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables(spark, dir).orders
      .select(col("o_custkey").as("cust_key"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("cust_key")
      .agg(sum(col("cents")).as("rev_cents"))
    val total = perCust.agg(sum(col("rev_cents")).as("total_cents"))
    // Two-level cumulative revenue (the partSkyline bucketed-prefix
    // pattern — a global-order running window over ALL customers is a
    // single-partition sort, dead at 100 TB): global desc traversal
    // order = desc bucket order, so cum = (sum of all strictly-higher
    // buckets, a prefix over the tiny per-bucket summary) + the
    // in-bucket running sum (shards sort in parallel). Pure long
    // sums — bit-identical to the one-window form the oracle runs.
    val b = perCust
      .withColumn("b", floor(col("rev_cents") / ParetoBucketCents))
    val perB = b.groupBy(col("b")).agg(sum(col("rev_cents")).as("bsum"))
    val wPre = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = perB.select(col("b"),
      coalesce(sum(col("bsum")).over(wPre), lit(0L)).as("pcum"))
    val wIn = Window.partitionBy(col("b"))
      .orderBy(col("rev_cents").desc, col("cust_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(prefix), Seq("b"))
      .withColumn("cum_cents",
        col("pcum") + sum(col("rev_cents")).over(wIn))
      .crossJoin(broadcast(total))
      .select(
        col("cust_key"),
        round(col("rev_cents") / 100.0, 2).as("revenue"),
        round(col("cum_cents").cast("double") / col("total_cents"), 4)
          .as("cum_share"),
        when(col("cum_cents") * 2 <= col("total_cents"), "A")
          .when(col("cum_cents") * 5 <= col("total_cents") * 4, "B")
          .otherwise("C").as("pareto_class"))
      .orderBy(col("revenue").desc, col("cust_key"))
  }

  /** Forecast horizon for [[eventsTrend]] (days past the last active
    * day; single-sourced into the oracle). */
  val TrendHorizonDays = 7L

  /** B (round 11): per-type OLS daily-volume trend + point forecast —
    * the "where is this event stream heading" read that completes
    * the time-structure family (seasonality = the periodic part,
    * changepoint = the level shifts, trend = the direction; a
    * capacity planner reads all three). Fit is ordinary least
    * squares of daily count on day over the type's ACTIVE days
    * (absent days are no-observation, not zero — the same grain
    * events_changepoint counts).
    *
    * Exactness: the whole fit reduces to FOUR INTEGER SUMS
    * (n, Σx, Σy, Σxy, Σx²) — counts and epoch-days are integers, so
    * every sum is exact and order-free — and slope/forecast are
    * SINGLE rational expressions of them:
    *   slope    = (n·Σxy − Σx·Σy) / D,    D = n·Σx² − (Σx)²
    *   forecast = ((Σy·Σx² − Σx·Σxy) + (n·Σxy − Σx·Σy)·x_f) / D
    * with x_f = last active day + [[TrendHorizonDays]]. Numerators
    * and D stay in long range to ~sf100 (bounds in the oracle
    * comment); the ONE long→double cast each side of the division is
    * IEEE-identical cross-engine ⇒ full hash gate, no FP-fold-order
    * exposure anywhere (the text_tfidf rational-idf trick applied to
    * regression). Negative-forecast clamp deliberately absent — a
    * below-zero point forecast IS the trend signal.
    *
    * Shape: one exchange for the (type, day) count, one tiny
    * per-type agg — the daily frame is the same first stage as
    * changepoint/seasonality and scales identically. */
  /** Autocorrelation lags reported by [[eventsAutocorr]]. */
  val AutocorrMaxLag = 7

  /** B: lag-k autocorrelation of the daily event-volume series,
    * k = 1..[[AutocorrMaxLag]] — the "does volume today predict
    * volume k days out" read that complements events_seasonality's
    * day-of-week profile (a weekly cycle shows as an r spike at
    * k = 7) and events_trend's OLS drift.
    *
    * Shape: ONE fact scan → per-day integer counts (map-side
    * combined), dense zero-filled day grid (gap days are real zero
    * observations), both persisted; the 7 lag branches are
    * equi-joins + 1-row aggregates over the |days|-row series —
    * bounded by the calendar, not the data, at any corpus size.
    * Exactness: every aggregate (n, Σx, Σy, Σxx, Σyy, Σxy) is an
    * order-free INTEGER sum; each is converted to double ONCE and
    * the Pearson expression is mirrored op-for-op (the ::double
    * hops also dodge bigint overflow at extreme volumes); zero
    * variance filters identically on both sides ⇒ full hash gate. */
  def eventsAutocorr(spark: SparkSession, dir: String): DataFrame =
    autocorrOf(Tables(spark, dir).events
      .select(Tables.tsNsToSec("ts").as("ep"))
      .selectExpr("ep div 86400 AS day"))

  /** Lag-k Pearson autocorrelation over any (day) observation frame
    * (one row per observation; days with no rows are zero-filled). */
  def autocorrOf(obs: DataFrame): DataFrame =
    autocorrOfDaily(obs.groupBy(col("day")).agg(count(lit(1)).as("v")))

  /** [[autocorrOf]]'s read stage over a PRE-AGGREGATED (day, v)
    * daily-count frame — shared with the streaming twin
    * (stream_autocorr maintains the day counters online and scores
    * lags here on read). */
  def autocorrOfDaily(dailyIn: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val daily = dailyIn.persist(StorageLevel.MEMORY_AND_DISK)
    val series = daily
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("v"), lit(0L)).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    (1 to AutocorrMaxLag).map { k =>
      val x = series.select(col("day"), col("v").as("x"))
      val y = series.select((col("day") + k).as("day"), col("v").as("y"))
      x.join(y, "day")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(lit(k).as("lag"), col("n").cast("int").as("n"),
          (col("n").cast("double") * col("sxy") -
            col("sx").cast("double") * col("sy")).as("cov"),
          (col("n").cast("double") * col("sxx") -
            col("sx").cast("double") * col("sx")).as("vx"),
          (col("n").cast("double") * col("syy") -
            col("sy").cast("double") * col("sy")).as("vy"))
        .filter(col("vx") > 0.0 && col("vy") > 0.0)
        .select(col("lag"), col("n"),
          round(col("cov") / (sqrt(col("vx")) * sqrt(col("vy"))), 6)
            .as("r"))
    }.reduce(_ unionAll _)
      .orderBy(col("lag"))
  }

  /** Shared per-type OLS sufficient statistics over daily counts —
    * (n, Σx, Σy, Σxy, Σx², last day), all exact integers; the fit
    * both [[eventsTrend]] and [[eventsForecast]] divide out. */
  private def trendStatsOf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .select(col("event_type"), Tables.tsNsToSec("ts").as("ep"))
      .selectExpr("event_type", "ep div 86400 AS day")
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
    daily.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("day")).as("sx"),
      sum(col("c")).as("sy"),
      sum(col("day") * col("c")).as("sxy"),
      sum(col("day") * col("day")).as("sxx"),
      max(col("day")).as("d1"))
  }

  def eventsTrend(spark: SparkSession, dir: String): DataFrame = {
    val s = trendStatsOf(spark, dir)
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slopeNum = col("n") * col("sxy") - col("sx") * col("sy")
    val xf = col("d1") + lit(TrendHorizonDays)
    val fcNum = (col("sy") * col("sxx") - col("sx") * col("sxy")) +
      slopeNum * xf
    // n = 1 (one active day) ⇒ den = 0: an OLS line is undefined, so
    // slope/forecast are NULL — guarded identically in the oracle
    // (DuckDB's x/0 is not IEEE Infinity, so the unguarded form would
    // diverge exactly on degenerate types; ADVICE r11).
    s.select(col("event_type"), col("n").as("n_days"), col("d1"),
        when(col("n") >= 2,
          round(slopeNum.cast("double") / den.cast("double"), 6))
          .as("slope"),
        when(col("n") >= 2,
          round(fcNum.cast("double") / den.cast("double"), 4))
          .as(s"fc_d${TrendHorizonDays}"))
      .orderBy(col("event_type"))
  }

  /** B (round 15): the DAILY forecast grid — events_trend's exact
    * rational OLS line evaluated at every day of the next
    * [[TrendHorizonDays]]-day horizon, one row per (event_type,
    * day): ŷ(x) = ((Σy·Σx² − Σx·Σxy) + (n·Σxy − Σx·Σy)·x) / D — the
    * series a capacity dashboard plots where events_trend's single
    * point answers "where does it land". Same four integer sums
    * (shared [[trendStatsOf]] — the fit can never drift from the
    * trend query's), numerator assembled in exact long algebra, ONE
    * long→double cast each side of the division ⇒ full hash gate.
    * Degenerate one-day types (D = 0) are dropped, mirrored
    * (n >= 2 both sides; D > 0 follows from distinct days). Shape:
    * one (type, day) exchange + a types-sized explode — metadata
    * scale at any SF. */
  def eventsForecast(spark: SparkSession, dir: String): DataFrame = {
    val s = trendStatsOf(spark, dir)
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slopeNum = col("n") * col("sxy") - col("sx") * col("sy")
    val icNum = col("sy") * col("sxx") - col("sx") * col("sxy")
    s.filter(col("n") >= 2)
      .select(col("event_type"), den.as("den"), slopeNum.as("s_num"),
        icNum.as("i_num"),
        explode(sequence(col("d1") + 1,
          col("d1") + lit(TrendHorizonDays))).as("day"))
      .select(col("event_type"), col("day"),
        round((col("i_num") + col("s_num") * col("day")).cast("double") /
          col("den").cast("double"), 4).as("yhat"))
      .orderBy(col("event_type"), col("day"))
  }

  /** B: inter-arrival time distribution per event type — the gap
    * statistics (mean / p50 / p90 / max of the per-user time between
    * consecutive same-type events) that size session timeouts,
    * watermark delays and anomaly baselines: a p90 gap above the
    * sessionize threshold means sessions are being split; a p90 far
    * beyond a stream watermark means late data is being dropped.
    *
    * Shape: ONE (user_id, event_type) window exchange for the lead
    * gaps, then a 5-key two-phase aggregate. The exact per-type
    * quantiles ride ONE percentile(array) call (shared buffer —
    * CLAUDE.md: N separate percentile aggregates each build their
    * own per-group value map); mean is one bigint/bigint division ⇒
    * full hash gate (Spark percentile interpolates exactly like
    * DuckDB quantile_cont on integer-spaced values). */
  def eventsInterarrival(spark: SparkSession, dir: String): DataFrame =
    interarrivalOf(Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep")))

  /** Core over any (user_id, event_id, event_type, ep) frame. */
  def interarrivalOf(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ep"), col("event_id"))
    e.withColumn("gap", lead(col("ep"), 1).over(w) - col("ep"))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap")).as("total_gap_s"),
        percentile(col("gap"), array(lit(0.5), lit(0.9))).as("q"),
        max(col("gap")).as("max_gap_s"))
      .select(col("event_type"), col("n_gaps"), col("total_gap_s"),
        round(col("total_gap_s") / col("n_gaps"), 4).as("mean_gap_s"),
        round(element_at(col("q"), 1), 4).as("p50_gap_s"),
        round(element_at(col("q"), 2), 4).as("p90_gap_s"),
        col("max_gap_s"))
      .orderBy(col("event_type"))
  }

  /** B: burstiness of per-user inter-arrival gaps per event type —
    * Goh & Barabási's B = (σ−μ)/(σ+μ) ∈ (−1, 1): B → 1 bursty
    * (heavy-tailed gaps — retry storms, scraper bursts), B ≈ 0
    * Poisson, B → −1 periodic (cron-like). The one-number shape
    * read over the SAME gap set events_interarrival summarizes by
    * quantiles — together they decide whether a sessionize timeout
    * can be a constant or needs a per-type dial.
    *
    * Exactness: n, Σgap, Σgap² are order-free integer aggregates
    * (gap ≤ corpus span ~10⁷ s ⇒ Σgap² < 10¹⁴·n, bigint-safe to
    * extreme scales); μ, σ², σ and B are single mirrored double
    * expressions with one cast per operand side (the events_trend
    * rational-assembly discipline), sqrt IEEE-exact ⇒ full hash
    * gate. Zero-variance types (σ = 0 ⇒ B = −1 exactly) and n < 2
    * types filter identically in both engines. */
  def eventsBurstiness(spark: SparkSession, dir: String): DataFrame =
    burstinessOf(Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep")))

  /** Core over any (user_id, event_id, event_type, ep) frame. */
  def burstinessOf(e: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ep"), col("event_id"))
    burstinessAggOf(e
      .withColumn("gap", lead(col("ep"), 1).over(w) - col("ep"))
      .filter(col("gap").isNotNull)
      .select(col("event_type"), col("gap")))
  }

  /** Shared read stage over an (event_type, gap) frame — also scored
    * by the stream_burstiness twin's stateful gap stage. */
  def burstinessAggOf(gaps: DataFrame): DataFrame = {
    val s = gaps
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("gap")).as("sg"),
        sum(col("gap") * col("gap")).as("sgg"))
      .filter(col("n") >= 2)
    val nd = col("n").cast("double")
    val mu = col("sg").cast("double") / nd
    // population variance: (n·Σx² − (Σx)²) / n²
    val varp = (nd * col("sgg").cast("double") -
      col("sg").cast("double") * col("sg").cast("double")) / (nd * nd)
    val sd = sqrt(varp)
    s.select(col("event_type"), col("n").as("n_gaps"),
        round(mu, 4).as("mean_gap_s"),
        round(sd, 4).as("sd_gap_s"),
        round((sd - mu) / (sd + mu), 6).as("burstiness"))
      .orderBy(col("event_type"))
  }

  /** B: first-order Markov transition matrix over per-user event
    * streams — P(next event type | current type) with transition
    * counts. (Reference surface: JobX users chain a map step keying
    * consecutive log lines with a reduce counting pairs —
    * job_engine.py's map/reduce over sorted per-user logs; here the
    * adjacency comes from ONE lead window.) The matrix is the
    * sequence-model read behind events_pathing's top paths: a high
    * self-loop means bursty repetition, a high type→'error' column
    * is the UX regression signal, and row entropy feeds
    * session-simulation generators.
    *
    * Shape: ONE user_id window exchange for the lead (total order by
    * (ep, event_id) — unique, deterministic), a (from,to) two-phase
    * aggregate (≤ |types|² rows), then a row-total window on that
    * metadata-sized matrix. Counts are bigint; the probability is one
    * bigint/bigint IEEE division ⇒ full hash gate. */
  def eventsMarkov(spark: SparkSession, dir: String): DataFrame =
    markovOf(Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep")))

  /** Core over any (user_id, event_id, event_type, ep) frame. */
  def markovOf(e: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ep"), col("event_id"))
    markovAggOf(e
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type")))
  }

  /** Shared read stage over a (from_type, to_type) transition frame —
    * also scored by the stream_markov twin's stateful pair stage. */
  def markovAggOf(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("n_from"), 4).as("p_next"))
      .orderBy(col("from_type"), col("to_type"))

  /** B: Kaplan-Meier survival curve of signup→purchase conversion
    * time — the right-censored time-to-event estimate a plain
    * mean-days-to-convert gets wrong (users who never purchased are
    * censored at the corpus end, not dropped: dropping them biases
    * conversion time low by exactly the slow cohort). Each output row
    * is a death day: subjects still at risk, conversions that day,
    * and the KM product-limit survival S(t).
    *
    * Shape: ONE events scan — a user_id window tags first signup,
    * one per-user conditional aggregate takes first-purchase-at-or-
    * after and the user max, censor time from a 1-row max broadcast
    * over the per-user frame, then day-grain windows on the collapsed
    * duration frame — bounded by the calendar span, not the row
    * count, at any SF (the events_trend discipline). n_risk is exact integer
    * algebra; the product limit S(t) = Π(1 − dᵢ/nᵢ) is a STRICT
    * ordered double product (collect_list over the day-ordered frame
    * + a sequential fold; DuckDB: list() OVER the same frame +
    * seedless list_reduce multiply). IEEE division and multiplication
    * are correctly rounded, so the value is bit-identical across
    * engines AND across libm implementations — the r13 driver-box
    * hash flake was exp∘Σln ulp drift flipping a round(4) half
    * boundary; no transcendental touches the hash-gated value now. */
  def eventsSurvival(spark: SparkSession, dir: String): DataFrame =
    survivalOf(Tables(spark, dir).events
      .select(col("user_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep")))

  /** Core over any (user_id, event_type, ep) frame.
    *
    * ONE events scan (the events_funnel no-subtree-dedup discipline;
    * the r14 form scanned it three times — signup agg, purchase agg,
    * corpus max): a user_id window tags every row with the user's
    * first signup, then one groupBy(user_id) — riding the window's
    * hash partitioning, no second exchange — takes the conditional
    * first-purchase-at-or-after and the per-user max. The corpus max
    * (censor time) folds off the tiny persisted per-user frame, not
    * the fact table. SurvivalScanSpec asserts scans == 1. */
  def survivalOf(e: DataFrame): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    val per = e
      .withColumn("t0",
        min(when(col("event_type") === "signup", col("ep"))).over(wu))
      .groupBy(col("user_id"))
      .agg(first(col("t0")).as("t0"),
        min(when(col("event_type") === "purchase" &&
          col("ep") >= col("t0"), col("ep"))).as("tp"),
        max(col("ep")).as("umax"))
      .persist()
    val tmax = per.agg(max(col("umax")).as("tmax"))
    val subj = per.filter(col("t0").isNotNull)
      .crossJoin(broadcast(tmax))
      .select(
        when(col("tp").isNotNull, expr("(tp - t0) div 86400L"))
          .otherwise(expr("(tmax - t0) div 86400L")).as("day"),
        when(col("tp").isNotNull, lit(1L)).otherwise(lit(0L)).as("died"))
    val byday = subj.groupBy(col("day"))
      .agg(sum(col("died")).as("d"), sum(lit(1L) - col("died")).as("c"))
    val wPrev = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byday
      .withColumn("n_total", sum(col("d") + col("c")).over(
        Window.partitionBy()))
      .withColumn("n_risk", col("n_total") -
        coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .filter(col("d") > 0)
      // Strict ordered product of the KM factors: d/n_risk is one
      // correctly-rounded IEEE division of exact integers, 1−x one
      // exact-input subtraction, and the fold multiplies in frame
      // order — every step correctly rounded, so bit-identical to the
      // oracle's seedless list_reduce (1.0·f₁ = f₁ exactly). The day
      // frame is calendar-bounded, so the O(days) per-row relist is a
      // constant at any SF. d == n_risk yields factor exactly 0.0 and
      // the product stays 0 from there — no log, no guard needed.
      .withColumn("survival",
        aggregate(
          collect_list(lit(1.0) - col("d") / col("n_risk")).over(wCum),
          lit(1.0), (acc, x) => acc * x))
      .select(col("day"), col("n_risk"), col("d").as("n_deaths"),
        round(col("survival"), 4).as("survival"))
      .orderBy(col("day"))
  }
}
