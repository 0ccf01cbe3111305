package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The relational query surface — what a JobX user computes with
  * map/combine/reduce handler chains, declared as Catalyst logical
  * plans instead so the optimizer owns pushdown, join strategy and
  * partial aggregation.
  *
  * Conventions shared with the DuckDB oracles (see
  * [[graft.Oracles]]): double aggregates are `round(_, 4)` to erase
  * FP-associativity noise between engines; event timestamps are
  * reduced to epoch seconds (`unix_timestamp`) because parquet stores
  * them at ns and Spark/DuckDB truncate differently; every output has
  * a deterministic total order.
  *
  * Scale notes are per-query; dims (`region nation supplier part`)
  * are broadcast explicitly, fact-fact joins shuffle on their keys.
  */
object Relational {

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** TPC-H Q1 shape: scan → filter → groupBy → multi-agg. One shuffle
    * on the (tiny) group key; partial aggregation map-side. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Top-3 orders per priority via row_number window (rank-k pattern).
    * Window shuffle partitions by o_orderpriority only — at scale use
    * a two-phase topK (partial per-partition limit) which AQE+window
    * group limit pushdown already performs in Spark 4. */
  def q2TopkWindow(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** Flagship: customer ⋈ orders ⋈ lineitem revenue by nation.
    * `nation` broadcast; customer⋈orders and orders⋈lineitem shuffle
    * on their join keys; AQE coalesces post-shuffle partitions. */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") <  ts("1997-01-01 00:00:00"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
             .as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** EXISTS — left-semi join (no row multiplication, no dedup). */
  def q4SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.orders.filter(col("o_totalprice") > 450000)
    t.customer
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** 6-table star join: revenue by region. All dims broadcast — the
    * only shuffle is lineitem's aggregation. */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") <  ts("1998-01-01 00:00:00"))
      .groupBy(col("r_name"), col("p_type"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
             .as("revenue"),
           round(sum(col("l_quantity")), 4).as("sum_qty"))
      .orderBy(col("r_name"), col("p_type"))
  }

  /** Tight scan+filter+global agg (TPC-H Q6 shape): predicate fully
    * pushed to parquet, no shuffle beyond the final single-row agg. */
  def q6FilterAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") <  ts("1997-01-01 00:00:00") &&
              col("l_discount").between(0.03, 0.07) &&
              col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4)
             .as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  /** NOT EXISTS — left-anti join; customers with no orders. */
  def q7AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q13 shape: left outer join preserving customers with zero
    * orders, per-customer count, then distribution over counts. */
  def q8OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** GROUP BY ROLLUP — hierarchical subtotals in one pass. */
  def q9Rollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)
  }

  /** HAVING — post-aggregation filter stays after the shuffle. */
  def q10Having(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 4).as("sum_total"))
      .filter(col("n_orders") >= 15)
      .orderBy(col("o_custkey"))
  }

  /** Conditional aggregation (TPC-H Q14 shape): promo revenue share. */
  def q11CaseAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") <  ts("1997-01-01 00:00:00"))
      .agg(round(
        sum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(lit(0.0))) * 100.0 /
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("promo_share"))
  }

  /** Multi-column DISTINCT + count-distinct per group. */
  def q12Distinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    // Three SINGLE-distinct branches joined on the 3-value group key
    // instead of one agg with three countDistincts: the multi-distinct
    // form plans as Expand ×3 (every input row tripled and null-padded
    // before the partial agg, no codegen fast hashmap); each branch
    // here is a two-phase hash agg whose map side dedups before the
    // exchange (the round-11 table_fds decomposition; A/B measured
    // 1.66 → 1.34 s median-of-7 at sf0.1 — the (part, supp) pair
    // branch still carries its ~600k distinct pairs through one
    // exchange and bounds the win). The joins are 3-row ⋈ 3-row.
    def branch(name: String, cols: Column*) =
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(cols.head, cols.tail: _*).as(name))
    branch("n_parts", col("l_partkey"))
      .join(branch("n_supps", col("l_suppkey")), "l_returnflag")
      .join(branch("n_ps", col("l_partkey"), col("l_suppkey")),
        "l_returnflag")
      .orderBy(col("l_returnflag"))
  }

  /** UNION of conformed schemas + dedup + count by origin kind. */
  def q13Union(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val c = t.customer.select(col("c_nationkey").cast("int").as("nk"),
                              lit("customer").as("kind"))
    val s = t.supplier.select(col("s_nationkey").cast("int").as("nk"),
                              lit("supplier").as("kind"))
    c.unionByName(s).distinct()
      .groupBy(col("kind")).agg(count(lit(1)).as("n_nations"))
      .orderBy(col("kind"))
  }

  /** Scalar subquery: parts priced above the global average. The
    * average is a 1-row broadcast, not a driver collect.
    *
    * Deliberate trade-off: `part` is scanned twice (once for the avg,
    * once for the filter). A cache would pin the table in executor
    * memory (wrong at 100 TB); a window `avg() over ()` would funnel
    * every row through one partition. Two pruned column scans are the
    * cheapest correct plan. */
  def q14ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir).part
    // The threshold comes from a reassociated parallel fold — round it
    // to 4dp (DuckDB-exact) before comparing, per the CLAUDE.md rule
    // that FP folds feeding a filter must not be used raw: a part
    // priced within the engines' avg discrepancy of the mean would
    // otherwise flip the row count.
    val avgPrice = p.agg(round(avg(col("p_retailprice")), 4).as("ap"))
    p.join(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("ap"))
      .select(col("p_partkey"), col("p_brand"),
              round(col("p_retailprice"), 4).as("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** IN (subquery) — semi-join on a filtered dim. */
  def q15InSubquery(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val building = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    t.orders
      .join(building, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 4).as("sum_total"))
      .orderBy(col("o_orderstatus"))
  }

  /** Running sum / lag / lead per key — one window shuffle on
    * user_id, all three functions share the same frame sort. */
  def q16WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
              Tables.tsNsToSec("ts").as("ep"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ep"), col("event_id"))
    ev.withColumn("rn", row_number().over(w))
      .withColumn("running_value",
        round(sum(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
      .withColumn("prev_value", round(lag(col("value"), 1, 0.0).over(w), 4))
      .withColumn("next_value", round(lead(col("value"), 1, 0.0).over(w), 4))
      .select(col("user_id"), col("event_id"), col("rn"),
              round(col("value"), 4).as("value"),
              col("running_value"), col("prev_value"), col("next_value"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** Global ORDER BY + LIMIT → TakeOrderedAndProject (no full sort of
    * the table, a per-partition top-k then a driver-side merge). */
  def q17SortLimit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.select(col("l_orderkey"), col("l_linenumber"),
              round(col("l_extendedprice"), 4).as("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
               col("l_linenumber"))
      .limit(100)
  }

  /** String function family — all codegen'd builtins, no UDFs. */
  def q18StringFuncs(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
    c.select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        substring(col("c_name"), 1, 9).as("name_prefix"),
        length(col("c_name")).as("name_len"),
        concat_ws("/", col("c_mktsegment"), col("c_name")).as("seg_name"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
        regexp_replace(col("c_mktsegment"), "[AEIOU]", "_").as("seg_masked"))
      .orderBy(col("c_custkey"))
  }

  /** Date/time function family over orders. */
  def q19DateFuncs(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders.filter(col("o_orderkey") < 500)
    o.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        quarter(col("o_orderdate")).as("o_quarter"),
        unix_timestamp(date_trunc("month", col("o_orderdate")))
          .as("month_start_ep"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .as("days_since_epoch_start"))
      .orderBy(col("o_orderkey"))
  }

  /** GROUPING SETS that neither rollup nor cube expresses: two
    * independent single-column groupings in one pass (one shuffle,
    * Expand feeds both sets). */
  def q21GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** Pivot: per-user value sums spread over fixed event_type columns.
    * The pivot list is explicit — at scale an implicit pivot triggers
    * a distinct-values job first and can explode the schema. */
  def q22Pivot(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events.filter(col("user_id") < 50)
    ev.groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(round(sum(col("value")), 4))
      .orderBy(col("user_id"))
  }

  /** Exact interpolated percentiles per group (Spark `percentile` =
    * DuckDB `quantile_cont`: linear interpolation at rank q·(n−1)).
    * Exact percentile sorts per group — at 100 TB prefer
    * approx_percentile unless exactness is contractual. */
  def q23Percentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    // ONE percentile call with an array of percentages: three separate
    // calls each build and merge their own full value-count map per
    // group (3x buffer memory, 3x merge); the array form shares one
    // map and sorts once. Measured 2.4 s -> 1.4 s at sf0.1, results
    // bit-identical (same Percentile aggregate, same interpolation).
    li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")
        .as("ps"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p75"))
      .orderBy(col("l_returnflag"))
  }

  /** Sketch-based variant of q23 — the 100 TB path made real code.
    * `approx_percentile` (KLL-style quantile sketch) is a true
    * partial aggregate: each partition folds its values into a
    * fixed-size sketch and the exchange carries sketches, not sorted
    * value vectors — no hot group can exceed executor memory, unlike
    * the exact form. accuracy=10000 bounds rank error at 1/10000.
    * Rows-only gate (sketches are not bit-reproducible across
    * engines); RelationalSpec asserts the error bound vs exact. */
  def q23ApproxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.groupBy(col("l_returnflag"))
      .agg(
        round(expr("approx_percentile(l_extendedprice, 0.25, 10000)"), 4)
          .as("p25"),
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 4)
          .as("p50"),
        round(expr("approx_percentile(l_extendedprice, 0.75, 10000)"), 4)
          .as("p75"))
      .orderBy(col("l_returnflag"))
  }

  /** Sketch-based variant of q12 — HyperLogLog++ count-distinct.
    * The exact form Expands ×3 then shuffles every distinct value;
    * this one shuffles three constant-size HLL sketches per group and
    * merges them — at 100 TB the difference between a data-volume
    * shuffle and a metadata one. rsd=0.02 → ~2% standard error
    * (ApproxSpec asserts a 5% ceiling vs exact; rsd=0.01 was measured
    * 2× slower than the exact form at sf0.1 — sketch size grows as
    * 1/rsd²). The pair column counts distinct xxhash64(pk, sk): a
    * 64-bit hash instead of a built string; collisions ~n²/2⁶⁵, far
    * below the sketch's own error. Rows-only gate. */
  def q12ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("n_parts"),
        approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("n_supps"),
        approx_count_distinct(
          xxhash64(col("l_partkey"), col("l_suppkey")),
          rsd = 0.02).as("n_ps"))
      .orderBy(col("l_returnflag"))
  }

  /** RANGE-frame window (vs q16's ROWS frame): trailing 3-day count
    * and sum per user, frame bounds defined by the ORDER BY VALUE
    * (epoch seconds), so ties are peers and enter the frame together
    * in both engines. Same single user_id exchange as any per-user
    * window. */
  def q25RangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("value"),
        Tables.tsNsToSec("ts").as("ep"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ep"))
      .rangeBetween(-3L * 86400L, 0L)
    ev.select(col("user_id"), col("event_id"), col("ep"),
        count(lit(1)).over(w).as("n_3d"),
        round(sum(col("value")).over(w), 4).as("sum_3d"))
      .orderBy(col("user_id"), col("ep"), col("event_id"))
  }

  /** Set operations: INTERSECT / EXCEPT (distinct semantics). Repeat
    * customers (orders in both 1995 AND 1996) minus big spenders.
    * Spark plans INTERSECT as a distinct left-semi and EXCEPT as a
    * distinct left-anti — both plain key shuffles with map-side
    * partial distinct, no row explosion; the final customer join is a
    * broadcast (dim side small after the set ops). */
  def q24SetOps(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val orders = t.orders
    def custsIn(year: Int) =
      orders.filter(expr(s"year(o_orderdate) = $year"))
        .select(col("o_custkey"))
    val bigSpenders = orders.filter(col("o_totalprice") > 400000)
      .select(col("o_custkey"))
    custsIn(1995).intersect(custsIn(1996)).except(bigSpenders)
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** JSON extraction from the events.props payload column. */
  def q20Json(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    ev.select(get_json_object(col("props"), "$.k").cast("int").as("k"),
              col("value"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("k"))
  }

  /** Window-function distribution surface — ntile / percent_rank /
    * cume_dist / lag over the per-customer revenue ranking (the
    * "where does each customer sit in the distribution" read that
    * q2 (rank), q16 (ROWS frame) and q25 (RANGE frame) don't cover).
    *
    * Exactness: revenue is aggregated in integer cents, and the
    * ranking ORDER BY carries a full tiebreak (rev desc, cust_key) —
    * a total order, so rank == row_number and percent_rank
    * ((rank−1)/(n−1)) and cume_dist (rank/n) are the same rationals
    * in both engines; one round(4) erases representation noise.
    * ntile over a total order is positionally determined.
    *
    * Shape: one groupBy(cust) with map-side partial agg, then the
    * two-phase distributed ranking (the partSkyline bucketed-prefix
    * pattern — the per-customer frame GROWS with the data, so a
    * global-order window over it is a single-partition sort, dead at
    * 100 TB): revenue buckets rank in parallel; the global stage
    * orders only the per-bucket (count, last-value) summary — a
    * domain-fixed handful of rows at any SF. The global row number
    * is prefix-count + in-bucket row_number; under the total order,
    * rank == row_number, so percent_rank ((rk−1)/(n−1)), cume_dist
    * (rk/n) and ntile (positional integer algebra on rk, n) rebuild
    * from it EXACTLY, and lag patches bucket boundaries with the
    * previous bucket's last value — bit-identical to the one-window
    * form the oracle runs. */
  def q27WindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables(spark, dir).orders
      .select(col("o_custkey").as("cust_key"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("cust_key"))
      .agg(sum(col("cents")).as("rev_cents"))
    val b = perCust.withColumn("b",
      floor(col("rev_cents") / graft.operators.Lifecycle.ParetoBucketCents))
    val wIn = Window.partitionBy(col("b"))
      .orderBy(col("rev_cents").desc, col("cust_key"))
    val perB = b.groupBy(col("b")).agg(
      count(lit(1)).as("bn"), min(col("rev_cents")).as("blast"))
    val wB = Window.orderBy(col("b").desc)
    val summary = perB.select(col("b"),
      coalesce(sum(col("bn"))
        .over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as("pcnt"),
      // the row BEFORE a bucket's first row (global desc order) is
      // the previous bucket's LAST row; lag only needs its rev_cents,
      // and ties share the value, so min(rev_cents) suffices
      lag(col("blast"), 1).over(wB).as("plast"),
      sum(col("bn")).over(Window.partitionBy()).as("n"))
    b.join(broadcast(summary), Seq("b"))
      .withColumn("rk", col("pcnt") + row_number().over(wIn))
      .withColumn("lag_rev",
        coalesce(lag(col("rev_cents"), 1).over(wIn), col("plast")))
      // ntile(10) over a total order is positionally determined:
      // q = n div 10 and r = n % 10; the first r tiles take q+1 rows
      .withColumn("qn", expr("n div 10"))
      .withColumn("rn", expr("n % 10"))
      .select(col("cust_key"),
        round(col("rev_cents") / 100.0, 2).as("revenue"),
        when(col("rk") <= (col("qn") + 1) * col("rn"),
            expr("(rk - 1) div (qn + 1) + 1"))
          .otherwise(expr("rn + (rk - 1 - (qn + 1) * rn) div qn + 1"))
          .cast("int").as("decile"),
        round(when(col("n") > 1,
            (col("rk") - 1).cast("double") / (col("n") - 1))
          .otherwise(lit(0.0)), 4).as("pct_rank"),
        round(col("rk").cast("double") / col("n"), 4).as("cume"),
        round((col("lag_rev") - col("rev_cents")) / 100.0, 2)
          .as("gap_above"))
      .orderBy(col("revenue").desc, col("cust_key"))
  }

  /** GROUP BY CUBE — all 2^k grouping combinations in one Expand
    * pass, completing the rollup (q9) / grouping-sets (q21) / cube
    * trio. The `grouping()` flags disambiguate a NULL subtotal row
    * from genuinely-NULL data; they are emitted as explicit per-column
    * 0/1 ints rather than one `grouping_id()` because the composite
    * id's bit order is engine-defined, while the per-column flag is
    * SQL-standard and hash-gates cross-engine. Same scale shape as
    * rollup: ONE Expand (4 grouping sets → 4× the filtered rows
    * map-side) into one map-side-combined aggregate over a tiny key
    * space — no extra exchanges vs a plain groupBy. */
  def q26Cube(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
           grouping(col("l_linestatus")).cast("int").as("g_ls"),
           round(sum(col("l_quantity")), 4).as("sum_qty"),
           count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("l_linestatus"),
              col("g_rf"), col("g_ls"), col("sum_qty"), col("n_rows"))
      .orderBy(col("g_rf"), col("g_ls"),
               col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)
  }

  /** Price-bucket width (in cents) for [[partSkyline]]'s two-level
    * dominance scan. The price DOMAIN is fixed (doesn't grow with
    * row count), so a fixed bucket width keeps the per-bucket summary
    * frame metadata-sized at any data scale — unlike LSH/IVF dials,
    * which must scale with n (see knn_graph_ivf). */
  val SkylineBucketCents = 1000L

  /** B: 2-D skyline (Pareto frontier) of parts — every part no other
    * part strictly dominates on (price low, size high): the
    * "efficient frontier" query pattern (börzsönyi et al.), the
    * multi-objective cousin of q2's per-key top-k. q dominates p iff
    * q.price ≤ p.price ∧ q.size ≥ p.size ∧ (q.price < p.price ∨
    * q.size > p.size); duplicates on both axes survive (neither
    * strictly dominates).
    *
    * Scale shape: dominance is decided WITHOUT a global-order window
    * (single-partition sort — dead at 100 TB). Prices (as exact
    * integer cents) bucket by cents/1000: within a bucket the
    * strictly-cheaper running max(size) is a bucket-PARTITIONED
    * range window (shards sort in parallel); across buckets the
    * threshold is a prefix-max over the per-bucket max(size)
    * aggregate — a ~100-row frame at any scale — broadcast-joined
    * back. Equal-price strict-size dominance is a (bucket, cents)
    * partitioned max. Pure integer algebra ⇒ full hash gate. */
  def partSkyline(spark: SparkSession, dir: String): DataFrame =
    skylineOf(Tables(spark, dir).part
      .select(col("p_partkey"),
        floor(col("p_retailprice") * 100 + 0.5).cast("long").as("cents"),
        col("p_size").cast("long").as("size")))

  /** Skyline over any (p_partkey, cents minimize, size maximize)
    * frame. */
  def skylineOf(p: DataFrame): DataFrame = {
    val b = p.withColumn("b", floor(col("cents") / SkylineBucketCents))
    // strictly-cheaper max size WITHIN the bucket (range window on
    // the exact integer cents — excludes price ties by bound −1)
    val wIn = Window.partitionBy(col("b")).orderBy(col("cents"))
      .rangeBetween(Window.unboundedPreceding, -1)
    // same-price strictly-larger size (ties on price)
    val wEq = Window.partitionBy(col("b"), col("cents"))
    // strictly-cheaper max size from ALL lower buckets: prefix max
    // over the tiny per-bucket summary, joined back on bucket id
    val perBucket = b.groupBy(col("b")).agg(max(col("size")).as("bmax"))
    val wPre = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = perBucket
      .select(col("b"), max(col("bmax")).over(wPre).as("pmax"))
    b.join(broadcast(prefix), Seq("b"))
      .withColumn("m_in", max(col("size")).over(wIn))
      .withColumn("m_eq", max(col("size")).over(wEq))
      .filter(coalesce(col("m_in"), lit(Long.MinValue)) < col("size") &&
        coalesce(col("pmax"), lit(Long.MinValue)) < col("size") &&
        col("m_eq") === col("size"))
      .select(col("p_partkey"), col("cents").as("price_cents"),
        col("size").cast("int").as("p_size"))
      .orderBy(col("price_cents"), col("p_size"), col("p_partkey"))
  }
}
