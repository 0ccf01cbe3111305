package graft

/** DuckDB oracle SQL, one entry per SQL-expressible `queries` key.
  *
  * Cross-engine alignment rules (see SURVEY.md §5):
  *  - aliases identical to the Spark output column names;
  *  - `round(_, 4)` on every computed double;
  *  - epoch seconds (`epoch(date_trunc('second', ts))::bigint`) for
  *    event timestamps — parquet holds ns, Spark truncates to µs;
  *  - explicit `::int` casts where DuckDB widens to BIGINT but Spark
  *    emits INT (year/month/row_number/…);
  *  - deterministic ORDER BY with full tiebreak.
  */
object Oracles {

  val relational: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // Per-column profile, one UNION ALL branch per column (the same
    // branch-per-column shape as the Spark side); min/max stringified
    // — int/varchar only, whose string forms are engine-identical.
    // Columns single-sourced from Profile.LineitemCols.
    "table_profile" ->
      graft.operators.Profile.LineitemCols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  min($c)::varchar AS min_val, max($c)::varchar AS max_val
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    // Mirrors Profile.tableProfileTyped's pinned formatting contract:
    // %.6f for doubles, fixed 6-digit-micros timestamps. DuckDB reads
    // events.ts as micro TIMESTAMP whatever the parquet physical type
    // (ns parquet truncates, µs parquet is native); the Spark side
    // profiles the normalized epoch-nanos long at the same micro
    // grain by integral div — both engines agree at µs precision.
    "table_profile_typed" ->
      graft.operators.Profile.TypedCols.map { case (table, c, kind) =>
        def fmt(x: String): String = kind match {
          case "plain" => s"$x::varchar"
          case "double" => s"printf('%.6f', $x)"
          case "ts" | "tsns" => s"strftime($x, '%Y-%m-%d %H:%M:%S.%f')"
        }
        s"""SELECT '$table' AS table_name, '$c' AS col_name,
           |  count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  ${fmt(s"min($c)")} AS min_val,
           |  ${fmt(s"max($c)")} AS max_val
           |FROM $table""".stripMargin
      }.mkString("", "\nUNION ALL\n",
        "\nORDER BY table_name, col_name"),

    // Join-key skew datasheet: per-key counts CTE, then a 1-row
    // report per key — heaviest key via (cnt DESC, k ASC) LIMIT 1
    // (the deterministic tiebreak), ratios as single divisions of
    // exact ::bigint operands (DuckDB's sum() is HUGEINT — cast
    // before dividing so both engines divide the same long types).
    // Keys single-sourced from Profile.SkewKeys.
    "table_skew" -> {
      val ks = graft.operators.Profile.SkewKeys
      val ctes = ks.map { case (table, c) =>
        s"""c_${table}_$c AS (
           |  SELECT $c AS k, count(*) AS cnt FROM $table GROUP BY 1)"""
          .stripMargin
      }.mkString("WITH ", ",\n", "")
      val branches = ks.map { case (table, c) =>
        val cte = s"c_${table}_$c"
        s"""SELECT '$table.$c' AS entity,
           |  sum(cnt)::bigint AS n_rows, count(*)::bigint AS n_keys,
           |  (SELECT k::varchar FROM $cte
           |   ORDER BY cnt DESC, k LIMIT 1) AS top_key,
           |  max(cnt)::bigint AS top_cnt,
           |  round(max(cnt)::bigint / sum(cnt)::bigint, 6) AS top_share,
           |  round((max(cnt)::bigint * count(*)::bigint)
           |        / sum(cnt)::bigint, 4) AS skew_ratio
           |FROM $cte""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"$ctes\n$branches\nORDER BY entity"
    },

    // Z-order key: the same integer algebra as ZOrder.zorderKey —
    // `//` bucketization, per-bit shift/mask/or interleave generated
    // from the shared KeyBits constant. Pure BIGINT ops, exact in
    // both engines.
    "zorder_key" -> {
      val bits = graft.sources.ZOrder.KeyBits
      val n = 1L << bits
      val inter = (0 until bits).flatMap(i => Seq(
        s"(((ba >> $i) & 1) << ${2 * i})",
        s"(((bb >> $i) & 1) << ${2 * i + 1})")).mkString("\n|    | ")
      raw"""WITH e AS (
        |  SELECT event_id, user_id AS ua,
        |    epoch(date_trunc('second', ts))::bigint AS sec
        |  FROM events),
        |st AS (
        |  SELECT min(ua) AS mna, max(ua) AS mxa,
        |    min(sec) AS mnb, max(sec) AS mxb
        |  FROM e),
        |b AS (
        |  SELECT event_id,
        |    ((ua - mna) * $n) // (mxa - mna + 1) AS ba,
        |    ((sec - mnb) * $n) // (mxb - mnb + 1) AS bb
        |  FROM e CROSS JOIN st)
        |SELECT event_id, ba AS bucket_user, bb AS bucket_sec,
        |  $inter AS z
        |FROM b
        |ORDER BY event_id""".stripMargin
    },

    // CUBE with per-column grouping() flags (composite grouping_id
    // bit order is engine-defined; the per-column 0/1 flag is
    // SQL-standard and cross-engine).
    // B window-distribution surface: ntile/percent_rank/cume_dist
    // over a TOTAL order (rev_cents desc, cust_key) on the
    // per-customer integer-cents aggregate — rank == row_number, so
    // the rationals (rank−1)/(n−1) and rank/n agree cross-engine;
    // round(4) erases representation noise only.
    "q27_window_funcs" ->
      """WITH c AS (
        |  SELECT o_custkey AS cust_key,
        |    sum(floor(o_totalprice * 100)::bigint) AS rev_cents
        |  FROM orders GROUP BY 1)
        |SELECT cust_key,
        |  round(rev_cents / 100.0, 2) AS revenue,
        |  ntile(10) OVER w AS decile,
        |  round(percent_rank() OVER w, 4) AS pct_rank,
        |  round(cume_dist() OVER w, 4) AS cume,
        |  round((lag(rev_cents, 1) OVER w - rev_cents) / 100.0, 2)
        |    AS gap_above
        |FROM c
        |WINDOW w AS (ORDER BY rev_cents DESC, cust_key)
        |ORDER BY revenue DESC, cust_key""".stripMargin,

    "q26_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag)::int AS g_rf,
        |  grouping(l_linestatus)::int AS g_ls,
        |  round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin,

    // B skyline: the oracle uses the global-window dominance form
    // (fine single-node); the Spark side buckets — identical output
    // by construction. Pure integer algebra (cents, size).
    "part_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey, floor(p_retailprice * 100 + 0.5)::bigint
        |      AS cents,
        |    p_size::bigint AS size
        |  FROM part),
        |w AS (
        |  SELECT p_partkey, cents, size,
        |    max(size) OVER (ORDER BY cents RANGE BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING) AS m_in,
        |    max(size) OVER (PARTITION BY cents) AS m_eq
        |  FROM p)
        |SELECT p_partkey, cents AS price_cents, size::int AS p_size
        |FROM w
        |WHERE coalesce(m_in, -1) < size AND m_eq = size
        |ORDER BY price_cents, p_size, p_partkey""".stripMargin,

    // H7 FK integrity: one left-outer probe + one aggregate per
    // edge, orphan = non-null key with no parent. Edges
    // single-sourced from Profile.FkEdges; sums cast off DuckDB's
    // HUGEINT widening.
    "table_fk_check" -> {
      val blocks = graft.operators.Profile.FkEdges.map {
        case (ct, ck, pt, pk) =>
          s"""SELECT '$ct.$ck -> $pt.$pk' AS edge,
             |  count(*) AS n_child,
             |  sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END)::bigint
             |    AS n_null,
             |  sum(CASE WHEN k IS NOT NULL AND pk IS NULL
             |      THEN 1 ELSE 0 END)::bigint AS n_orphans,
             |  round(sum(CASE WHEN k IS NOT NULL AND pk IS NULL
             |        THEN 1 ELSE 0 END) / count(*), 6) AS orphan_share
             |FROM (SELECT c.$ck AS k, p.pk
             |      FROM $ct c LEFT JOIN
             |        (SELECT DISTINCT $pk AS pk FROM $pt) p
             |        ON c.$ck = p.pk)""".stripMargin
      }
      blocks.mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    },

    // H5 equi-width histograms: the same IEEE floor-bin algebra per
    // column, 1-row stats CTE cross-joined; blocks unioned. Columns
    // and bin count single-sourced from Profile.
    "table_histogram" -> {
      val b = graft.operators.Profile.HistBins
      val blocks = graft.operators.Profile.HistCols.map { case (t, c) =>
        s"""SELECT '$t.$c' AS entity, bin,
           |  round(mn + bin * (mx - mn) / $b, 4) AS lo,
           |  round(mn + (bin + 1) * (mx - mn) / $b, 4) AS hi,
           |  count(*) AS n
           |FROM (
           |  SELECT least(floor((x - mn) * $b / (mx - mn)), ${b - 1})::int
           |           AS bin, mn, mx
           |  FROM (SELECT $c::double AS x FROM $t) CROSS JOIN
           |       (SELECT min($c::double) AS mn, max($c::double) AS mx
           |        FROM $t))
           |GROUP BY bin, mn, mx""".stripMargin
      }
      blocks.mkString("", "\nUNION ALL\n", "\nORDER BY entity, bin")
    },

    // H4 snapshot diff: both snapshots derive from doc_id algebra
    // (single-sourced semantics with Profile.snapshotDiff); the
    // status CASE is wrapped so the filter needn't repeat it.
    "snapshot_diff" ->
      """WITH a AS (
        |  SELECT doc_id, md5(text) AS md5_a
        |  FROM documents WHERE doc_id % 7 <> 3),
        |b AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
        |        ELSE text END) AS md5_b
        |  FROM documents WHERE doc_id % 11 <> 7),
        |d AS (
        |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |    CASE WHEN a.doc_id IS NULL THEN 'added'
        |         WHEN b.doc_id IS NULL THEN 'removed'
        |         WHEN md5_a <> md5_b THEN 'changed' END AS status,
        |    md5_a, md5_b
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT doc_id, status, md5_a, md5_b
        |FROM d WHERE status IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    "q2_topk_window" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey)::int AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin,

    "q3_join_agg" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q4_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q5_multijoin" ->
      """SELECT r_name, p_type,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY r_name, p_type
        |ORDER BY r_name, p_type""".stripMargin,

    "q6_filter_agg" ->
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q7_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q8_outer_join" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q9_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q10_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 4) AS sum_total
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 15
        |ORDER BY o_custkey""".stripMargin,

    "q11_case_agg" ->
      """SELECT round(
        |  sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 100.0 /
        |  sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'""".stripMargin,

    "q12_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT (l_partkey, l_suppkey)) AS n_ps
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q13_union" ->
      """SELECT kind, count(*) AS n_nations FROM (
        |  SELECT DISTINCT * FROM (
        |    SELECT c_nationkey::int AS nk, 'customer' AS kind FROM customer
        |    UNION ALL
        |    SELECT s_nationkey::int AS nk, 'supplier' AS kind FROM supplier))
        |GROUP BY kind
        |ORDER BY kind""".stripMargin,

    "q14_scalar_subquery" ->
      """SELECT p_partkey, p_brand, round(p_retailprice, 4) AS p_retailprice
        |FROM part
        |WHERE p_retailprice > (SELECT round(avg(p_retailprice), 4) FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "q15_in_subquery" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  round(sum(o_totalprice), 4) AS sum_total
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q16_window_running" ->
      """SELECT user_id, event_id, rn::int AS rn, round(value, 4) AS value,
        |  round(running_value, 4) AS running_value,
        |  round(prev_value, 4) AS prev_value,
        |  round(next_value, 4) AS next_value
        |FROM (
        |  SELECT user_id, event_id, value,
        |    epoch(date_trunc('second', ts))::bigint AS ep,
        |    row_number() OVER w AS rn,
        |    sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS running_value,
        |    lag(value, 1, 0.0) OVER w AS prev_value,
        |    lead(value, 1, 0.0) OVER w AS next_value
        |  FROM events WHERE user_id < 20
        |  WINDOW w AS (PARTITION BY user_id ORDER BY
        |               epoch(date_trunc('second', ts))::bigint, event_id))
        |ORDER BY user_id, rn""".stripMargin,

    "q17_sort_limit" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice, 4) AS l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q18_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  substring(c_name, 1, 9) AS name_prefix,
        |  length(c_name)::int AS name_len,
        |  concat_ws('/', c_mktsegment, c_name) AS seg_name,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
        |  regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_masked
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q19_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate)::int AS o_year,
        |  month(o_orderdate)::int AS o_month,
        |  dayofmonth(o_orderdate)::int AS o_day,
        |  quarter(o_orderdate)::int AS o_quarter,
        |  epoch(date_trunc('month', o_orderdate))::bigint AS month_start_ep,
        |  date_diff('day', DATE '1995-01-01', o_orderdate::date)::int
        |    AS days_since_epoch_start
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin,

    "q20_json" ->
      """SELECT CAST(props->>'$.k' AS int) AS k,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY k
        |ORDER BY k""".stripMargin,

    "q21_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin,

    "q22_pivot" ->
      """SELECT user_id,
        |  round(sum(value) FILTER (event_type = 'click'), 4) AS click,
        |  round(sum(value) FILTER (event_type = 'view'), 4) AS view,
        |  round(sum(value) FILTER (event_type = 'purchase'), 4) AS purchase
        |FROM events
        |WHERE user_id < 50
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q23_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |s AS (
        |  SELECT user_id, ts
        |  FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id,
        |  epoch(date_trunc('second', p.ts))::bigint AS p_sec,
        |  epoch(date_trunc('second', s.ts))::bigint AS signup_sec
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin,

    // B RFM segmentation: cents-exact monetary, integral recency,
    // quintile BOUNDARIES from one quantile_cont array call per
    // metric (no global ntile sort), per-row boundary compares.
    "events_rfm" ->
      raw"""WITH p AS (
        |  SELECT user_id, epoch(date_trunc('second', ts))::bigint AS ep,
        |    floor(value * 100)::bigint AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |u0 AS (
        |  SELECT user_id, max(ep) AS last_ep, count(*) AS freq,
        |    sum(cents)::bigint AS cents
        |  FROM p GROUP BY 1),
        |mx AS (SELECT max(ep) AS max_ep FROM p),
        |u AS (
        |  SELECT user_id, (max_ep - last_ep) // 86400 AS recency_days,
        |    freq, cents
        |  FROM u0 CROSS JOIN mx),
        |b AS (
        |  SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS qr,
        |    quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS qf,
        |    quantile_cont(cents, [0.2, 0.4, 0.6, 0.8]) AS qm
        |  FROM u),
        |scored AS (
        |  SELECT user_id, recency_days, freq,
        |    round(cents / 100.0, 2) AS monetary,
        |    6 - (1 + (CASE WHEN recency_days > qr[1] THEN 1 ELSE 0 END) + (CASE WHEN recency_days > qr[2] THEN 1 ELSE 0 END) + (CASE WHEN recency_days > qr[3] THEN 1 ELSE 0 END) + (CASE WHEN recency_days > qr[4] THEN 1 ELSE 0 END)) AS r,
        |    (1 + (CASE WHEN freq > qf[1] THEN 1 ELSE 0 END) + (CASE WHEN freq > qf[2] THEN 1 ELSE 0 END) + (CASE WHEN freq > qf[3] THEN 1 ELSE 0 END) + (CASE WHEN freq > qf[4] THEN 1 ELSE 0 END)) AS f,
        |    (1 + (CASE WHEN cents > qm[1] THEN 1 ELSE 0 END) + (CASE WHEN cents > qm[2] THEN 1 ELSE 0 END) + (CASE WHEN cents > qm[3] THEN 1 ELSE 0 END) + (CASE WHEN cents > qm[4] THEN 1 ELSE 0 END)) AS m
        |  FROM u CROSS JOIN b)
        |SELECT user_id, recency_days, freq, monetary, r, f, m,
        |  CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champions'
        |       WHEN f >= 4 THEN 'loyal'
        |       WHEN m >= 4 THEN 'big_spender'
        |       WHEN r <= 2 AND f >= 3 THEN 'at_risk'
        |       WHEN r = 1 THEN 'churned'
        |       ELSE 'casual' END AS segment
        |FROM scored
        |ORDER BY user_id""".stripMargin,

    // Forward as-of: DuckDB's ASOF is backward-only, so the oracle
    // mirrors the union + following-frame window algebra verbatim
    // (which also pins the same-instant tie rule: view tag 0 sorts
    // before purchase tag 1, so a same-ts purchase is "next").
    "asof_join_forward" ->
      """WITH u AS (
        |  SELECT event_id, user_id, ts,
        |    NULL::bigint AS p_id, NULL::timestamp AS p_ts, 0 AS tag
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT event_id, user_id, ts,
        |    event_id AS p_id, ts AS p_ts, 1 AS tag
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT *,
        |    first_value(p_id IGNORE NULLS) OVER w AS next_p_id,
        |    first_value(p_ts IGNORE NULLS) OVER w AS next_p_ts
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_id AS view_id, user_id,
        |  epoch(date_trunc('second', ts))::bigint AS view_sec,
        |  next_p_id AS next_purchase_id,
        |  epoch(date_trunc('second', next_p_ts))::bigint AS purchase_sec,
        |  epoch(date_trunc('second', next_p_ts))::bigint
        |    - epoch(date_trunc('second', ts))::bigint AS lag_s
        |FROM m WHERE tag = 0
        |ORDER BY view_id""".stripMargin,

    // NEAREST as-of: both window frames over one (partition, order)
    // spec; same-instant counts as prior, |Δ| ties resolve prior —
    // the choice compares raw µs gaps (order-equivalent to Spark's
    // ×1000 nano gaps, ties included).
    "asof_join_nearest" ->
      """WITH u AS (
        |  SELECT event_id, user_id, ts,
        |    NULL::bigint AS p_id, NULL::timestamp AS p_ts, 1 AS tag
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT event_id, user_id, ts,
        |    event_id AS p_id, ts AS p_ts, 0 AS tag
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT *,
        |    last_value(p_id IGNORE NULLS) OVER wb AS prev_id,
        |    last_value(p_ts IGNORE NULLS) OVER wb AS prev_ts,
        |    first_value(p_id IGNORE NULLS) OVER wf AS next_id,
        |    first_value(p_ts IGNORE NULLS) OVER wf AS next_ts
        |  FROM u
        |  WINDOW
        |    wb AS (PARTITION BY user_id ORDER BY ts, tag, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY ts, tag, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |c AS (
        |  SELECT *,
        |    (prev_ts IS NOT NULL AND (next_ts IS NULL OR
        |       (ts - prev_ts) <= (next_ts - ts))) AS pick_prev
        |  FROM m WHERE tag = 1)
        |SELECT event_id AS view_id, user_id,
        |  epoch(date_trunc('second', ts))::bigint AS view_sec,
        |  CASE WHEN pick_prev THEN prev_id ELSE next_id END
        |    AS nearest_purchase_id,
        |  epoch(date_trunc('second',
        |    CASE WHEN pick_prev THEN prev_ts ELSE next_ts END))::bigint
        |    AS nearest_sec,
        |  abs(epoch(date_trunc('second',
        |      CASE WHEN pick_prev THEN prev_ts ELSE next_ts END))::bigint
        |    - epoch(date_trunc('second', ts))::bigint) AS gap_s,
        |  CASE WHEN pick_prev THEN 'prev'
        |       WHEN next_ts IS NOT NULL THEN 'next'
        |       ELSE NULL END AS direction
        |FROM c
        |ORDER BY view_id""".stripMargin,

    // RANGE frame over the numeric ORDER BY value: ties are peers in
    // both engines, so the frame sets agree row for row.
    "q25_range_window" ->
      """SELECT user_id, event_id, ep,
        |  count(*) OVER w AS n_3d,
        |  round(sum(value) OVER w, 4) AS sum_3d
        |FROM (
        |  SELECT user_id, event_id, value,
        |    epoch(date_trunc('second', ts))::bigint AS ep
        |  FROM events WHERE user_id < 20)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ep
        |             RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ep, event_id""".stripMargin,

    "q24_set_ops" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |SELECT c_custkey, c_name, c_mktsegment
        |FROM ((SELECT * FROM a INTERSECT SELECT * FROM b)
        |      EXCEPT SELECT * FROM big) s
        |JOIN customer ON s.o_custkey = c_custkey
        |ORDER BY c_custkey""".stripMargin,

    // Inequality (no equi key) interval join — DuckDB plans its IEJoin;
    // the Spark side is the binned equi-join form (RangeJoin.scala).
    // Window constants must track RangeJoin.{WindowSec, AnchorMinValue}.
    "range_join" ->
      s"""WITH ev AS (
        |  SELECT event_id, user_id, value, event_type,
        |    epoch(date_trunc('second', ts))::bigint AS sec
        |  FROM events),
        |a AS (
        |  SELECT event_id AS anchor_id, sec AS a_sec
        |  FROM ev WHERE event_type = 'purchase'
        |    AND value > ${graft.operators.RangeJoin.AnchorMinValue})
        |SELECT a.anchor_id,
        |  count(*) AS n_events,
        |  count(DISTINCT e.user_id) AS n_users,
        |  round(sum(e.value), 4) AS sum_value
        |FROM a JOIN ev e
        |  ON e.sec >= a.a_sec
        |  AND e.sec < a.a_sec + ${graft.operators.RangeJoin.WindowSec}
        |GROUP BY a.anchor_id
        |ORDER BY a.anchor_id""".stripMargin,

    // Keyed symmetric band join — DuckDB's hash join on user_id with
    // the band as a residual filter; the Spark side is the ≤3-bin
    // exploded equi-join (RangeJoin.bandJoinAgg). Width tracks
    // RangeJoin.BandSec. LEFT join keeps zero-match purchases
    // (count over e.sec counts matches only; min of none = NULL).
    "events_band_join" ->
      s"""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch(date_trunc('second', ts))::bigint AS sec
        |  FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, sec FROM ev
        |      WHERE event_type = 'purchase'),
        |e AS (SELECT user_id, sec FROM ev WHERE event_type = 'error')
        |SELECT p.purchase_id, p.user_id,
        |  count(e.sec)::bigint AS n_errors,
        |  min(abs(e.sec - p.sec))::bigint AS min_gap_sec
        |FROM p LEFT JOIN e
        |  ON p.user_id = e.user_id
        |  AND abs(e.sec - p.sec) <= ${graft.operators.RangeJoin.BandSec}
        |GROUP BY 1, 2
        |ORDER BY purchase_id""".stripMargin,

    "events_sessionize" ->
      ("WITH " + sessionCte + "\n" +
      """SELECT user_id, session_id, n_events,
        |  session_start, session_end, session_value
        |FROM sess
        |ORDER BY user_id, session_id""".stripMargin),

    // B: the one-row session datasheet over the same session frame.
    // Exact integer counts, two correctly-rounded long/long
    // divisions, and ONE quantile_cont array call (the q23 shared-
    // buffer / mix_curriculum interpolation-bit-equality pattern).
    "events_sessions_stats" ->
      ("WITH " + sessionCte + "\n" +
      """SELECT count(*) AS n_sessions,
        |  count(DISTINCT user_id) AS n_users,
        |  sum(n_events)::bigint AS total_events,
        |  round(sum(n_events) / count(*), 4) AS avg_events,
        |  round(count(*) FILTER (n_events = 1) / count(*), 4)
        |    AS bounce_share,
        |  round(quantile_cont(session_end - session_start,
        |                      [0.25, 0.5, 0.75])[1], 4) AS p25_duration_s,
        |  round(quantile_cont(session_end - session_start,
        |                      [0.25, 0.5, 0.75])[2], 4) AS p50_duration_s,
        |  round(quantile_cont(session_end - session_start,
        |                      [0.25, 0.5, 0.75])[3], 4) AS p75_duration_s,
        |  max(session_end - session_start) AS max_duration_s
        |FROM sess""".stripMargin),

    // Ordered funnel: each stage's min-ts is strictly after the
    // previous stage's — all integer epoch-second math, exact hash.
    // (funnelSql is shared with the G5 stream_funnel entry: the
    // stateful streaming path must reproduce this exactly in batch.)
    "events_funnel" -> funnelSql,

    // First-order Markov transitions between consecutive event types
    // per user; p = n/n_from is a BIGINT/BIGINT double division
    // (correctly rounded IEEE → exact hash).
    "events_pathing" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch(date_trunc('second', ts))::bigint AS ep
        |  FROM events),
        |trans AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |                              ORDER BY ep, event_id) AS to_type
        |  FROM ev),
        |cnt AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM trans WHERE to_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(n / sum(n) OVER (PARTITION BY from_type), 4) AS p
        |FROM cnt
        |ORDER BY from_type, to_type""".stripMargin,

    // Top-20 3-step sequences; tie order (n DESC, then types) must be
    // total or the LIMIT cut is nondeterministic.
    "events_sequences" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch(date_trunc('second', ts))::bigint AS ep
        |  FROM events),
        |seq AS (
        |  SELECT event_type AS t1,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id))
        |SELECT t1, t2, t3, count(*) AS n
        |FROM seq WHERE t3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, t1, t2, t3
        |LIMIT 20""".stripMargin,

    // Weekly cohort retention; `//` = DuckDB integral division,
    // mirroring Spark's `div` (Funnel.WeekSeconds single-sourced).
    // retentionSql is shared with the G6 stream_retention entry.
    "events_retention" -> retentionSql,

    // Trailing-24h spike detection. Every window aggregate is an
    // EXACT integer (count / Σx / Σx² of per-hour counts as BIGINTs);
    // mean/var/z derive in the same double expression tree as Spark,
    // so the gate is a full bit-exact hash despite the statistics —
    // deliberately NOT stddev() (engine Welford orders differ in the
    // last ulp). Baseline + threshold single-sourced from Funnel.
    // (anomalySql is shared with the G9 stream_anomaly entry: the
    // stateful trailing-window fold's batch mode must equal this
    // RANGE-window form.)
    "events_anomaly" -> anomalySql,

    // First/last-touch attribution (attributionSql is shared with the
    // G8 stream_attribution entry: the stateful fold's batch mode must
    // equal this window form).
    "events_attribution" -> attributionSql,

    // Event-type co-occurrence: distinct (user, type) → same-user
    // type pairs (a < b) → integer user counts per pair + per-type
    // reach, one exact Jaccard division.
    "events_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_users_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |r AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1)
        |SELECT type_a, type_b, n_users_both,
        |  ra.n AS n_users_a, rb.n AS n_users_b,
        |  round(n_users_both / (ra.n + rb.n - n_users_both), 6) AS jaccard
        |FROM p
        |JOIN r ra ON ra.event_type = p.type_a
        |JOIN r rb ON rb.event_type = p.type_b
        |ORDER BY type_a, type_b""".stripMargin,

    // DAU/MAU/stickiness: the sliding-window distinct via the same
    // contribution explode (ud.day + o.n) the Spark side uses — a
    // plain equi-aggregation on both engines, no range join. Window
    // width single-sourced from Funnel.MauWindowDays; only observed
    // days report (inner join with dau).
    "events_engagement" -> {
      val w = graft.operators.Funnel.MauWindowDays
      s"""WITH ud AS (
        |  SELECT DISTINCT
        |    epoch(date_trunc('second', ts))::bigint // 86400 AS day,
        |    user_id
        |  FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |mau AS (
        |  SELECT ud.day + o.n AS day, count(DISTINCT ud.user_id) AS mau
        |  FROM ud CROSS JOIN range(0, $w) o(n)
        |  GROUP BY 1)
        |SELECT d.day, d.dau, m.mau,
        |  round(d.dau / m.mau, 4) AS stickiness
        |FROM dau d JOIN mau m USING (day)
        |ORDER BY day""".stripMargin
    },

    // B growth accounting: contribution-union form (own-day status +
    // churn into day+1), mirroring Lifecycle.lifecycleOf's explode;
    // churn rows on silent days drop via the dau>0 filter.
    "events_lifecycle" ->
      """WITH ud AS (
        |  SELECT DISTINCT
        |    epoch(date_trunc('second', ts))::bigint // 86400 AS day,
        |    user_id
        |  FROM events),
        |t AS (
        |  SELECT day, user_id,
        |    lag(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
        |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
        |  FROM ud),
        |c AS (
        |  SELECT day,
        |    CASE WHEN prev_day IS NULL THEN 'new'
        |         WHEN prev_day = day - 1 THEN 'retained'
        |         ELSE 'resurrected' END AS kind
        |  FROM t
        |  UNION ALL
        |  SELECT day + 1, 'churned' FROM t
        |  WHERE next_day IS NULL OR next_day > day + 1),
        |a AS (
        |  SELECT day,
        |    sum(CASE WHEN kind = 'new' THEN 1 ELSE 0 END)::bigint AS new_users,
        |    sum(CASE WHEN kind = 'retained' THEN 1 ELSE 0 END)::bigint AS retained,
        |    sum(CASE WHEN kind = 'resurrected' THEN 1 ELSE 0 END)::bigint AS resurrected,
        |    sum(CASE WHEN kind = 'churned' THEN 1 ELSE 0 END)::bigint AS churned
        |  FROM c GROUP BY 1)
        |SELECT day, new_users, retained, resurrected, churned,
        |  new_users + retained + resurrected AS dau
        |FROM a
        |WHERE new_users + retained + resurrected > 0
        |ORDER BY day""".stripMargin,

    // B activity heatmap: epoch-day 0 = Thursday → (+4)%7 puts dow 0
    // on Sunday; value averaged from cents-exact integer sums.
    "events_heatmap" ->
      """WITH e AS (
        |  SELECT
        |    ((((epoch(date_trunc('second', ts))::bigint // 86400) % 7) + 4) % 7)::int AS dow,
        |    ((epoch(date_trunc('second', ts))::bigint // 3600) % 24)::int AS hour,
        |    user_id, floor(value * 100)::bigint AS cents
        |  FROM events)
        |SELECT dow, hour, count(*)::bigint AS n_events,
        |  count(DISTINCT user_id)::bigint AS n_users,
        |  round((sum(cents)::bigint / 100.0) / count(*), 4) AS avg_value
        |FROM e GROUP BY dow, hour
        |ORDER BY dow, hour""".stripMargin,

    // B transition dwell times: raw-µs ts order with event_id
    // tiebreak (same total order as Spark's epoch-nanos long), gaps
    // as exact epoch-second integers; mean = Σ/n division, p90 =
    // quantile_cont (bit-equal to Spark percentile interpolation).
    "events_dwell" ->
      """WITH p AS (
        |  SELECT user_id, event_type AS dst,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS src,
        |    epoch(date_trunc('second', ts))::bigint -
        |      lag(epoch(date_trunc('second', ts))::bigint) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT src, dst, count(*)::bigint AS n,
        |  round(sum(gap)::bigint / count(*), 4) AS avg_gap_sec,
        |  round(quantile_cont(gap, 0.9), 4) AS p90_gap_sec,
        |  max(gap)::bigint AS max_gap_sec
        |FROM p WHERE src IS NOT NULL
        |GROUP BY src, dst
        |ORDER BY src, dst""".stripMargin,

    // B interval-union coverage: the same strictly-preceding running
    // max-end sweep (1800 s window width single-sourced from
    // Lifecycle.CoverageWindowSec), all integer seconds.
    "interval_coverage" -> {
      val w = graft.operators.Lifecycle.CoverageWindowSec
      s"""WITH iv AS (
        |  SELECT user_id, epoch(date_trunc('second', ts))::bigint AS ep,
        |    event_id
        |  FROM events),
        |g AS (
        |  SELECT user_id, ep,
        |    max(ep + $w) OVER (PARTITION BY user_id ORDER BY ep, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM iv)
        |SELECT user_id, count(*)::bigint AS n_events,
        |  sum(greatest(0, ep + $w -
        |    greatest(ep, coalesce(prev_end, ep))))::bigint AS covered_sec,
        |  sum(CASE WHEN prev_end IS NULL OR ep >= prev_end
        |    THEN 1 ELSE 0 END)::bigint AS n_segments
        |FROM g GROUP BY 1
        |ORDER BY user_id""".stripMargin
    },

    // B revenue cohorts: integer month key year·12+month−1, min-window
    // cohort assignment, cents-exact revenue, yyyymm render.
    "orders_cohort" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    (year(o_orderdate) * 12 + month(o_orderdate) - 1)::int AS mk,
        |    floor(o_totalprice * 100)::bigint AS cents
        |  FROM orders),
        |g AS (
        |  SELECT o_custkey, mk, cents,
        |    min(mk) OVER (PARTITION BY o_custkey) AS cohort_mk
        |  FROM o),
        |a AS (
        |  SELECT cohort_mk, (mk - cohort_mk)::int AS month_index,
        |    count(DISTINCT o_custkey)::bigint AS n_customers,
        |    count(*)::bigint AS n_orders,
        |    sum(cents)::bigint AS cents
        |  FROM g GROUP BY 1, 2)
        |SELECT ((cohort_mk // 12) * 100 + cohort_mk % 12 + 1)::int AS cohort_month,
        |  month_index, n_customers, n_orders,
        |  round(cents / 100.0, 2) AS revenue
        |FROM a
        |ORDER BY cohort_month, month_index""".stripMargin,

    // B supplier scorecard: two-level aggregate mirrored structurally
    // (finer (supp, order) grain first ⇒ count(*) is the distinct
    // order count with no Expand); integer cents/counts, shares as
    // single mirrored divisions. Late threshold single-sourced from
    // Lifecycle.ScorecardLateDays.
    "supplier_scorecard" -> {
      val late = graft.operators.Lifecycle.ScorecardLateDays
      s"""WITH f AS (
         |  SELECT l_suppkey, l.l_orderkey,
         |    count(*)::bigint AS lines,
         |    sum(floor(l_extendedprice * (1 - l_discount) * 100)::bigint)
         |      AS cents,
         |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::bigint
         |      AS rets,
         |    sum(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
         |             > $late THEN 1 ELSE 0 END)::bigint AS lates,
         |    sum(floor(l_discount * 10000 + 0.5)::bigint) AS dbp
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  GROUP BY 1, 2),
         |s AS (
         |  SELECT l_suppkey, count(*)::bigint AS n_orders,
         |    sum(lines)::bigint AS n_lines, sum(cents)::bigint AS cents,
         |    sum(rets)::bigint AS rets, sum(lates)::bigint AS lates,
         |    sum(dbp)::bigint AS dbp
         |  FROM f GROUP BY 1)
         |SELECT s_suppkey, s_name, n_name, n_orders, n_lines,
         |  round(cents / 100.0, 2) AS revenue,
         |  round(dbp / (n_lines * 10000.0), 4) AS avg_discount,
         |  round(rets::double / n_lines, 4) AS return_share,
         |  round(lates::double / n_lines, 4) AS late_share
         |FROM s JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |ORDER BY s_suppkey""".stripMargin
    },

    // B Pareto/ABC: integer-cents cumulative fold over the per-customer
    // aggregate; the A/B/C cut is pure integer algebra (2·cum ≤ total,
    // 5·cum ≤ 4·total) so no double threshold can flake cross-engine.
    "orders_pareto" ->
      """WITH c AS (
        |  SELECT o_custkey AS cust_key,
        |    sum(floor(o_totalprice * 100)::bigint) AS rev_cents
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(rev_cents) AS total_cents FROM c),
        |w AS (
        |  SELECT cust_key, rev_cents,
        |    sum(rev_cents) OVER (ORDER BY rev_cents DESC, cust_key
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
        |  FROM c)
        |SELECT cust_key,
        |  round(rev_cents / 100.0, 2) AS revenue,
        |  round(cum_cents::double / total_cents, 4) AS cum_share,
        |  CASE WHEN cum_cents * 2 <= total_cents THEN 'A'
        |       WHEN cum_cents * 5 <= total_cents * 4 THEN 'B'
        |       ELSE 'C' END AS pareto_class
        |FROM w, t
        |ORDER BY revenue DESC, cust_key""".stripMargin,

    // B custom-operator demo: the TopKPerKey heap plan must equal the
    // window-rank form it replaces (rank on (price DESC, orderkey) —
    // a total order, so both engines and both plans agree exactly).
    "topk_per_key" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,

    // B decorrelated correlated subquery: the above-own-average flag
    // is pure integer algebra (cents·n > Σ) — a double `price > avg`
    // can flip on rows equal to a non-representable mean.
    "orders_above_avg" ->
      """WITH o AS (
        |  SELECT o_custkey AS cust_key,
        |    floor(o_totalprice * 100)::bigint AS cents
        |  FROM orders),
        |w AS (
        |  SELECT cust_key, cents,
        |    count(*) OVER (PARTITION BY cust_key) AS n,
        |    sum(cents) OVER (PARTITION BY cust_key) AS tot
        |  FROM o),
        |a AS (
        |  SELECT cust_key, count(*) AS n_orders,
        |    sum(CASE WHEN cents * n > tot THEN 1 ELSE 0 END) AS n_above,
        |    max(round(tot / (n * 100.0), 4)) AS avg_price
        |  FROM w GROUP BY 1)
        |SELECT cust_key, n_orders::bigint AS n_orders,
        |  n_above::bigint AS n_above, avg_price,
        |  round(n_above::double / n_orders, 4) AS share_above
        |FROM a ORDER BY cust_key""".stripMargin,

    // B year-over-year growth (Lifecycle.ordersYoy): cents-exact
    // monthly revenue, growth = exact bigint numerator over ONE
    // double division per side; months without a prior-year
    // counterpart are NULL via the left join.
    "orders_yoy" ->
      """WITH m AS (
        |  SELECT year(o_orderdate)::int AS yr,
        |    month(o_orderdate)::int AS mo,
        |    sum(floor(o_totalprice * 100)::bigint) AS rev_cents,
        |    count(*)::bigint AS n_orders
        |  FROM orders GROUP BY 1, 2)
        |SELECT a.yr, a.mo,
        |  round(a.rev_cents / 100.0, 2) AS revenue, a.n_orders,
        |  round(((a.rev_cents - b.rev_cents) * 100)::double
        |        / b.rev_cents::double, 4) AS yoy_pct
        |FROM m a LEFT JOIN m b ON a.yr = b.yr + 1 AND a.mo = b.mo
        |ORDER BY a.yr, a.mo""".stripMargin,

    // B gaps-and-islands: mk − row_number is constant within a run of
    // consecutive active months; all integer.
    "orders_streaks" ->
      """WITH m AS (
        |  SELECT DISTINCT o_custkey AS cust_key,
        |    (year(o_orderdate) * 12 + month(o_orderdate) - 1)::int AS mk
        |  FROM orders),
        |i AS (
        |  SELECT cust_key,
        |    mk - row_number() OVER (PARTITION BY cust_key ORDER BY mk) AS isl
        |  FROM m),
        |g AS (SELECT cust_key, isl, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT cust_key, sum(len)::bigint AS n_months,
        |  count(*)::bigint AS n_streaks, max(len)::bigint AS max_streak
        |FROM g GROUP BY 1
        |ORDER BY cust_key""".stripMargin,

    // B time-weighted average: Σ cents·dur and Σ dur exact integers
    // off one user window; the final division is the only double.
    // Single-event users have no dwell → NULL twap.
    "events_twap" ->
      """WITH e AS (
        |  SELECT user_id, epoch(date_trunc('second', ts))::bigint AS ep,
        |    event_id, floor(value * 100)::bigint AS cents
        |  FROM events),
        |d AS (
        |  SELECT user_id, cents,
        |    lead(ep) OVER (PARTITION BY user_id
        |                   ORDER BY ep, event_id) - ep AS dur
        |  FROM e),
        |a AS (
        |  SELECT user_id, count(*) AS n_events,
        |    coalesce(sum(dur), 0) AS dur_sec, sum(cents * dur) AS wsum
        |  FROM d GROUP BY 1)
        |SELECT user_id, n_events::bigint AS n_events,
        |  dur_sec::bigint AS dur_sec,
        |  CASE WHEN dur_sec = 0 THEN NULL
        |       ELSE round(wsum / (dur_sec * 100.0), 4) END AS twap
        |FROM a ORDER BY user_id""".stripMargin,

    // B rolling distinct users: uniques don't add, so wau is the
    // contribute-forward explode (each active (user, day) visible to
    // the next 7 days) + one distinct per target day. Window width
    // single-sourced from Lifecycle.RollingWindowDays.
    "events_rolling_uniques" -> {
      val wnd = graft.operators.Lifecycle.RollingWindowDays
      s"""WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    (epoch(date_trunc('second', ts))::bigint // 86400) AS day
        |  FROM events),
        |d AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |tg AS (
        |  SELECT user_id, day + g.g AS day
        |  FROM ud CROSS JOIN (SELECT unnest(range(0, $wnd)) AS g) g),
        |w AS (SELECT day, count(DISTINCT user_id) AS wau_7
        |      FROM tg GROUP BY 1)
        |SELECT d.day, d.dau::bigint AS dau, w.wau_7::bigint AS wau_7,
        |  round(d.dau::double / w.wau_7, 4) AS stickiness
        |FROM d JOIN w ON d.day = w.day
        |ORDER BY d.day""".stripMargin
    },

    // B SLA datasheet: integer day latencies off the orderkey join;
    // quantile_cont == Spark percentile (the q23 contract); threshold
    // single-sourced from Lifecycle.SlaDays.
    "orders_sla" -> {
      val k = graft.operators.Lifecycle.SlaDays
      s"""WITH lat AS (
         |  SELECT o.o_orderpriority,
         |    datediff('day', o.o_orderdate, l.l_shipdate)::bigint AS lat
         |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
         |SELECT o_orderpriority, count(*)::bigint AS n_lines,
         |  sum(CASE WHEN lat <= $k THEN 1 ELSE 0 END)::bigint AS n_ontime,
         |  round(sum(CASE WHEN lat <= $k THEN 1 ELSE 0 END)::double
         |        / count(*), 4) AS ontime_frac,
         |  round(quantile_cont(lat, 0.5), 4) AS p50_days,
         |  round(quantile_cont(lat, 0.9), 4) AS p90_days
         |FROM lat GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // B seasonality: χ² vs uniform reduced to (k·Σo² − N²)/N — integer
    // numerator, one division; peaks via struct max, earliest-bin
    // tiebreak. dow 0 = Monday ((epoch_day + 3) % 7).
    "events_seasonality" ->
      """WITH e AS (
        |  SELECT event_type,
        |    epoch(date_trunc('second', ts))::bigint AS ep
        |  FROM events),
        |d AS (SELECT event_type, ((ep // 86400) + 3) % 7 AS dow,
        |        (ep // 3600) % 24 AS hour
        |      FROM e),
        |c0 AS MATERIALIZED (SELECT event_type, dow, hour, count(*)::bigint AS c
        |       FROM d GROUP BY 1, 2, 3),
        |dw AS (SELECT event_type, dow, sum(c)::bigint AS c
        |       FROM c0 GROUP BY 1, 2),
        |hr AS (SELECT event_type, hour, sum(c)::bigint AS c
        |       FROM c0 GROUP BY 1, 2),
        |da AS (SELECT event_type, sum(c) AS n, sum(c * c) AS s2,
        |         max({'c': c, 'negb': -dow}) AS pk
        |       FROM dw GROUP BY 1),
        |ha AS (SELECT event_type, sum(c * c) AS s2,
        |         max({'c': c, 'negb': -hour}) AS pk
        |       FROM hr GROUP BY 1)
        |SELECT da.event_type, da.n::bigint AS n,
        |  (-(da.pk.negb))::int AS peak_dow,
        |  round((7 * da.s2 - da.n * da.n)::double / da.n, 4) AS chi2_dow,
        |  (-(ha.pk.negb))::int AS peak_hour,
        |  round((24 * ha.s2 - da.n * da.n)::double / da.n, 4) AS chi2_hour
        |FROM da JOIN ha USING (event_type)
        |ORDER BY da.event_type""".stripMargin,

    // B backlog: interval-stabbing deltas (+1 start day, −1 last-ship
    // day) prefix-summed over the dense global day grid; lineless
    // orders never close. All integer.
    "orders_backlog" ->
      """WITH starts AS (
        |  SELECT datediff('day', DATE '1970-01-01', o_orderdate)::bigint
        |      AS day,
        |    count(*)::bigint AS opened
        |  FROM orders GROUP BY 1),
        |lastship AS (
        |  SELECT l_orderkey,
        |    max(datediff('day', DATE '1970-01-01', l_shipdate))::bigint
        |      AS cday
        |  FROM lineitem GROUP BY 1),
        |closes AS (SELECT cday, count(*)::bigint AS closed
        |           FROM lastship GROUP BY 1),
        |deltas AS MATERIALIZED (
        |  SELECT coalesce(s.day, c.cday) AS day,
        |    coalesce(s.opened, 0)::bigint AS opened,
        |    coalesce(c.closed, 0)::bigint AS closed
        |  FROM starts s FULL JOIN closes c ON c.cday = s.day),
        |rng AS (SELECT min(day) AS d0, max(day) AS d1 FROM deltas),
        |grid AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM rng),
        |j AS (
        |  SELECT g.day, coalesce(d.opened, 0)::bigint AS opened,
        |    coalesce(d.closed, 0)::bigint AS closed
        |  FROM grid g LEFT JOIN deltas d USING (day))
        |SELECT day, opened, closed,
        |  (sum(opened) OVER w - sum(closed) OVER w)::bigint AS backlog
        |FROM j
        |WINDOW w AS (ORDER BY day
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,

    // B CUSUM change point: integer argmax of N·prefix − i·S over the
    // dense per-type day grid (struct max == Spark), the single
    // division only in the reported magnitude.
    "events_changepoint" ->
      """WITH e AS (
        |  SELECT event_type,
        |    epoch(date_trunc('second', ts))::bigint // 86400 AS day
        |  FROM events),
        |daily AS MATERIALIZED (SELECT event_type, day, count(*)::bigint AS c
        |          FROM e GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(day) AS d0, max(day) AS d1
        |        FROM daily GROUP BY 1),
        |grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day
        |         FROM rng),
        |dense AS (SELECT g.event_type, g.day, coalesce(d.c, 0)::bigint AS c
        |          FROM grid g LEFT JOIN daily d USING (event_type, day)),
        |scanned AS (
        |  SELECT event_type, day, c,
        |    count(*) OVER wr AS i, sum(c) OVER wr AS prefix,
        |    count(*) OVER wa AS n_days, sum(c) OVER wa AS total
        |  FROM dense
        |  WINDOW wr AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wa AS (PARTITION BY event_type)),
        |dev AS (SELECT event_type, day, n_days, total,
        |          n_days * prefix - i * total AS nc,
        |          abs(n_days * prefix - i * total) AS dev
        |        FROM scanned),
        |best AS (SELECT event_type, max(n_days) AS n_days,
        |           max(total) AS total,
        |           max({'dev': dev, 'negday': -day, 'nc': nc}) AS b
        |         FROM dev GROUP BY 1)
        |SELECT event_type, n_days::bigint AS n_days, total::bigint AS total,
        |  (-(b.negday))::bigint AS cp_day, sign(b.nc)::int AS side,
        |  round(b.dev::double / n_days, 4) AS cusum_dev
        |FROM best ORDER BY event_type""".stripMargin,

    // B OLS daily-volume trend + point forecast (Lifecycle
    // .eventsTrend): the fit reduces to exact integer sums over the
    // active-day counts — n, Σx, Σy, Σxy, Σx² all bigint (day ~2e4,
    // counts ≤ ~7e3/day at sf1: Σy·Σx² ≈ 2.6e15, the largest product,
    // fits bigint to ~sf100) — and slope/forecast are single rational
    // expressions with ONE ::double cast each side of the division,
    // IEEE-identical cross-engine. Mirrors the Spark long algebra
    // term for term.
    // B inter-arrival stats: integer lead gaps off one
    // (user, type) window; ONE quantile_cont array call (the q23
    // shared-buffer / interpolation-bit-equality pattern); mean is
    // one bigint/bigint division.
    "events_interarrival" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch(date_trunc('second', ts))::bigint AS ep
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |    lead(ep) OVER (PARTITION BY user_id, event_type
        |                   ORDER BY ep, event_id) - ep AS gap
        |  FROM ev),
        |a AS (
        |  SELECT event_type, count(*)::bigint AS n_gaps,
        |    sum(gap)::bigint AS total_gap_s,
        |    quantile_cont(gap, [0.5, 0.9]) AS q,
        |    max(gap)::bigint AS max_gap_s
        |  FROM g WHERE gap IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n_gaps, total_gap_s,
        |  round(total_gap_s / n_gaps, 4) AS mean_gap_s,
        |  round(q[1], 4) AS p50_gap_s,
        |  round(q[2], 4) AS p90_gap_s,
        |  max_gap_s
        |FROM a ORDER BY event_type""".stripMargin,

    // B burstiness (Lifecycle.eventsBurstiness): order-free integer
    // sums; μ/σ/B assembled in mirrored double expressions with one
    // cast per operand side (events_trend discipline), sqrt
    // IEEE-exact ⇒ full hash gate.
    "events_burstiness" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch(date_trunc('second', ts))::bigint AS ep
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |    lead(ep) OVER (PARTITION BY user_id, event_type
        |                   ORDER BY ep, event_id) - ep AS gap
        |  FROM ev),
        |a AS (
        |  SELECT event_type, count(*)::bigint AS n,
        |    sum(gap)::bigint AS sg, sum(gap * gap)::bigint AS sgg
        |  FROM g WHERE gap IS NOT NULL GROUP BY event_type),
        |f AS (SELECT * FROM a WHERE n >= 2)
        |SELECT event_type, n AS n_gaps,
        |  round(sg::double / n::double, 4) AS mean_gap_s,
        |  round(sqrt((n::double * sgg::double - sg::double * sg::double)
        |    / (n::double * n::double)), 4) AS sd_gap_s,
        |  round((sqrt((n::double * sgg::double - sg::double * sg::double)
        |      / (n::double * n::double)) - sg::double / n::double) /
        |    (sqrt((n::double * sgg::double - sg::double * sg::double)
        |      / (n::double * n::double)) + sg::double / n::double), 6)
        |    AS burstiness
        |FROM f ORDER BY event_type""".stripMargin,

    // B first-order Markov transition matrix (Lifecycle
    // .eventsMarkov): adjacency from one per-user lead over the
    // unique (ep, event_id) total order; bigint counts; ONE
    // bigint/bigint IEEE division per row ⇒ full hash gate.
    "events_markov" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch(date_trunc('second', ts))::bigint AS ep
        |  FROM events),
        |pairs AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ep, event_id) AS to_type
        |  FROM ev),
        |m AS (
        |  SELECT from_type, to_type, count(*)::bigint AS n
        |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(n / sum(n) OVER (PARTITION BY from_type), 4) AS p_next
        |FROM m ORDER BY from_type, to_type""".stripMargin,

    // B Kaplan-Meier signup→purchase survival (Lifecycle
    // .eventsSurvival): n_risk is exact integer algebra; the product
    // limit is a STRICT ordered product of (1 − d/n_risk) — list()
    // OVER the day frame + seedless list_reduce multiply, matching
    // Spark's collect_list + seeded fold (1.0·f₁ = f₁ exactly).
    // Division and multiplication are correctly rounded IEEE ops, so
    // the value is bit-identical across engines/libm — the r13
    // exp∘Σln form flaked a round(4) half boundary on the driver box.
    // n_risk is ::bigint-forced: an un-cast integer sum() OVER ()
    // is HUGEINT, whose Python materialization differs across DuckDB
    // versions (float64 vs object int) and flips the value hash with
    // zero numeric drift — the r14 driver-box failure. OracleTypeSpec
    // pins the portable-type contract for every oracle output column.
    "events_survival" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    epoch(date_trunc('second', ts))::bigint AS ep
        |  FROM events),
        |su AS (SELECT user_id, min(ep) AS t0 FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (
        |  SELECT s.user_id, min(e.ep) AS tp
        |  FROM su s JOIN ev e ON e.user_id = s.user_id
        |  WHERE e.event_type = 'purchase' AND e.ep >= s.t0
        |  GROUP BY 1),
        |mx AS (SELECT max(ep) AS tmax FROM ev),
        |subj AS (
        |  SELECT CASE WHEN p.tp IS NOT NULL
        |           THEN (p.tp - s.t0) // 86400
        |           ELSE (m.tmax - s.t0) // 86400 END AS day,
        |    CASE WHEN p.tp IS NOT NULL THEN 1 ELSE 0 END AS died
        |  FROM su s LEFT JOIN pu p USING (user_id) CROSS JOIN mx m),
        |byday AS (
        |  SELECT day, sum(died)::bigint AS d,
        |    sum(1 - died)::bigint AS c
        |  FROM subj GROUP BY 1),
        |r AS (
        |  SELECT day, d,
        |    (sum(d + c) OVER () -
        |      coalesce(sum(d + c) OVER (ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |        0))::bigint AS n_risk
        |  FROM byday)
        |SELECT day, n_risk, d AS n_deaths,
        |  round(list_reduce(list(1 - d / n_risk) OVER w,
        |    (u, v) -> u * v), 4) AS survival
        |FROM r WHERE d > 0
        |WINDOW w AS (ORDER BY day
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,

    "events_trend" -> {
      val h = graft.operators.Lifecycle.TrendHorizonDays
      s"""WITH e AS (
        |  SELECT event_type,
        |    epoch(date_trunc('second', ts))::bigint // 86400 AS day
        |  FROM events),
        |daily AS (SELECT event_type, day, count(*)::bigint AS c
        |          FROM e GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, count(*)::bigint AS n,
        |    sum(day)::bigint AS sx, sum(c)::bigint AS sy,
        |    sum(day * c)::bigint AS sxy,
        |    sum(day * day)::bigint AS sxx,
        |    max(day)::bigint AS d1
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n AS n_days, d1,
        |  CASE WHEN n >= 2 THEN
        |    round((n * sxy - sx * sy)::double /
        |          (n * sxx - sx * sx)::double, 6) END AS slope,
        |  CASE WHEN n >= 2 THEN
        |    round(((sy * sxx - sx * sxy) +
        |           (n * sxy - sx * sy) * (d1 + $h))::double /
        |          (n * sxx - sx * sx)::double, 4) END AS fc_d$h
        |FROM s ORDER BY event_type""".stripMargin
    },

    // B daily forecast grid (Lifecycle.eventsForecast): the SAME
    // trend sufficient statistics, line evaluated at every horizon
    // day — numerator in exact bigint algebra, one ::double cast per
    // side of the division (the events_trend discipline).
    "events_forecast" -> {
      val h = graft.operators.Lifecycle.TrendHorizonDays
      s"""WITH e AS (
        |  SELECT event_type,
        |    epoch(date_trunc('second', ts))::bigint // 86400 AS day
        |  FROM events),
        |daily AS (SELECT event_type, day, count(*)::bigint AS c
        |          FROM e GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, count(*)::bigint AS n,
        |    sum(day)::bigint AS sx, sum(c)::bigint AS sy,
        |    sum(day * c)::bigint AS sxy,
        |    sum(day * day)::bigint AS sxx,
        |    max(day)::bigint AS d1
        |  FROM daily GROUP BY 1),
        |f AS (
        |  SELECT event_type,
        |    (n * sxy - sx * sy)::bigint AS s_num,
        |    (sy * sxx - sx * sxy)::bigint AS i_num,
        |    (n * sxx - sx * sx)::bigint AS den, d1
        |  FROM s WHERE n >= 2),
        |g AS (
        |  SELECT event_type, s_num, i_num, den,
        |    unnest(range(d1 + 1, d1 + $h + 1)) AS day
        |  FROM f)
        |SELECT event_type, day::bigint AS day,
        |  round((i_num + s_num * day)::double / den::double, 4) AS yhat
        |FROM g ORDER BY event_type, day""".stripMargin
    },

    // B daily-grid LOCF resample: per-day last sample via named-struct
    // max (DuckDB row order == Spark struct order), dense grid via
    // range unnest, carry via IGNORE NULLS last_value. All integer.
    // B lag-k autocorrelation: all six aggregates are order-free
    // integer sums over the dense zero-filled day grid; each converts
    // to double ONCE and the Pearson expression mirrors the Spark
    // plan op-for-op (the ::double hops also dodge bigint overflow).
    "events_autocorr" -> {
      val maxLag = graft.operators.Lifecycle.AutocorrMaxLag
      raw"""WITH daily AS MATERIALIZED (
         |  SELECT epoch(date_trunc('second', ts))::bigint // 86400 AS day,
         |    count(*)::bigint AS v
         |  FROM events GROUP BY day),
         |rng AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         |series AS MATERIALIZED (
         |  SELECT g.day, coalesce(daily.v, 0)::bigint AS v
         |  FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM rng) g
         |  LEFT JOIN daily USING (day)),
         |stats AS (
         |  SELECT l.lag, count(*)::bigint AS n,
         |    sum(x.v)::bigint AS sx, sum(y.v)::bigint AS sy,
         |    sum(x.v * x.v)::bigint AS sxx, sum(y.v * y.v)::bigint AS syy,
         |    sum(x.v * y.v)::bigint AS sxy
         |  FROM (SELECT unnest(range(1, ${maxLag + 1})) AS lag) l
         |  JOIN series y ON true
         |  JOIN series x ON x.day = y.day + l.lag
         |  GROUP BY l.lag)
         |SELECT lag::int AS lag, n::int AS n,
         |  round((n::double * sxy - sx::double * sy)
         |    / (sqrt(n::double * sxx - sx::double * sx)
         |       * sqrt(n::double * syy - sy::double * sy)), 6) AS r
         |FROM stats
         |WHERE (n::double * sxx - sx::double * sx) > 0.0
         |  AND (n::double * syy - sy::double * sy) > 0.0
         |ORDER BY lag""".stripMargin
    },

    "events_resample" ->
      """WITH e AS (
        |  SELECT user_id, epoch(date_trunc('second', ts))::bigint AS ep,
        |    event_id, floor(value * 100)::bigint AS cents
        |  FROM events),
        |d AS (SELECT user_id, ep // 86400 AS day, ep, event_id, cents
        |      FROM e),
        |agg AS MATERIALIZED (
        |  SELECT user_id, day, count(*)::bigint AS n_events,
        |    max({'ep': ep, 'eid': event_id, 'cents': cents}).cents
        |      AS last_cents
        |  FROM d GROUP BY 1, 2),
        |rng AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |        FROM agg GROUP BY 1),
        |grid AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day
        |         FROM rng),
        |j AS (
        |  SELECT g.user_id, g.day,
        |    coalesce(a.n_events, 0)::bigint AS n_events, a.last_cents
        |  FROM grid g LEFT JOIN agg a USING (user_id, day))
        |SELECT user_id, day, n_events,
        |  last_value(last_cents IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS locf_cents
        |FROM j ORDER BY user_id, day""".stripMargin,

    // B basket mining: distinct-membership self-join with the same
    // A-priori item prune; confidences/lift are single divisions of
    // integer products, mirrored op-for-op. s single-sourced from
    // Lifecycle.BasketMinOrders.
    "orders_basket" -> {
      val s = graft.operators.Lifecycle.BasketMinOrders
      s"""WITH b AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p
         |  FROM lineitem),
         |n AS (SELECT count(DISTINCT k)::bigint AS n_orders FROM b),
         |supp AS MATERIALIZED (SELECT p, count(*)::bigint AS n_item FROM b
         |         GROUP BY p HAVING count(*) >= $s),
         |fb AS MATERIALIZED (SELECT b.k, b.p FROM b JOIN supp ON supp.p = b.p),
         |pairs AS (
         |  SELECT a.p AS pa, b2.p AS pb, count(*)::bigint AS n_ab
         |  FROM fb a JOIN fb b2 ON a.k = b2.k AND a.p < b2.p
         |  GROUP BY 1, 2 HAVING count(*) >= $s)
         |SELECT pa AS part_a, pb AS part_b, n_ab,
         |  sa.n_item AS n_a, sb.n_item AS n_b,
         |  round(n_ab::double / sa.n_item, 4) AS conf_ab,
         |  round(n_ab::double / sb.n_item, 4) AS conf_ba,
         |  round((n_ab * (SELECT n_orders FROM n))::double /
         |        (sa.n_item * sb.n_item), 4) AS lift
         |FROM pairs
         |JOIN supp sa ON sa.p = pa
         |JOIN supp sb ON sb.p = pb
         |ORDER BY part_a, part_b""".stripMargin
    },

    // B A/B readout: integer exposure/moment counts; means, sample
    // variances and the Welch z mirror the Spark expression tree
    // op-for-op (÷ × − and IEEE-correctly-rounded sqrt are
    // deterministic cross-engine), so z hash-gates exactly.
    "events_abtest" ->
      """WITH u AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c,
        |    (user_id % 2 = 0) AS va
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT
        |    sum(CASE WHEN va THEN 1 ELSE 0 END) AS n_a,
        |    sum(CASE WHEN va THEN c ELSE 0 END) AS s_a,
        |    sum(CASE WHEN va THEN c * c ELSE 0 END) AS q_a,
        |    sum(CASE WHEN NOT va THEN 1 ELSE 0 END) AS n_b,
        |    sum(CASE WHEN NOT va THEN c ELSE 0 END) AS s_b,
        |    sum(CASE WHEN NOT va THEN c * c ELSE 0 END) AS q_b
        |  FROM u)
        |SELECT n_a::bigint AS n_a, s_a::bigint AS purchases_a,
        |  round(s_a::double / n_a, 4) AS mean_a,
        |  n_b::bigint AS n_b, s_b::bigint AS purchases_b,
        |  round(s_b::double / n_b, 4) AS mean_b,
        |  round((s_a::double / n_a - s_b::double / n_b) /
        |    sqrt(((q_a - s_a::double * s_a / n_a) / (n_a - 1)) / n_a +
        |         ((q_b - s_b::double * s_b / n_b) / (n_b - 1)) / n_b), 4) AS z
        |FROM r""".stripMargin,

    // H FD discovery: branch per ordered pair, each count an exact
    // integer; fd_holds is integer equality. Pairs single-sourced
    // from Profile.FdCols.
    "table_fds" -> {
      val cols = graft.operators.Profile.FdCols
      val fdPairs = for { a <- cols; b <- cols if a != b } yield (a, b)
      fdPairs.map { case (a, b) =>
        s"""SELECT '$a' AS det, '$b' AS dep,
           |  (SELECT count(DISTINCT $a) FROM orders)::bigint AS n_det,
           |  (SELECT count(*) FROM (SELECT DISTINCT $a, $b FROM orders))::bigint
           |    AS n_pairs,
           |  (SELECT count(*) FROM (SELECT DISTINCT $a, $b FROM orders)) =
           |    (SELECT count(DISTINCT $a) FROM orders) AS fd_holds""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY det, dep")
    },

    // H Benford first-digit audit: digit = first char of the integer
    // part's decimal string (integer-exact, no pow/log); expected
    // probabilities are the SAME double literals the Spark plan
    // embeds (Profile.BenfordP), ::double-forced so DuckDB never
    // routes them through DECIMAL.
    "table_benford" -> {
      val ps = graft.operators.Profile.BenfordP.zipWithIndex
        .map { case (p, i) => s"(${i + 1}, ${p}::double)" }
        .mkString(", ")
      raw"""WITH obs AS (
         |  SELECT substring(floor(x)::bigint::varchar, 1, 1)::int AS digit,
         |    count(*)::bigint AS n_obs
         |  FROM (SELECT l_extendedprice AS x FROM lineitem
         |        WHERE l_extendedprice >= 1.0)
         |  GROUP BY digit),
         |d(digit, p) AS (VALUES $ps),
         |j AS (
         |  SELECT d.digit, coalesce(obs.n_obs, 0)::bigint AS n_obs, d.p
         |  FROM d LEFT JOIN obs USING (digit)),
         |t AS (SELECT *, (sum(n_obs) OVER ())::bigint AS total FROM j)
         |SELECT digit, n_obs,
         |  round(n_obs / total, 6) AS obs_share,
         |  round(p, 6) AS benford_p,
         |  round((n_obs - p * total) * (n_obs - p * total) / (p * total), 4)
         |    AS chi2_term
         |FROM t ORDER BY digit""".stripMargin
    },

    // H k-anonymity: per-QI class sizes then a 1-row rollup, one
    // branch per QI set; pure integer counts + one division.
    "table_kanon" -> {
      val P = graft.operators.Profile
      val blocks = P.KanonQis.map { qi =>
        val cols = qi.mkString(", ")
        s"""SELECT '${qi.mkString(",")}' AS qi,
           |  sum(cls)::bigint AS n_rows, count(*)::bigint AS n_classes,
           |  min(cls)::bigint AS min_class,
           |  (min(cls) >= ${P.KanonK}) AS k_anonymous,
           |  sum(CASE WHEN cls < ${P.KanonK} THEN cls ELSE 0
           |      END)::bigint AS n_rows_at_risk,
           |  round(sum(CASE WHEN cls < ${P.KanonK} THEN cls ELSE 0
           |      END)::bigint / sum(cls)::bigint, 6) AS risk_share
           |FROM (SELECT count(*)::bigint AS cls FROM src
           |      GROUP BY $cols)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH src AS (
         |  SELECT o_orderpriority, o_orderstatus, c_mktsegment,
         |    c_nationkey
         |  FROM orders JOIN customer ON o_custkey = c_custkey)
         |$blocks
         |ORDER BY qi""".stripMargin
    },

    // H Cramér's V: integer contingency cells, margins as window
    // sums over the cells, χ² a strict sequential list_reduce fold
    // in (x,y) order mirroring the Spark aggregate HOF; expected
    // counts go double BEFORE the ri·cj product (mirrored). Zero
    // cells' χ² mass recovered analytically: fold((n-e)²/e − e) + n
    // (Σ_zero e = n − Σ_exist e) — no densifying cross join.
    "table_cramers_v" -> {
      val blocks = graft.operators.Profile.CramersPairs.map {
        case (a, b) =>
          s"""SELECT '$a' AS col_x, '$b' AS col_y, n, dof,
             |  round(chi2, 4) AS chi2,
             |  round(sqrt(chi2 / (n * least_rc)), 6) AS cramers_v
             |FROM (
             |  SELECT max(n)::bigint AS n,
             |    ((count(DISTINCT x) - 1) * (count(DISTINCT y) - 1))::int
             |      AS dof,
             |    least(count(DISTINCT x) - 1, count(DISTINCT y) - 1)
             |      AS least_rc,
             |    list_reduce(list(term ORDER BY x, y), (u, v) -> u + v)
             |      + max(n)::bigint AS chi2
             |  FROM (
             |    SELECT x, y, n,
             |      (nij - (ri::double * cj) / n)
             |        * (nij - (ri::double * cj) / n)
             |        / ((ri::double * cj) / n)
             |        - (ri::double * cj) / n AS term
             |    FROM (
             |      SELECT x, y, nij,
             |        sum(nij) OVER (PARTITION BY x)::bigint AS ri,
             |        sum(nij) OVER (PARTITION BY y)::bigint AS cj,
             |        sum(nij) OVER ()::bigint AS n
             |      FROM (SELECT $a AS x, $b AS y, count(*)::bigint AS nij
             |            FROM src GROUP BY 1, 2))))""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH src AS (
         |  SELECT o_orderpriority, o_orderstatus, c_mktsegment
         |  FROM orders JOIN customer ON o_custkey = c_custkey)
         |$blocks
         |ORDER BY col_x, col_y""".stripMargin
    },

    // H candidate keys (Profile.tableKeys): one distinct-count
    // branch per candidate set, pure integer algebra ⇒ full hash.
    "table_keys" -> {
      val blocks = graft.operators.Profile.KeyCandidates.map { cols =>
        val cl = cols.mkString(", ")
        s"""SELECT '${cols.mkString(",")}' AS candidate,
           |  count(*)::bigint AS n_rows,
           |  count(DISTINCT ($cl))::bigint AS n_distinct,
           |  count(*)::bigint - count(DISTINCT ($cl))::bigint
           |    AS n_dup_rows,
           |  count(*) = count(DISTINCT ($cl)) AS is_key
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"$blocks\nORDER BY candidate"
    },

    // H declarative DQ rule report (Profile.tableDqRules): one
    // sum-of-indicator block per rule, FK = anti-join count,
    // uniqueness = distinct count; pure integer ⇒ full hash gate.
    "table_dq_rules" ->
      """WITH blocks AS (
        |  SELECT 'orders' AS tbl, 'totalprice_positive' AS rule,
        |    count(*)::bigint AS n_rows,
        |    sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
        |        THEN 1 ELSE 0 END)::bigint AS n_violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders', 'status_in_domain', count(*)::bigint,
        |    sum(CASE WHEN o_orderstatus IS NULL
        |             OR o_orderstatus NOT IN ('F', 'O', 'P')
        |        THEN 1 ELSE 0 END)::bigint
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders', 'orderdate_not_null', count(*)::bigint,
        |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::bigint
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem', 'quantity_in_range', count(*)::bigint,
        |    sum(CASE WHEN l_quantity IS NULL
        |             OR NOT (l_quantity >= 1 AND l_quantity <= 50)
        |        THEN 1 ELSE 0 END)::bigint
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem', 'discount_in_range', count(*)::bigint,
        |    sum(CASE WHEN l_discount IS NULL
        |             OR NOT (l_discount >= 0 AND l_discount <= 0.1)
        |        THEN 1 ELSE 0 END)::bigint
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'customer', 'name_not_blank', count(*)::bigint,
        |    sum(CASE WHEN c_name IS NULL OR length(c_name) = 0
        |        THEN 1 ELSE 0 END)::bigint
        |  FROM customer
        |  UNION ALL
        |  SELECT 'lineitem', 'fk_orderkey_exists',
        |    (SELECT count(*) FROM lineitem)::bigint,
        |    (SELECT count(*) FROM lineitem l
        |     LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |     WHERE o.o_orderkey IS NULL)::bigint
        |  UNION ALL
        |  SELECT 'orders', 'orderkey_unique', count(*)::bigint,
        |    (count(*) - count(DISTINCT o_orderkey))::bigint
        |  FROM orders)
        |SELECT tbl, rule, n_rows, n_violations,
        |  n_violations = 0 AS pass
        |FROM blocks
        |ORDER BY tbl, rule""".stripMargin,

    // H table/column fingerprints (Profile.tableChecksum): XOR of a
    // 60-bit md5 prefix per non-null value — commutative, so one
    // canonical value regardless of row order; DuckDB 0x-cast ==
    // Spark conv(,16,10) (the sample_negatives hashing contract).
    // Pure integer ⇒ full hash gate.
    "table_checksum" -> {
      val blocks = graft.operators.Profile.ChecksumCols.flatMap {
        case (tbl, cols) => cols.map { c =>
          s"""SELECT '$tbl' AS tbl, '$c' AS col_name,
             |  count(*)::bigint AS n_rows,
             |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::bigint
             |    AS n_null,
             |  bit_xor(CASE WHEN $c IS NULL THEN 0
             |    ELSE ('0x' || substr(md5($c::varchar), 1, 15))::bigint
             |    END) AS xor_sig
             |FROM $tbl""".stripMargin
        }
      }.mkString("\nUNION ALL\n")
      s"$blocks\nORDER BY tbl, col_name"
    },

    // H PSI drift (Profile.tablePsi): pure integer fixed-width
    // binning off global min/max, Laplace shares = one IEEE division
    // each, RUNNING ordered psi sum (sequential fold both engines);
    // ln is the table_entropy ulp class under round(6).
    "table_psi" -> {
      val b = graft.operators.Profile.PsiBins
      s"""WITH src AS (
         |  SELECT floor(o_totalprice * 100)::bigint AS cents,
         |    datediff('day', DATE '1970-01-01', o_orderdate)::bigint
         |      AS day
         |  FROM orders),
         |st AS (SELECT min(day) AS dmin, max(day) AS dmax,
         |    min(cents) AS cmin, max(cents) AS cmax FROM src),
         |counts AS (
         |  SELECT least($b - 1, ((cents - cmin) * $b)
         |      // (cmax - cmin + 1)) AS bin,
         |    sum(CASE WHEN day <= (dmin + dmax) // 2 THEN 1 ELSE 0
         |      END)::bigint AS n_ref,
         |    sum(CASE WHEN day <= (dmin + dmax) // 2 THEN 0 ELSE 1
         |      END)::bigint AS n_cur
         |  FROM src CROSS JOIN st GROUP BY 1),
         |grid AS (
         |  SELECT g.bin, cmin + (g.bin * (cmax - cmin + 1)) // $b
         |      AS bin_lo_cents,
         |    coalesce(n_ref, 0)::bigint AS n_ref,
         |    coalesce(n_cur, 0)::bigint AS n_cur
         |  FROM (SELECT unnest(range(0, $b)) AS bin) g
         |  CROSS JOIN st LEFT JOIN counts ON counts.bin = g.bin),
         |p AS (
         |  SELECT bin, bin_lo_cents, n_ref, n_cur,
         |    (n_ref + 1) / (sum(n_ref) OVER () + $b) AS p_ref,
         |    (n_cur + 1) / (sum(n_cur) OVER () + $b) AS p_cur
         |  FROM grid)
         |SELECT bin, bin_lo_cents, n_ref, n_cur,
         |  round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
         |  round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term,
         |  round(sum((p_cur - p_ref) * ln(p_cur / p_ref)) OVER (
         |    ORDER BY bin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         |    AS psi_cum
         |FROM p ORDER BY bin""".stripMargin
    },

    // H mutual information (Profile.tableMutualInfo): same cells /
    // window-margins / strict-ordered-fold shape as table_cramers_v;
    // MI term = (nij/n)·ln(nij·n / (ri·cj)), all bigint operands, one
    // IEEE division per factor; ln ulp class under round(6).
    "table_mutual_info" -> {
      val blocks = graft.operators.Profile.CramersPairs.map {
        case (a, b) =>
          s"""SELECT '$a' AS col_x, '$b' AS col_y, n, r, c,
             |  round(mi, 6) AS mi_nats,
             |  CASE WHEN least(r, c) > 1
             |    THEN round(mi / ln(least(r, c)::double), 6) END AS nmi
             |FROM (
             |  SELECT max(n)::bigint AS n,
             |    count(DISTINCT x)::int AS r, count(DISTINCT y)::int AS c,
             |    list_reduce(list(term ORDER BY x, y), (u, v) -> u + v)
             |      AS mi
             |  FROM (
             |    SELECT x, y,
             |      (nij / n) * ln((nij * n) / (ri * cj)) AS term, n
             |    FROM (
             |      SELECT x, y, nij,
             |        sum(nij) OVER (PARTITION BY x)::bigint AS ri,
             |        sum(nij) OVER (PARTITION BY y)::bigint AS cj,
             |        sum(nij) OVER ()::bigint AS n
             |      FROM (SELECT $a AS x, $b AS y, count(*)::bigint AS nij
             |            FROM src GROUP BY 1, 2))))""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH src AS (
         |  SELECT o_orderpriority, o_orderstatus, c_mktsegment
         |  FROM orders JOIN customer ON o_custkey = c_custkey)
         |$blocks
         |ORDER BY col_x, col_y""".stripMargin
    },

    // H type-2 SCD history (Scd.scd2History): change flags via lag
    // over the unique (day, o_orderkey) total order, versions a
    // running integer sum, bounds min/lead — pure integer/string
    // algebra ⇒ full hash gate.
    "scd2_history" ->
      """WITH src AS (
        |  SELECT o_custkey AS k, o_orderpriority AS attr,
        |    datediff('day', DATE '1970-01-01', o_orderdate)::bigint
        |      AS day,
        |    o_orderkey AS seq
        |  FROM orders),
        |chg AS (
        |  SELECT k, attr, day, seq,
        |    CASE WHEN lag(attr) OVER w IS NULL
        |      OR lag(attr) OVER w <> attr THEN 1 ELSE 0 END AS c
        |  FROM src WINDOW w AS (PARTITION BY k ORDER BY day, seq)),
        |runs AS (
        |  SELECT k, attr, day,
        |    sum(c) OVER (PARTITION BY k ORDER BY day, seq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      ::bigint AS version
        |  FROM chg),
        |hist AS (
        |  SELECT k, version, min(attr) AS attr,
        |    min(day) AS valid_from_day, count(*)::bigint AS n_orders
        |  FROM runs GROUP BY k, version)
        |SELECT k AS cust_key, version, attr, valid_from_day,
        |  lead(valid_from_day) OVER wv AS valid_to_day, n_orders,
        |  (lead(valid_from_day) OVER wv IS NULL) AS is_current
        |FROM hist WINDOW wv AS (PARTITION BY k ORDER BY version)
        |ORDER BY cust_key, version""".stripMargin,

    // H changelog merge (Scd.cdcMerge): snapshot = last event at or
    // before the integer corpus midpoint, final = last overall (both
    // row_number over the unique (ep, event_id) desc order); MERGE
    // ops insert/update/unchanged with the error-tombstone DELETE
    // rule mirrored. Integer algebra ⇒ full hash gate.
    "cdc_merge" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch(date_trunc('second', ts))::bigint AS ep
        |  FROM events),
        |mid AS (SELECT (min(ep) + max(ep)) // 2 AS mid FROM ev),
        |snap AS (
        |  SELECT user_id, event_type AS snap_status, ep AS snap_ep
        |  FROM (
        |    SELECT e.*, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ep DESC, event_id DESC) AS rn
        |    FROM ev e CROSS JOIN mid WHERE ep <= mid)
        |  WHERE rn = 1),
        |lastv AS (
        |  SELECT user_id, event_type AS status, ep AS last_ep
        |  FROM (
        |    SELECT e.*, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ep DESC, event_id DESC) AS rn
        |    FROM ev e)
        |  WHERE rn = 1),
        |m AS (
        |  SELECT l.user_id, l.status, l.last_ep,
        |    CASE WHEN s.snap_ep IS NULL THEN 'insert'
        |         WHEN l.last_ep > s.snap_ep THEN 'update'
        |         ELSE 'unchanged' END AS op
        |  FROM lastv l LEFT JOIN snap s ON l.user_id = s.user_id)
        |SELECT user_id, status, last_ep, op FROM m
        |WHERE NOT (op = 'update' AND status = 'error')
        |ORDER BY user_id""".stripMargin,

    // H sequence-gap audit: pure integer adjacency over the distinct
    // key set (the oracle may use the plain global lead; the Spark
    // side buckets — identical output by construction).
    "table_seq_gaps" ->
      """WITH k AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        |g AS (SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM k)
        |SELECT k + 1 AS gap_start, nk - 1 AS gap_end,
        |  nk - k - 1 AS gap_len
        |FROM g WHERE nk - k > 1
        |ORDER BY gap_start""".stripMargin,

    // H freshness panel (Profile.tableFreshness): epoch-second
    // integer algebra per event_type; the corpus watermark comes off
    // the aggregated frame; one mirrored double division for the
    // daily rate, NULL on zero span.
    "table_freshness" ->
      """WITH e AS (
        |  SELECT event_type,
        |    epoch(date_trunc('second', ts))::bigint AS ep
        |  FROM events),
        |p AS (
        |  SELECT event_type, count(*)::bigint AS n_events,
        |    min(ep) AS first_sec, max(ep) AS last_sec
        |  FROM e GROUP BY 1),
        |t AS (SELECT max(last_sec) AS tmax FROM p)
        |SELECT event_type, n_events, last_sec,
        |  (tmax - last_sec)::bigint AS lag_sec,
        |  (last_sec - first_sec)::bigint AS span_sec,
        |  CASE WHEN last_sec > first_sec THEN
        |    round((n_events * 86400)::double
        |          / (last_sec - first_sec)::double, 4)
        |  END AS per_day
        |FROM p, t ORDER BY event_type""".stripMargin,

    // H Gini: every sum an order-free integer (cents, row_number
    // ranks over the (total, custkey) total order), one final
    // mirrored double expression.
    "table_gini" ->
      """WITH pc AS (
        |  SELECT o.o_custkey,
        |    sum(floor(l_extendedprice * (1 - l_discount) * 100)::bigint)
        |      ::bigint AS cents
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY o.o_custkey),
        |rk AS (
        |  SELECT c.c_mktsegment, pc.cents,
        |    row_number() OVER (PARTITION BY c.c_mktsegment
        |      ORDER BY pc.cents, c.c_custkey) AS rk
        |  FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey),
        |agg AS (
        |  SELECT c_mktsegment, count(*)::bigint AS n,
        |    sum(cents)::bigint AS s0, sum(rk * cents)::bigint AS s1
        |  FROM rk GROUP BY c_mktsegment)
        |SELECT c_mktsegment AS segment, n::int AS n_customers,
        |  s0 AS total_cents,
        |  round((2.0::double * s1 - (n + 1)::double * s0)
        |    / (n::double * s0), 6) AS gini
        |FROM agg ORDER BY segment""".stripMargin,

    // H two-sample KS: integer cumulative CDFs over ordered distinct
    // values; each D factor converts to double once (mirrored), max
    // is order-free, and the α=0.05 coefficient is the same double
    // literal on both sides (no cross-engine ln).
    "table_ks" -> {
      val P = graft.operators.Profile
      val ts = P.KsTypes
      val pairs =
        for { i <- ts.indices; j <- ts.indices if i < j }
          yield (ts(i), ts(j))
      val condCols = ts.map(t =>
        s"sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)::bigint AS c_$t")
        .mkString(",\n    ")
      val cumCols = ts.map(t =>
        s"(sum(c_$t) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED " +
          s"PRECEDING AND CURRENT ROW))::bigint AS cum_$t")
        .mkString(",\n    ")
      val totCols = ts.map(t => s"sum(c_$t)::bigint AS n_$t").mkString(", ")
      val dnCols = pairs.map { case (a, b) =>
        s"max(abs(cum_$a::double * n_$b - cum_$b::double * n_$a)) " +
          s"AS dn_${a}_$b"
      }.mkString(",\n    ")
      val arms = pairs.map { case (a, b) =>
        s"SELECT '$a' AS type_a, '$b' AS type_b, n_$a AS n_a, " +
          s"n_$b AS n_b, dn_${a}_$b AS dn FROM dmax, totals"
      }.mkString("\n  UNION ALL\n  ")
      raw"""WITH counts AS MATERIALIZED (
         |  SELECT value,
         |    $condCols
         |  FROM events WHERE value IS NOT NULL GROUP BY value),
         |cum AS (
         |  SELECT value,
         |    $cumCols
         |  FROM counts),
         |totals AS MATERIALIZED (SELECT $totCols FROM counts),
         |dmax AS MATERIALIZED (
         |  SELECT
         |    $dnCols
         |  FROM cum, totals),
         |pair_rows AS (
         |  $arms)
         |SELECT type_a, type_b, n_a, n_b,
         |  round(dn / (n_a::double * n_b), 6) AS d,
         |  round(${P.KsCrit05}::double
         |    * sqrt((n_a::double + n_b) / (n_a::double * n_b)), 6)
         |    AS crit_05,
         |  (dn / (n_a::double * n_b)) > (${P.KsCrit05}::double
         |    * sqrt((n_a::double + n_b) / (n_a::double * n_b)))
         |    AS significant
         |FROM pair_rows
         |ORDER BY type_a, type_b""".stripMargin
    },

    // H robust outliers: quantile_cont ≡ Spark percentile
    // (q23-proven); score literals ::double-forced and the threshold
    // compares the unrounded double; mad > 0 guards the
    // div-by-zero IEEE/NULL divergence identically on both sides.
    "table_outliers" -> {
      val P = graft.operators.Profile
      raw"""WITH e AS (SELECT event_id, event_type, value FROM events),
         |med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
         |        FROM e GROUP BY event_type),
         |mad AS (SELECT e.event_type,
         |          quantile_cont(abs(value - med), 0.5) AS mad
         |        FROM e JOIN med USING (event_type)
         |        GROUP BY e.event_type)
         |SELECT event_id, e.event_type,
         |  round(value, 6) AS value,
         |  round(med, 4) AS med,
         |  round(mad, 4) AS mad,
         |  round(${P.MadK}::double * (value - med) / mad, 4) AS robust_z
         |FROM e JOIN med USING (event_type) JOIN mad USING (event_type)
         |WHERE mad > 0.0
         |  AND abs(${P.MadK}::double * (value - med) / mad)
         |        > ${P.MadZThreshold}::double
         |ORDER BY event_id""".stripMargin
    },

    // H column entropy + pairwise MI: both engines reduce to integer
    // counts over the SAME bounded joint cube, then one mirrored FP
    // expression per statistic (H = log2(n) − Σ c·log2(c)/n) with
    // round(4) — the corr tolerance rule. Pairs single-sourced from
    // Profile.EntropyCols; j materialized (7 references).
    "table_entropy" -> {
      val cols = graft.operators.Profile.EntropyCols
      val pairs = cols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
      def sTerm(by: String) =
        s"(SELECT sum(c * log2(c)) FROM (SELECT sum(c)::bigint AS c FROM j GROUP BY $by))"
      val head =
        s"""WITH j AS MATERIALIZED (
           |  SELECT ${cols.mkString(", ")}, count(*)::bigint AS c
           |  FROM lineitem GROUP BY ${(1 to cols.size).mkString(", ")})""".stripMargin
      val blocks = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_x, '$b' AS col_y,
           |  (SELECT count(*) FROM (SELECT $a, $b FROM j GROUP BY 1, 2))::bigint
           |    AS n_xy,
           |  round(log2(n) - ${sTerm(a)} / n, 4) AS h_x,
           |  round(log2(n) - ${sTerm(b)} / n, 4) AS h_y,
           |  round(log2(n) - ${sTerm(s"$a, $b")} / n, 4) AS h_xy,
           |  round(log2(n) + (${sTerm(s"$a, $b")} - ${sTerm(a)} - ${sTerm(b)}) / n, 4)
           |    AS mi
           |FROM (SELECT sum(c)::bigint AS n FROM j)""".stripMargin
      }
      head + "\n" +
        blocks.mkString("", "\nUNION ALL\n", "\nORDER BY col_x, col_y")
    },

    // B linear attribution (Funnel.eventsAttributionLinear): credit
    // fractions enter fixed-point BEFORE the sum (order-free
    // integers), one mirrored output division; (ep, event_id) total
    // window order both engines.
    "events_attribution_linear" -> {
      val sc = graft.operators.Funnel.AttrScale
      s"""WITH ev AS (
         |  SELECT user_id,
         |    epoch(date_trunc('second', ts))::bigint AS ep,
         |    event_id, event_type
         |  FROM events),
         |p AS (
         |  SELECT event_type,
         |    count(CASE WHEN event_type = 'view' THEN 1 END) OVER w
         |      AS nv,
         |    count(CASE WHEN event_type = 'click' THEN 1 END) OVER w
         |      AS nc
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING
         |               AND 1 PRECEDING)),
         |cr AS (SELECT nv, nc FROM p
         |       WHERE event_type = 'purchase' AND nv + nc > 0),
         |fp AS (
         |  SELECT sum((nv * $sc) // (nv + nc))::bigint AS view_fp,
         |    sum((nc * $sc) // (nv + nc))::bigint AS click_fp,
         |    count(*)::bigint AS n_purch
         |  FROM cr),
         |tt AS (
         |  SELECT
         |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::bigint
         |      AS n_views,
         |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::bigint
         |      AS n_clicks
         |  FROM ev)
         |SELECT 'click' AS touch_type, n_clicks AS n_touches,
         |  n_purch AS n_purchases_credited,
         |  round(click_fp::double / ${sc}.0, 6) AS credit
         |FROM fp CROSS JOIN tt
         |UNION ALL
         |SELECT 'view', n_views, n_purch,
         |  round(view_fp::double / ${sc}.0, 6)
         |FROM fp CROSS JOIN tt
         |ORDER BY touch_type""".stripMargin
    },

    // B robust daily anomaly (Funnel.eventsAnomalyMad): exact counts,
    // quantile_cont == Spark percentile interpolation (events_rfm
    // precedent), one mirrored IEEE z expression, MAD=0 ⇒ NULL CASE.
    "events_anomaly_mad" -> {
      val c = graft.operators.Funnel.MadZConst
      val cut = graft.operators.Funnel.MadOutlierCut
      s"""WITH daily AS (
         |  SELECT event_type,
         |    (epoch(date_trunc('second', ts))::bigint // 86400) AS day,
         |    count(*)::bigint AS cnt
         |  FROM events GROUP BY 1, 2),
         |med AS (SELECT event_type, quantile_cont(cnt, 0.5) AS med
         |        FROM daily GROUP BY 1),
         |dev AS (
         |  SELECT d.event_type, d.day, d.cnt, m.med,
         |    abs(d.cnt::double - m.med) AS adev
         |  FROM daily d JOIN med m USING (event_type)),
         |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
         |        FROM dev GROUP BY 1)
         |SELECT d.event_type, d.day, d.cnt AS n_events,
         |  round(d.med, 4) AS med, round(a.mad, 4) AS mad,
         |  CASE WHEN a.mad > 0
         |       THEN round($c * (d.cnt::double - d.med) / a.mad, 4)
         |  END AS robust_z,
         |  CASE WHEN a.mad > 0
         |       THEN abs($c * (d.cnt::double - d.med) / a.mad) > $cut
         |  END AS is_outlier
         |FROM dev d JOIN mad a USING (event_type)
         |ORDER BY d.event_type, d.day""".stripMargin
    },

    // B per-user behavioral entropy (Funnel.eventsEntropy): exact
    // integer counts, H via a STRICT type-sorted sequential fold
    // (list_reduce == Spark aggregate seeded 0.0 — IEEE 0+x is
    // exact); log2 ulp class under round(4).
    "events_entropy" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*)::bigint AS c
        |  FROM events GROUP BY 1, 2),
        |u AS (
        |  SELECT user_id, sum(c)::bigint AS n_events,
        |    count(*)::bigint AS n_types,
        |    list_reduce(
        |      list_transform(list(c ORDER BY event_type),
        |                     v -> v::double * log2(v::double)),
        |      (x, y) -> x + y) AS s
        |  FROM c GROUP BY 1)
        |SELECT user_id, n_events, n_types::int AS n_types,
        |  round(log2(n_events::double) - s / n_events, 4) AS entropy_bits,
        |  CASE WHEN n_types > 1
        |       THEN round((log2(n_events::double) - s / n_events)
        |                  / log2(n_types::double), 4)
        |  END AS evenness
        |FROM u
        |ORDER BY user_id""".stripMargin,

    // B EWMA forecast: α = 1/2 halvings over the day-sorted count
    // prefix (strict sequential fold — DuckDB's seedless list_reduce
    // == Spark's aggregate seeded with the first element), e_{d-1}
    // reconstructed exactly as 2·e_d − n_d. 1-based i here ↔ Spark's
    // 0-based pos + 1; both fold the same i-element prefix.
    "events_ewma" ->
      """WITH e AS (
        |  SELECT event_type,
        |    (epoch(date_trunc('second', ts))::bigint // 86400) AS day
        |  FROM events),
        |d AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type,
        |    list(day ORDER BY day) AS ds,
        |    list(n ORDER BY day) AS ns
        |  FROM d GROUP BY 1),
        |x AS (
        |  SELECT event_type, ds, ns,
        |    unnest(range(1, len(ns) + 1)) AS i
        |  FROM s),
        |f AS (
        |  SELECT event_type, ds[i] AS day, ns[i] AS n, i,
        |    list_reduce(list_transform(ns[1:i], v -> v::double),
        |                (x, y) -> (x + y) / 2.0) AS ewma
        |  FROM x)
        |SELECT event_type, day, n::bigint AS n,
        |  round(ewma, 4) AS ewma,
        |  CASE WHEN i = 1 THEN NULL
        |       ELSE round(n::double - (ewma * 2 - n::double), 4)
        |  END AS resid
        |FROM f
        |ORDER BY event_type, day""".stripMargin,

    // H pairwise Pearson correlation: one UNION ALL branch per pair
    // (oracle-side table re-reads are irrelevant; the Spark side is a
    // single agg pass). Pairs single-sourced from Profile.CorrCols.
    "table_corr" -> {
      val pairs = graft.operators.Profile.CorrCols.combinations(2)
        .map { case Seq(a, b) => (a, b) }.toSeq
      pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_x, '$b' AS col_y,
           |  round(corr($a, $b), 4) AS r, count(*)::bigint AS n_rows
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_x, col_y")
    },

    // C entity resolution: pair work over the distinct-name domain;
    // the length band is a complete blocking filter for edit
    // distance ≤ τ; levenshtein is the same unit-cost DP in both
    // engines — exact integer.
    "er_blocking" -> {
      val tau = graft.operators.EntityRes.ErTau
      raw"""WITH n AS (
         |  SELECT p_name AS name, length(p_name)::int AS len,
         |    count(*)::bigint AS n
         |  FROM part GROUP BY p_name),
         |cand AS (
         |  SELECT a.name AS name_a, b.name AS name_b,
         |    a.len AS len_a, b.len AS len_b, a.n AS n_a, b.n AS n_b
         |  FROM n a JOIN n b
         |    ON a.name < b.name AND abs(a.len - b.len) <= $tau)
         |SELECT name_a, name_b, len_a, len_b, n_a, n_b,
         |  levenshtein(name_a, name_b)::int AS dist
         |FROM cand WHERE levenshtein(name_a, name_b) <= $tau
         |ORDER BY name_a, name_b""".stripMargin
    },

    // C entity resolution (merge half): the er_blocking pair chain
    // closed into components by the componentCtes reach shape —
    // safe here because edit-variant clusters are tiny (never the
    // percolation case, CLAUDE.md) — min-name rep, window rollups.
    "er_resolve" -> {
      val tau = graft.operators.EntityRes.ErTau
      raw"""WITH RECURSIVE nm AS (
         |  SELECT p_name AS name, count(*)::bigint AS n_rows
         |  FROM part GROUP BY p_name),
         |p AS (
         |  SELECT a.name AS name_a, b.name AS name_b
         |  FROM nm a JOIN nm b
         |    ON a.name < b.name
         |    AND abs(length(a.name) - length(b.name)) <= $tau
         |    AND levenshtein(a.name, b.name) <= $tau),
         |edges AS (
         |  SELECT name_a AS src, name_b AS dst FROM p
         |  UNION ALL
         |  SELECT name_b, name_a FROM p),
         |reach AS (
         |  SELECT DISTINCT name AS node, name AS lbl FROM nm
         |  UNION
         |  SELECT e.dst AS node, r.lbl AS lbl
         |  FROM reach r JOIN edges e ON e.src = r.node),
         |comp AS (SELECT node, min(lbl) AS rep FROM reach GROUP BY node),
         |g AS (
         |  SELECT c.node AS name, c.rep, nm.n_rows
         |  FROM comp c JOIN nm ON nm.name = c.node)
         |SELECT name, rep AS entity_rep, n_rows,
         |  (count(*) OVER (PARTITION BY rep))::bigint AS grp_names,
         |  (sum(n_rows) OVER (PARTITION BY rep))::bigint AS grp_rows
         |FROM g ORDER BY name""".stripMargin
    },

    // B/C iterative graph: integer fixed-point PageRank, the same
    // recurrence as Graph.graphPagerank unrolled as one CTE stage per
    // round (constants single-sourced from Graph.Pr*). All integral
    // div/sum — exact at any iteration count.
    // Triangle counting: degree-ordered orientation (row-value
    // comparison == Spark's struct order), two equi-join closure,
    // per-node role union. All integer ⇒ full hash gate.
    "graph_triangles" ->
      """WITH li AS (SELECT l_orderkey AS k, l_partkey AS p FROM lineitem),
        |und AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst
        |        FROM li a JOIN li b ON a.k = b.k AND a.p < b.p),
        |deg AS MATERIALIZED (SELECT n, count(*)::bigint AS deg FROM (
        |          SELECT src AS n FROM und UNION ALL SELECT dst AS n FROM und)
        |        GROUP BY n),
        |o AS MATERIALIZED (SELECT
        |    CASE WHEN (da.deg, und.src) < (db.deg, und.dst)
        |         THEN und.src ELSE und.dst END AS a,
        |    CASE WHEN (da.deg, und.src) < (db.deg, und.dst)
        |         THEN und.dst ELSE und.src END AS b
        |  FROM und
        |  JOIN deg da ON da.n = und.src
        |  JOIN deg db ON db.n = und.dst),
        |tri AS MATERIALIZED (SELECT o1.a AS x, o1.b AS y, o2.b AS z
        |        FROM o o1 JOIN o o2 ON o2.a = o1.b
        |        JOIN o o3 ON o3.a = o1.a AND o3.b = o2.b),
        |cnt AS (SELECT n, count(*)::bigint AS n_tri FROM (
        |          SELECT x AS n FROM tri UNION ALL
        |          SELECT y AS n FROM tri UNION ALL
        |          SELECT z AS n FROM tri)
        |        GROUP BY n)
        |SELECT deg.n AS node, deg.deg,
        |  coalesce(cnt.n_tri, 0)::bigint AS n_tri
        |FROM deg LEFT JOIN cnt ON cnt.n = deg.n
        |ORDER BY node""".stripMargin,

    // B brand-partition modularity (Graph.graphModularity): exact
    // integer e_c/d_c/m over the labeled edge frame, one mirrored
    // IEEE term per community ⇒ full hash gate.
    "graph_modularity" ->
      """WITH li AS (SELECT l_orderkey AS k, l_partkey AS p FROM lineitem),
        |und AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst
        |        FROM li a JOIN li b ON a.k = b.k AND a.p < b.p),
        |pb AS (SELECT p_partkey AS p, p_brand AS brand FROM part),
        |e AS MATERIALIZED (
        |  SELECT und.src, und.dst, ps.brand AS b_src, pd.brand AS b_dst
        |  FROM und JOIN pb ps ON ps.p = und.src
        |  JOIN pb pd ON pd.p = und.dst),
        |m AS (SELECT count(*)::bigint AS m FROM e),
        |ec AS (SELECT b_src AS brand, count(*)::bigint AS e_in
        |       FROM e WHERE b_src = b_dst GROUP BY 1),
        |dc AS (SELECT brand, count(*)::bigint AS d_tot FROM (
        |         SELECT b_src AS brand FROM e
        |         UNION ALL SELECT b_dst FROM e) GROUP BY 1),
        |nodes AS (
        |  SELECT pb.brand, count(*)::bigint AS n_nodes FROM (
        |    SELECT src AS p FROM und UNION SELECT dst FROM und) n
        |  JOIN pb ON pb.p = n.p GROUP BY 1)
        |SELECT nodes.brand, n_nodes,
        |  coalesce(ec.e_in, 0)::bigint AS e_in, dc.d_tot,
        |  round(coalesce(ec.e_in, 0)::double / m.m::double
        |    - (dc.d_tot::double / (2 * m.m)::double)
        |      * (dc.d_tot::double / (2 * m.m)::double), 6) AS q_term
        |FROM nodes
        |JOIN dc ON dc.brand = nodes.brand
        |LEFT JOIN ec ON ec.brand = nodes.brand
        |CROSS JOIN m
        |ORDER BY nodes.brand""".stripMargin,

    // B edge embeddedness (Graph.graphEdgeJaccard): same oriented
    // triangle enumeration as graph_triangles, each triangle
    // contributing its 3 canonical id-ordered edges; integer support
    // + one NULL-guarded division, total-order cut ⇒ full hash gate.
    "graph_edge_jaccard" -> {
      val k = graft.operators.Graph.EdgeJacTopK
      s"""WITH li AS (SELECT l_orderkey AS k, l_partkey AS p FROM lineitem),
        |und AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst
        |        FROM li a JOIN li b ON a.k = b.k AND a.p < b.p),
        |deg AS MATERIALIZED (SELECT n, count(*)::bigint AS deg FROM (
        |          SELECT src AS n FROM und UNION ALL SELECT dst AS n FROM und)
        |        GROUP BY n),
        |o AS MATERIALIZED (SELECT
        |    CASE WHEN (da.deg, und.src) < (db.deg, und.dst)
        |         THEN und.src ELSE und.dst END AS a,
        |    CASE WHEN (da.deg, und.src) < (db.deg, und.dst)
        |         THEN und.dst ELSE und.src END AS b
        |  FROM und
        |  JOIN deg da ON da.n = und.src
        |  JOIN deg db ON db.n = und.dst),
        |tri AS MATERIALIZED (SELECT o1.a AS x, o1.b AS y, o2.b AS z
        |        FROM o o1 JOIN o o2 ON o2.a = o1.b
        |        JOIN o o3 ON o3.a = o1.a AND o3.b = o2.b),
        |etri AS (
        |  SELECT least(x, y) AS u, greatest(x, y) AS v FROM tri
        |  UNION ALL SELECT least(x, z), greatest(x, z) FROM tri
        |  UNION ALL SELECT least(y, z), greatest(y, z) FROM tri),
        |sup AS (SELECT u, v, count(*)::bigint AS sup
        |        FROM etri GROUP BY u, v),
        |j AS (
        |  SELECT und.src, und.dst, da.deg AS deg_src, db.deg AS deg_dst,
        |    coalesce(sup.sup, 0)::bigint AS support
        |  FROM und
        |  JOIN deg da ON da.n = und.src
        |  JOIN deg db ON db.n = und.dst
        |  LEFT JOIN sup ON sup.u = und.src AND sup.v = und.dst)
        |SELECT src, dst, deg_src, deg_dst, support,
        |  CASE WHEN deg_src + deg_dst - 2 - support > 0
        |       THEN round(support::double /
        |                  (deg_src + deg_dst - 2 - support)::double, 4)
        |  END AS jaccard
        |FROM j
        |ORDER BY support DESC, src, dst
        |LIMIT $k""".stripMargin
    },

    // Degree assortativity (Newman 2002): six EXACT integer sums
    // over the symmetric degree-joined edge list (order-free), then
    // the Pearson assembly casts each sum to double ONCE and
    // combines in FP — identical operands + correctly rounded IEEE
    // ops ⇒ bit-identical cross-engine even where m·Σd² would
    // overflow int64. Regular graphs (exact-zero variance) → NULL,
    // same CASE both engines.
    "graph_assortativity" ->
      """WITH li AS (SELECT l_orderkey AS k, l_partkey AS p FROM lineitem),
        |und AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst
        |        FROM li a JOIN li b ON a.k = b.k AND a.p < b.p),
        |adj AS MATERIALIZED (
        |  SELECT src AS u, dst AS v FROM und
        |  UNION ALL SELECT dst, src FROM und),
        |deg AS MATERIALIZED (
        |  SELECT u AS node, count(*)::bigint AS d FROM adj GROUP BY 1),
        |sc AS (
        |  SELECT du.d AS du, dv.d AS dv
        |  FROM adj JOIN deg du ON du.node = adj.u
        |           JOIN deg dv ON dv.node = adj.v),
        |s AS (
        |  SELECT count(*)::bigint AS m,
        |    sum(du)::bigint AS su, sum(dv)::bigint AS sv,
        |    sum(du * dv)::bigint AS suv,
        |    sum(du * du)::bigint AS suu,
        |    sum(dv * dv)::bigint AS svv
        |  FROM sc),
        |n AS (SELECT count(*)::bigint AS n_nodes FROM deg)
        |SELECT n_nodes, m // 2 AS n_edges,
        |  CASE WHEN (m::double * suu::double - su::double * su::double) > 0
        |        AND (m::double * svv::double - sv::double * sv::double) > 0
        |  THEN round(
        |    (m::double * suv::double - su::double * sv::double) /
        |    (sqrt(m::double * suu::double - su::double * su::double) *
        |     sqrt(m::double * svv::double - sv::double * sv::double)), 6)
        |  END AS assortativity
        |FROM s, n""".stripMargin,

    // B k-hop reach (Graph.graphKhop): fixed depth ⇒ three unrolled
    // distinct-join CTE stages (no recursion — the one-definition
    // discipline); pure set-distinct integer algebra ⇒ full hash
    // gate. SELECT DISTINCT ... FROM (UNION ALL) form per CLAUDE.md.
    "graph_khop" -> {
      val k = graft.operators.Graph.KhopSources
      s"""WITH li AS (SELECT l_orderkey AS k, l_partkey AS p FROM lineitem),
         |und AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst
         |        FROM li a JOIN li b ON a.k = b.k AND a.p < b.p),
         |adj AS MATERIALIZED (
         |  SELECT src, dst FROM und
         |  UNION ALL SELECT dst, src FROM und),
         |srcs AS (SELECT DISTINCT src AS s FROM adj ORDER BY s LIMIT $k),
         |r0 AS (SELECT s, s AS v FROM srcs),
         |r1 AS MATERIALIZED (SELECT DISTINCT s, v FROM (
         |  SELECT r.s, a.dst AS v FROM r0 r JOIN adj a ON r.v = a.src
         |  UNION ALL SELECT s, v FROM r0)),
         |r2 AS MATERIALIZED (SELECT DISTINCT s, v FROM (
         |  SELECT r.s, a.dst AS v FROM r1 r JOIN adj a ON r.v = a.src
         |  UNION ALL SELECT s, v FROM r1)),
         |r3 AS MATERIALIZED (SELECT DISTINCT s, v FROM (
         |  SELECT r.s, a.dst AS v FROM r2 r JOIN adj a ON r.v = a.src
         |  UNION ALL SELECT s, v FROM r2)),
         |c1 AS (SELECT s, count(*)::bigint - 1 AS n_1hop FROM r1 GROUP BY s),
         |c2 AS (SELECT s, count(*)::bigint - 1 AS n_2hop FROM r2 GROUP BY s),
         |c3 AS (SELECT s, count(*)::bigint - 1 AS n_3hop FROM r3 GROUP BY s)
         |SELECT s AS source, n_1hop, n_2hop, n_3hop
         |FROM c1 JOIN c2 USING (s) JOIN c3 USING (s)
         |ORDER BY source""".stripMargin
    },

    // Link prediction: wedges fan out from capped-degree centers
    // only (constants single-sourced from Graph.Link*/RaScale); the
    // RA score is an order-free integer sum (// = integral div), the
    // Jaccard is one bigint/bigint division, and the top-k cut is a
    // total order — full hash gate.
    "graph_link_predict" -> {
      val G = graft.operators.Graph
      raw"""WITH li AS (SELECT l_orderkey AS k, l_partkey AS p FROM lineitem),
         |und AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst
         |        FROM li a JOIN li b ON a.k = b.k AND a.p < b.p),
         |deg AS MATERIALIZED (SELECT n, count(*)::bigint AS deg FROM (
         |          SELECT src AS n FROM und UNION ALL SELECT dst AS n FROM und)
         |        GROUP BY n),
         |ec AS MATERIALIZED (
         |  SELECT e.c, e.m, deg.deg AS cdeg FROM (
         |    SELECT src AS c, dst AS m FROM und
         |    UNION ALL SELECT dst AS c, src AS m FROM und) e
         |  JOIN deg ON deg.n = e.c AND deg.deg <= ${G.LinkDegCap}),
         |scored AS (
         |  SELECT x.m AS pa, y.m AS pb, count(*)::bigint AS cn,
         |    sum(${G.RaScale} // x.cdeg)::bigint AS ra_fp
         |  FROM ec x JOIN ec y ON x.c = y.c AND x.m < y.m
         |  GROUP BY pa, pb),
         |newp AS (
         |  SELECT s.* FROM scored s
         |  WHERE NOT EXISTS (SELECT 1 FROM und
         |                    WHERE und.src = s.pa AND und.dst = s.pb))
         |SELECT pa AS node_a, pb AS node_b, cn::int AS cn,
         |  da.deg::int AS deg_a, db.deg::int AS deg_b,
         |  round(cn / (da.deg + db.deg - cn), 6) AS jaccard, ra_fp
         |FROM newp
         |JOIN deg da ON da.n = pa
         |JOIN deg db ON db.n = pb
         |ORDER BY cn DESC, ra_fp DESC, node_a, node_b
         |LIMIT ${G.LinkTopK}""".stripMargin
    },

    "graph_pagerank" -> {
      val iters = graft.operators.Graph.PrIters
      val scale = graft.operators.Graph.PrScale
      val k = graft.operators.Graph.PrTopK
      // edges/deg are referenced in EVERY unrolled round and each
      // r_i in the next — explicit MATERIALIZED, or DuckDB's inliner
      // re-derives the 24M-pair self-join per round (measured: the
      // sf1 oracle spilled past 79 GB of temp and died; materialized
      // it runs in memory).
      val head =
        s"""WITH li AS (SELECT l_orderkey AS k, l_partkey AS p FROM lineitem),
           |edges AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst
           |          FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p),
           |deg AS MATERIALIZED (
           |  SELECT src, count(*)::bigint AS deg FROM edges GROUP BY 1),
           |nn AS (SELECT count(*)::bigint AS n FROM deg),
           |bb AS (SELECT ($scale // n) AS q0,
           |              (15 * ($scale // n)) // 100 AS b FROM nn),
           |r0 AS (SELECT src AS node, (SELECT q0 FROM bb) AS q FROM deg)""".stripMargin
      val loops = (1 to iters).map { i =>
        s""",
           |r$i AS MATERIALIZED (
           |  SELECT e.dst AS node,
           |    ((SELECT b FROM bb) + (85 * sum(r${i - 1}.q // d.deg)) // 100)::bigint AS q
           |  FROM edges e
           |  JOIN r${i - 1} ON r${i - 1}.node = e.src
           |  JOIN deg d ON d.src = e.src
           |  GROUP BY e.dst)""".stripMargin
      }.mkString
      head + loops +
        s"""
           |SELECT * FROM (
           |  SELECT row_number() OVER (ORDER BY r.q DESC, r.node)::int AS rk,
           |    r.node AS part, d.deg, r.q
           |  FROM r$iters r JOIN deg d ON d.src = r.node)
           |WHERE rk <= $k
           |ORDER BY rk""".stripMargin
    }
  )

  /** The anomaly SQL — shared verbatim by `events_anomaly` (B-section
    * RANGE-window form) and `stream_anomaly` (G9 stateful
    * trailing-window fold, batch mode): one semantics, two execution
    * strategies. (`def`, not `val`: consumed by object vals declared
    * earlier.) */
  private def anomalySql: String = {
    val minN = graft.operators.Funnel.AnomalyMinBaseline
    val zThr = graft.operators.Funnel.AnomalySpikeZ
    s"""WITH hourly AS (
       |  SELECT event_type,
       |    epoch(date_trunc('second', ts))::bigint // 3600 AS h,
       |    count(*) AS cnt
       |  FROM events
       |  GROUP BY 1, 2),
       |win AS (
       |  SELECT event_type, h, cnt,
       |    count(cnt) OVER w AS nw,
       |    sum(cnt) OVER w AS sumx,
       |    sum(cnt * cnt) OVER w AS sumx2
       |  FROM hourly
       |  WINDOW w AS (PARTITION BY event_type ORDER BY h
       |               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
       |scored AS (
       |  SELECT event_type, h, cnt, nw,
       |    sumx::double / nw AS mean,
       |    (sumx2::double - sumx::double * sumx / nw) / (nw - 1)
       |      AS varr
       |  FROM win WHERE nw >= $minN)
       |SELECT event_type, h * 3600 AS hour_ep, cnt::int AS n_events,
       |  round((cnt::double - mean) / sqrt(varr), 4) AS z,
       |  abs((cnt::double - mean) / sqrt(varr)) > $zThr AS is_spike
       |FROM scored
       |WHERE varr > 0
       |ORDER BY event_type, hour_ep""".stripMargin
  }

  /** The attribution SQL — shared verbatim by `events_attribution`
    * (B-section window form) and `stream_attribution` (G8 stateful
    * form, batch mode): one semantics, two execution strategies.
    * Same running ROWS frame in both engines, (ts, event_id)
    * total-order tiebreak, IGNORE NULLS first/last skipping non-touch
    * rows; purchases with no prior touch keep NULL credit.
    * (`def`, not `val`: consumed by object vals declared earlier.) */
  private def attributionSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, ts,
      |    CASE WHEN event_type IN ('view', 'click')
      |         THEN event_type END AS touch_type,
      |    CASE WHEN event_type IN ('view', 'click')
      |         THEN event_id END AS touch_id
      |  FROM events),
      |w AS (
      |  SELECT event_id, user_id, event_type,
      |    epoch(date_trunc('second', ts))::bigint AS ep,
      |    first_value(touch_type IGNORE NULLS) OVER win AS first_touch_type,
      |    first_value(touch_id IGNORE NULLS) OVER win AS first_touch_id,
      |    last_value(touch_type IGNORE NULLS) OVER win AS last_touch_type,
      |    last_value(touch_id IGNORE NULLS) OVER win AS last_touch_id,
      |    count(touch_id) OVER win AS n_touches
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id AS purchase_id, user_id, ep,
      |  first_touch_type, first_touch_id,
      |  last_touch_type, last_touch_id, n_touches::int AS n_touches
      |FROM w WHERE event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

  /** The cohort-retention SQL — shared verbatim by `events_retention`
    * (window form) and `stream_retention` (G6 stateful form, batch
    * mode): one semantics, two execution strategies. (`def`, not
    * `val`: consumed by object vals declared earlier.) */
  private def retentionSql: String = {
    val wk = graft.operators.Funnel.WeekSeconds
    s"""WITH ev AS (
       |  SELECT user_id, event_type,
       |    epoch(date_trunc('second', ts))::bigint AS ep
       |  FROM events),
       |cohort AS (
       |  SELECT user_id, min(ep) // $wk AS cohort_week
       |  FROM ev WHERE event_type = 'signup' GROUP BY 1),
       |act AS (
       |  SELECT DISTINCT e.user_id, c.cohort_week,
       |    (e.ep // $wk) - c.cohort_week AS week_offset
       |  FROM ev e JOIN cohort c ON c.user_id = e.user_id
       |  WHERE (e.ep // $wk) - c.cohort_week >= 0)
       |SELECT cohort_week, week_offset, count(*) AS n_users
       |FROM act GROUP BY 1, 2
       |ORDER BY cohort_week, week_offset""".stripMargin
  }

  /** SURVEY §2A — the MapReduce-engine pipelines. */
  val mr: Map[String, String] = Map(
    "mr_wordcount" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(text, '[ \t\n\x0B\f\r]+')) AS word
        |  FROM documents) t
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY word""".stripMargin,

    "mr_sum" ->
      """SELECT user_id, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "mr_multiply" ->
      """SELECT l_orderkey, round(product(1 + l_discount), 4) AS prod_disc
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,

    // sorted-list slice mirrors the operator's NoopMaxValues per-key
    // memory bound (a no-op at ≤ 7 lineitems per order, single-sourced
    // so a changed cap cannot desync the gate)
    "mr_noop" ->
      s"""SELECT l_orderkey,
        |  array_to_string(
        |    list_sort(list(l_linenumber))[1:${graft.mr.MrQueries.NoopMaxValues}],
        |    ',') AS linenumbers
        |FROM lineitem
        |WHERE l_orderkey < 100
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,

    "mr_chain" ->
      """SELECT o_orderkey AS k,
        |  CAST(round(o_totalprice * 100) AS bigint) AS cents
        |FROM orders
        |WHERE o_orderkey < 200
        |ORDER BY k""".stripMargin,

    // A6 distributed grep (MrQueries.mrGrep): non-overlapping greedy
    // count == replace-shrinkage count — one definition both engines;
    // pure integer ⇒ full hash gate.
    "mr_grep" -> {
      val p = graft.mr.MrQueries.GrepPattern
      s"""SELECT doc_id, source,
         |  ((len(text) - len(replace(text, '$p', ''))) // ${p.length})
         |    ::bigint AS n_matches
         |FROM documents
         |WHERE len(replace(text, '$p', '')) < len(text)
         |ORDER BY doc_id""".stripMargin
    }
  )

  /** SURVEY §2E — text analysis. Expression trees mirror
    * graft.functions.TextFunctions op-for-op so doubles agree
    * bit-for-bit before rounding. */
  val text: Map[String, String] = Map(
    "text_tokens" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
        |                  w -> w <> ''))::int AS n_ws_tokens,
        |  len(regexp_extract_all(text,
        |      '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]'))::int AS n_bpe_tokens,
        |  round(length(text) /
        |    len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
        |                    w -> w <> '')), 4) AS chars_per_token
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      ("WITH " + qualityBaseCte("documents") + "\n" +
      s"""SELECT doc_id, n_tok::int AS n_tokens,
        |  round(stop_ratio, 4) AS stopword_ratio,
        |  round(punct_ratio, 4) AS punct_ratio,
        |  round($qualityExpr, 4) AS quality
        |FROM q_base
        |ORDER BY doc_id""".stripMargin),

    // E33 quality ensemble (TextQueries.qualityEnsemble): the four
    // certified component chains composed — q_base (E2 score), per
    // (E24 rule flags), the E12 bigram-LM typicality (LEFT join, 0
    // for no-bigram docs), E25 Flesch (normalized, clamped) — into
    // one left-associated ::double-forced linear pool; keep compares
    // the UNROUNDED ensemble (bit-identical: exact algebra + double
    // literals, no transcendental anywhere).
    "quality_ensemble" -> {
      val Q = graft.functions.TextQueries
      ("WITH " + qualityBaseCte("documents") + ",\n" + gopherCtes +
        ",\n" + bigramLmCtes + ",\n" +
      s"""lm AS (
         |  SELECT occ.doc_id,
         |    round(sum(cnt2)::bigint / sum(cnt1)::bigint, 6) AS typ
         |  FROM occ JOIN big USING (bigram)
         |  JOIN uni ON uni.tok = occ.w1
         |  GROUP BY occ.doc_id),
         |syl AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, '[aeiou]+')) AS n_syl,
         |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
         |      AS n_sent
         |  FROM documents),
         |qq AS (
         |  SELECT doc_id, n_tok, ($qualityExpr) AS q
         |  FROM q_base WHERE n_tok > 0),
         |gp AS (
         |  SELECT doc_id,
         |    (CASE WHEN ($gopherRuleLen) THEN 1 ELSE 0 END
         |     + CASE WHEN ($gopherRuleWlen) THEN 1 ELSE 0 END
         |     + CASE WHEN ($gopherRuleDiv) THEN 1 ELSE 0 END
         |     + CASE WHEN ($gopherRuleRep) THEN 1 ELSE 0 END
         |     + CASE WHEN ($gopherRuleStop) THEN 1 ELSE 0 END) AS npass
         |  FROM per),
         |fl AS (
         |  SELECT qq.doc_id,
         |    greatest(0.0::double, least(1.0::double,
         |      ((206.835::double - 1.015::double * (n_tok / n_sent)
         |        - 84.6::double * (n_syl / n_tok))
         |       + ${Q.EnsFleschShift}::double)
         |      / ${Q.EnsFleschSpan}::double)) AS fln
         |  FROM qq JOIN syl USING (doc_id)),
         |f AS (
         |  SELECT qq.doc_id, qq.q, gp.npass, fl.fln,
         |    coalesce(lm.typ, 0.0::double) AS typ
         |  FROM qq JOIN gp USING (doc_id) JOIN fl USING (doc_id)
         |  LEFT JOIN lm USING (doc_id)),
         |e AS (
         |  SELECT doc_id, q, npass, typ, fln,
         |    ${Q.EnsWQuality}::double * q
         |      + ${Q.EnsWGopher}::double * (npass / 5.0::double)
         |      + ${Q.EnsWTypicality}::double * typ
         |      + ${Q.EnsWFlesch}::double * fln AS ens
         |  FROM f)
         |SELECT doc_id, round(q, 4) AS quality,
         |  npass::int AS n_rules_passed, typ AS cond_typicality,
         |  round(fln, 4) AS flesch_norm, round(ens, 6) AS ensemble,
         |  ens >= ${Q.EnsKeepMin}::double AS keep
         |FROM e ORDER BY doc_id""".stripMargin)
    },

    "text_langid" -> langidSql,

    // The G29 stream entry is the same stateless per-row classifier
    // (bit-identical under any micro-batching), so it shares E3's
    // oracle verbatim — the stream_pii precedent.
    "stream_langid" -> langidSql,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_transform(string_split(text, ''), c -> ascii(c)::bigint),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // E16 RAKE (ratio-of-sums scoring): stopword-free token runs via
    // a running stopword-count window; word freq/deg joined back;
    // score = one division of two integer sums. Stopword list
    // single-sourced from TextFunctions.EnStopwords via the Scala
    // interpolation below.
    "text_rake" -> {
      val stops = graft.functions.TextFunctions.EnStopwords
        .map(w => s"'$w'").mkString(", ")
      val k = graft.functions.TextQueries.RakeTopK
      raw"""WITH toks0 AS (
         |  SELECT doc_id,
         |    unnest([{'pos': i, 'w': w[i]} FOR i IN range(1, len(w) + 1)])
         |      AS t
         |  FROM (SELECT doc_id,
         |          list_filter(string_split_regex(text,
         |            '[ \t\n\x0B\f\r]+'), x -> x <> '') AS w
         |        FROM documents)),
         |toks AS (
         |  SELECT doc_id, t.pos AS pos, t.w AS w,
         |    CASE WHEN t.w IN ($stops) THEN 1 ELSE 0 END AS is_stop
         |  FROM toks0),
         |grp AS (
         |  SELECT doc_id, pos, w, is_stop,
         |    sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
         |  FROM toks),
         |ph AS (SELECT doc_id, g, pos, w FROM grp WHERE is_stop = 0),
         |plen AS (SELECT doc_id, g, count(*) AS plen FROM ph GROUP BY 1, 2),
         |wstat AS (
         |  SELECT doc_id, w, count(*) AS freq, sum(plen) AS deg
         |  FROM ph JOIN plen USING (doc_id, g) GROUP BY 1, 2),
         |scored AS (
         |  SELECT p.doc_id, p.g,
         |    string_agg(p.w, ' ' ORDER BY p.pos) AS phrase,
         |    sum(s.deg)::bigint AS num, sum(s.freq)::bigint AS den
         |  FROM ph p JOIN wstat s ON p.doc_id = s.doc_id AND p.w = s.w
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT doc_id, phrase, num, den,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY num / den DESC, phrase ASC, num DESC)::int AS rk
         |  FROM scored)
         |SELECT doc_id, rk, phrase, round(num / den, 4) AS score
         |FROM ranked WHERE rk <= $k
         |ORDER BY doc_id, rk""".stripMargin
    },

    // E15 winnowing: per-occurrence gram polyhashes via the same
    // list_reduce fold as text_fingerprint (constants single-sourced
    // from TextQueries/TextFunctions), sliding-window minima via
    // 1-based inclusive list slices, order-free set reductions.
    "text_winnow" -> {
      val n = graft.functions.TextQueries.WinnowN
      val w = graft.functions.TextQueries.WinnowW
      val mod = graft.functions.TextFunctions.FpMod
      val gram = (1 to n - 1).foldLeft("w[i]") {
        (acc, k) => s"$acc || ' ' || w[i+$k]" }
      raw"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    [list_reduce(list_transform(string_split($gram, ''),
        |                                c -> ascii(c)::bigint),
        |                 (a, b) -> (a * 31 + b) % $mod)
        |     FOR i IN range(1, len(w) - ${n - 2})] AS hs
        |  FROM toks WHERE len(w) >= $n),
        |wins AS (
        |  SELECT doc_id, len(hs) AS n_grams,
        |    list_distinct([list_min(hs[i:i+${w - 1}])
        |                   FOR i IN range(1, len(hs) - ${w - 2})]) AS fps
        |  FROM g WHERE len(hs) >= $w)
        |SELECT doc_id, n_grams::int AS n_grams, len(fps)::int AS n_fp,
        |  list_reduce(fps, (a, b) -> xor(a, b)) AS fp_xor,
        |  list_min(fps) AS fp_min
        |FROM wins
        |ORDER BY doc_id""".stripMargin
    },

    // E5: rational-idf tf-idf (no ln — see TextQueries.textTfidf: IEEE
    // + * / are correctly rounded, so the hash gate is exact). The
    // division operands are BIGINT on both sides; DuckDB's `/` (like
    // Spark's) promotes to double division.
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
        |                       w -> w <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |ntok AS (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY 1),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf, f.df,
        |    (t.tf / n.n_tok) * ((nd.n_docs + 1) / (f.df + 1)) AS tfidf
        |  FROM tf t
        |  JOIN ntok n USING (doc_id)
        |  JOIN dfreq f USING (term)
        |  CROSS JOIN nd),
        |ranked AS (
        |  SELECT doc_id, term, tf, df, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY tfidf DESC, term ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, rk::int AS rk, term, tf, df,
        |  round(tfidf, 6) AS tfidf
        |FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,

    // Mirrors TextQueries.textBm25 term for term: rational RSJ idf
    // (no ln — exactness discipline, see the operator scaladoc), k1+1
    // written as (1.2 + 1) — NOT 2.2 — because 1.2d + 1.0 and the
    // parsed literal 2.2 are DIFFERENT doubles (the sum truncates
    // exactly, the literal rounds up); both engines must do the same
    // addition. sum(dl)::bigint per the HUGEINT rule. The inner
    // ORDER BY cuts on the UNROUNDED score (same cut as Spark's
    // TakeOrdered), the outer re-sorts by doc_id.
    "text_bm25" -> {
      val ts = graft.functions.TextQueries.Bm25Terms
      val k1 = graft.functions.TextQueries.Bm25K1 // "1.2"
      val b = graft.functions.TextQueries.Bm25B   // "0.75"
      val k = graft.functions.TextQueries.Bm25TopK
      val tfCols = ts.map(t =>
        s"count(*) FILTER (WHERE term = '$t') AS tf_$t").mkString(",\n|    ")
      val dfCols = ts.map(t =>
        s"count(*) FILTER (WHERE tf_$t > 0) AS df_$t").mkString(",\n|    ")
      val scoreSum = ts.map(t =>
        s"((n_docs - df_$t + 0.5) / (df_$t + 0.5)) * (tf_$t * ($k1 + 1)) / " +
          s"(tf_$t + $k1 * ((1 - $b) + $b * (dl / (sum_dl / n_docs))))")
        .mkString("\n|    + ")
      val tfList = ts.map(t => s"tf_$t").mkString(", ")
      raw"""WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
        |                       w -> w <> '')) AS term
        |  FROM documents),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS dl,
        |    $tfCols
        |  FROM toks GROUP BY 1),
        |stats AS (
        |  SELECT count(*) AS n_docs, sum(dl)::bigint AS sum_dl,
        |    $dfCols
        |  FROM perdoc),
        |scored AS (
        |  SELECT doc_id, $tfList, dl,
        |    $scoreSum AS score
        |  FROM perdoc CROSS JOIN stats
        |  WHERE ${ts.map(t => s"tf_$t").mkString(" + ")} > 0)
        |SELECT doc_id, $tfList, dl, round(score, 4) AS score FROM (
        |  SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT $k)
        |ORDER BY doc_id""".stripMargin
    },

    // Spark counts distinct xxhash64 of words/bigrams (native codegen
    // loop); the oracle counts the strings — equal absent a 64-bit
    // collision.
    "text_repetition" ->
      raw"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), w -> w <> '') AS w
        |  FROM documents)
        |SELECT doc_id,
        |  len(w)::int AS n_words,
        |  len(list_distinct(w))::int AS n_distinct_words,
        |  round(1.0 - len(list_distinct(w)) / len(w), 4) AS word_dup_ratio,
        |  round(1.0 - len(list_distinct([w[i] || ' ' || w[i+1]
        |                                 FOR i IN range(1, len(w))]))
        |              / (len(w) - 1), 4) AS bigram_dup_ratio
        |FROM toks WHERE len(w) >= 2
        |ORDER BY doc_id""".stripMargin,

    // Cross-doc duplicated-shingle fraction: sh0 (per-doc-distinct
    // 3-shingles) shared with the dedup family; df window counts
    // docs per shingle. Spark counts distinct shingle HASHES — equal
    // to these string counts absent a 64-bit collision; the division
    // is the only double.
    "text_boilerplate" ->
      s"""WITH ${shingleDistinctCtes("documents")},
        |dfed AS (
        |  SELECT doc_id, count(*) OVER (PARTITION BY s) AS df FROM sh0)
        |SELECT doc_id, count(*)::bigint AS n_shingles,
        |  sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::bigint AS n_dup,
        |  round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::double
        |        / count(*), 4) AS dup_frac
        |FROM dfed GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // PII scrub over the deterministically augmented corpus: both
    // engines build the identical pii_text (integer algebra on
    // doc_id), the regex literals are single-sourced from TextQueries
    // (RE2 ∩ java.util.regex dialect), counts are taken pre-redaction
    // and the three rewrites apply in the same fixed order. DuckDB's
    // regexp_replace needs the explicit 'g' flag to match Spark's
    // replace-all default.
    // Bigram-LM conditional typicality: ratio of two INTEGER sums
    // (corpus bigram count over corpus prefix-unigram count, summed
    // over each doc's bigram occurrences), one double division at the
    // end. Bigram derivation identical to corpus_ngrams; docs with
    // < 2 tokens vanish through the inner join in both engines.
    "text_bigram_lm" ->
      ("WITH " + bigramLmCtes + "\n" +
      """SELECT occ.doc_id, count(*)::int AS n_bigrams,
         |  sum(cnt2)::bigint AS sum_bigram_cnt,
         |  sum(cnt1)::bigint AS sum_prefix_cnt,
         |  sum(CASE WHEN cnt2 = 1 THEN 1 ELSE 0 END)::int AS n_unique_bigrams,
         |  round(sum(cnt2)::bigint / sum(cnt1)::bigint, 6) AS cond_typicality
         |FROM occ
         |JOIN big USING (bigram)
         |JOIN uni ON uni.tok = occ.w1
         |GROUP BY occ.doc_id
         |ORDER BY occ.doc_id""".stripMargin),

    // E23 CCNet head/middle/tail: the same bigram-LM chain reduced to
    // the per-doc typicality ratio, then ntile(3) over the per-lang
    // (typicality desc, doc_id) total order — pure rank algebra, no
    // quantile interpolation in the gate.
    "quality_lm_buckets" ->
      ("WITH " + bigramLmCtes + "\n" +
      """, lm AS (
         |  SELECT occ.doc_id,
         |    round(sum(cnt2)::bigint / sum(cnt1)::bigint, 6) AS cond_typicality
         |  FROM occ
         |  JOIN big USING (bigram)
         |  JOIN uni ON uni.tok = occ.w1
         |  GROUP BY occ.doc_id),
         |s AS (
         |  SELECT lm.doc_id, d.lang, lm.cond_typicality,
         |    ntile(3) OVER (PARTITION BY d.lang
         |      ORDER BY lm.cond_typicality DESC, lm.doc_id) AS b
         |  FROM lm JOIN documents d USING (doc_id))
         |SELECT doc_id, lang, cond_typicality,
         |  CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |    ELSE 'tail' END AS bucket
         |FROM s ORDER BY doc_id""".stripMargin),

    // E25 Flesch readability: every literal forced ::double (DuckDB
    // otherwise evaluates the literal terms in DECIMAL — measured
    // 279/500 bit-mismatches); bands compare the unrounded double.
    "text_readability" -> readabilitySql,

    // G39: the stateless streaming twin shares E25's oracle verbatim
    // (the stream_langid/stream_pii precedent — per-row scan, no
    // state, bit-identical under any micro-batching).
    "stream_readability" -> readabilitySql,

    // E24 Gopher-style ruleset: every rule input is an integer
    // aggregate of the (doc_id, w) term-frequency table; each ratio
    // is ONE bigint/bigint division and every flag compares the
    // unrounded double — thresholds interpolated from the same Scala
    // constants the Spark side reads. CTEs + rule predicates shared
    // verbatim with the G28 streaming gate (one rule definition).
    "quality_gopher_rules" ->
      ("WITH " + gopherCtes + "\n" +
      s"""SELECT doc_id, n_tok::int AS n_tok, n_distinct::int AS n_distinct,
         |  round(n_chars_tok / n_tok, 4) AS mean_word_len,
         |  round(n_distinct / n_tok, 4) AS distinct_ratio,
         |  round(top_c / n_tok, 4) AS top_token_ratio,
         |  n_stop_kinds::int AS n_stop_kinds,
         |  ($gopherRuleLen) AS r_len,
         |  ($gopherRuleWlen) AS r_wlen,
         |  ($gopherRuleDiv) AS r_div,
         |  ($gopherRuleRep) AS r_rep,
         |  ($gopherRuleStop) AS r_stop,
         |  ($gopherRuleAll) AS pass
         |FROM per ORDER BY doc_id""".stripMargin),

    // G28 ingest gate: the same CTEs/predicates, pass-filtered — the
    // stateless streaming twin admits exactly the batch keep set.
    "stream_quality_gate" ->
      ("WITH " + gopherCtes + "\n" +
      s"""SELECT doc_id, n_tok::int AS n_tok, n_distinct::int AS n_distinct,
         |  round(n_chars_tok / n_tok, 4) AS mean_word_len,
         |  round(n_distinct / n_tok, 4) AS distinct_ratio,
         |  round(top_c / n_tok, 4) AS top_token_ratio,
         |  n_stop_kinds::int AS n_stop_kinds
         |FROM per WHERE $gopherRuleAll
         |ORDER BY doc_id""".stripMargin),

    // E28 Heaps fit: prefix sums over 10 doc-id-decile buckets (V
    // from per-token first-doc, N from per-doc counts — no per-prefix
    // rescan), then the zipf-style sequential OLS folds; degenerate
    // fits (zero x-variance) NULL-guarded identically.
    "corpus_heaps" -> {
      val p = graft.functions.TextQueries.HeapsPoints
      raw"""WITH t AS (
         |  SELECT doc_id, unnest(list_filter(
         |    string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |    w -> w <> '')) AS w
         |  FROM documents),
         |mx AS (SELECT max(doc_id) AS mx FROM documents),
         |pk AS (
         |  SELECT least($p, (doc_id * $p // (mx + 1)) + 1) AS k,
         |    sum(n)::bigint AS toks
         |  FROM (SELECT doc_id, count(*)::bigint AS n FROM t
         |        GROUP BY doc_id), mx
         |  GROUP BY 1),
         |fk AS (
         |  SELECT least($p, (fd * $p // (mx + 1)) + 1) AS k,
         |    count(*)::bigint AS newv
         |  FROM (SELECT min(doc_id) AS fd FROM t GROUP BY w), mx
         |  GROUP BY 1),
         |ax AS (SELECT g + 1 AS k FROM range(0, $p) r(g)),
         |cp AS (
         |  SELECT ax.k,
         |    (sum(coalesce(pk.toks, 0)) OVER (ORDER BY ax.k))::bigint
         |      AS nn,
         |    (sum(coalesce(fk.newv, 0)) OVER (ORDER BY ax.k))::bigint
         |      AS vv
         |  FROM ax LEFT JOIN pk USING (k) LEFT JOIN fk USING (k)),
         |one AS (
         |  SELECT list(struct_pack(k := k, nn := nn, vv := vv)
         |      ORDER BY k) AS arr,
         |    count(*)::bigint AS m
         |  FROM cp WHERE nn >= 1),
         |sums AS (
         |  SELECT m, arr,
         |    list_reduce(list_transform(range(1, m + 1),
         |      i -> log2(arr[i].nn)), (a, b) -> a + b) AS sx,
         |    list_reduce(list_transform(range(1, m + 1),
         |      i -> log2(arr[i].vv)), (a, b) -> a + b) AS sy,
         |    list_reduce(list_transform(range(1, m + 1),
         |      i -> log2(arr[i].nn) * log2(arr[i].nn)), (a, b) -> a + b)
         |      AS sxx,
         |    list_reduce(list_transform(range(1, m + 1),
         |      i -> log2(arr[i].nn) * log2(arr[i].vv)), (a, b) -> a + b)
         |      AS sxy,
         |    list_reduce(list_transform(range(1, m + 1),
         |      i -> log2(arr[i].vv) * log2(arr[i].vv)), (a, b) -> a + b)
         |      AS syy
         |  FROM one)
         |SELECT m::int AS n_points,
         |  arr[m::int].nn AS total_tokens, arr[m::int].vv AS vocab,
         |  CASE WHEN abs(m::double * sxx - sx * sx) > 1e-9 THEN
         |    round((m::double * sxy - sx * sy)
         |      / (m::double * sxx - sx * sx), 4) + 0.0 END AS heaps_beta,
         |  CASE WHEN abs(m::double * sxx - sx * sx) > 1e-9 THEN
         |    round((sy - ((m::double * sxy - sx * sy)
         |        / (m::double * sxx - sx * sx)) * sx) / m::double, 4)
         |      + 0.0 END AS heaps_log2k,
         |  CASE WHEN abs(m::double * sxx - sx * sx) > 1e-9
         |        AND abs(m::double * syy - sy * sy) > 1e-9 THEN
         |    round((m::double * sxy - sx * sy) * (m::double * sxy - sx * sy)
         |      / ((m::double * sxx - sx * sx)
         |         * (m::double * syy - sy * sy)), 4) + 0.0 END AS r2
         |FROM sums""".stripMargin
    },

    // E30 source-pair Jensen–Shannon divergence: count frame + k-row
    // per-source totals; H(P)/H(Q) in the count form, H(M) as the
    // per-pair union sum — the table_entropy tolerance class (engine
    // log2 ulps + sum re-association absorbed by round(4)); every
    // per-term expression mirrored op-for-op (divisions before the
    // /2, coalesce-to-0 on the absent side).
    "corpus_jsd" ->
      raw"""WITH t AS (
         |  SELECT source, unnest(list_filter(
         |    string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |    w -> w <> '')) AS w
         |  FROM documents),
         |cnt AS (
         |  SELECT source, w, count(*)::bigint AS c FROM t GROUP BY 1, 2),
         |tot AS (
         |  SELECT source, sum(c)::bigint AS n, count(*)::bigint AS v,
         |    sum(c * log2(c)) AS slc
         |  FROM cnt GROUP BY 1),
         |pr AS (
         |  SELECT a.source AS sa, a.n AS na, a.v AS va, a.slc AS slca,
         |    b.source AS sb, b.n AS nb, b.v AS vb, b.slc AS slcb
         |  FROM tot a JOIN tot b ON a.source < b.source),
         |uw AS (
         |  SELECT p.sa, p.sb, p.na, p.nb, p.va, p.vb, p.slca, p.slcb,
         |    c.w,
         |    sum(CASE WHEN c.source = p.sa THEN c.c END) AS c1,
         |    sum(CASE WHEN c.source = p.sb THEN c.c END) AS c2
         |  FROM pr p JOIN cnt c ON c.source IN (p.sa, p.sb)
         |  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9),
         |hm AS (
         |  SELECT sa, sb, na, nb, va, vb, slca, slcb,
         |    -sum(((coalesce(c1, 0)::double / na +
         |           coalesce(c2, 0)::double / nb) / 2.0) *
         |      log2((coalesce(c1, 0)::double / na +
         |            coalesce(c2, 0)::double / nb) / 2.0)) AS h_m,
         |    sum(CASE WHEN c1 IS NOT NULL AND c2 IS NOT NULL
         |        THEN 1 ELSE 0 END)::bigint AS v_shared
         |  FROM uw GROUP BY 1, 2, 3, 4, 5, 6, 7, 8)
         |SELECT sa AS source_a, sb AS source_b,
         |  na AS n_tokens_a, nb AS n_tokens_b,
         |  va AS vocab_a, vb AS vocab_b, v_shared,
         |  round(log2(na) - slca / na, 4) AS h_a,
         |  round(log2(nb) - slcb / nb, 4) AS h_b,
         |  round(h_m - ((log2(na) - slca / na) +
         |               (log2(nb) - slcb / nb)) / 2.0, 4) AS jsd
         |FROM hm ORDER BY source_a, source_b""".stripMargin,

    // E27 Zipf fit: top-100 head is a total order (count DESC, token
    // ASC); the five OLS sums are seedless list_reduce folds in rank
    // order mirroring Spark's aggregate HOF element-for-element;
    // round(4) erases last-ulp libm log2 noise. Degenerate-variance
    // eps guards (k=1: den=0 ⇒ 0/0) mirror heapsOf's — both engines
    // agree on NULL instead of diverging on NaN semantics.
    // E31 vocabulary coverage curve (TextQueries.corpusCoverage):
    // integer prefix sums over the (c DESC, w) head, one division ⇒
    // full hash gate; per-k ORDER-BY-LIMIT subqueries == Spark's
    // sorted-head array slices (same total tiebreak).
    "corpus_coverage" -> {
      val ks = graft.functions.TextQueries.CoverageKs
      val blocks = ks.map { k =>
        s"""SELECT $k AS k,
           |  (SELECT count(*)
           |   FROM (SELECT w FROM v ORDER BY c DESC, w LIMIT $k))::int
           |    AS n_types_used,
           |  (SELECT coalesce(sum(c), 0)
           |   FROM (SELECT c FROM v ORDER BY c DESC, w LIMIT $k))::bigint
           |    AS covered_tokens""".stripMargin
      }.mkString("\nUNION ALL\n")
      raw"""WITH t AS (
         |  SELECT unnest(list_filter(
         |    string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |    w -> w <> '')) AS w
         |  FROM documents),
         |v AS (SELECT w, count(*)::bigint AS c FROM t GROUP BY w),
         |tot AS (SELECT sum(c)::bigint AS total_tokens,
         |    count(*)::bigint AS n_vocab FROM v),
         |cov AS (
         |$blocks)
         |SELECT k, n_types_used, covered_tokens, total_tokens, n_vocab,
         |  round(covered_tokens::double / total_tokens::double, 4)
         |    AS coverage
         |FROM cov CROSS JOIN tot
         |ORDER BY k""".stripMargin
    },

    "corpus_zipf" -> {
      val k = graft.functions.TextQueries.ZipfTopK
      raw"""WITH t AS (
         |  SELECT unnest(list_filter(
         |    string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |    w -> w <> '')) AS w
         |  FROM documents),
         |top AS (
         |  SELECT w, count(*)::bigint AS c FROM t GROUP BY w
         |  ORDER BY c DESC, w LIMIT $k),
         |one AS (
         |  SELECT list(struct_pack(c := c, w := w)
         |      ORDER BY c DESC, w) AS arr,
         |    count(*)::bigint AS k
         |  FROM top),
         |sums AS (
         |  SELECT k, arr,
         |    list_reduce(list_transform(range(1, k + 1),
         |      i -> log2(i)), (a, b) -> a + b) AS sx,
         |    list_reduce(list_transform(range(1, k + 1),
         |      i -> log2(arr[i].c)), (a, b) -> a + b) AS sy,
         |    list_reduce(list_transform(range(1, k + 1),
         |      i -> log2(i) * log2(i)), (a, b) -> a + b) AS sxx,
         |    list_reduce(list_transform(range(1, k + 1),
         |      i -> log2(i) * log2(arr[i].c)), (a, b) -> a + b) AS sxy,
         |    list_reduce(list_transform(range(1, k + 1),
         |      i -> log2(arr[i].c) * log2(arr[i].c)), (a, b) -> a + b)
         |      AS syy
         |  FROM one)
         |SELECT k::int AS n_ranks, arr[1].w AS top_token,
         |  arr[1].c AS top_count,
         |  CASE WHEN abs(k::double * sxx - sx * sx) > 1e-9 THEN
         |    round((k::double * sxy - sx * sy)
         |      / (k::double * sxx - sx * sx), 4) + 0.0 END AS zipf_slope,
         |  CASE WHEN abs(k::double * sxx - sx * sx) > 1e-9 THEN
         |    round((sy - ((k::double * sxy - sx * sy)
         |        / (k::double * sxx - sx * sx)) * sx) / k::double, 4)
         |      + 0.0 END AS intercept,
         |  CASE WHEN abs(k::double * sxx - sx * sx) > 1e-9
         |        AND abs(k::double * syy - sy * sy) > 1e-9 THEN
         |    round((k::double * sxy - sx * sy) * (k::double * sxy - sx * sy)
         |      / ((k::double * sxx - sx * sx)
         |         * (k::double * syy - sy * sy)), 4) + 0.0 END AS r2
         |FROM sums""".stripMargin
    },

    // E26 rule ablation: same CTEs/predicates; per-rule kill and
    // unique-kill counts off ONE aggregate, shares one bigint/bigint
    // division each.
    "quality_rule_ablation" -> {
      val preds = Seq(
        "div" -> gopherRuleDiv, "len" -> gopherRuleLen,
        "rep" -> gopherRuleRep, "stop" -> gopherRuleStop,
        "wlen" -> gopherRuleWlen)
      val flagCols = preds.map { case (n, p) =>
        s"CASE WHEN NOT ($p) THEN 1 ELSE 0 END AS f_$n" }
        .mkString(",\n    ")
      val allF = preds.map { case (n, _) => s"f_$n" }.mkString(" + ")
      val sumCols = preds.map { case (n, _) =>
        s"sum(f_$n)::bigint AS k_$n,\n    " +
          s"sum(CASE WHEN f_$n = 1 AND $allF = 1 THEN 1 ELSE 0 " +
          s"END)::bigint AS u_$n" }.mkString(",\n    ")
      val arms = preds.map { case (n, _) =>
        s"SELECT 'r_$n' AS rule, k_$n AS n_fail, u_$n AS n_unique_fail," +
          s" n_docs, n_pass FROM s" }.mkString("\n  UNION ALL ")
      "WITH " + gopherCtes + ",\n" +
        s"""fl AS (
           |  SELECT doc_id,
           |    $flagCols
           |  FROM per),
           |s AS (
           |  SELECT count(*)::bigint AS n_docs,
           |    sum(CASE WHEN $allF = 0 THEN 1 ELSE 0 END)::bigint AS n_pass,
           |    $sumCols
           |  FROM fl),
           |u AS (
           |  $arms)
           |SELECT rule, n_fail, n_unique_fail,
           |  round(n_fail / n_docs, 6) AS fail_share,
           |  round(n_unique_fail / n_docs, 6) AS unique_fail_share,
           |  n_docs, n_pass
           |FROM u ORDER BY rule""".stripMargin
    },

    "text_pii" -> piiSql,

    // The G14 stream entry is the same stateless per-row scrub
    // (bit-identical under any micro-batching), so it shares E11's
    // oracle verbatim.
    "stream_pii" -> piiSql,

    // Top-K vocabulary cut is a total order (count DESC, token ASC),
    // so the boundary tie is deterministic in both engines. Integer
    // '/' is double division in DuckDB, matching Spark's Column./.
    "text_oov" -> {
      val k = graft.functions.TextQueries.OovVocabK
      raw"""WITH t AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |                       w -> w <> '')) AS tok
         |  FROM documents),
         |v AS (
         |  SELECT tok FROM (
         |    SELECT tok, count(*) AS cnt FROM t GROUP BY tok)
         |  ORDER BY cnt DESC, tok ASC LIMIT $k),
         |m AS (
         |  SELECT t.doc_id,
         |    CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
         |  FROM t LEFT JOIN v USING (tok))
         |SELECT doc_id, count(*)::int AS n_tokens, sum(oov)::int AS n_oov,
         |  round(sum(oov) / count(*), 4) AS oov_ratio
         |FROM m GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
    },

    // Mean corpus token frequency per doc: Σ cnt / (n_tokens · N) with
    // both operands exact integers, ONE double division (correctly
    // rounded IEEE, bit-exact cross-engine). Casts keep DuckDB's
    // hugeint sums out of the division.
    "text_typicality" ->
      raw"""WITH t AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |                       w -> w <> '')) AS tok
         |  FROM documents),
         |v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
         |nt AS (SELECT sum(cnt)::bigint AS n_total FROM v)
         |SELECT t.doc_id, count(*)::int AS n_tokens,
         |  sum(v.cnt)::bigint AS sum_cnt, min(v.cnt)::bigint AS min_cnt,
         |  round(sum(v.cnt)::bigint / (count(*) * nt.n_total), 6)
         |    AS typicality
         |FROM t JOIN v USING (tok) CROSS JOIN nt
         |GROUP BY t.doc_id, nt.n_total
         |ORDER BY t.doc_id""".stripMargin,

    // Corpus card per (source, lang): integer sums, exact single
    // divisions only — no FP accumulation.
    "corpus_stats" ->
      raw"""WITH pd AS (
         |  SELECT source, lang,
         |    len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |                    w -> w <> '')) AS n_tok,
         |    length(text) AS n_chars
         |  FROM documents),
         |tot AS (SELECT count(*) AS total_docs FROM pd)
         |SELECT source, lang, count(*)::int AS n_docs,
         |  sum(n_tok)::bigint AS n_tokens, sum(n_chars)::bigint AS n_chars,
         |  round(sum(n_tok)::bigint / count(*), 4) AS tokens_per_doc,
         |  round(count(*) / tot.total_docs, 6) AS doc_share
         |FROM pd CROSS JOIN tot
         |GROUP BY source, lang, tot.total_docs
         |ORDER BY source, lang""".stripMargin,

    // Quality deciles per language over the SAME single-sourced
    // quality CTE + score expression as text_quality/curate. ntile
    // over the total (quality, doc_id) order is deterministic; min/
    // max fold the raw score (bit-exact cross-engine, the curate
    // floor contract) and round only for display.
    "quality_deciles" ->
      ("WITH " + qualityBaseCte("documents") + ",\n" +
      s"""s AS (
         |  SELECT doc_id, lang, $qualityExpr AS quality
         |  FROM q_base),
         |t AS (
         |  SELECT lang, quality,
         |    ntile(10) OVER (PARTITION BY lang
         |                    ORDER BY quality, doc_id) AS decile
         |  FROM s)
         |SELECT lang, decile::int AS decile, count(*) AS n_docs,
         |  round(min(quality), 4) AS q_min,
         |  round(max(quality), 4) AS q_max
         |FROM t
         |GROUP BY lang, decile
         |ORDER BY lang, decile""".stripMargin),

    // Top-k bigrams per language: the same \s+ tokenize-and-compact
    // as WordNgrams (the pack_sequences regex), 1-indexed adjacent
    // pairs via an end-exclusive range, integer counts, total
    // (n desc, bigram asc) tiebreak. k single-sourced from
    // TextQueries.TopNgramsK.
    "corpus_ngrams" -> {
      val k = graft.functions.TextQueries.TopNgramsK
      raw"""WITH t AS (
         |  SELECT lang,
         |    list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |                w -> w <> '') AS s
         |  FROM documents),
         |g AS (
         |  SELECT lang,
         |    unnest(list_transform(range(1, len(s)),
         |                          i -> s[i] || ' ' || s[i + 1])) AS bigram
         |  FROM t WHERE len(s) >= 2),
         |c AS (
         |  SELECT lang, bigram, count(*) AS n FROM g GROUP BY lang, bigram)
         |SELECT lang, rk::int AS rk, bigram, n FROM (
         |  SELECT lang, bigram, n,
         |    row_number() OVER (PARTITION BY lang
         |                       ORDER BY n DESC, bigram) AS rk
         |  FROM c)
         |WHERE rk <= $k
         |ORDER BY lang, rk""".stripMargin
    },

    // E vocabulary profile: all counts integer, both ratios divide the
    // same integers (::double numerator pins double division in both
    // engines).
    "text_hapax" ->
      raw"""WITH toks AS (
         |  SELECT source,
         |    unnest(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |                       w -> w <> '')) AS term
         |  FROM documents),
         |tf AS (SELECT source, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |d AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
         |v AS (
         |  SELECT source, sum(tf) AS n_tokens, count(*) AS vocab,
         |    sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS hapax
         |  FROM tf GROUP BY 1)
         |SELECT v.source, d.n_docs::int AS n_docs,
         |  v.n_tokens::bigint AS n_tokens, v.vocab::bigint AS vocab,
         |  v.hapax::bigint AS hapax,
         |  round(v.vocab::double / v.n_tokens, 4) AS ttr,
         |  round(v.hapax::double / v.vocab, 4) AS hapax_ratio
         |FROM v JOIN d ON v.source = d.source
         |ORDER BY v.source""".stripMargin,

    // E collocations: rational lift (no ln — textBm25's exactness
    // discipline); numerator/denominator multiply in the same
    // left-assoc order as the Spark expression, rank on the unrounded
    // double with bigram tiebreak.
    "text_collocations" -> {
      val minC = graft.functions.TextQueries.CollocMinCount
      val k = graft.functions.TextQueries.CollocTopK
      raw"""WITH uni AS (
         |  SELECT term, count(*) AS c FROM (
         |    SELECT unnest(list_filter(
         |      string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |      w -> w <> '')) AS term
         |    FROM documents)
         |  GROUP BY term),
         |t AS (
         |  SELECT list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |                     w -> w <> '') AS s
         |  FROM documents),
         |bg AS (
         |  SELECT unnest(list_transform(range(1, len(s)),
         |                               i -> s[i] || ' ' || s[i + 1])) AS bigram
         |  FROM t WHERE len(s) >= 2),
         |bi AS (
         |  SELECT bigram, count(*) AS c_xy FROM bg
         |  GROUP BY bigram HAVING count(*) >= $minC),
         |tot AS (SELECT (SELECT sum(c) FROM uni) AS n_uni,
         |               (SELECT count(*) FROM bg) AS n_bi),
         |l AS (
         |  SELECT bi.bigram, bi.c_xy, ux.c AS c_x, uy.c AS c_y,
         |    (bi.c_xy::double * n_uni * n_uni) /
         |      (n_bi::double * ux.c * uy.c) AS lift
         |  FROM bi
         |  JOIN uni ux ON ux.term = string_split(bi.bigram, ' ')[1]
         |  JOIN uni uy ON uy.term = string_split(bi.bigram, ' ')[2]
         |  CROSS JOIN tot),
         |top AS (SELECT * FROM l ORDER BY lift DESC, bigram LIMIT $k)
         |SELECT bigram, c_xy::bigint AS c_xy, c_x::bigint AS c_x,
         |  c_y::bigint AS c_y, round(lift, 4) AS lift
         |FROM top ORDER BY bigram""".stripMargin
    },

    // Heavy-hitter bigrams above the exact 1/ShareDenom corpus share.
    // The oracle computes the full count table and cuts; the Spark
    // side must land on the identical set via MG-sketch candidates +
    // exact recount (the sketch's merge-order freedom is exactly what
    // the exact second pass erases). Integer cut, exact long/long
    // share division.
    "ngram_blocklist" -> {
      val denom = graft.operators.HeavyHitters.ShareDenom
      raw"""WITH t AS (
         |  SELECT list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |                     w -> w <> '') AS s
         |  FROM documents),
         |g AS (
         |  SELECT unnest(list_transform(range(1, len(s)),
         |                               i -> s[i] || ' ' || s[i + 1])) AS gram
         |  FROM t WHERE len(s) >= 2),
         |c AS (SELECT gram, count(*) AS n FROM g GROUP BY gram),
         |tot AS (SELECT sum(n)::bigint AS total FROM c)
         |SELECT gram, n, round(n / tot.total, 6) AS share
         |FROM c, tot
         |WHERE n * $denom > tot.total
         |ORDER BY n DESC, gram""".stripMargin
    },

    // E RAG chunking: same non-empty whitespace tokens as text_tokens,
    // start grid via unnest(range(0, n_tok, stride)) — geometry
    // single-sourced from TextQueries.ChunkWin/ChunkStride.
    "text_chunk" -> {
      val win = graft.functions.TextQueries.ChunkWin
      val st = graft.functions.TextQueries.ChunkStride
      s"""WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
        |                w -> w <> '') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n_tok
        |      FROM d WHERE len(toks) > 0),
        |s AS (SELECT doc_id, toks, n_tok,
        |        unnest(range(0, n_tok, $st)) AS start_tok
        |      FROM n)
        |SELECT doc_id, (start_tok // $st)::int AS chunk_id,
        |  start_tok::int AS start_tok,
        |  least($win, n_tok - start_tok)::int AS chunk_tokens,
        |  md5(array_to_string(
        |    list_slice(toks, start_tok + 1, start_tok + $win), ' ')) AS chunk_md5
        |FROM s
        |ORDER BY doc_id, chunk_id""".stripMargin
    },

    // E character entropy: integer char counts, entropy fold over the
    // count list sorted by character — accumulation order pinned, so
    // the double hash-gates exactly (ASCII corpus: regexp char
    // extraction ≡ Spark's split-by-empty).
    // E35 sentence segmentation (TextQueries.textSentences): the
    // terminator-chunk regex, space-trim and empty-drop mirror
    // TextFunctions.sentences; positions come from the kept list, so
    // unnest + generate_subscripts == Spark's posexplode exactly.
    "text_sentences" -> sentencesSql,

    // The G40 stream entry is the same stateless per-row segmentation
    // (bit-identical under any micro-batching) — shares E35's oracle
    // verbatim, the stream_readability precedent.
    "stream_sentences" -> sentencesSql,

    "text_entropy" ->
      raw"""WITH ch AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
        |  FROM documents),
        |cc AS (SELECT doc_id, c, count(*)::bigint AS n
        |       FROM ch GROUP BY 1, 2),
        |l AS (SELECT doc_id, list(n ORDER BY c) AS ns, sum(n)::bigint AS tot
        |      FROM cc GROUP BY 1)
        |SELECT doc_id, tot::int AS n_chars, len(ns)::int AS n_distinct,
        |  round(-list_reduce(
        |    list_transform(ns, x -> (x / tot) * log2(x / tot)),
        |    (a, b) -> a + b), 4) AS entropy
        |FROM l
        |ORDER BY doc_id""".stripMargin
  )

  /** Shared inverted-shingle-index CTE chain over `src` (must expose
    * doc_id, text), ending in `pairs_j(doc_a, doc_b, jac)` with
    * jac >= 0.5 — the SQL twin of Dedup.ngramPairsOf, used verbatim
    * by the three queries built on the pair graph so the df cut
    * (Dedup.NgramDfMax — single source of truth) and Jaccard algebra
    * can never drift apart between them. */
  /** E2's quality inputs as one CTE over `src` — single-sourced so
    * the text_quality and curate_corpus oracles can never drift apart
    * (they previously re-inlined the same formula twice). Mirrors
    * graft.functions.TextFunctions op-for-op. */
  /** The bigram-LM corpus passes — whitespace tokens, per-occurrence
    * bigrams with their prefix word, corpus bigram and unigram counts —
    * ending in `occ(doc_id, bigram, w1)`, `big(bigram, cnt2)`,
    * `uni(tok, cnt1)`. Shared verbatim by `text_bigram_lm` and
    * `quality_lm_buckets` so both gate one LM definition. */
  private def bigramLmCtes: String =
    raw"""t AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |                w -> w <> '') AS s
         |  FROM documents),
         |occ AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(s)),
         |                          i -> s[i] || ' ' || s[i + 1])) AS bigram,
         |    unnest(list_transform(range(1, len(s)), i -> s[i])) AS w1
         |  FROM t WHERE len(s) >= 2),
         |big AS (SELECT bigram, count(*) AS cnt2 FROM occ GROUP BY bigram),
         |uni AS (
         |  SELECT tok, count(*) AS cnt1 FROM (
         |    SELECT unnest(s) AS tok FROM t) GROUP BY tok)""".stripMargin

  /** The E24/G28 Gopher rule chain — per-doc term frequencies and
    * the five integer rule inputs, ending in `per`. (`def`, not
    * `val`: consumed by object vals declared earlier.) */
  /** E3 language-ID SQL — shared verbatim by `text_langid` and its
    * stateless streaming twin `stream_langid`. */
  private def langidSql: String =
    """SELECT doc_id, s_en::int AS s_en, s_de::int AS s_de,
      |  s_es::int AS s_es, s_fr::int AS s_fr,
      |  pred_lang, lang AS true_lang,
      |  (pred_lang = lang) AS is_match
      |FROM (
      |  SELECT *,
      |    CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
      |         WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
      |         WHEN s_es >= s_fr THEN 'es'
      |         ELSE 'fr' END AS pred_lang
      |  FROM (
      |    SELECT doc_id, lang,
      |      len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
      |          w -> w IN ('the','a','is','of'))) AS s_en,
      |      len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
      |          w -> w IN ('der','die','und'))) AS s_de,
      |      len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
      |          w -> w IN ('el','los','y'))) AS s_es,
      |      len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
      |          w -> w IN ('le','les','et'))) AS s_fr
      |    FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** E35/G40 sentence segmentation SQL — shared verbatim by
    * `text_sentences` and its stateless streaming twin
    * `stream_sentences` (the readabilitySql precedent). */
  private def sentencesSql: String =
    raw"""WITH s AS (
       |  SELECT doc_id,
       |    list_filter(list_transform(
       |      regexp_extract_all(text, '[^.!?]+[.!?]+|[^.!?]+$$'),
       |      x -> trim(x)), x -> x <> '') AS sents
       |  FROM documents),
       |u AS (
       |  SELECT doc_id, unnest(sents) AS sent,
       |    generate_subscripts(sents, 1) - 1 AS sent_id
       |  FROM s WHERE len(sents) > 0)
       |SELECT doc_id, sent_id::int AS sent_id,
       |  len(list_filter(string_split_regex(sent, '[ \t\n\x0B\f\r]+'),
       |      w -> w <> ''))::int AS n_tok,
       |  md5(sent) AS sent_md5
       |FROM u
       |ORDER BY doc_id, sent_id""".stripMargin

  /** E25/G39 Flesch readability SQL — shared verbatim by
    * `text_readability` and its stateless streaming twin
    * `stream_readability` (the langidSql precedent). */
  private def readabilitySql: String =
    raw"""WITH g AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
       |                    w -> w <> '')) AS n_tok,
       |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sent,
       |    len(regexp_extract_all(text, '[aeiou]+')) AS n_syl
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, n_tok, n_sent, n_syl,
       |    206.835::double - 1.015::double * (n_tok / n_sent)
       |      - 84.6::double * (n_syl / n_tok) AS flesch
       |  FROM g WHERE n_tok > 0)
       |SELECT doc_id, n_tok::int AS n_tok, n_sent::int AS n_sent,
       |  n_syl::int AS n_syllable_runs,
       |  round(n_syl / n_tok, 4) AS syl_per_word,
       |  round(flesch, 4) AS flesch,
       |  CASE WHEN flesch >= 60.0::double THEN 'easy'
       |       WHEN flesch >= 30.0::double THEN 'medium'
       |       ELSE 'hard' END AS band
       |FROM f ORDER BY doc_id""".stripMargin

  private def gopherCtes: String =
    raw"""tf AS (
       |  SELECT doc_id, w, count(*) AS c FROM (
       |    SELECT doc_id,
       |      unnest(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
       |                         w -> w <> '')) AS w
       |    FROM documents) GROUP BY doc_id, w),
       |per AS (
       |  SELECT doc_id, sum(c)::bigint AS n_tok,
       |    count(*)::bigint AS n_distinct, max(c)::bigint AS top_c,
       |    sum(length(w) * c)::bigint AS n_chars_tok,
       |    sum(CASE WHEN w IN ('the','a','is','of') THEN 1 ELSE 0
       |        END)::bigint AS n_stop_kinds
       |  FROM tf GROUP BY doc_id)""".stripMargin

  private def gopherRuleLen: String = {
    val Q = graft.functions.TextQueries
    s"n_tok >= ${Q.GopherTokMin} AND n_tok <= ${Q.GopherTokMax}"
  }
  private def gopherRuleWlen: String = {
    val Q = graft.functions.TextQueries
    s"n_chars_tok / n_tok >= ${Q.GopherWlenMin}" +
      s" AND n_chars_tok / n_tok <= ${Q.GopherWlenMax}"
  }
  private def gopherRuleDiv: String =
    s"n_distinct / n_tok >= ${graft.functions.TextQueries.GopherDivMin}"
  private def gopherRuleRep: String =
    s"top_c / n_tok <= ${graft.functions.TextQueries.GopherRepMax}"
  private def gopherRuleStop: String =
    s"n_stop_kinds >= ${graft.functions.TextQueries.GopherStopMin}"
  private def gopherRuleAll: String =
    s"($gopherRuleLen) AND ($gopherRuleWlen) AND ($gopherRuleDiv)" +
      s" AND ($gopherRuleRep) AND ($gopherRuleStop)"

  private def qualityBaseCte(src: String): String =
    raw"""q_base AS (
         |  SELECT doc_id, text, lang,
         |    len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |                    w -> w <> '')) AS n_tok,
         |    len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |        w -> w IN ('the','a','is','of')))
         |      / len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |                        w -> w <> '')) AS stop_ratio,
         |    len(regexp_extract_all(text, '[^a-z0-9 \t\n\x0B\f\r]'))
         |      / length(text) AS punct_ratio
         |  FROM $src)""".stripMargin

  /** The E2 composite score over [[qualityBaseCte]]'s columns —
    * TextFunctions.qualityScore's expression tree, verbatim.
    * (`def`, not `val`: the maps interpolating this are object vals
    * declared earlier in the file — a val here would still be null
    * when they initialize.) */
  private def qualityExpr: String =
    "0.5 * least(1.0, n_tok / 200.0) + 0.3 * (1.0 - stop_ratio)" +
      " + 0.2 * (1.0 - punct_ratio)"

  /** The df-cut inverted-shingle-index prefix (toks→sh0→sh) over
    * `src` — shared by the symmetric pair chain below AND the
    * asymmetric decontaminate chain, so the shingle definition and
    * df cut are single-sourced. `sfx` renames the CTEs so two chains
    * can coexist in one composed query (see curate_train). */
  /** The shared PQ code chain — e → cents → cd → codes → qd →
    * pq_pairs(q_id, n_id, score): the ADC-scored candidate stream,
    * consumed by `ann_pq` (top-5 straight off the codes) and
    * `ann_rerank` (top-R cut, then exact refine). Mirrors
    * Similarity.pqPairs; same Knuth-hash codebook seeds, first-max
    * sub-dot assignment (row_number d DESC, c_idx), score folded
    * over list(d ORDER BY m) == Spark's fixed d_0+…+d_15 tree.
    * (`def`, not `val`: consumed by object vals declared earlier.) */
  private def pqPairCtes: String = {
    val mul = graft.operators.Similarity.IvfHashMul
    val mod = graft.operators.Similarity.IvfHashMod
    val m = graft.operators.Similarity.PqSub
    val sd = 64 / m
    s"""e AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
      |  FROM embeddings),
      |cents AS (
      |  SELECT row_number() OVER (
      |      ORDER BY (vec_id * $mul) % $mod, vec_id) AS c_idx,
      |    v AS cv
      |  FROM e
      |  ORDER BY (vec_id * $mul) % $mod, vec_id
      |  LIMIT 16),
      |cd AS (
      |  SELECT e.vec_id, t.m, c.c_idx,
      |    list_reduce(
      |      list_transform(
      |        list_zip(e.v[t.m*$sd+1 : t.m*$sd+$sd],
      |                 c.cv[t.m*$sd+1 : t.m*$sd+$sd]),
      |        s -> s[1] * s[2]),
      |      (x, y) -> x + y) AS d
      |  FROM e, range(0, $m) t(m), cents c),
      |codes AS (
      |  SELECT vec_id, m, c_idx AS code FROM (
      |    SELECT vec_id, m, c_idx,
      |      row_number() OVER (PARTITION BY vec_id, m
      |                         ORDER BY d DESC, c_idx) AS rn
      |    FROM cd) WHERE rn = 1),
      |qd AS (SELECT vec_id AS q_id, m, c_idx, d FROM cd WHERE vec_id < 10),
      |pq_pairs AS (
      |  SELECT q.q_id, x.vec_id AS n_id,
      |    list_reduce(list(q.d ORDER BY q.m), (a, b) -> a + b) AS score
      |  FROM codes x JOIN qd q ON q.m = x.m AND q.c_idx = x.code
      |  WHERE x.vec_id <> q.q_id
      |  GROUP BY q.q_id, x.vec_id)""".stripMargin
  }

  /** Cut-free prefix (toks→sh0: distinct shingles, no df cut) — the
    * train side of the ingest-time decontaminate oracle uses exactly
    * this and nothing more (an unbounded train stream has no knowable
    * df), so it is its own helper rather than a dead `sh$sfx` CTE
    * carried along. */
  private def shingleDistinctCtes(src: String, sfx: String = ""): String =
    raw"""toks$sfx AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), w -> w <> '') AS w
         |  FROM $src),
         |sh0$sfx AS (
         |  SELECT doc_id,
         |    unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |                          FOR i IN range(1, len(w) - 1)])) AS s
         |  FROM toks$sfx WHERE len(w) >= 3)""".stripMargin

  private def shingleCtes(src: String, sfx: String = ""): String =
    shingleDistinctCtes(src, sfx) + ",\n" +
    raw"""sh$sfx AS (
         |  SELECT doc_id, s FROM (
         |    SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM sh0$sfx)
         |  WHERE df <= ${graft.operators.Dedup.NgramDfMax})""".stripMargin

  /** The full decontamination chain over `src`, ending in
    * `contam$sfx(eval_doc, train_doc, contain)` with contain ≥ τ —
    * shared verbatim by the standalone `decontaminate` entry and the
    * composed `curate_train` oracle. */
  private def decontamCtes(src: String, sfx: String = ""): String = {
    val ev = graft.operators.Decontaminate.EvalSource
    val tau = graft.operators.Decontaminate.Tau
    shingleCtes(src, sfx) + ",\n" +
    s"""srcs$sfx AS (SELECT doc_id, source FROM $src),
       |inter$sfx AS (
       |  SELECT a.doc_id AS eval_doc, b.doc_id AS train_doc,
       |    count(*) AS c
       |  FROM sh$sfx a
       |  JOIN srcs$sfx sa ON sa.doc_id = a.doc_id AND sa.source = '$ev'
       |  JOIN sh$sfx b ON b.s = a.s
       |  JOIN srcs$sfx sb ON sb.doc_id = b.doc_id AND sb.source <> '$ev'
       |  GROUP BY 1, 2),
       |sizes$sfx AS (SELECT doc_id, count(*) AS n FROM sh$sfx GROUP BY 1),
       |contam$sfx AS (
       |  SELECT eval_doc, train_doc, c::double / n AS contain
       |  FROM inter$sfx JOIN sizes$sfx ON sizes$sfx.doc_id = eval_doc
       |  WHERE c::double / n >= $tau)""".stripMargin
  }

  private def ngramPairCtes(src: String): String =
    shingleCtes(src) + ",\n" +
    raw"""sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs_j AS (
         |  SELECT doc_a, doc_b, jac FROM (
         |    SELECT doc_a, doc_b, c::double / (sa.n + sb.n - c) AS jac
         |    FROM inter
         |    JOIN sizes sa ON sa.doc_id = doc_a
         |    JOIN sizes sb ON sb.doc_id = doc_b)
         |  WHERE jac >= 0.5)""".stripMargin

  /** Connected components over `pairs_j`: recursive closure, min
    * reachable label per node — the closed form of Spark's
    * min-label-propagation fixpoint (Dedup.componentLabels). */
  private val componentCtes: String =
    """edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs_j
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM pairs_j),
      |reach AS (
      |  SELECT DISTINCT src AS node, src AS lbl FROM edges
      |  UNION
      |  SELECT e.dst AS node, r.lbl AS lbl
      |  FROM reach r JOIN edges e ON e.src = r.node),
      |comp AS (SELECT node, min(lbl) AS rep_doc FROM reach GROUP BY node)""".stripMargin

  /** SURVEY §2C — dedup (SQL-expressible subset; minhash/simhash are
    * rows-only + property-tested). */
  val dedup: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS rep_doc,
        |  count(*) AS n_dups
        |FROM documents
        |GROUP BY 1
        |ORDER BY text_hash""".stripMargin,

    // C20 canonicalized-URL dedup (Dedup.dedupUrl): the messy-URL
    // synthesis and the canonicalizer are mirrored op-for-op; every
    // regexp is anchored (≤1 match), so DuckDB's replace-first ==
    // Spark's replace-all on every input.
    "dedup_url" ->
      raw"""WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTP' END)
        |    || '://'
        |    || (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
        |    || (CASE WHEN doc_id % 3 = 0 THEN upper(source)
        |             ELSE source END)
        |    || (CASE WHEN doc_id % 3 = 1 THEN '.EXAMPLE.COM'
        |             ELSE '.example.com' END)
        |    || '/docs/' || (doc_id % 40)
        |    || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
        |    || (CASE WHEN doc_id % 4 = 0
        |               THEN '?utm_source=feed&utm_campaign=c'
        |                    || (doc_id % 3)
        |             WHEN doc_id % 4 = 1 THEN '?fbclid=x' || doc_id
        |             ELSE '' END)
        |    || (CASE WHEN doc_id % 6 = 0 THEN '#sec' || (doc_id % 5)
        |             ELSE '' END) AS url
        |  FROM documents),
        |p1 AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(url, '#.*$$', ''),
        |                   '^[a-zA-Z][a-zA-Z0-9+.-]*://', '') AS a
        |  FROM u),
        |p2 AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(regexp_extract(a, '^[^/?]+')),
        |                   '^www\.', '') AS host,
        |    regexp_replace(a, '^[^/?]+', '') AS rest
        |  FROM p1),
        |p3 AS (
        |  SELECT doc_id, host,
        |    regexp_replace(regexp_replace(rest, '\?.*$$', ''),
        |                   '/+$$', '') AS path,
        |    regexp_extract(rest, '\?(.*)$$', 1) AS query
        |  FROM p2),
        |p4 AS (
        |  SELECT doc_id, host, path,
        |    array_to_string(list_sort(list_filter(
        |      string_split(query, '&'),
        |      p -> p <> '' AND NOT regexp_matches(p,
        |        '^(utm_[a-z]+|fbclid|gclid)='))), '&') AS kept
        |  FROM p3)
        |SELECT host || path
        |    || (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END)
        |    AS canon_url,
        |  min(doc_id) AS rep_doc, count(*) AS n_dups
        |FROM p4
        |GROUP BY 1
        |ORDER BY canon_url""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH ${ngramPairCtes("documents")}
         |SELECT doc_a, doc_b, round(jac, 4) AS jac
         |FROM pairs_j
         |ORDER BY doc_a, doc_b""".stripMargin,

    // C15 containment pairs: the SAME shared shingle chain (df cut
    // included) as C2; only the final ratio differs — |A∩B|/|A| and
    // /|B| on identical integer operands, τ on the unrounded greater
    // direction (both engines compute the identical division).
    "dedup_containment" -> {
      val tau = graft.operators.Dedup.ContainTau
      s"""WITH ${shingleCtes("documents")},
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pr AS (
         |  SELECT doc_a, doc_b,
         |    c::double / sa.n AS c_ab, c::double / sb.n AS c_ba
         |  FROM inter
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b)
         |SELECT doc_a, doc_b, round(c_ab, 4) AS contain_ab,
         |  round(c_ba, 4) AS contain_ba
         |FROM pr WHERE greatest(c_ab, c_ba) >= $tau
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    // Same algebra as Dedup.dedupSubstring: k-grams via k-1 leads over
    // per-doc position order, corpus-wide occurrence count >= 2,
    // gaps-and-islands merge of consecutive repeated positions into
    // maximal spans. k and the span floor are single-sourced.
    "dedup_substring" -> {
      val k = graft.operators.Dedup.SubstrK
      val leads = (1 until k).map(i =>
        s"lead(tok, $i) OVER (PARTITION BY doc_id ORDER BY pos)")
      // regex split + empty filter mirrors Spark's split("\s+") with
      // the ""-head artifact dropped — both engines number the same
      // token stream (file convention: string_split_regex everywhere).
      // The whitespace class is spelled out because Java's \s is
      // [ \t\n\x0B\f\r] while RE2's excludes \x0B — a vertical tab in
      // a document would otherwise split differently per engine.
      raw"""WITH d AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |                w -> w <> '') AS t
         |  FROM documents),
         |toks AS (
         |  SELECT doc_id, i - 1 AS pos, t[i] AS tok
         |  FROM d, unnest(range(1, len(t) + 1)) AS r(i)),
         |grams0 AS (
         |  SELECT doc_id, pos,
         |    concat_ws(' ', tok, ${leads.mkString(", ")}) AS g,
         |    ${leads.last} AS last_tok
         |  FROM toks),
         |grams AS (
         |  SELECT doc_id, pos, g FROM grams0 WHERE last_tok IS NOT NULL),
         |rep AS (
         |  SELECT doc_id, pos,
         |    count(*) OVER (PARTITION BY g) AS cnt
         |  FROM grams),
         |runs AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
         |      AS grp
         |  FROM rep WHERE cnt >= 2),
         |spans AS (
         |  SELECT doc_id, min(pos) AS start_pos,
         |    max(pos) + ${k - 1} AS end_pos
         |  FROM runs GROUP BY doc_id, grp)
         |SELECT doc_id, start_pos::int AS start_pos, end_pos::int AS end_pos,
         |  (end_pos - start_pos + 1)::int AS n_tokens
         |FROM spans
         |WHERE end_pos - start_pos + 1 >= ${graft.operators.Dedup.SubstrMinSpan}
         |ORDER BY doc_id, start_pos""".stripMargin
    },

    // Incremental ingest gate: batch (doc_id % m = r) probed against
    // the corpus. Shares the sh CTE (df cut over corpus AND batch)
    // with the symmetric pair chain so the shingle definition cannot
    // drift; the Jaccard algebra is C2's, asymmetrically joined.
    "dedup_incremental" -> {
      val m = graft.operators.Incremental.BatchMod
      val r = graft.operators.Incremental.BatchRem
      val tau = graft.operators.Incremental.Tau
      s"""WITH ${shingleCtes("documents")},
         |h AS (SELECT doc_id, md5(text) AS h,
         |             (doc_id % $m = $r) AS is_new
         |      FROM documents),
         |corpus_h AS (SELECT DISTINCT h FROM h WHERE NOT is_new),
         |batch AS (
         |  SELECT doc_id, h,
         |    min(doc_id) OVER (PARTITION BY h) AS first_in_batch
         |  FROM h WHERE is_new),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS new_doc, b.doc_id AS corp_doc, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s
         |  WHERE a.doc_id % $m = $r AND NOT (b.doc_id % $m = $r)
         |  GROUP BY 1, 2),
         |near AS (
         |  SELECT DISTINCT new_doc FROM inter
         |  JOIN sizes sa ON sa.doc_id = new_doc
         |  JOIN sizes sb ON sb.doc_id = corp_doc
         |  WHERE c::double / (sa.n + sb.n - c) >= $tau)
         |SELECT doc_id,
         |  (h IN (SELECT h FROM corpus_h)
         |   OR doc_id > first_in_batch) AS exact_dup,
         |  (doc_id IN (SELECT new_doc FROM near)) AS near_dup,
         |  (NOT (h IN (SELECT h FROM corpus_h) OR doc_id > first_in_batch)
         |   AND doc_id NOT IN (SELECT new_doc FROM near)) AS keep
         |FROM batch
         |ORDER BY doc_id""".stripMargin
    },

    "dedup_components" ->
      s"""WITH RECURSIVE ${ngramPairCtes("documents")},
         |$componentCtes
         |SELECT c.node AS doc_id, c.rep_doc, s.n_members
         |FROM comp c
         |JOIN (SELECT rep_doc, count(*) AS n_members
         |      FROM comp GROUP BY rep_doc) s
         |  ON c.rep_doc = s.rep_doc
         |ORDER BY doc_id""".stripMargin,

    // C16 shingle novelty (Dedup.corpusNovelty): the shared shingle
    // definition (no df cut — no self-join to square), min-per-
    // shingle first doc, integer counts + one division.
    "corpus_novelty" ->
      ("WITH " + shingleDistinctCtes("documents") + ",\n" +
      """first AS (SELECT s, min(doc_id) AS fd FROM sh0 GROUP BY s)
        |SELECT d.doc_id, count(*)::bigint AS n_shingles,
        |  sum(CASE WHEN f.fd = d.doc_id THEN 1 ELSE 0 END)::bigint
        |    AS n_novel,
        |  round(sum(CASE WHEN f.fd = d.doc_id THEN 1 ELSE 0 END)::double
        |        / count(*)::double, 4) AS novelty
        |FROM sh0 d JOIN first f ON f.s = d.s
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin),

    // C15 dedup yield report (Dedup.dedupStats): size histogram over
    // the same recursive components, singleton row = corpus total −
    // clustered; pure integer + one division ⇒ full hash gate.
    "dedup_stats" ->
      s"""WITH RECURSIVE ${ngramPairCtes("documents")},
         |$componentCtes,
         |sz AS (
         |  SELECT rep_doc, count(*)::bigint AS n_members
         |  FROM comp GROUP BY rep_doc),
         |tot AS (SELECT count(*)::bigint AS n_total FROM documents),
         |hist AS (
         |  SELECT n_members, count(*)::bigint AS n_clusters
         |  FROM sz GROUP BY n_members
         |  UNION ALL
         |  SELECT 1::bigint AS n_members,
         |    (SELECT n_total FROM tot) -
         |      (SELECT coalesce(sum(n_members), 0)::bigint FROM sz)
         |    AS n_clusters)
         |SELECT n_members, n_clusters,
         |  (n_members * n_clusters)::bigint AS n_docs,
         |  ((n_members - 1) * n_clusters)::bigint AS n_removable,
         |  round((n_members * n_clusters)::double /
         |        (SELECT n_total FROM tot)::double, 4) AS pct_of_corpus
         |FROM hist
         |WHERE n_clusters > 0
         |ORDER BY n_members""".stripMargin,

    // C11: components × the shared quality CTE (single-sourced with
    // text_quality / curate — the election and the quality report
    // cannot drift). Ranking compares UNROUNDED quality, ties break
    // on node — the same total order as the Spark window.
    "dedup_best_rep" ->
      ("WITH RECURSIVE " + qualityBaseCte("documents") + ",\n" +
        ngramPairCtes("documents") + ",\n" + componentCtes + ",\n" +
        s"""scored AS (
          |  SELECT c.node, c.rep_doc AS comp_id, $qualityExpr AS quality
          |  FROM comp c JOIN q_base q ON q.doc_id = c.node),
          |ranked AS (
          |  SELECT node, comp_id, quality,
          |    row_number() OVER (PARTITION BY comp_id
          |                       ORDER BY quality DESC, node) AS rn
          |  FROM scored),
          |best AS (
          |  SELECT comp_id, node AS rep_doc FROM ranked WHERE rn = 1)
          |SELECT r.node AS doc_id, b.rep_doc,
          |  round(r.quality, 4) AS quality,
          |  (r.node = b.rep_doc) AS is_rep
          |FROM ranked r JOIN best b USING (comp_id)
          |ORDER BY doc_id""".stripMargin),

    "dedup_embed_cosine" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(
        |      list_transform(list_zip(v, v), s -> s[1] * s[2]),
        |      (x, y) -> x + y)) AS nrm
        |  FROM e),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.nrm AS na, b.nrm AS nb,
        |    list_reduce(
        |      list_transform(list_zip(a.v, b.v), s -> s[1] * s[2]),
        |      (x, y) -> x + y) AS dot
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(dot / (na * nb), 4) AS cos
        |FROM pairs
        |WHERE dot / (na * nb) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    // C12 semantic decontamination: eval = the fixed vec_id prefix,
    // strict-fold dots, divisor order train·eval, threshold on the
    // unrounded double — mirrors Decontaminate.decontaminateSemantic.
    "decontaminate_semantic" -> {
      val D = graft.operators.Decontaminate
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, v,
         |    sqrt(list_reduce(
         |      list_transform(list_zip(v, v), s -> s[1] * s[2]),
         |      (x, y) -> x + y)) AS nrm
         |  FROM e),
         |p AS (
         |  SELECT t.vec_id AS train_id, q.vec_id AS eval_id,
         |    list_reduce(
         |      list_transform(list_zip(t.v, q.v), s -> s[1] * s[2]),
         |      (x, y) -> x + y) / (t.nrm * q.nrm) AS cos
         |  FROM n t JOIN n q
         |    ON q.vec_id < ${D.EvalVecIds} AND t.vec_id >= ${D.EvalVecIds})
         |SELECT train_id, eval_id, round(cos, 4) AS cos
         |FROM p WHERE cos >= ${D.SemTau}
         |ORDER BY train_id, eval_id""".stripMargin
    },

    // SemDeDup: the scaled IVF quantizer CTEs pin the cell structure
    // to Similarity.ivfBase at nLists = max(SemLists, ⌊√n⌋) exactly
    // (the knn_graph_ivf dial); candidates are MULTI-PROBED — every
    // vector's SemProbe best cells (d DESC, c_idx DESC — the
    // knn_graph_ivf probe tie rule), a pair qualifies when any probed
    // cell coincides (DISTINCT: a pair can meet in up to p cells). A
    // vector is dropped iff some smaller-id candidate clears τ, rep =
    // the smallest such neighbor. Same strict-fold cosine (and
    // divisor order lo·hi) as C5.
    "dedup_semantic" -> {
      val tau = graft.operators.Dedup.SemTau
      val p = graft.operators.Dedup.SemProbe
      s"""${ivfAssignCtesScaled(graft.operators.Dedup.SemLists)},
        |probes AS (
        |  SELECT vec_id, c_idx AS cell FROM (
        |    SELECT vec_id, c_idx, row_number() OVER (
        |        PARTITION BY vec_id ORDER BY d DESC, c_idx DESC) AS rn
        |    FROM dots) WHERE rn <= $p),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS lo, b.vec_id AS hi
        |  FROM probes a JOIN probes b
        |    ON b.cell = a.cell AND a.vec_id < b.vec_id),
        |pr AS (
        |  SELECT lo, hi,
        |    list_reduce(
        |      list_transform(list_zip(na.v, nb.v), s -> s[1] * s[2]),
        |      (x, y) -> x + y) / (na.nrm * nb.nrm) AS cos
        |  FROM cand
        |  JOIN n na ON na.vec_id = lo
        |  JOIN n nb ON nb.vec_id = hi),
        |drops AS (
        |  SELECT hi AS vec_id, min(lo) AS rep_id,
        |    count(*)::int AS n_smaller_near
        |  FROM pr WHERE cos >= $tau GROUP BY hi)
        |SELECT s.vec_id, s.list_id, d.rep_id IS NULL AS kept,
        |  coalesce(d.rep_id, s.vec_id) AS rep_id,
        |  coalesce(d.n_smaller_near, 0)::int AS n_smaller_near
        |FROM assigned s LEFT JOIN drops d ON d.vec_id = s.vec_id
        |ORDER BY s.vec_id""".stripMargin
    },

    // Per-embedding QC stats. Sequential list_reduce folds match
    // VecStatsD's strict index-order accumulation bit-for-bit: the
    // seedless list_reduce starts at element 1, VecStatsD at 0.0 —
    // equivalent for norm²/max_abs because x² and |x| are
    // non-negative, and for the sum because `sm + 0.0` below
    // normalizes the one case where the seed is visible (an
    // all--0.0 vector folds to -0.0 seedless but +0.0 from a 0.0
    // seed; x + 0.0 == x bit-exactly for every other double).
    // greatest() is NaN-propagating in DuckDB exactly as VecStatsD's
    // max_abs loop is (VectorSpec's NaN rows). Zero-length guard:
    // seedless list_reduce ERRORS on an empty list, so each fold is
    // gated on len(v) — an empty embedding then surfaces as a
    // visible NULL-vs-0.0 row diff against VecStatsD's (0, 0, 0),
    // never as an oracle crash. is_unit compares the UNROUNDED norm
    // against the single-sourced tolerance.
    // D drift monitor: all cross-row reduction is integer (fixed-
    // point component sums, integral-div means — DuckDB // truncates
    // toward zero exactly like Spark div, verified on negatives);
    // the only FP ops are two correctly-rounded sqrts and one
    // division, mirrored op-for-op.
    "embed_drift" -> {
      val sc = graft.operators.Similarity.DriftScale
      raw"""WITH comps AS (
         |  SELECT label, unnest(range(0, len(embedding))) AS d,
         |    unnest(list_transform(embedding,
         |      x -> floor(x::double * $sc)::bigint)) AS q
         |  FROM embeddings),
         |bysum AS (
         |  SELECT label, d, sum(q)::bigint AS s, count(*)::bigint AS n
         |  FROM comps GROUP BY label, d),
         |labmean AS (SELECT label, d, s // n AS m, n FROM bysum),
         |gmean AS (
         |  SELECT d, sum(s)::bigint // sum(n)::bigint AS g
         |  FROM bysum GROUP BY d),
         |dots AS (
         |  SELECT label, sum(m * g)::bigint AS dot,
         |    sum(m * m)::bigint AS nl, sum(g * g)::bigint AS ng,
         |    max(n) AS n_vecs
         |  FROM labmean JOIN gmean USING (d) GROUP BY label)
         |SELECT label, n_vecs::int AS n_vecs,
         |  round(sqrt(nl) / $sc, 6) AS centroid_norm,
         |  round(dot / (sqrt(nl) * sqrt(ng)), 6) AS cos_to_global
         |FROM dots ORDER BY label""".stripMargin
    },

    "embed_stats" -> {
      val tol = graft.operators.Similarity.UnitNormTol
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
         |  FROM embeddings),
         |s AS (
         |  SELECT vec_id, len(v)::int AS dim,
         |    CASE WHEN len(v) = 0 THEN NULL ELSE sqrt(list_reduce(
         |      list_transform(list_zip(v, v), p -> p[1] * p[2]),
         |      (x, y) -> x + y)) END AS nrm,
         |    CASE WHEN len(v) = 0 THEN NULL
         |      ELSE list_reduce(v, (x, y) -> x + y) + 0.0 END AS sm,
         |    CASE WHEN len(v) = 0 THEN NULL
         |      ELSE list_reduce(list_transform(v, x -> abs(x)),
         |        (x, y) -> greatest(x, y)) END AS mab
         |  FROM e)
         |SELECT vec_id, dim, round(nrm, 4) AS norm,
         |  round(sm / dim, 4) AS mean, round(mab, 4) AS max_abs,
         |  abs(nrm - 1.0) <= $tol AS is_unit
         |FROM s
         |ORDER BY vec_id""".stripMargin
    },

    // Stratified rebalance sample: keep iff first 16 md5 bits (as
    // 4-char lowercase hex — fixed-width hex compare IS the numeric
    // compare) sort below the per-lang threshold. Seed + thresholds
    // are single-sourced from graft.operators.Sampling so Spark and
    // oracle cannot drift.
    // Sequence packing: running token total per source shard in doc_id
    // order; window = start_off div budget, offset = start_off % budget.
    // Token count is text_tokens' n_ws_tokens form; budget single-
    // sourced from Sampling.PackBudget. Pure integer algebra.
    "pack_sequences" -> packSequencesSql,

    "sample_stratified" -> stratifiedSampleSql,

    // J11 deterministic holdout split: same md5-hex fate function as
    // the stratified sampler (lowercase-hex string compare IS the
    // 16-bit numeric compare), fences single-sourced from Sampling.
    // J14 time split: one quantile_cont cutoff (interpolation
    // bit-equal to Spark percentile on integer seconds), boundary
    // compares on the unrounded double, embargo fences mirrored.
    "sample_time_split" -> {
      val S = graft.operators.Sampling
      s"""WITH ev AS (
         |  SELECT event_id, user_id,
         |    epoch(date_trunc('second', ts))::bigint AS ep
         |  FROM events),
         |c AS (SELECT quantile_cont(ep, ${S.TimeSplitQ}) AS t_cut FROM ev)
         |SELECT event_id, user_id, ep,
         |  CASE WHEN ep <= t_cut THEN 'train'
         |       WHEN ep > t_cut + ${S.TimeSplitEmbargoDays * 86400L}
         |         THEN 'test'
         |       ELSE 'embargo' END AS split
         |FROM ev, c
         |ORDER BY event_id""".stripMargin
    },

    "sample_split" -> {
      val seed = graft.operators.Sampling.SplitSeed
      val tr = graft.operators.Sampling.SplitTrainMax
      val va = graft.operators.Sampling.SplitValMax
      s"""SELECT doc_id, lang, bucket,
         |  CASE WHEN bucket < '$tr' THEN 'train'
         |       WHEN bucket < '$va' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (
         |  SELECT doc_id, lang,
         |    substr(md5('$seed' || doc_id::varchar), 1, 4) AS bucket
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    // J12 leakage-safe split: the J11 fate function keyed on
    // coalesce(near-dup component rep, doc_id) — components via the
    // shared C2/C6 CTE chain (ngramPairCtes + componentCtes, the
    // dedup_components algebra verbatim), so cluster membership
    // cannot drift between the split and the dedup report.
    "sample_leakage_split" -> {
      val seed = graft.operators.Sampling.SplitSeed
      val tr = graft.operators.Sampling.SplitTrainMax
      val va = graft.operators.Sampling.SplitValMax
      s"""WITH RECURSIVE ${ngramPairCtes("documents")},
         |$componentCtes,
         |r AS (
         |  SELECT d.doc_id, d.lang,
         |    coalesce(c.rep_doc, d.doc_id) AS rep_doc
         |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
         |b AS (
         |  SELECT doc_id, lang, rep_doc,
         |    substr(md5('$seed' || rep_doc::varchar), 1, 4) AS bucket
         |  FROM r)
         |SELECT doc_id, lang, rep_doc, bucket,
         |  CASE WHEN bucket < '$tr' THEN 'train'
         |       WHEN bucket < '$va' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b
         |ORDER BY doc_id""".stripMargin
    },

    // J13 soft dedup: 1/multiplicity weight over exact-dup groups;
    // count window is exact integer algebra, reciprocal rounds via
    // round ↔ roundDuck. 1.0::double keeps the division IEEE (bare
    // 1.0 is DECIMAL in DuckDB — different quotient algebra).
    "mix_soft_dedup" ->
      """SELECT doc_id, lang, n_dups,
        |  round(1.0::double / n_dups, 6) AS weight
        |FROM (
        |  SELECT doc_id, lang,
        |    count(*) OVER (PARTITION BY md5(text)) AS n_dups
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // J DSIR importance weights (Sampling.mixDsir): add-1 unigram
    // log-ratio vs the 'en' target slice; one double product per
    // side, one IEEE division, one ln per token; per-doc sum is a
    // STRICT pos-ordered list_reduce fold ↔ Spark's aggregate HOF;
    // ln ulp class under round(4).
    "mix_dsir" -> {
      val lang = graft.operators.Sampling.DsirTargetLang
      raw"""WITH toks AS (
         |  SELECT doc_id, is_t,
         |    unnest(range(1, len(ws) + 1)) AS pos, unnest(ws) AS w
         |  FROM (
         |    SELECT doc_id, lang = '$lang' AS is_t,
         |      list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |                  x -> x <> '') AS ws
         |    FROM documents)),
         |model AS (
         |  SELECT w, sum(CASE WHEN is_t THEN 1 ELSE 0 END)::bigint AS ct,
         |    count(*)::bigint AS cr
         |  FROM toks GROUP BY 1),
         |tot AS (SELECT sum(ct)::bigint AS nt, sum(cr)::bigint AS nr,
         |    count(*)::bigint AS v FROM model),
         |terms AS (
         |  SELECT doc_id, pos,
         |    ln(((ct + 1)::double * (nr + v)) /
         |       ((cr + 1)::double * (nt + v))) AS term
         |  FROM toks JOIN model USING (w) CROSS JOIN tot)
         |SELECT doc_id, count(*)::bigint AS n_tokens,
         |  round(list_reduce(list(term ORDER BY pos), (a, b) -> a + b),
         |    4) AS dsir_logratio
         |FROM terms GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
    },

    // J14 in-batch negatives: 32-bit md5 batch bucket mod the scaled
    // batch count (DuckDB 0x-cast vs Spark conv(,16,10)); the
    // per-anchor cut orders by a second fixed-width-hex draw —
    // lexical compare = numeric compare, all integers.
    // J19 token-budget allocation (Sampling.mixTokensBudget): pure
    // integer largest-remainder apportionment off an IEEE-exact
    // sqrt weight — no FP share ever materializes.
    "mix_tokens_budget" -> {
      val b = graft.operators.Sampling.TokBudget
      raw"""WITH tk AS (
         |  SELECT source, count(*)::bigint AS n_docs,
         |    sum(len(list_filter(
         |      string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |      x -> x <> '')))::bigint AS n_tokens
         |  FROM documents GROUP BY 1),
         |w AS (SELECT *,
         |    floor(sqrt(n_tokens::double * 1000000.0))::bigint AS w
         |  FROM tk),
         |s AS (SELECT *, sum(w) OVER () AS wsum FROM w),
         |q AS (SELECT *, ($b * w) // wsum AS quota0,
         |    ($b * w) % wsum AS rem FROM s),
         |d AS (SELECT *, $b - sum(quota0) OVER () AS deficit,
         |    row_number() OVER (ORDER BY rem DESC, source) AS rk
         |  FROM q)
         |SELECT source, n_docs, n_tokens, w,
         |  (quota0 + CASE WHEN rk <= deficit THEN 1 ELSE 0 END)::bigint
         |    AS quota
         |FROM d
         |ORDER BY source""".stripMargin
    },

    // J21 weighted (PPS) systematic sampling (Sampling.sampleWeighted):
    // k equally-spaced pointers over the cumulative-weight axis of the
    // salted-md5 traversal order; the pointer-count comparison is pure
    // long algebra ((2j+1)·W < 2k·C — no pointer ever materializes as
    // FP), the bucketed two-level cumsum equals the global one
    // bit-for-bit, all div operands non-negative (// == Spark div).
    "sample_weighted" -> {
      val S = graft.operators.Sampling
      val k = S.WSampleK
      val hw = S.WSampleHexWidth
      raw"""WITH d AS (
         |  SELECT doc_id,
         |    greatest(len(list_filter(
         |      string_split_regex(text, '[ \t\n\x0B\f\r]+'),
         |      x -> x <> ''))::bigint, 1) AS w,
         |    md5('${S.WSampleSeed}' || doc_id::varchar) AS h
         |  FROM documents),
         |b AS (SELECT *, substr(h, 1, $hw) AS bk FROM d),
         |pb AS (SELECT bk, sum(w)::bigint AS bw FROM b GROUP BY 1),
         |pre AS (SELECT bk,
         |    coalesce(sum(bw) OVER (ORDER BY bk
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      0)::bigint AS p,
         |    sum(bw) OVER ()::bigint AS tot
         |  FROM pb),
         |cum AS (
         |  SELECT x.doc_id, x.w, pre.tot,
         |    pre.p + sum(x.w) OVER (PARTITION BY x.bk
         |      ORDER BY x.h, x.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_hi
         |  FROM b x JOIN pre USING (bk)),
         |n AS (
         |  SELECT doc_id, w,
         |    (CASE WHEN ${2 * k} * c_hi <= tot THEN 0
         |          ELSE least($k, (${2 * k} * c_hi + tot - 1) // (2 * tot))
         |     END)
         |    - (CASE WHEN ${2 * k} * (c_hi - w) <= tot THEN 0
         |            ELSE least($k,
         |              (${2 * k} * (c_hi - w) + tot - 1) // (2 * tot))
         |       END) AS n_hits
         |  FROM cum)
         |SELECT doc_id, w AS weight, n_hits::int AS n_hits
         |FROM n WHERE n_hits >= 1
         |ORDER BY doc_id""".stripMargin
    },

    // J18 k-fold assignment (Sampling.sampleKfold): salted-md5 fold
    // (0x-cast == conv), integer counts + one share division.
    "sample_kfold" -> {
      val S = graft.operators.Sampling
      s"""WITH f AS (
         |  SELECT ('0x' || substr(md5('${S.KfoldSeed}'
         |      || doc_id::varchar), 1, 8))::bigint % ${S.KfoldK} AS fold
         |  FROM documents),
         |t AS (SELECT count(*)::bigint AS n_total FROM f)
         |SELECT fold, count(*)::bigint AS n_test,
         |  (SELECT n_total FROM t) - count(*)::bigint AS n_train,
         |  round(count(*)::double / (SELECT n_total FROM t)::double, 4)
         |    AS share
         |FROM f
         |GROUP BY fold
         |ORDER BY fold""".stripMargin
    },

    // J17 Poisson bootstrap (Sampling.sampleBootstrap): salted-md5
    // inverse-CDF draws (0x-cast == conv contract), indicator-sum k,
    // exact integer sums + one mean division ⇒ full hash gate.
    "sample_bootstrap" -> {
      val S = graft.operators.Sampling
      val cases = S.BootCdf.map(t =>
        s"CASE WHEN u >= $t THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH x AS (
         |  SELECT r.rep, d.doc_id, d.n_chars,
         |    ('0x' || substr(md5('${S.BootSeed}' || r.rep::varchar || ':'
         |        || d.doc_id::varchar), 1, 8))::bigint::double
         |      / 4294967296.0 AS u
         |  FROM documents d
         |  CROSS JOIN (SELECT unnest(range(0, ${S.BootReps})) AS rep) r),
         |k AS (
         |  SELECT rep, doc_id, n_chars, ($cases)::bigint AS k FROM x)
         |SELECT rep, sum(k)::bigint AS n_drawn,
         |  sum(CASE WHEN k > 0 THEN 1 ELSE 0 END)::bigint AS n_unique,
         |  round(sum(k * n_chars)::double / sum(k)::double, 4)
         |    AS mean_chars
         |FROM k
         |GROUP BY rep
         |ORDER BY rep""".stripMargin
    },

    "sample_negatives" -> {
      val S = graft.operators.Sampling
      raw"""WITH e AS (SELECT vec_id, label FROM embeddings),
         |nb AS (SELECT greatest(1, count(*) // ${S.NegBatchTarget})::bigint
         |         AS n_batches FROM e),
         |b AS (
         |  SELECT vec_id, label,
         |    ('0x' || substr(md5('${S.NegSeed}' || vec_id::varchar), 1, 8))::bigint
         |      % n_batches AS batch
         |  FROM e, nb),
         |pairs AS (
         |  SELECT a.vec_id AS anchor, a.label AS anchor_label,
         |    c.vec_id AS negative, c.label AS neg_label, a.batch
         |  FROM b a JOIN b c ON a.batch = c.batch AND a.label <> c.label),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY anchor
         |    ORDER BY md5('${S.NegRankSeed}' || anchor::varchar || ':'
         |                 || negative::varchar), negative) AS rn
         |  FROM pairs)
         |SELECT anchor, anchor_label, negative, neg_label, batch, rn
         |FROM ranked WHERE rn <= ${S.NegK}
         |ORDER BY anchor, rn""".stripMargin
    },

    // J10 importance sampling: keep iff 16-bit md5 bucket <
    // floor(quality·65536) — integer compare (DuckDB's 0x-cast vs
    // Spark's conv(,16,10)), quality single-sourced via qualityExpr.
    "sample_importance" -> {
      val seed = graft.operators.Sampling.ImportanceSeed
      val scale = graft.operators.Sampling.ImportanceScale
      "WITH " + qualityBaseCte("documents") + ",\n" +
      s"""s AS (
         |  SELECT doc_id, lang,
         |    ('0x' || substr(md5('$seed' || doc_id::varchar), 1, 4))::bigint
         |      AS bucket,
         |    floor(($qualityExpr) * $scale)::bigint AS thr,
         |    round($qualityExpr, 4) AS quality
         |  FROM q_base)
         |SELECT doc_id, lang, bucket, thr, quality
         |FROM s WHERE bucket < thr
         |ORDER BY doc_id""".stripMargin
    },

    // J10 balanced batches: per-lang salted-md5 rank mod B. Salt and
    // B single-sourced from Sampling.
    "mix_balanced_batches" -> {
      val seed = graft.operators.Sampling.BatchSeed
      val b = graft.operators.Sampling.NumBatches
      s"""WITH drawn AS (
         |  SELECT doc_id, lang,
         |    md5('$seed' || doc_id::varchar) AS draw
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |                       ORDER BY draw, doc_id) AS rk
         |  FROM drawn)
         |SELECT doc_id, lang, ((rk - 1) % $b)::int AS batch FROM r
         |ORDER BY doc_id""".stripMargin
    },

    // J9 exact-k stratified sample: full-width md5 draw, per-lang
    // row_number over the (draw, doc_id) total order, rank ≤ k. Salt
    // and k single-sourced from Sampling.
    "sample_exact_k" -> {
      val seed = graft.operators.Sampling.ExactKSeed
      val k = graft.operators.Sampling.ExactK
      s"""WITH drawn AS (
         |  SELECT doc_id, lang,
         |    md5('$seed' || doc_id::varchar) AS draw
         |  FROM documents),
         |r AS (
         |  SELECT lang, doc_id, draw,
         |    row_number() OVER (PARTITION BY lang
         |                       ORDER BY draw, doc_id)::int AS rk
         |  FROM drawn)
         |SELECT lang, rk, doc_id, draw FROM r
         |WHERE rk <= $k
         |ORDER BY lang, rk""".stripMargin
    },

    // J7 training-shard shuffle: shard = hex prefix of the salted
    // md5, pos = rank of the full hash within the shard. Salt and
    // prefix width single-sourced from Sampling; fixed-width
    // lowercase hex compares numerically in both engines.
    "corpus_shuffle" -> {
      val seed = graft.operators.Sampling.ShuffleSeed
      val k = graft.operators.Sampling.ShardHexWidth
      s"""SELECT doc_id, shard, pos::int AS pos FROM (
         |  SELECT doc_id, substr(h, 1, $k) AS shard,
         |    row_number() OVER (PARTITION BY substr(h, 1, $k)
         |                       ORDER BY h, doc_id) AS pos
         |  FROM (SELECT doc_id, md5('$seed' || doc_id::varchar) AS h
         |        FROM documents))
         |ORDER BY shard, pos""".stripMargin
    },

    // J8 curriculum layout: stage = quality quartile (1 = cleanest;
    // boundary docs go to the earlier stage — `<` on unrounded
    // bit-identical doubles), per-(stage, shard) rank = the J7
    // shuffle under the same salt. quantile_cont ↔ Spark percentile
    // interpolation equivalence is the q23 precedent; quality CTE
    // single-sourced with text_quality.
    "mix_curriculum" -> {
      val seed = graft.operators.Sampling.ShuffleSeed
      val k = graft.operators.Sampling.ShardHexWidth
      ("WITH " + qualityBaseCte("documents") + ",\n" +
        s"""scored AS (
          |  SELECT doc_id, $qualityExpr AS quality FROM q_base),
          |bs AS (
          |  SELECT quantile_cont(quality, 0.25) AS b1,
          |    quantile_cont(quality, 0.5) AS b2,
          |    quantile_cont(quality, 0.75) AS b3
          |  FROM scored),
          |staged AS (
          |  SELECT doc_id, quality,
          |    1 + (quality < b3)::int + (quality < b2)::int
          |      + (quality < b1)::int AS stage,
          |    md5('$seed' || doc_id::varchar) AS h
          |  FROM scored CROSS JOIN bs)
          |SELECT doc_id, stage, shard, pos::int AS pos,
          |  round(quality, 4) AS quality
          |FROM (
          |  SELECT doc_id, stage, quality, substr(h, 1, $k) AS shard,
          |    row_number() OVER (PARTITION BY stage, substr(h, 1, $k)
          |                       ORDER BY h, doc_id) AS pos
          |  FROM staged)
          |ORDER BY doc_id""".stripMargin)
    },

    // Mixture rebalance toward the declared per-source weight recipe:
    // thr is pure integer algebra over the per-source counts, the
    // draw is the same fixed-width-hex md5 compare as
    // sample_stratified under mixSources' own salt. ::bigint casts
    // keep DuckDB's window sum (HUGEINT) off the hex() path.
    // thr = 65536 (keep-all) bypasses the 4-char compare in BOTH
    // engines.
    "mix_sources" -> mixSourcesSql,

    // Temperature-flattened language rebalance (α = 0.5): the weight
    // is the INTEGER sqrt of the per-lang count (floor of the
    // correctly-rounded IEEE sqrt — bit-safe cross-engine below 2⁵²),
    // then mix_sources' integer threshold algebra verbatim and the
    // fixed-width-hex md5 draw under mixTemperature's own salt.
    "mix_temperature" -> {
      val seed = graft.operators.Sampling.TempSeed
      s"""WITH c AS (
         |  SELECT lang, count(*) AS cnt,
         |    floor(sqrt(count(*)))::bigint AS w
         |  FROM documents GROUP BY lang),
         |r AS (
         |  SELECT lang,
         |    least(65536, ((sum(cnt) OVER ())::bigint * w * 65536)
         |                 // ((sum(w) OVER ())::bigint * cnt)) AS thr
         |  FROM c),
         |s AS (
         |  SELECT d.doc_id, d.lang, r.thr,
         |    substr(md5('$seed' || d.doc_id::varchar), 1, 4) AS bucket,
         |    CASE WHEN r.thr >= 65536 THEN '10000'
         |         ELSE lpad(lower(hex(r.thr)), 4, '0') END AS thr_hex
         |  FROM documents d JOIN r USING (lang))
         |SELECT doc_id, lang, bucket, thr_hex
         |FROM s WHERE thr >= 65536 OR bucket < thr_hex
         |ORDER BY doc_id""".stripMargin
    },

    // Epoch upsampling toward the same recipe: base copies are the
    // integral part of thr_total/65536, the fractional extra copy is
    // the fixed-width-hex md5 draw under mixEpochs' own salt against
    // rem = thr_total mod 65536. Epoch ids come from an end-exclusive
    // range so n_copies = 0 emits nothing in both engines.
    "mix_epochs" -> {
      val seed = graft.operators.Sampling.EpochSeed
      val m = graft.operators.Sampling.MixWeightMod
      s"""WITH c AS (
         |  SELECT source, count(*) AS cnt,
         |    substr(source, 4)::bigint % $m + 1 AS w
         |  FROM documents GROUP BY source),
         |r AS (
         |  SELECT source,
         |    ((sum(cnt) OVER ())::bigint * w * 65536)
         |      // ((sum(w) OVER ())::bigint * cnt) AS thr_total
         |  FROM c),
         |s AS (
         |  SELECT d.doc_id, d.source,
         |    (r.thr_total // 65536) AS base,
         |    (r.thr_total % 65536) AS rem,
         |    substr(md5('$seed' || d.doc_id::varchar), 1, 4) AS bucket
         |  FROM documents d JOIN r USING (source)),
         |k AS (
         |  SELECT doc_id, source,
         |    (base + CASE WHEN bucket < lpad(lower(hex(rem)), 4, '0')
         |                 THEN 1 ELSE 0 END)::int AS n_copies
         |  FROM s)
         |SELECT doc_id, source, epoch::int AS epoch, n_copies
         |FROM (
         |  SELECT doc_id, source, n_copies,
         |    unnest(range(0, n_copies)) AS epoch
         |  FROM k WHERE n_copies > 0)
         |ORDER BY doc_id, epoch""".stripMargin
    },

    // Asymmetric containment |A∩B|/|A| over the SAME df-cut shingle
    // space as the pair chain (shingleCtes single-sources both);
    // τ and the eval slice come from Decontaminate so Spark and
    // oracle cannot drift. decontamCtes is shared verbatim with the
    // composed curate_train oracle.
    "decontaminate" ->
      s"""WITH ${decontamCtes("documents")}
         |SELECT eval_doc, train_doc, round(contain, 4) AS contain
         |FROM contam
         |ORDER BY eval_doc, train_doc""".stripMargin
  )

  /** J3 mixture rebalance toward the declared per-source weight
    * recipe: thr is pure integer algebra over the per-source counts,
    * the draw the fixed-width-hex md5 compare under mixSources' own
    * salt; thr = 65536 (keep-all) bypasses the 4-char compare in
    * BOTH engines. SHARED by the J3 batch entry and the G13
    * stream_mix batch entry — the stateless ingest thinning must
    * reproduce the batch mix exactly. */
  private def mixSourcesSql: String = {
    val seed = graft.operators.Sampling.MixSeed
    val m = graft.operators.Sampling.MixWeightMod
    s"""WITH c AS (
       |  SELECT source, count(*) AS cnt,
       |    substr(source, 4)::bigint % $m + 1 AS w
       |  FROM documents GROUP BY source),
       |r AS (
       |  SELECT source,
       |    least(65536, ((sum(cnt) OVER ())::bigint * w * 65536)
       |                 // ((sum(w) OVER ())::bigint * cnt)) AS thr
       |  FROM c),
       |s AS (
       |  SELECT d.doc_id, d.source, r.thr,
       |    substr(md5('$seed' || d.doc_id::varchar), 1, 4) AS bucket,
       |    CASE WHEN r.thr >= 65536 THEN '10000'
       |         ELSE lpad(lower(hex(r.thr)), 4, '0') END AS thr_hex
       |  FROM documents d JOIN r USING (source))
       |SELECT doc_id, source, bucket, thr_hex
       |FROM s WHERE thr >= 65536 OR bucket < thr_hex
       |ORDER BY doc_id""".stripMargin
  }

  /** J2 sequence packing — running token total per source shard in
    * doc_id order; window = start_off div budget, offset = start_off
    * mod budget. Token count is text_tokens' n_ws_tokens form; budget
    * single-sourced from Sampling.PackBudget. Pure integer algebra.
    * SHARED by the J2 batch entry and the G11 stream_pack batch
    * entry — the online cursor packer must reproduce the window form
    * exactly. */
  private def packSequencesSql: String = {
    val b = graft.operators.Sampling.PackBudget
    // raw interpolator: the regex backslashes must reach DuckDB intact
    raw"""WITH t AS (
       |  SELECT doc_id, source,
       |    len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
       |                    w -> w <> ''))::bigint AS n
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, n,
       |    sum(n) OVER (PARTITION BY source ORDER BY doc_id) - n
       |      AS start_off
       |  FROM t)
       |SELECT doc_id, source, n::int AS n_tokens,
       |  (start_off // $b)::int AS seq_id,
       |  (start_off % $b)::int AS seq_offset
       |FROM c
       |ORDER BY doc_id""".stripMargin
  }

  /** J1 stratified sample — keep iff first 16 md5 bits (as 4-char
    * lowercase hex — fixed-width hex compare IS the numeric compare)
    * sort below the per-lang threshold. Seed + thresholds single-
    * sourced from graft.operators.Sampling. SHARED by the J1 batch
    * entry and the G10 stream_sample batch entry — the stateless
    * streaming path must reproduce this exactly. */
  private def stratifiedSampleSql: String = {
    val cases = graft.operators.Sampling.LangThresholds
      .map { case (lang, thr, _) => s"WHEN '$lang' THEN '$thr'" }
      .mkString(" ")
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |    substr(md5('${graft.operators.Sampling.Seed}'
       |               || doc_id::varchar), 1, 4) AS bucket,
       |    CASE lang $cases ELSE '0000' END AS thr
       |  FROM documents)
       |SELECT doc_id, lang, bucket, thr
       |FROM s WHERE bucket < thr
       |ORDER BY doc_id""".stripMargin
  }

  /** E11 PII scrub — deterministic doc_id-algebra augmentation, regex
    * literals single-sourced from TextQueries (RE2 ∩ java.util.regex
    * dialect), counts pre-redaction, rewrites in the fixed
    * email→phone→IP order with DuckDB's explicit 'g' flag matching
    * Spark's replace-all default. SHARED by the E11 batch entry and
    * the G14 stream_pii entry — the stateless streaming scrub must
    * reproduce this exactly. */
  /** E11's deterministic augmentation as a reusable CTE over any
    * (doc_id, text) source — TextQueries.piiAugmented's integer
    * algebra verbatim. Shared by the E11/G14 scrub oracle and the
    * G17 composed ingest-gate oracle (stream_curate). */
  private def piiAugCte(src: String): String =
    s"""aug AS (
      |  SELECT doc_id,
      |    text
      |    || CASE WHEN doc_id % 3 <> 0
      |         THEN ' Contact user' || doc_id::varchar || '.'
      |           || (doc_id % 97)::varchar || '@'
      |           || CASE doc_id % 4 WHEN 0 THEN 'example.com'
      |              WHEN 1 THEN 'mail.example.org'
      |              WHEN 2 THEN 'corp-site.net' ELSE 'test.io' END
      |         ELSE '' END
      |    || CASE WHEN doc_id % 5 < 2
      |         THEN ' call +1-555-'
      |           || lpad(((doc_id*7) % 10000)::varchar, 4, '0')
      |         ELSE '' END
      |    || CASE WHEN doc_id % 7 = 0
      |         THEN ' from ' || ((doc_id*13) % 256)::varchar || '.'
      |           || ((doc_id*17) % 256)::varchar || '.'
      |           || ((doc_id*23) % 256)::varchar || '.'
      |           || ((doc_id*29) % 256)::varchar
      |         ELSE '' END AS pii_text
      |  FROM $src)""".stripMargin

  /** The fixed-order email→phone→IP redaction over `aug` — the SQL
    * sibling of TextQueries.piiRedacted. */
  private def piiRedCte: String = {
    val email = graft.functions.TextQueries.EmailRe
    val phone = graft.functions.TextQueries.PhoneRe
    val ip = graft.functions.TextQueries.IpRe
    s"""red AS (
      |  SELECT doc_id, pii_text,
      |    regexp_replace(regexp_replace(regexp_replace(pii_text,
      |      '$email', '<EMAIL>', 'g'),
      |      '$phone', '<PHONE>', 'g'),
      |      '$ip', '<IP>', 'g') AS redacted
      |  FROM aug)""".stripMargin
  }

  private def piiSql: String = {
    val email = graft.functions.TextQueries.EmailRe
    val phone = graft.functions.TextQueries.PhoneRe
    val ip = graft.functions.TextQueries.IpRe
    // helpers are concatenated pre-stripped: interpolating them into
    // a stripMargin template would eat the first '|' of every '||'
    "WITH " + piiAugCte("documents") + ",\n" + piiRedCte + "\n" +
    s"""SELECT doc_id,
      |  len(regexp_extract_all(pii_text, '$email'))::int AS n_emails,
      |  len(regexp_extract_all(pii_text, '$phone'))::int AS n_phones,
      |  len(regexp_extract_all(pii_text, '$ip'))::int AS n_ips,
      |  (len(regexp_extract_all(pii_text, '$email'))
      |   + len(regexp_extract_all(pii_text, '$phone'))
      |   + len(regexp_extract_all(pii_text, '$ip'))) > 0 AS has_pii,
      |  md5(redacted) AS redacted_md5,
      |  length(redacted)::int AS redacted_len
      |FROM red
      |ORDER BY doc_id""".stripMargin
  }

  /** SURVEY §2I — the composed curation pipeline: E2 quality filter →
    * exact dedup (min doc_id per md5) → near-dup component
    * non-representatives dropped (C2 pairs + C6 components over the
    * filtered corpus — note the df cut counts within that corpus,
    * matching Curate.curateCorpus exactly). */
  val curate: Map[String, String] = Map(
    // quality CTE + score expression are the same single-sourced
    // fragments text_quality uses; the threshold is interpolated from
    // Curate.MinQuality — none of the three can silently drift from
    // the Spark side.
    "curate_corpus" ->
      ("WITH RECURSIVE " + qualityBaseCte("documents") + ",\n" +
      s"""scored AS (
        |  SELECT doc_id, text, n_tok, $qualityExpr AS quality
        |  FROM q_base),
        |q AS (SELECT * FROM scored
        |      WHERE quality >= ${graft.operators.Curate.MinQuality}),""".stripMargin
        + "\n" +
      """ex AS (
        |  SELECT doc_id, text, n_tok, quality FROM (
        |    SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS rep
        |    FROM q)
        |  WHERE doc_id = rep),
        |""".stripMargin
        + ngramPairCtes("ex") + ",\n" + componentCtes + "\n" +
      """SELECT doc_id, n_tok::int AS n_tokens, round(quality, 4) AS quality
        |FROM ex
        |WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> rep_doc)
        |ORDER BY doc_id""".stripMargin),

    // §2I capstone: the same survivors chain, then (4) drop the eval
    // slice and decontamCtes-flagged docs (chain shared verbatim with
    // the standalone entry, suffixed _d to coexist), and (5) the
    // Sampling hash-threshold filter (seed + thresholds interpolated
    // from the same constants the Spark side reads).
    "curate_train" ->
      (trainKeptCtes + "\n" +
        """SELECT doc_id, lang, round(quality, 4) AS quality
          |FROM kept
          |ORDER BY doc_id""".stripMargin),

    // §2I row-level provenance: the SAME trainKept CTE chain, read as
    // a per-doc first-dropping-stage CASE in pipeline order — Σ drops
    // reconciles with curate_report by construction.
    "curate_provenance" -> {
      val evalSrc = graft.operators.Decontaminate.EvalSource
      val minQ = graft.operators.Curate.MinQuality
      val seed = graft.operators.Sampling.Seed
      val sampleCases = graft.operators.Sampling.LangThresholds
        .map { case (lang, thr, _) => s"WHEN '$lang' THEN '$thr'" }
        .mkString(" ")
      (trainKeptCtes + "\n" +
        s"""SELECT s.doc_id, d.lang, d.source,
           |  round(s.quality, 4) AS quality,
           |  CASE
           |    WHEN s.quality < $minQ THEN 'quality'
           |    WHEN s.doc_id NOT IN (SELECT doc_id FROM ex)
           |      THEN 'exact_dup'
           |    WHEN s.doc_id IN
           |        (SELECT node FROM comp WHERE node <> rep_doc)
           |      THEN 'near_dup'
           |    WHEN d.source = '$evalSrc' THEN 'eval_slice'
           |    WHEN s.doc_id IN (SELECT train_doc FROM contam_d)
           |      THEN 'contaminated'
           |    WHEN NOT (substr(md5('$seed' || s.doc_id::varchar), 1, 4)
           |              < CASE d.lang $sampleCases ELSE '0000' END)
           |      THEN 'rebalance'
           |    ELSE 'kept'
           |  END AS dropped_at
           |FROM scored s JOIN documents d ON d.doc_id = s.doc_id
           |ORDER BY s.doc_id""".stripMargin)
    },

    // §2I observability: per-stage survivor counts over the SAME CTE
    // chain the capstones run — the funnel report cannot drift from
    // the pipeline.
    "curate_report" -> {
      val evalSrc = graft.operators.Decontaminate.EvalSource
      (trainKeptCtes + "\n" +
        s"""SELECT * FROM (
           |SELECT 0 AS stage_idx, 'input' AS stage,
           |  (SELECT count(*) FROM documents) AS n_docs
           |UNION ALL SELECT 1, 'quality', (SELECT count(*) FROM q)
           |UNION ALL SELECT 2, 'exact', (SELECT count(*) FROM ex)
           |UNION ALL SELECT 3, 'neardup',
           |  (SELECT count(*) FROM ex
           |   WHERE doc_id NOT IN
           |     (SELECT node FROM comp WHERE node <> rep_doc))
           |UNION ALL SELECT 4, 'decontam',
           |  (SELECT count(*)
           |   FROM ex JOIN documents d ON d.doc_id = ex.doc_id
           |   WHERE ex.doc_id NOT IN
           |       (SELECT node FROM comp WHERE node <> rep_doc)
           |     AND d.source <> '$evalSrc'
           |     AND ex.doc_id NOT IN (SELECT train_doc FROM contam_d))
           |UNION ALL SELECT 5, 'sampled', (SELECT count(*) FROM kept))
           |ORDER BY stage_idx""".stripMargin)
    },

    // The curated training set packed into context windows: the same
    // kept CTE chain, then pack_sequences' per-source running-sum
    // algebra over it — six operator families under one oracle.
    "curate_pack" -> {
      val b = graft.operators.Sampling.PackBudget
      (trainKeptCtes + ",\n" +
        s"""c AS (
           |  SELECT doc_id, source, n_tok,
           |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
           |      - n_tok AS start_off
           |  FROM kept)
           |SELECT doc_id, source, n_tok::int AS n_tokens,
           |  (start_off // $b)::int AS seq_id,
           |  (start_off % $b)::int AS seq_offset
           |FROM c
           |ORDER BY doc_id""".stripMargin)
    })

  /** The curate_train kept-set CTE chain (stages 1–5), ending in
    * `kept(doc_id, lang, source, n_tok, quality)` — shared verbatim
    * by the curate_train and curate_pack oracles so the kept set
    * cannot drift between them. (`def`, not `val`: consumed by
    * object vals declared earlier.) */
  private def trainKeptCtes: String = {
    val evalSrc = graft.operators.Decontaminate.EvalSource
    val sampleCases = graft.operators.Sampling.LangThresholds
      .map { case (lang, thr, _) => s"WHEN '$lang' THEN '$thr'" }
      .mkString(" ")
    ("WITH RECURSIVE " + qualityBaseCte("documents") + ",\n" +
    s"""scored AS (
      |  SELECT doc_id, text, n_tok, $qualityExpr AS quality
      |  FROM q_base),
      |q AS (SELECT * FROM scored
      |      WHERE quality >= ${graft.operators.Curate.MinQuality}),""".stripMargin
      + "\n" +
    """ex AS (
      |  SELECT doc_id, text, n_tok, quality FROM (
      |    SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS rep
      |    FROM q)
      |  WHERE doc_id = rep),
      |""".stripMargin
      + ngramPairCtes("ex") + ",\n" + componentCtes + ",\n"
      + decontamCtes("documents", "_d") + ",\n" +
    s"""kept AS (
      |  SELECT ex.doc_id, d.lang, d.source, ex.n_tok, ex.quality
      |  FROM ex JOIN documents d ON d.doc_id = ex.doc_id
      |  WHERE ex.doc_id NOT IN (SELECT node FROM comp WHERE node <> rep_doc)
      |    AND d.source <> '$evalSrc'
      |    AND ex.doc_id NOT IN (SELECT train_doc FROM contam_d)
      |    AND substr(md5('${graft.operators.Sampling.Seed}'
      |               || ex.doc_id::varchar), 1, 4)
      |        < CASE d.lang $sampleCases ELSE '0000' END)""".stripMargin)
  }

  /** The deterministic IVF coarse-quantizer CTE chain, ending in
    * `n(vec_id, v, nrm)` and `assigned(vec_id, list_id)` — shared
    * verbatim by the fixed-cell ANN oracles (ann_ivf/ann_pq family)
    * so the cell structure cannot drift between them
    * (dedup_semantic moved to [[ivfAssignCtesScaled]] in round 13
    * alongside knn_graph_ivf). Mirrors
    * Similarity.ivfBase/ivfAssigned stage for stage: Knuth-hash
    * quantizer seed (integer algebra — the reason it isn't xxhash64),
    * strict sequential-fold dot products (bit-identical per
    * CLAUDE.md), first-max-index assignment (row_number d DESC,
    * c_idx ASC). (`def`, not `val`: consumed by object vals.) */
  private def ivfAssignCtes(nLists: Int): String = {
    val mul = graft.operators.Similarity.IvfHashMul
    val mod = graft.operators.Similarity.IvfHashMod
    s"""WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, v,
      |    sqrt(list_reduce(
      |      list_transform(list_zip(v, v), s -> s[1] * s[2]),
      |      (x, y) -> x + y)) AS nrm
      |  FROM e),
      |cents AS (
      |  SELECT row_number() OVER (
      |      ORDER BY (vec_id * $mul) % $mod, vec_id) AS c_idx,
      |    v AS cv
      |  FROM e
      |  ORDER BY (vec_id * $mul) % $mod, vec_id
      |  LIMIT $nLists),
      |dots AS (
      |  SELECT n.vec_id, c.c_idx,
      |    list_reduce(
      |      list_transform(list_zip(n.v, c.cv), s -> s[1] * s[2]),
      |      (x, y) -> x + y) AS d
      |  FROM n CROSS JOIN cents c),
      |assigned AS (
      |  SELECT vec_id, c_idx AS list_id FROM (
      |    SELECT vec_id, c_idx, row_number() OVER (
      |        PARTITION BY vec_id ORDER BY d DESC, c_idx) AS rn
      |    FROM dots) WHERE rn = 1)""".stripMargin
  }

  /** [[ivfAssignCtes]] with the CORPUS-SCALED cell count of
    * Similarity.knnGraphIvf: nLists = greatest(minLists, ⌊√n⌋),
    * computed from count(*) OVER () in the cents CTE — the same
    * one-count index sizing the Spark side runs. IEEE sqrt is
    * correctly rounded, so the floored double is identical
    * cross-engine. Everything else is the shared chain verbatim. */
  private def ivfAssignCtesScaled(minLists: Int): String = {
    val mul = graft.operators.Similarity.IvfHashMul
    val mod = graft.operators.Similarity.IvfHashMod
    s"""WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, v,
      |    sqrt(list_reduce(
      |      list_transform(list_zip(v, v), s -> s[1] * s[2]),
      |      (x, y) -> x + y)) AS nrm
      |  FROM e),
      |cents AS (
      |  SELECT c_idx, cv FROM (
      |    SELECT row_number() OVER (
      |        ORDER BY (vec_id * $mul) % $mod, vec_id) AS c_idx,
      |      v AS cv, count(*) OVER () AS n_vec
      |    FROM e)
      |  WHERE c_idx <= greatest($minLists, floor(sqrt(n_vec))::bigint)),
      |dots AS (
      |  SELECT n.vec_id, c.c_idx,
      |    list_reduce(
      |      list_transform(list_zip(n.v, c.cv), s -> s[1] * s[2]),
      |      (x, y) -> x + y) AS d
      |  FROM n CROSS JOIN cents c),
      |assigned AS (
      |  SELECT vec_id, c_idx AS list_id FROM (
      |    SELECT vec_id, c_idx, row_number() OVER (
      |        PARTITION BY vec_id ORDER BY d DESC, c_idx) AS rn
      |    FROM dots) WHERE rn = 1)""".stripMargin
  }

  /** The full knn_graph_ivf CTE chain, shared verbatim by the
    * knn_graph_ivf and semantic_clusters oracles (the same
    * no-drift rule as [[ivfAssignCtes]]): scaled-cell assignment →
    * per-vector probes (d DESC, c_idx DESC, top-KnnGraphProbe) →
    * IVF candidate cosines → round-0 top-k id cut (UNROUNDED
    * strict-fold cosines, (cos DESC, n_id) tiebreak — bit-identical
    * to the Spark TopKByScore cut) → the ONE NN-descent refinement
    * round (candidates = knn0 ∪ neighbors-of-neighbors ∪ reversed,
    * set-union = Spark's distinct) → exact rescore → final `knn`
    * (q_id, n_id, rk, cos unrounded). The candidate union is
    * SELECT DISTINCT over UNION ALL arms, NOT a chained UNION: this
    * chain is embedded in semantic_clusters' WITH RECURSIVE block,
    * and DuckDB's recursive parser mishandles a multi-arm UNION CTE
    * there — measured 60 097 → 64 374 cand rows (dedup lost), which
    * inflates ranks in the re-cut and silently drops true edges; a
    * DISTINCT-over-subquery body has no top-level UNION and is
    * immune in both contexts. (`def`: consumed by object vals.) */
  private def knnGraphCtes: String = {
    val p = graft.operators.Similarity.KnnGraphProbe
    val k = graft.operators.Similarity.KnnK
    s"""${ivfAssignCtesScaled(graft.operators.Similarity.KnnGraphLists)},
      |probes AS (
      |  SELECT vec_id AS q_id, c_idx AS list_id FROM (
      |    SELECT vec_id, c_idx, row_number() OVER (
      |        PARTITION BY vec_id ORDER BY d DESC, c_idx DESC) AS rn
      |    FROM dots) WHERE rn <= $p),
      |pairs AS (
      |  SELECT p.q_id, a.vec_id AS n_id,
      |    list_reduce(
      |      list_transform(list_zip(q.v, x.v), s -> s[1] * s[2]),
      |      (u, w) -> u + w) / (q.nrm * x.nrm) AS cos
      |  FROM probes p
      |  JOIN assigned a ON a.list_id = p.list_id
      |  JOIN n x ON x.vec_id = a.vec_id
      |  JOIN n q ON q.vec_id = p.q_id
      |  WHERE a.vec_id <> p.q_id),
      |knn0 AS (
      |  SELECT q_id, n_id FROM (
      |    SELECT q_id, n_id,
      |      row_number() OVER (PARTITION BY q_id
      |                         ORDER BY cos DESC, n_id) AS rk
      |    FROM pairs)
      |  WHERE rk <= $k),
      |cand AS (
      |  SELECT DISTINCT q_id, n_id FROM (
      |    SELECT q_id, n_id FROM knn0
      |    UNION ALL
      |    SELECT a.q_id, b.n_id FROM knn0 a JOIN knn0 b ON b.q_id = a.n_id
      |    WHERE b.n_id <> a.q_id
      |    UNION ALL
      |    SELECT n_id, q_id FROM knn0)),
      |rescored AS (
      |  SELECT c.q_id, c.n_id,
      |    list_reduce(
      |      list_transform(list_zip(q.v, x.v), s -> s[1] * s[2]),
      |      (u, w) -> u + w) / (q.nrm * x.nrm) AS cos
      |  FROM cand c
      |  JOIN n q ON q.vec_id = c.q_id
      |  JOIN n x ON x.vec_id = c.n_id),
      |knn AS (
      |  SELECT q_id, n_id, rk, cos FROM (
      |    SELECT q_id, n_id, cos,
      |      row_number() OVER (PARTITION BY q_id
      |                         ORDER BY cos DESC, n_id) AS rk
      |    FROM rescored)
      |  WHERE rk <= $k)""".stripMargin
  }

  /** SURVEY §2D — similarity search (ann_lsh is rows-only +
    * recall-property-tested). */
  val similarity: Map[String, String] = Map(
    // Mirrors Similarity.annIvf stage for stage: Knuth-hash quantizer
    // seed (integer algebra — the reason it isn't xxhash64), strict
    // sequential-fold dot products (bit-identical per CLAUDE.md),
    // first-max-index assignment (row_number d DESC, c_idx ASC),
    // array_sort-then-reverse probe order (d DESC, c_idx DESC), exact
    // rerank with the (cos DESC, n_id) tiebreak.
    "ann_ivf" -> {
      s"""${ivfAssignCtes(nLists = 16)},
        |probes AS (
        |  SELECT vec_id AS q_id, c_idx AS list_id FROM (
        |    SELECT vec_id, c_idx, row_number() OVER (
        |        PARTITION BY vec_id ORDER BY d DESC, c_idx DESC) AS rn
        |    FROM dots WHERE vec_id < 10) WHERE rn <= 4),
        |pairs AS (
        |  SELECT p.q_id, a.vec_id AS n_id,
        |    list_reduce(
        |      list_transform(list_zip(q.v, x.v), s -> s[1] * s[2]),
        |      (u, w) -> u + w) / (q.nrm * x.nrm) AS cos
        |  FROM probes p
        |  JOIN assigned a ON a.list_id = p.list_id
        |  JOIN n x ON x.vec_id = a.vec_id
        |  JOIN n q ON q.vec_id = p.q_id
        |  WHERE a.vec_id <> p.q_id)
        |SELECT q_id, n_id, rk::int AS rk, round(cos, 4) AS cos FROM (
        |  SELECT q_id, n_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY cos DESC, n_id) AS rk
        |  FROM pairs)
        |WHERE rk <= 5
        |ORDER BY q_id, rk""".stripMargin
    },

    // D12 recall@5 eval (Similarity.annRecallEval): the ann_ivf and
    // ann_bruteforce chains verbatim (same folds, same UNROUNDED
    // rank cuts), intersected per query — both id sets are already
    // hash-certified algebra, so the count + ratio gate exactly.
    "ann_recall_eval" ->
      s"""${ivfAssignCtes(nLists = 16)},
        |probes AS (
        |  SELECT vec_id AS q_id, c_idx AS list_id FROM (
        |    SELECT vec_id, c_idx, row_number() OVER (
        |        PARTITION BY vec_id ORDER BY d DESC, c_idx DESC) AS rn
        |    FROM dots WHERE vec_id < 10) WHERE rn <= 4),
        |ipairs AS (
        |  SELECT p.q_id, a.vec_id AS n_id,
        |    list_reduce(
        |      list_transform(list_zip(q.v, x.v), s -> s[1] * s[2]),
        |      (u, w) -> u + w) / (q.nrm * x.nrm) AS cos
        |  FROM probes p
        |  JOIN assigned a ON a.list_id = p.list_id
        |  JOIN n x ON x.vec_id = a.vec_id
        |  JOIN n q ON q.vec_id = p.q_id
        |  WHERE a.vec_id <> p.q_id),
        |ivf AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, n_id) AS rk
        |    FROM ipairs) WHERE rk <= 5),
        |epairs AS (
        |  SELECT q.vec_id AS q_id, x.vec_id AS n_id,
        |    list_reduce(
        |      list_transform(list_zip(q.v, x.v), s -> s[1] * s[2]),
        |      (u, w) -> u + w) / (q.nrm * x.nrm) AS cos
        |  FROM n q JOIN n x ON q.vec_id <> x.vec_id
        |  WHERE q.vec_id < 10),
        |exact AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, n_id) AS rk
        |    FROM epairs) WHERE rk <= 5),
        |hits AS (
        |  SELECT e.q_id, count(*) AS c
        |  FROM exact e JOIN ivf i ON i.q_id = e.q_id AND i.n_id = e.n_id
        |  GROUP BY 1)
        |SELECT q.q_id, coalesce(h.c, 0) AS n_hits,
        |  round(coalesce(h.c, 0)::double / 5.0, 4) AS recall
        |FROM (SELECT DISTINCT q_id FROM exact) q
        |LEFT JOIN hits h ON h.q_id = q.q_id
        |ORDER BY q.q_id""".stripMargin,

    // D14 per-cell assignment quality (Similarity.embedSilhouette):
    // the shared fixed-cell quantizer chain; margin = d(rn1) − d(rn2)
    // (value-sorted multiset order == Spark's array_sort), fixed-
    // point BEFORE the per-cell sum (order-free integers), two
    // mirrored IEEE divisions out ⇒ full hash gate.
    "embed_silhouette" -> {
      val sc = graft.operators.Similarity.SilMarginScale
      val amb = graft.operators.Similarity.SilAmbiguousFp
      ivfAssignCtes(16) + s""",
        |ranked AS (
        |  SELECT vec_id, c_idx, d,
        |    row_number() OVER (PARTITION BY vec_id
        |                       ORDER BY d DESC, c_idx) AS rn
        |  FROM dots),
        |m AS (
        |  SELECT a.vec_id, a.c_idx AS list_id,
        |    floor((a.d - b.d) * $sc)::bigint AS margin_fp
        |  FROM ranked a JOIN ranked b
        |    ON a.vec_id = b.vec_id AND b.rn = 2
        |  WHERE a.rn = 1)
        |SELECT list_id, count(*)::bigint AS n_members,
        |  round(sum(margin_fp)::double /
        |        (count(*)::double * ${sc}.0), 6) AS mean_margin,
        |  round(min(margin_fp)::double / ${sc}.0, 6) AS min_margin,
        |  sum(CASE WHEN margin_fp < $amb THEN 1 ELSE 0 END)::bigint
        |    AS n_ambiguous
        |FROM m
        |GROUP BY list_id
        |ORDER BY list_id""".stripMargin
    },

    // D10 IVF-bounded kNN graph (Similarity.knnGraphIvf): ann_ivf's
    // oracle with EVERY vector as a query (no vec_id < 10 cut) — the
    // same ivf_assign chain, probe tie rule (d DESC, c_idx DESC,
    // top-KnnGraphProbe), sequential-fold cosines, and (cos DESC,
    // n_id) rank tiebreak — plus the ONE NN-descent refinement round
    // the Spark side runs (knn0 cut → candidate union → exact
    // rescore → re-cut; every stage deterministic), so the chain
    // carries a full hash gate (the dedup_semantic precedent).
    "knn_graph_ivf" ->
      s"""$knnGraphCtes
        |SELECT q_id, n_id, rk::int AS rk, round(cos, 4) AS cos
        |FROM knn
        |ORDER BY q_id, rk""".stripMargin,

    // D13 corpus-wide graph recall (Similarity.knnGraphRecall): the
    // knn_graph_ivf chain verbatim as the approx arm, the
    // embed_knn_graph all-pairs chain verbatim as the exact arm, hit
    // counting = an id-pair equi-join (pure integer algebra), one
    // rounded mean division. Single summary row.
    "knn_graph_recall" -> {
      val k = graft.operators.Similarity.KnnK
      s"""$knnGraphCtes,
        |xpairs AS (
        |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |    list_reduce(
        |      list_transform(list_zip(a.v, b.v), s -> s[1] * s[2]),
        |      (x, y) -> x + y) / (a.nrm * b.nrm) AS cos
        |  FROM n a JOIN n b ON a.vec_id <> b.vec_id),
        |xknn AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      row_number() OVER (PARTITION BY q_id
        |                         ORDER BY cos DESC, n_id) AS rk
        |    FROM xpairs)
        |  WHERE rk <= $k),
        |ghits AS (
        |  SELECT x.q_id, count(*)::bigint AS h
        |  FROM xknn x JOIN knn a ON a.q_id = x.q_id AND a.n_id = x.n_id
        |  GROUP BY x.q_id),
        |perq AS (
        |  SELECT coalesce(h.h, 0)::bigint AS h
        |  FROM (SELECT DISTINCT q_id FROM xknn) q
        |  LEFT JOIN ghits h ON h.q_id = q.q_id)
        |SELECT count(*)::bigint AS n_queries, $k AS k,
        |  sum(h)::bigint AS sum_hits,
        |  round(sum(h)::double / (count(*) * $k), 4) AS mean_recall,
        |  min(h)::bigint AS min_hits,
        |  sum(CASE WHEN h = $k THEN 1 ELSE 0 END)::bigint AS n_full,
        |  sum(CASE WHEN h = 0 THEN 1 ELSE 0 END)::bigint AS n_zero
        |FROM perq""".stripMargin
    },

    // D11 semantic clusters (Similarity.semanticClusters): the
    // knn_graph_ivf chain verbatim (incl. its NN-descent refinement
    // round) → τ filter on the ROUNDED cosine (roundDuck ↔ round,
    // bit-exact, so the edge set cannot flake) → the dedup_components
    // recursive-reach component CTEs. Cluster rep = min vec_id
    // reachable, sizes per rep.
    "semantic_clusters" -> {
      val tau = graft.operators.Dedup.SemTau
      s"""WITH RECURSIVE ${knnGraphCtes.stripPrefix("WITH ")},
        |g AS (SELECT q_id, n_id FROM knn WHERE round(cos, 4) >= $tau),
        |edges AS (
        |  SELECT q_id AS src, n_id AS dst FROM g
        |  UNION
        |  SELECT n_id, q_id FROM g),
        |reach AS (
        |  SELECT DISTINCT src AS node, src AS lbl FROM edges
        |  UNION
        |  SELECT e.dst AS node, r.lbl AS lbl
        |  FROM reach r JOIN edges e ON e.src = r.node),
        |comp AS (SELECT node, min(lbl) AS cluster_rep FROM reach GROUP BY node)
        |SELECT c.node AS vec_id, c.cluster_rep, s.n_members
        |FROM comp c
        |JOIN (SELECT cluster_rep, count(*) AS n_members
        |      FROM comp GROUP BY cluster_rep) s USING (cluster_rep)
        |ORDER BY vec_id""".stripMargin
    },

    // IVF + PQ composed (Similarity.annIvfPq): the ivf_assign chain
    // supplies coarse lists AND the 16 seed vectors double as the PQ
    // codebooks; probes replay ann_ivf's tie rule (d DESC, c_idx
    // DESC, top-4), codes/ADC replay ann_pq's (first-max, list(d
    // ORDER BY m) left fold), and the candidate gate is the
    // probed-list membership join. Same FP-order contracts as both
    // parents ⇒ full hash gate.
    "ann_ivfpq" -> {
      val m = graft.operators.Similarity.PqSub
      val sd = 64 / m
      s"""${ivfAssignCtes(nLists = 16)},
        |cd AS (
        |  SELECT e.vec_id, t.m, c.c_idx,
        |    list_reduce(
        |      list_transform(
        |        list_zip(e.v[t.m*$sd+1 : t.m*$sd+$sd],
        |                 c.cv[t.m*$sd+1 : t.m*$sd+$sd]),
        |        s -> s[1] * s[2]),
        |      (x, y) -> x + y) AS d
        |  FROM e, range(0, $m) t(m), cents c),
        |codes AS (
        |  SELECT vec_id, m, c_idx AS code FROM (
        |    SELECT vec_id, m, c_idx,
        |      row_number() OVER (PARTITION BY vec_id, m
        |                         ORDER BY d DESC, c_idx) AS rn
        |    FROM cd) WHERE rn = 1),
        |qd AS (SELECT vec_id AS q_id, m, c_idx, d FROM cd WHERE vec_id < 10),
        |probes AS (
        |  SELECT vec_id AS q_id, c_idx AS list_id FROM (
        |    SELECT vec_id, c_idx, row_number() OVER (
        |        PARTITION BY vec_id ORDER BY d DESC, c_idx DESC) AS rn
        |    FROM dots WHERE vec_id < 10) WHERE rn <= 4),
        |pairs AS (
        |  SELECT q.q_id, x.vec_id AS n_id,
        |    list_reduce(list(q.d ORDER BY q.m), (a, b) -> a + b) AS score
        |  FROM codes x
        |  JOIN assigned a ON a.vec_id = x.vec_id
        |  JOIN probes p ON p.list_id = a.list_id
        |  JOIN qd q ON q.q_id = p.q_id AND q.m = x.m AND q.c_idx = x.code
        |  WHERE x.vec_id <> p.q_id
        |  GROUP BY q.q_id, x.vec_id)
        |SELECT q_id, n_id, rk::int AS rk, round(score, 4) AS score FROM (
        |  SELECT q_id, n_id, score,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY score DESC, n_id) AS rk
        |  FROM pairs)
        |WHERE rk <= 5
        |ORDER BY q_id, rk""".stripMargin
    },

    // PQ asymmetric-distance scoring, stage for stage with
    // Similarity.annPq: the same Knuth-hash codebook seeds (slices of
    // the IVF seed vectors), first-max sub-dot assignment (row_number
    // d DESC, c_idx), and the score folded over list(d ORDER BY m) —
    // the exact left-fold order of the Spark side's fixed d_0+…+d_15
    // expression tree, so the FP sum cannot drift. Sub-slices are
    // 64/PqSub dims of the 64-dim embeddings (PqSub = 16, 4-dim slices).
    "ann_pq" ->
      s"""WITH ${pqPairCtes}
        |SELECT q_id, n_id, rk::int AS rk, round(score, 4) AS score FROM (
        |  SELECT q_id, n_id, score,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY score DESC, n_id) AS rk
        |  FROM pq_pairs)
        |WHERE rk <= 5
        |ORDER BY q_id, rk""".stripMargin,

    // Two-stage retrieval: the PQ chain nominates top-R per query
    // (same ADC ordering), then only those candidates are re-scored
    // with the exact ann_bruteforce cosine fold and cut to top-5.
    // R single-sourced from Similarity.RerankR.
    "ann_rerank" -> {
      val r = graft.operators.Similarity.RerankR
      s"""WITH ${pqPairCtes},
        |cand AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      row_number() OVER (PARTITION BY q_id
        |                         ORDER BY score DESC, n_id) AS rk
        |    FROM pq_pairs)
        |  WHERE rk <= $r),
        |nv AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(
        |      list_transform(list_zip(v, v), s -> s[1] * s[2]),
        |      (x, y) -> x + y)) AS nrm
        |  FROM e),
        |rr AS (
        |  SELECT c.q_id, c.n_id,
        |    list_reduce(
        |      list_transform(list_zip(q.v, x.v), s -> s[1] * s[2]),
        |      (x2, y2) -> x2 + y2) / (q.nrm * x.nrm) AS cos
        |  FROM cand c
        |  JOIN nv x ON x.vec_id = c.n_id
        |  JOIN nv q ON q.vec_id = c.q_id)
        |SELECT q_id, n_id, rk::int AS rk, round(cos, 4) AS cos FROM (
        |  SELECT q_id, n_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY cos DESC, n_id) AS rk
        |  FROM rr)
        |WHERE rk <= 5
        |ORDER BY q_id, rk""".stripMargin
    },

    // D9 MMR diversified top-k: the K-step greedy unrolled as one
    // argmax CTE stage per pick (the pagerank unrolling precedent).
    // Every cosine is the shared strict index-order fold, so the
    // (rel − max sim)/2 scores are bit-identical to the Spark
    // flatMapGroups greedy and the per-stage row_number argmax
    // (mmr DESC, n_id) cannot flake. K/R single-sourced from
    // Similarity.MmrK/MmrR.
    "embed_mmr" -> {
      val k = graft.operators.Similarity.MmrK
      val r = graft.operators.Similarity.MmrR
      def dotE(a: String, b: String) =
        s"list_reduce(list_transform(list_zip($a, $b), s -> s[1] * s[2]), (x, y) -> x + y)"
      val head =
        s"""WITH e AS (
           |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
           |  FROM embeddings),
           |n AS MATERIALIZED (
           |  SELECT vec_id, v, sqrt(${dotE("v", "v")}) AS nrm
           |  FROM e),
           |q AS (SELECT * FROM n WHERE vec_id < 10),
           |rel AS (
           |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
           |    ${dotE("q.v", "n.v")} / (q.nrm * n.nrm) AS rel
           |  FROM q JOIN n ON q.vec_id <> n.vec_id),
           |cand AS MATERIALIZED (
           |  SELECT c.q_id, c.n_id, c.rel, n.v, n.nrm FROM (
           |    SELECT q_id, n_id, rel,
           |      row_number() OVER (PARTITION BY q_id
           |                         ORDER BY rel DESC, n_id) AS rk
           |    FROM rel) c JOIN n ON c.n_id = n.vec_id
           |  WHERE c.rk <= $r),
           |sims AS MATERIALIZED (
           |  SELECT a.q_id, a.n_id AS ai, b.n_id AS bi,
           |    ${dotE("a.v", "b.v")} / (a.nrm * b.nrm) AS s
           |  FROM cand a JOIN cand b
           |    ON a.q_id = b.q_id AND a.n_id <> b.n_id),
           |p1 AS (
           |  SELECT q_id, n_id, rel, rel AS mmr FROM (
           |    SELECT q_id, n_id, rel,
           |      row_number() OVER (PARTITION BY q_id
           |                         ORDER BY rel DESC, n_id) AS rk
           |    FROM cand) WHERE rk = 1),
           |sel1 AS (SELECT q_id, n_id FROM p1)""".stripMargin
      val stages = (2 to k).map { t =>
        s"""s$t AS (
           |  SELECT c.q_id, c.n_id, c.rel, (c.rel - max(s.s)) / 2.0 AS mmr
           |  FROM cand c
           |  JOIN sims s ON s.q_id = c.q_id AND s.ai = c.n_id
           |  JOIN sel${t - 1} p ON p.q_id = s.q_id AND p.n_id = s.bi
           |  LEFT JOIN sel${t - 1} d ON d.q_id = c.q_id AND d.n_id = c.n_id
           |  WHERE d.n_id IS NULL
           |  GROUP BY 1, 2, 3),
           |p$t AS (
           |  SELECT q_id, n_id, rel, mmr FROM (
           |    SELECT q_id, n_id, rel, mmr,
           |      row_number() OVER (PARTITION BY q_id
           |                         ORDER BY mmr DESC, n_id) AS rk
           |    FROM s$t) WHERE rk = 1),
           |sel$t AS (SELECT q_id, n_id FROM sel${t - 1}
           |          UNION ALL SELECT q_id, n_id FROM p$t)""".stripMargin
      }
      val finalSel = (1 to k).map { t =>
        s"SELECT q_id, n_id, $t AS rk, round(rel, 4) AS rel, round(mmr, 4) AS mmr FROM p$t"
      }.mkString("\nUNION ALL\n")
      (head +: stages).mkString(",\n") + "\n" + finalSel +
        "\nORDER BY q_id, rk"
    },

    "ann_bruteforce" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(
        |      list_transform(list_zip(v, v), s -> s[1] * s[2]),
        |      (x, y) -> x + y)) AS nrm
        |  FROM e),
        |q AS (SELECT * FROM n WHERE vec_id < 10),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    list_reduce(
        |      list_transform(list_zip(q.v, n.v), s -> s[1] * s[2]),
        |      (x, y) -> x + y) / (q.nrm * n.nrm) AS cos
        |  FROM q JOIN n ON q.vec_id <> n.vec_id)
        |SELECT q_id, n_id, rk::int AS rk, round(cos, 4) AS cos FROM (
        |  SELECT q_id, n_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY cos DESC, n_id) AS rk
        |  FROM pairs)
        |WHERE rk <= 5
        |ORDER BY q_id, rk""".stripMargin,

    // D16 filtered kNN (Similarity.annFiltered): the ann_bruteforce
    // chain with the label equi-predicate PRE-filtering the corpus
    // side (metadata-filtered vector search) — same strict folds,
    // same (cos DESC, n_id) tiebreak.
    "ann_filtered" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> x::double) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, label, v,
        |    sqrt(list_reduce(
        |      list_transform(list_zip(v, v), s -> s[1] * s[2]),
        |      (x, y) -> x + y)) AS nrm
        |  FROM e),
        |q AS (SELECT * FROM n WHERE vec_id < 10),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    list_reduce(
        |      list_transform(list_zip(q.v, n.v), s -> s[1] * s[2]),
        |      (x, y) -> x + y) / (q.nrm * n.nrm) AS cos
        |  FROM q JOIN n ON q.label = n.label AND q.vec_id <> n.vec_id)
        |SELECT q_id, n_id, rk::int AS rk, round(cos, 4) AS cos FROM (
        |  SELECT q_id, n_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY cos DESC, n_id) AS rk
        |  FROM pairs)
        |WHERE rk <= 5
        |ORDER BY q_id, rk""".stripMargin,

    // D15 range search (Similarity.annRange): the ann_bruteforce
    // cosine chain with a τ filter instead of a top-k cut —
    // strict-fold cosines make the τ boundary bit-identical.
    "ann_range" -> {
      val tau = graft.operators.Similarity.RangeTau
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(
        |      list_transform(list_zip(v, v), s -> s[1] * s[2]),
        |      (x, y) -> x + y)) AS nrm
        |  FROM e),
        |q AS (SELECT * FROM n WHERE vec_id < 10),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    list_reduce(
        |      list_transform(list_zip(q.v, n.v), s -> s[1] * s[2]),
        |      (x, y) -> x + y) / (q.nrm * n.nrm) AS cos
        |  FROM q JOIN n ON q.vec_id <> n.vec_id)
        |SELECT q_id, n_id, round(cos, 4) AS cos
        |FROM pairs
        |WHERE cos >= $tau
        |ORDER BY q_id, cos DESC, n_id""".stripMargin
    },

    // D8 k-NN graph: ordered-pair re-derivation of the Spark side's
    // mirrored unordered pairs — per-element products commute
    // bit-exactly and the fold order (index order) is shared, so the
    // (b→a) direction DuckDB computes equals the (a→b) value Spark
    // mirrors. Rank on the unrounded cos with n_id tiebreak, both
    // engines.
    "embed_knn_graph" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(
        |      list_transform(list_zip(v, v), s -> s[1] * s[2]),
        |      (x, y) -> x + y)) AS nrm
        |  FROM e),
        |pairs AS (
        |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |    list_reduce(
        |      list_transform(list_zip(a.v, b.v), s -> s[1] * s[2]),
        |      (x, y) -> x + y) / (a.nrm * b.nrm) AS cos
        |  FROM n a JOIN n b ON a.vec_id <> b.vec_id)
        |SELECT q_id, n_id, rk::int AS rk, round(cos, 4) AS cos FROM (
        |  SELECT q_id, n_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY cos DESC, n_id) AS rk
        |  FROM pairs)
        |WHERE rk <= 5
        |ORDER BY q_id, rk""".stripMargin,

    // Int8 quantization digest. The quantized value is spelled as the
    // SAME floor algebra QuantStatsI8 generates — floor(|y| + 0.5)
    // with the sign restored, never an engine round() — and scale is
    // the same NaN-propagating greatest fold as embed_stats over
    // the same cast-to-double list, so q_i, scale and every sq_err
    // term are bit-identical cross-engine. An all-zero/empty vector
    // takes the scale=0 → all-zero-q branch in BOTH engines (no 0/0
    // NaN); the empty-vector folds are len-gated like embed_stats so
    // a zero-length embedding surfaces as a visible NULL-vs-0 diff,
    // never an oracle crash. Squares are ≥ 0 ⇒ the seedless
    // list_reduce == the 0.0-seeded generated loop bit-for-bit.
    "embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, v, len(v)::int AS dim,
        |    CASE WHEN len(v) = 0 THEN 0.0
        |      ELSE list_reduce(list_transform(v, x -> abs(x)),
        |        (x, y) -> greatest(x, y)) END / 127.0 AS scale
        |  FROM e),
        |q AS (
        |  SELECT vec_id, v, dim, scale,
        |    list_transform(v, x -> CASE WHEN scale = 0 THEN 0::bigint
        |      ELSE least(127::bigint, greatest((-127)::bigint,
        |        (CASE WHEN x / scale >= 0 THEN floor(x / scale + 0.5)
        |              ELSE -floor(-(x / scale) + 0.5) END)::bigint))
        |      END) AS ql
        |  FROM m)
        |SELECT vec_id, dim, round(scale, 8) AS scale,
        |  CASE WHEN dim = 0 THEN NULL
        |    ELSE list_sum(ql)::bigint END AS q_sum,
        |  list_min(ql)::int AS q_min,
        |  list_max(ql)::int AS q_max,
        |  len(list_filter(ql, x -> abs(x) = 127))::int AS n_sat,
        |  len(list_filter(ql, x -> x = 0))::int AS n_zero,
        |  CASE WHEN dim = 0 THEN NULL
        |    ELSE round(list_reduce(
        |      list_transform(list_zip(v, ql),
        |        p -> (p[1] - p[2] * scale) * (p[1] - p[2] * scale)),
        |      (x, y) -> x + y), 8) END AS sq_err
        |FROM q
        |ORDER BY vec_id""".stripMargin,

    // D centroid-distance outliers: fixed-point integer centroid
    // (order-free exact, grain single-sourced from
    // Similarity.CentroidFixedScale), dist² = ‖x‖² − 2x·c + ‖c‖² with
    // the same strict folds as the C5/D dots — bit-exact, so rank on
    // the unrounded value agrees cross-engine.
    "embed_outliers" -> {
      val fx = graft.operators.Similarity.CentroidFixedScale
      val k = graft.operators.Similarity.OutlierK
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
        |  FROM embeddings),
        |ex AS (SELECT vec_id, unnest(v) AS x,
        |         generate_subscripts(v, 1) AS d
        |       FROM e),
        |cent AS (SELECT d, sum(floor(x * $fx)::bigint)::bigint AS s,
        |           count(*) AS cnt
        |         FROM ex GROUP BY 1),
        |cl AS (SELECT list((s::double / cnt) / $fx.0 ORDER BY d) AS c
        |       FROM cent),
        |ccv AS (SELECT list_reduce(
        |          list_transform(list_zip(c, c), s -> s[1] * s[2]),
        |          (x, y) -> x + y) AS cc
        |        FROM cl),
        |scored AS (
        |  SELECT vec_id,
        |    list_reduce(list_transform(list_zip(v, v), s -> s[1] * s[2]),
        |      (x, y) -> x + y)
        |    - 2.0 * list_reduce(list_transform(list_zip(v, c), s -> s[1] * s[2]),
        |      (x, y) -> x + y)
        |    + cc AS dist2
        |  FROM e CROSS JOIN cl CROSS JOIN ccv)
        |SELECT * FROM (
        |  SELECT row_number() OVER (ORDER BY dist2 DESC, vec_id)::int AS rk,
        |    vec_id, round(dist2, 4) AS dist2
        |  FROM scored)
        |WHERE rk <= $k
        |ORDER BY rk""".stripMargin
    }
  )

  /** SURVEY §2F — multimodal binary plumbing. mm_decode's oracle does
    * the same PNG/BMP header parse as Multimodal.decodeHeader with
    * blob substring + hex→int casts: big-endian IHDR fields for PNG,
    * little-endian BITMAPINFOHEADER for BMP (signed width/height),
    * NULL dimensions + ok=false for unknown magic. The corpus is
    * printable ASCII, so both engines take the unknown branch on
    * every row — the png/bmp arms are exercised by MultimodalSpec's
    * synthesized headers (exact-rows, Spark side). mean_byte is an
    * exact integer byte sum over the blob divided once, folded from
    * the blob's 2-char hex pairs — actual UTF-8 bytes via
    * `encode(text)` (Spark's `cast(text as binary)`), NOT ascii()
    * codepoints, so a non-ASCII corpus cannot silently diverge the
    * gate (and `::blob`, which hard-errors on non-ASCII, is avoided
    * throughout). */
  val multimodal: Map[String, String] = Map(
    // Byte offsets become hex-string offsets (1-based byte o → hex
    // char 2(o-1)+1): PNG magic 89504E470D0A1A0A at 1, IHDR at 25,
    // BE width/height/depth at 33/41/49; BMP 424D at 1, reserved
    // zeros at 13, LE width/height/bpp byte pairs from 37/45/57;
    // WAV RIFF/WAVE/fmt at 1/17/25, NUL-guarded LE fmt-size at 33,
    // LE channels/rate/bits at 45/49/69; MP4 ftyp at 9 with a
    // NUL-guarded BE box size at 1.
    "mm_decode" ->
      // The mp4 arm walks the real box grammar in hex-string space
      // (recursive CTEs: top-level boxes to `moov`, children to
      // `mvhd`, v0/v1 layouts) with the same validity guards as
      // Multimodal.mvhdInfo (header fits, size >= 8, body fits). No
      // corpus row is mp4, so the walk was validated against the
      // same synthesized-blob cases MultimodalSpec uses (exact
      // v0/v1/bare-ftyp/truncated-moov agreement with the Scala
      // parser).
      """WITH RECURSIVE parsed AS (
        |SELECT doc_id, h, is_png, is_bmp, is_wav, is_mp4, w_le, h_le, bytesum
        |FROM (
        |  SELECT doc_id, h, is_png, is_bmp, is_wav,
        |    (length(h) >= 24 AND substring(h, 9, 8) = '66747970'
        |      AND (CASE WHEN length(h) >= 24
        |           THEN ('0x' || substring(h, 1, 8))::bigint
        |           ELSE -1 END) BETWEEN 12 AND 64
        |      AND NOT (is_png OR is_bmp OR is_wav)) AS is_mp4,
        |    w_le, h_le, bytesum
        |  FROM (
        |    SELECT doc_id, h, is_png,
        |      (length(h) >= 60 AND substring(h, 1, 4) = '424D'
        |        AND substring(h, 13, 8) = '00000000'
        |        AND NOT is_png) AS is_bmp,
        |      (length(h) >= 72 AND substring(h, 1, 8) = '52494646'
        |        AND substring(h, 17, 8) = '57415645'
        |        AND substring(h, 25, 8) = '666D7420'
        |        AND (CASE WHEN length(h) >= 72
        |             THEN ('0x' || substring(h, 39, 2) || substring(h, 37, 2)
        |               || substring(h, 35, 2) || substring(h, 33, 2))::bigint
        |             ELSE -1 END) IN (16, 18, 40)
        |        AND NOT is_png) AS is_wav,
        |      -- little-endian uint32 at byte offsets 18 / 22 (0-based)
        |      CASE WHEN length(h) >= 60 THEN
        |        ('0x' || substring(h, 43, 2) || substring(h, 41, 2)
        |          || substring(h, 39, 2) || substring(h, 37, 2))::bigint
        |      END AS w_le,
        |      CASE WHEN length(h) >= 60 THEN
        |        ('0x' || substring(h, 51, 2) || substring(h, 49, 2)
        |          || substring(h, 47, 2) || substring(h, 45, 2))::bigint
        |      END AS h_le,
        |      bytesum
        |    FROM (
        |      SELECT doc_id, hex(encode(text)) AS h,
        |        (octet_length(encode(text)) >= 26
        |          AND substring(hex(encode(text)), 1, 16) = '89504E470D0A1A0A'
        |          AND substring(hex(encode(text)), 25, 8) = '49484452') AS is_png,
        |        -- fold the blob's actual bytes (2-char hex pairs), NOT
        |        -- ascii() codepoints: the two only agree while the
        |        -- corpus is pure ASCII; one multi-byte character
        |        -- would silently diverge the mean_byte hash gate
        |        CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
        |        ELSE list_reduce(
        |          list_transform(range(octet_length(encode(text))::int),
        |            i -> ('0x' || substring(hex(encode(text)),
        |                                    (i * 2 + 1)::int, 2))::bigint),
        |          (a, b) -> a + b)::double END AS bytesum
        |      FROM documents)))),
        |walk AS (
        |  SELECT doc_id, h, 0::bigint AS pos,
        |    ('0x' || substring(h, 1, 8))::bigint AS size,
        |    substring(h, 9, 8) AS btype
        |  FROM parsed
        |  WHERE is_mp4
        |    AND length(h) >= 16
        |    AND ('0x' || substring(h, 1, 8))::bigint >= 8
        |    AND ('0x' || substring(h, 1, 8))::bigint * 2 <= length(h)
        |  UNION ALL
        |  SELECT doc_id, h, pos + size,
        |    ('0x' || substring(h, ((pos + size) * 2 + 1)::int, 8))::bigint,
        |    substring(h, ((pos + size) * 2 + 9)::int, 8)
        |  FROM walk
        |  WHERE btype <> '6D6F6F76'
        |    AND (pos + size + 8) * 2 <= length(h)
        |    AND ('0x' || substring(h, ((pos + size) * 2 + 1)::int, 8))::bigint >= 8
        |    AND (pos + size
        |      + ('0x' || substring(h, ((pos + size) * 2 + 1)::int, 8))::bigint) * 2
        |      <= length(h)),
        |moov AS (
        |  SELECT doc_id, h, pos, size FROM walk WHERE btype = '6D6F6F76'),
        |mwalk AS (
        |  SELECT doc_id, h, pos + size AS lim, pos + 8 AS cpos,
        |    ('0x' || substring(h, ((pos + 8) * 2 + 1)::int, 8))::bigint AS csize,
        |    substring(h, ((pos + 8) * 2 + 9)::int, 8) AS ctype
        |  FROM moov
        |  WHERE pos + 16 <= pos + size
        |    AND ('0x' || substring(h, ((pos + 8) * 2 + 1)::int, 8))::bigint >= 8
        |    AND pos + 8 + ('0x' || substring(h, ((pos + 8) * 2 + 1)::int, 8))::bigint
        |        <= pos + size
        |  UNION ALL
        |  SELECT doc_id, h, lim, cpos + csize,
        |    ('0x' || substring(h, ((cpos + csize) * 2 + 1)::int, 8))::bigint,
        |    substring(h, ((cpos + csize) * 2 + 9)::int, 8)
        |  FROM mwalk
        |  WHERE ctype <> '6D766864'
        |    AND cpos + csize + 8 <= lim
        |    AND ('0x' || substring(h, ((cpos + csize) * 2 + 1)::int, 8))::bigint >= 8
        |    AND cpos + csize
        |      + ('0x' || substring(h, ((cpos + csize) * 2 + 1)::int, 8))::bigint
        |      <= lim),
        |mvhd AS (
        |  SELECT doc_id, ts::int AS mv_timescale,
        |    CASE WHEN ts > 0 THEN dur::double / ts END AS mv_duration_s
        |  FROM (
        |    SELECT doc_id,
        |      CASE WHEN ver = 1
        |           THEN ('0x' || substring(h, (cpos * 2 + 57)::int, 8))::bigint
        |           ELSE ('0x' || substring(h, (cpos * 2 + 41)::int, 8))::bigint
        |      END AS ts,
        |      CASE WHEN ver = 1
        |           THEN ('0x' || substring(h, (cpos * 2 + 65)::int, 16))::bigint
        |           ELSE ('0x' || substring(h, (cpos * 2 + 49)::int, 8))::bigint
        |      END AS dur
        |    FROM (
        |      SELECT doc_id, h, cpos, csize,
        |        ('0x' || substring(h, (cpos * 2 + 17)::int, 2))::int AS ver
        |      FROM mwalk WHERE ctype = '6D766864' AND csize >= 9)
        |    WHERE (ver = 0 AND csize >= 28) OR (ver = 1 AND csize >= 40)))
        |SELECT parsed.doc_id,
        |  CASE WHEN is_png THEN 'png' WHEN is_bmp THEN 'bmp'
        |       WHEN is_wav THEN 'wav' WHEN is_mp4 THEN 'mp4'
        |       ELSE 'unknown' END AS format,
        |  CASE WHEN is_png THEN ('0x' || substring(h, 33, 8))::bigint::int
        |       WHEN is_bmp THEN (CASE WHEN w_le >= 2147483648
        |         THEN w_le - 4294967296 ELSE w_le END)::int
        |  END AS width,
        |  CASE WHEN is_png THEN ('0x' || substring(h, 41, 8))::bigint::int
        |       WHEN is_bmp THEN (CASE WHEN h_le >= 2147483648
        |         THEN h_le - 4294967296 ELSE h_le END)::int
        |  END AS height,
        |  CASE WHEN is_png THEN ('0x' || substring(h, 49, 2))::int
        |       WHEN is_bmp THEN ('0x' || substring(h, 59, 2)
        |         || substring(h, 57, 2))::int
        |       WHEN is_wav THEN ('0x' || substring(h, 71, 2)
        |         || substring(h, 69, 2))::int
        |  END AS bit_depth,
        |  CASE WHEN is_wav THEN ('0x' || substring(h, 47, 2)
        |         || substring(h, 45, 2))::int
        |  END AS channels,
        |  CASE WHEN is_wav THEN ('0x' || substring(h, 55, 2)
        |         || substring(h, 53, 2) || substring(h, 51, 2)
        |         || substring(h, 49, 2))::bigint::int
        |  END AS sample_rate,
        |  mv_timescale AS timescale,
        |  round(mv_duration_s, 4) AS duration_s,
        |  round(CASE WHEN length(h) = 0 THEN 0.0
        |        ELSE bytesum / (length(h) / 2) END, 4) AS mean_byte,
        |  (is_png OR is_bmp OR is_wav OR is_mp4) AS ok
        |FROM parsed LEFT JOIN mvhd ON parsed.doc_id = mvhd.doc_id
        |ORDER BY parsed.doc_id""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text))::int AS n_bytes,
        |  substring(hex(encode(text)), 1, 8) AS magic_hex,
        |  md5(text) AS checksum
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "mm_framesample" ->
      """SELECT doc_id, ((i - 1) // 64)::int AS frame_idx,
        |  substring(h, ((i - 1) * 2 + 1)::int, 32) AS frame_hex
        |FROM (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |    unnest(range(1, octet_length(encode(text)) + 1, 64)) AS i
        |  FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // Mirrors Multimodal.mmResizeQuery's synthesized image corpus in
    // hex space (same cycled-pixel construction, same kind routing),
    // then checks the REAL operator behavior: raw rows dropped, |h|
    // for top-down BMPs, long-multiply-then-floor aspect math with
    // the ≥1 clamp, and the nearest-neighbor resample itself for BOTH
    // image kinds — every output pixel re-derived as
    // substr(px, (sy*rowbytes + sx*3)*2 + 1, 6) in ty,tx order, where
    // rowbytes is the 4-byte-aligned stride for BMP and the packed
    // w*3 for PNG. The PNG side is the strong half of the gate: the
    // operator recovers these pixels by actually CRC-checking,
    // inflating, and defiltering a real PNG, while this oracle knows
    // them directly from the construction rule — any decode bug
    // breaks the hash.
    // F5: the WAV construction rule re-derived per sample — the
    // operator's real chunk-walk + PCM16 parse must land on exactly
    // these integers (junk-chunk skipping and two's-complement LE
    // decode are proven by the match).
    "mm_wavstats" ->
      raw"""WITH base AS (
        |  SELECT doc_id, text || ' ' AS t,
        |    (1 + (doc_id * 11) % 300)::int AS n,
        |    (8000 * (1 + doc_id % 4))::int AS sample_rate
        |  FROM documents
        |  WHERE doc_id % 9 <> 4),
        |smp AS (
        |  SELECT doc_id, sample_rate, n,
        |    [ ((ascii(t[((i-1) % len(t)) + 1]) * 167 + (i-1) * 31)
        |        % 32768) - 16384
        |      FOR i IN range(1, n + 1) ] AS s
        |  FROM base)
        |SELECT doc_id, sample_rate, n AS n_samples,
        |  list_sum(s)::bigint AS sum_s,
        |  list_min(s)::int AS min_s, list_max(s)::int AS max_s,
        |  list_sum([x*x FOR x IN s])::bigint AS sum_sq,
        |  len([1 FOR i IN range(1, n)
        |       IF s[i]::bigint * s[i+1] < 0])::int AS n_zero_cross
        |FROM smp
        |ORDER BY doc_id""".stripMargin,

    // F6: silence runs re-derived from the WAV construction rule —
    // position islands (i − row_number) over the silent samples of
    // the per-sample comprehension; τ single-sourced.
    "mm_silence" -> {
      val tau = graft.multimodal.Multimodal.SilenceTau
      raw"""WITH base AS (
        |  SELECT doc_id, text || ' ' AS t,
        |    (1 + (doc_id * 11) % 300)::int AS n,
        |    (8000 * (1 + doc_id % 4))::int AS sample_rate
        |  FROM documents
        |  WHERE doc_id % 9 <> 4),
        |smp AS MATERIALIZED (
        |  SELECT doc_id, sample_rate, n,
        |    [ ((ascii(t[((i-1) % len(t)) + 1]) * 167 + (i-1) * 31)
        |        % 32768) - 16384
        |      FOR i IN range(1, n + 1) ] AS s
        |  FROM base),
        |u AS (
        |  SELECT doc_id,
        |    unnest([{'i': i, 'v': s[i]} FOR i IN range(1, n + 1)]) AS e
        |  FROM smp),
        |sil AS (SELECT doc_id, e.i AS i FROM u WHERE abs(e.v) < $tau),
        |isl AS (
        |  SELECT doc_id,
        |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        |  FROM sil),
        |runs AS (SELECT doc_id, count(*) AS len
        |         FROM isl GROUP BY doc_id, grp),
        |agg AS (
        |  SELECT doc_id, sum(len)::bigint AS n_silent,
        |    count(*)::int AS n_runs, max(len)::int AS max_run
        |  FROM runs GROUP BY 1)
        |SELECT s.doc_id, s.sample_rate, s.n AS n_samples,
        |  coalesce(a.n_silent, 0)::bigint AS n_silent,
        |  coalesce(a.n_runs, 0)::int AS n_runs,
        |  coalesce(a.max_run, 0)::int AS max_run
        |FROM smp s LEFT JOIN agg a USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin
    },

    "mm_resize" -> {
      // single-sourced from the operator constant, like SubstrK /
      // PackBudget / AnomalySpikeZ — a changed maxSide cannot
      // silently desync this oracle
      val ms = graft.multimodal.Multimodal.ResizeOracleMaxSide
      s"""WITH base AS (
        |  SELECT doc_id, text,
        |    1 + (doc_id * 7) % 40 AS w,
        |    1 + (doc_id * 13) % 32 AS h,
        |    CASE WHEN doc_id % 11 = 0 THEN 'raw'
        |         WHEN doc_id % 3 = 0 THEN 'png' ELSE 'bmp' END AS kind,
        |    ((w * 3 + 3) // 4) * 4 AS stride,
        |    hex(encode(text)) || '00' AS p2
        |  FROM documents),
        |pix AS (
        |  SELECT *,
        |    CASE WHEN kind = 'bmp' THEN stride ELSE w * 3 END AS rowbytes,
        |    CASE kind
        |      WHEN 'bmp' THEN substr(
        |        repeat(p2, ((stride * h * 2 + length(p2) - 1) // length(p2))::int),
        |        1, (stride * h * 2)::int)
        |      WHEN 'png' THEN substr(
        |        repeat(p2, ((w * h * 6 + length(p2) - 1) // length(p2))::int),
        |        1, (w * h * 6)::int)
        |    END AS px
        |  FROM base WHERE kind <> 'raw'),
        |planned AS (
        |  SELECT doc_id, w, h, rowbytes, px,
        |    CASE WHEN greatest(w, h) <= $ms THEN w
        |         ELSE greatest(1, (w * $ms) // greatest(w, h)) END AS tw,
        |    CASE WHEN greatest(w, h) <= $ms THEN h
        |         ELSE greatest(1, (h * $ms) // greatest(w, h)) END AS th
        |  FROM pix),
        |nn AS (
        |  SELECT p.doc_id,
        |    md5(lower(string_agg(
        |      substr(p.px,
        |        ((((ty.g * p.h) // p.th) * p.rowbytes
        |          + ((tx.g * p.w) // p.tw) * 3) * 2 + 1)::int, 6),
        |      '' ORDER BY ty.g, tx.g))) AS nn_md5
        |  FROM planned p
        |  JOIN generate_series(0, ${ms - 1}) ty(g) ON ty.g < p.th
        |  JOIN generate_series(0, ${ms - 1}) tx(g) ON tx.g < p.tw
        |  GROUP BY p.doc_id)
        |SELECT p.doc_id, w::int AS width, h::int AS height,
        |  tw::int AS target_w, th::int AS target_h,
        |  nn.nn_md5 AS resized_md5, 'nn' AS resample
        |FROM planned p JOIN nn ON nn.doc_id = p.doc_id
        |ORDER BY p.doc_id""".stripMargin
    },

    // F5 average-hash image dedup: same synthesized corpus + hex-space
    // pixel re-derivation as mm_resize; an 8×8 NN grid, integer
    // brightness sums, bit i set iff gray·64 > Σ gray, then exact
    // hash groups. The 256-row LUT turns hex byte pairs into ints.
    "mm_phash" ->
      ("WITH " + phashCtes + ",\n" +
      """g AS (
        |  SELECT ph.*, min(doc_id) OVER (PARTITION BY phash) AS rep_id,
        |    count(*) OVER (PARTITION BY phash)::bigint AS grp_n
        |  FROM ph)
        |SELECT g.doc_id, p.w::int AS width, p.h::int AS height,
        |  g.phash, g.n_ones, g.rep_id, g.grp_n
        |FROM g JOIN pix p USING (doc_id)
        |ORDER BY g.doc_id""".stripMargin),

    // F10 channel stats: the shared pixel CTEs, then ONE row per
    // pixel with all three channel bytes parsed inline via the
    // '0x'-prefix hex cast (exact integer parse — the per-channel
    // lut-join form measured a pathological >10 min plan at sf0.1),
    // one grouping pass; each mean is one bigint/bigint division
    // mirroring Spark's long/long.
    "mm_colorstats" ->
      ("WITH " + imgPixCtes + ",\n" +
      """pv AS (
        |  SELECT p.doc_id, p.w, p.h,
        |    ('0x' || substr(p.px,
        |      ((y.g * p.rowbytes + x.g * 3) * 2 + 1)::int, 2))::bigint
        |      AS c0,
        |    ('0x' || substr(p.px,
        |      ((y.g * p.rowbytes + x.g * 3) * 2 + 3)::int, 2))::bigint
        |      AS c1,
        |    ('0x' || substr(p.px,
        |      ((y.g * p.rowbytes + x.g * 3) * 2 + 5)::int, 2))::bigint
        |      AS c2
        |  FROM pix p
        |  CROSS JOIN range(0, 32) y(g)
        |  CROSS JOIN range(0, 40) x(g)
        |  WHERE y.g < p.h AND x.g < p.w),
        |agg AS (
        |  SELECT doc_id, max(w)::int AS width, max(h)::int AS height,
        |    count(*)::bigint AS n_px,
        |    sum(c0)::bigint AS s0, sum(c1)::bigint AS s1,
        |    sum(c2)::bigint AS s2,
        |    min(c0 + c1 + c2)::int AS min_gray,
        |    max(c0 + c1 + c2)::int AS max_gray
        |  FROM pv GROUP BY doc_id)
        |SELECT doc_id, width, height, n_px,
        |  round(s0 / n_px, 4) AS mean_c0,
        |  round(s1 / n_px, 4) AS mean_c1,
        |  round(s2 / n_px, 4) AS mean_c2,
        |  min_gray, max_gray
        |FROM agg ORDER BY doc_id""".stripMargin),

    // F11 gray-luminance histogram (Multimodal.mmHistogram): the
    // shared pixel plane in hex space, quarter-binned gray mass —
    // pure integer ⇒ full hash gate.
    "mm_histogram" ->
      ("WITH " + imgPixCtes + ",\n" +
      """pv AS (
        |  SELECT p.doc_id, p.w, p.h,
        |    ('0x' || substr(p.px,
        |      ((y.g * p.rowbytes + x.g * 3) * 2 + 1)::int, 2))::bigint
        |      AS c0,
        |    ('0x' || substr(p.px,
        |      ((y.g * p.rowbytes + x.g * 3) * 2 + 3)::int, 2))::bigint
        |      AS c1,
        |    ('0x' || substr(p.px,
        |      ((y.g * p.rowbytes + x.g * 3) * 2 + 5)::int, 2))::bigint
        |      AS c2
        |  FROM pix p
        |  CROSS JOIN range(0, 32) y(g)
        |  CROSS JOIN range(0, 40) x(g)
        |  WHERE y.g < p.h AND x.g < p.w)
        |SELECT doc_id, max(w)::int AS width, max(h)::int AS height,
        |  count(*)::bigint AS n_px,
        |  sum(CASE WHEN least(3, (c0 + c1 + c2) * 4 // 768) = 0
        |      THEN 1 ELSE 0 END)::bigint AS b0,
        |  sum(CASE WHEN least(3, (c0 + c1 + c2) * 4 // 768) = 1
        |      THEN 1 ELSE 0 END)::bigint AS b1,
        |  sum(CASE WHEN least(3, (c0 + c1 + c2) * 4 // 768) = 2
        |      THEN 1 ELSE 0 END)::bigint AS b2,
        |  sum(CASE WHEN least(3, (c0 + c1 + c2) * 4 // 768) = 3
        |      THEN 1 ELSE 0 END)::bigint AS b3
        |FROM pv GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin),

    // F9 gradient-hash dedup: the shared pixel CTEs through the 9×8
    // difference-hash chain (bit = horizontal gradient sign), then
    // mm_phash's exact-group window verbatim.
    "mm_dhash" ->
      ("WITH " + dhashCtes + ",\n" +
      """g AS (
        |  SELECT dh.*, min(doc_id) OVER (PARTITION BY dhash) AS rep_id,
        |    count(*) OVER (PARTITION BY dhash)::bigint AS grp_n
        |  FROM dh)
        |SELECT g.doc_id, p.w::int AS width, p.h::int AS height,
        |  g.dhash, g.n_ones, g.rep_id, g.grp_n
        |FROM g JOIN pix p USING (doc_id)
        |ORDER BY g.doc_id""".stripMargin),

    // F8 perceptual near-dup pairs: same phash chain, then the
    // 4×16-bit-band pigeonhole join (band match = substring equality
    // in bit-string space) and DuckDB's exact hamming() verify —
    // mirrors the Spark side's conv/xor/bit_count algebra exactly
    // because both compare the identical 64-char '0'/'1' string.
    "mm_neardup" ->
      ("WITH " + phashCtes + ",\n" +
      s"""b AS (
        |  SELECT doc_id, phash, r.g AS band,
        |    substr(phash, (1 + 16 * r.g)::int, 16) AS bv
        |  FROM ph CROSS JOIN range(0, 4) r(g)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
        |    a.phash AS pa, c.phash AS pb
        |  FROM b a JOIN b c
        |    ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id)
        |SELECT doc_a, doc_b, hamming(pa, pb)::int AS hamming
        |FROM cand WHERE hamming(pa, pb) <= ${graft.multimodal.Multimodal.NeardupHamTau}
        |ORDER BY doc_a, doc_b""".stripMargin)
  )

  /** The shared phash derivation — the synthesized-image corpus in hex
    * space through the 8×8 average-hash bit string, ending in
    * `ph(doc_id, phash, n_ones)` (and `pix` for dims). Consumed
    * verbatim by `mm_phash` (exact groups) and `mm_neardup` (banded
    * hamming pairs) so "the hash both queries see" has one
    * definition. */
  /** The synthesized-image pixel plane in hex space — base dims/kind
    * routing, the cycled pixel payload, and the hex→byte LUT. Shared
    * by the phash AND dhash chains so "the pixels every image hash
    * sees" has one definition. */
  private def imgPixCtes: String =
    """base AS (
      |  SELECT doc_id, text,
      |    1 + (doc_id * 7) % 40 AS w,
      |    1 + (doc_id * 13) % 32 AS h,
      |    CASE WHEN doc_id % 11 = 0 THEN 'raw'
      |         WHEN doc_id % 3 = 0 THEN 'png' ELSE 'bmp' END AS kind,
      |    ((w * 3 + 3) // 4) * 4 AS stride,
      |    hex(encode(text)) || '00' AS p2
      |  FROM documents),
      |pix AS (
      |  SELECT *,
      |    CASE WHEN kind = 'bmp' THEN stride ELSE w * 3 END AS rowbytes,
      |    CASE kind
      |      WHEN 'bmp' THEN substr(
      |        repeat(p2, ((stride * h * 2 + length(p2) - 1) // length(p2))::int),
      |        1, (stride * h * 2)::int)
      |      WHEN 'png' THEN substr(
      |        repeat(p2, ((w * h * 6 + length(p2) - 1) // length(p2))::int),
      |        1, (w * h * 6)::int)
      |    END AS px
      |  FROM base WHERE kind <> 'raw'),
      |lut AS (SELECT lpad(hex(t.g), 2, '0') AS hx, t.g AS v
      |        FROM range(0, 256) t(g))""".stripMargin

  private def phashCtes: String = imgPixCtes + ",\n" +
    """samp AS (
      |  SELECT p.doc_id, (ty.g * 8 + tx.g)::int AS i,
      |    substr(p.px, ((((ty.g * p.h) // 8) * p.rowbytes + ((tx.g * p.w) // 8) * 3) * 2 + 1)::int, 2) AS b1,
      |    substr(p.px, ((((ty.g * p.h) // 8) * p.rowbytes + ((tx.g * p.w) // 8) * 3) * 2 + 3)::int, 2) AS b2,
      |    substr(p.px, ((((ty.g * p.h) // 8) * p.rowbytes + ((tx.g * p.w) // 8) * 3) * 2 + 5)::int, 2) AS b3
      |  FROM pix p
      |  CROSS JOIN range(0, 8) ty(g) CROSS JOIN range(0, 8) tx(g)),
      |vals AS (
      |  SELECT s.doc_id, s.i, l1.v + l2.v + l3.v AS gray
      |  FROM samp s
      |  JOIN lut l1 ON l1.hx = s.b1
      |  JOIN lut l2 ON l2.hx = s.b2
      |  JOIN lut l3 ON l3.hx = s.b3),
      |tot AS (SELECT doc_id, sum(gray)::bigint AS total
      |        FROM vals GROUP BY 1),
      |ph AS (
      |  SELECT v.doc_id,
      |    string_agg(CASE WHEN v.gray * 64 > t.total THEN '1' ELSE '0' END,
      |      '' ORDER BY v.i) AS phash,
      |    sum(CASE WHEN v.gray * 64 > t.total THEN 1 ELSE 0 END)::int AS n_ones
      |  FROM vals v JOIN tot t USING (doc_id) GROUP BY v.doc_id)""".stripMargin

  /** The difference-hash chain over [[imgPixCtes]] — 9×8 NN samples
    * (x-grid of 9: (tx·w)//9), per-row horizontal gradient signs,
    * ending in `dh(doc_id, dhash, n_ones)`. Mirrors
    * Multimodal.dhashOf (DhashW=9, DhashH=8). */
  private def dhashCtes: String = imgPixCtes + ",\n" +
    """dsamp AS (
      |  SELECT p.doc_id, ty.g AS ty, tx.g AS tx,
      |    substr(p.px, ((((ty.g * p.h) // 8) * p.rowbytes + ((tx.g * p.w) // 9) * 3) * 2 + 1)::int, 2) AS b1,
      |    substr(p.px, ((((ty.g * p.h) // 8) * p.rowbytes + ((tx.g * p.w) // 9) * 3) * 2 + 3)::int, 2) AS b2,
      |    substr(p.px, ((((ty.g * p.h) // 8) * p.rowbytes + ((tx.g * p.w) // 9) * 3) * 2 + 5)::int, 2) AS b3
      |  FROM pix p
      |  CROSS JOIN range(0, 8) ty(g) CROSS JOIN range(0, 9) tx(g)),
      |dvals AS (
      |  SELECT s.doc_id, s.ty, s.tx, l1.v + l2.v + l3.v AS gray
      |  FROM dsamp s
      |  JOIN lut l1 ON l1.hx = s.b1
      |  JOIN lut l2 ON l2.hx = s.b2
      |  JOIN lut l3 ON l3.hx = s.b3),
      |dh AS (
      |  SELECT a.doc_id,
      |    string_agg(CASE WHEN a.gray < b.gray THEN '1' ELSE '0' END,
      |      '' ORDER BY a.ty, a.tx) AS dhash,
      |    sum(CASE WHEN a.gray < b.gray THEN 1 ELSE 0 END)::int AS n_ones
      |  FROM dvals a JOIN dvals b
      |    ON b.doc_id = a.doc_id AND b.ty = a.ty AND b.tx = a.tx + 1
      |  WHERE a.tx < 8
      |  GROUP BY a.doc_id)""".stripMargin

  /** SURVEY §2G — streaming jobs, verified through their batch form
    * (same transform; stream path is ScalaTest-driven). */
  /** The ordered-funnel SQL — shared verbatim by `events_funnel`
    * (B-section aggregate-join form) and `stream_funnel` (G5 stateful
    * form, batch mode): one semantics, two execution strategies.
    * (`def`, not `val`: consumed by object vals declared earlier.) */
  /** The gap-sessionized session frame — shared by the
    * events_sessionize dump and the events_sessions_stats datasheet
    * (one definition of "session" across both). */
  private def sessionCte: String =
    s"""sess AS (
      |  SELECT user_id, session_id::bigint AS session_id,
      |    count(*) AS n_events,
      |    min(ep) AS session_start, max(ep) AS session_end,
      |    round(sum(value), 4) AS session_value
      |  FROM (
      |    SELECT user_id, event_id, value, ep,
      |      sum(new_session) OVER (PARTITION BY user_id ORDER BY ep, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |    FROM (
      |      SELECT user_id, event_id, value, ep,
      |        CASE WHEN prev_ep IS NULL OR ep - prev_ep > ${graft.operators.Sessionize.GapSeconds}
      |             THEN 1 ELSE 0 END AS new_session
      |      FROM (
      |        SELECT user_id, event_id, value,
      |          epoch(date_trunc('second', ts))::bigint AS ep,
      |          lag(epoch(date_trunc('second', ts))::bigint, 1)
      |            OVER (PARTITION BY user_id
      |                  ORDER BY epoch(date_trunc('second', ts))::bigint,
      |                           event_id) AS prev_ep
      |        FROM events)))
      |  GROUP BY user_id, session_id)""".stripMargin

  private def funnelSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |    epoch(date_trunc('second', ts))::bigint AS ep
      |  FROM events),
      |base AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ep END) AS t1
      |  FROM ev GROUP BY 1),
      |t2 AS (
      |  SELECT e.user_id, min(e.ep) AS t2
      |  FROM ev e JOIN base b ON b.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ep > b.t1
      |  GROUP BY 1),
      |t3 AS (
      |  SELECT e.user_id, min(e.ep) AS t3
      |  FROM ev e JOIN t2 ON t2.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ep > t2.t2
      |  GROUP BY 1)
      |SELECT b.user_id, b.t1, t2.t2, t3.t3,
      |  (CASE WHEN t3.t3 IS NOT NULL THEN 3
      |        WHEN t2.t2 IS NOT NULL THEN 2
      |        WHEN b.t1 IS NOT NULL THEN 1
      |        ELSE 0 END)::int AS stage
      |FROM base b
      |LEFT JOIN t2 ON t2.user_id = b.user_id
      |LEFT JOIN t3 ON t3.user_id = b.user_id
      |ORDER BY b.user_id""".stripMargin

  val streaming: Map[String, String] = Map(
    // The stateful funnel's batch mode must equal the B-section
    // aggregate-join funnel — same shared SQL.
    "stream_funnel" -> funnelSql,

    // G18 online RFM: the stateful metrics stage + the shared scoring
    // stage reproduce B's events_rfm exactly — same SQL.
    "stream_rfm" -> relational("events_rfm"),

    // G19 online interval coverage: the constant-width sweep frontier
    // reproduces B's interval_coverage exactly — same SQL.
    "stream_coverage" -> relational("interval_coverage"),

    // G20 online heavy hitters: exact per-gram running counts + the
    // read-side integer cut reproduce E's ngram_blocklist exactly —
    // same SQL.
    "stream_hitters" -> text("ngram_blocklist"),

    // G21 online EWMA trend: the day-rollover fold emits the same
    // halving sequence as B's events_ewma prefix folds — same SQL.
    "stream_ewma" -> relational("events_ewma"),

    // G30 online inter-arrival gaps: the per-(user,type) last-seen
    // fold emits exactly the lead() window's gap set — same SQL as
    // B's events_interarrival.
    "stream_interarrival" -> relational("events_interarrival"),
    // G32 batch mode shares B's events_markov oracle: the stateful
    // per-user pair fold scored by the same read stage.
    "stream_markov" -> relational("events_markov"),
    // G33 shares B's events_burstiness oracle: the G30 gap state
    // machine scored by the shared burstiness read stage.
    "stream_burstiness" -> relational("events_burstiness"),
    // G31 online daily counters + lag autocorr: UTC 1-day windows ==
    // `ep div 86400`, the lag-OLS read stage is shared — same SQL.
    "stream_autocorr" -> relational("events_autocorr"),

    // G22 online TWAP: the six-long hold-period state reproduces B's
    // events_twap integral exactly — same SQL.
    "stream_twap" -> relational("events_twap"),
    "stream_abtest" -> relational("events_abtest"),
    // G24 online top-k: the heap-operator state twin — same
    // row_number window SQL as the custom-plan batch entry.
    "stream_topk" -> relational("topk_per_key"),
    // G25 online seasonality: 31 marginal counters per type scored
    // on read — same SQL as the batch profile.
    "stream_seasonality" -> relational("events_seasonality"),
    // G26 online change-point: per-type daily counters scored on
    // read by the shared CUSUM stage — same SQL as the batch scan.
    "stream_changepoint" -> relational("events_changepoint"),
    // G27 online backlog: per-order lifecycle state, the dense-day
    // prefix scored on read — same SQL as the batch stabbing form.
    "stream_backlog" -> relational("orders_backlog"),

    // G38 online shingle novelty: the per-shingle min-doc index
    // scored on read by the shared noveltyScore stage — same SQL as
    // the batch sweep.
    "stream_novelty" -> dedup("corpus_novelty"),

    // G37 online robust anomaly: the G26 daily-counter state scored
    // on read by the shared median/MAD stage — same SQL as the
    // batch sweep.
    "stream_anomaly_mad" -> relational("events_anomaly_mad"),

    // G36 online behavioral entropy: per-user type counters scored
    // on read by the shared entropyScore stage — same SQL as the
    // batch sweep.
    "stream_entropy" -> relational("events_entropy"),

    // G35 online feed fingerprint: the table_checksum XOR contract
    // over the documents feed — commutative, so the replayed stream
    // and the one-batch oracle agree by construction.
    "stream_checksum" -> {
      val blocks = graft.streaming.Streams.ChecksumDocCols.map { c =>
        s"""SELECT 'documents' AS tbl, '$c' AS col_name,
           |  count(*)::bigint AS n_rows,
           |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::bigint
           |    AS n_null,
           |  bit_xor(CASE WHEN $c IS NULL THEN 0
           |    ELSE ('0x' || substr(md5($c::varchar), 1, 15))::bigint
           |    END) AS xor_sig
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"$blocks\nORDER BY col_name"
    },

    // G34 online PSI drift: frozen first-half reference window +
    // edge-clamped integer binning (the greatest/least clamp also
    // erases Spark-div vs DuckDB-floor on negative offsets),
    // Laplace shares over the full static grid, per-day STRICT
    // bin-sorted fold; ln ulp class under round(6).
    "stream_psi" -> {
      val b = graft.operators.Profile.PsiBins
      s"""WITH ev AS (
         |  SELECT (epoch(date_trunc('second', ts))::bigint // 86400)
         |      AS day,
         |    floor(value * 100)::bigint AS cents
         |  FROM events),
         |st AS (SELECT min(day) AS dmin, max(day) AS dmax FROM ev),
         |rs AS (SELECT min(cents) AS cmin, max(cents) AS cmax
         |       FROM ev CROSS JOIN st WHERE day <= (dmin + dmax) // 2),
         |binned AS (
         |  SELECT day,
         |    least($b - 1, greatest(0,
         |      ((cents - cmin) * $b) // (cmax - cmin + 1))) AS bin,
         |    count(*)::bigint AS c
         |  FROM ev CROSS JOIN rs GROUP BY 1, 2),
         |ref AS (SELECT bin, sum(c)::bigint AS rc
         |        FROM binned CROSS JOIN st
         |        WHERE day <= (dmin + dmax) // 2 GROUP BY 1),
         |nref AS (SELECT coalesce(sum(rc), 0)::bigint AS n_ref FROM ref),
         |grid AS (SELECT day, unnest(range(0, $b)) AS bin
         |         FROM (SELECT DISTINCT day FROM binned)),
         |f AS (
         |  SELECT g.day, g.bin, coalesce(bn.c, 0)::bigint AS c,
         |    coalesce(r.rc, 0)::bigint AS rc
         |  FROM grid g
         |  LEFT JOIN binned bn ON bn.day = g.day AND bn.bin = g.bin
         |  LEFT JOIN ref r ON r.bin = g.bin),
         |nd AS (SELECT day, sum(c)::bigint AS n_d FROM f GROUP BY 1),
         |terms AS (
         |  SELECT f.day, f.bin, n.n_d,
         |    ((f.c + 1) / (n.n_d + $b)::double
         |      - (f.rc + 1) / (x.n_ref + $b)::double) *
         |    ln(((f.c + 1) / (n.n_d + $b)::double)
         |       / ((f.rc + 1) / (x.n_ref + $b)::double)) AS term
         |  FROM f JOIN nd n USING (day) CROSS JOIN nref x),
         |s AS (SELECT day, n_d,
         |        list_reduce(list(term ORDER BY bin), (a, b) -> a + b)
         |          AS sm
         |      FROM terms GROUP BY day, n_d)
         |SELECT day, n_d AS n_events, round(sm, 6) AS psi
         |FROM s
         |ORDER BY day""".stripMargin
    },

    // G17 composed ingest gate: replayed feed (re-crawls under a
    // 3·5·7-aligned id offset draw the same PII gates, different PII
    // values) → E11 scrub (shared aug/red CTEs) → E2 quality floor
    // over the REDACTED text (raw-value floor, rounded output) →
    // min-doc_id per post-scrub hash. The replays are byte-distinct
    // before the scrub and identical after it — the dedup stage is
    // provably active at every SF.
    "stream_curate" -> {
      val email = graft.functions.TextQueries.EmailRe
      val phone = graft.functions.TextQueries.PhoneRe
      val ip = graft.functions.TextQueries.IpRe
      val off = graft.streaming.Streams.ReingestOffset
      val minQ = graft.operators.Curate.MinQuality
      s"""WITH feed AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $off AS doc_id, text FROM documents
         |  WHERE doc_id % 10 = 6),""".stripMargin + "\n" +
      piiAugCte("feed") + ",\n" + piiRedCte + ",\n" +
      """red_docs AS (
         |  SELECT doc_id, redacted AS text, '' AS lang FROM red),""".stripMargin +
      "\n" + qualityBaseCte("red_docs") + ",\n" +
      s"""scored AS (
         |  SELECT b.doc_id,
         |    md5(b.text) AS text_hash,
         |    (len(regexp_extract_all(r.pii_text, '$email'))
         |     + len(regexp_extract_all(r.pii_text, '$phone'))
         |     + len(regexp_extract_all(r.pii_text, '$ip')))::int
         |      AS n_pii,
         |    $qualityExpr AS q_raw
         |  FROM q_base b JOIN red r ON b.doc_id = r.doc_id),
         |kept AS (
         |  SELECT *, min(doc_id) OVER (PARTITION BY text_hash) AS rep
         |  FROM scored WHERE q_raw >= $minQ)
         |SELECT doc_id, text_hash, n_pii, round(q_raw, 4) AS quality
         |FROM kept WHERE doc_id = rep
         |ORDER BY doc_id""".stripMargin
    },

    // Likewise: the stateful first-activity stream aggregated in
    // batch mode must equal the B-section retention window form.
    "stream_retention" -> retentionSql,

    // And the stateful attribution fold's batch mode must equal the
    // B-section attribution window form — same shared SQL.
    "stream_attribution" -> attributionSql,

    // Same contract for the stateful trailing-window anomaly scorer.
    "stream_anomaly" -> anomalySql,

    // The stateless ingestion sampler must equal the J1 batch sample
    // row-for-row — same shared SQL.
    "stream_sample" -> stratifiedSampleSql,

    // The online cursor packer's batch mode must equal the J2
    // running-sum window form — same shared SQL.
    "stream_pack" -> packSequencesSql,

    // Stateless ingest thinning against the batch-computed rate
    // table must equal the J3 batch mix — same shared SQL.
    "stream_mix" -> mixSourcesSql,
    "stream_window_agg" ->
      """SELECT win_start, event_type, count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value
        |FROM (
        |  SELECT ((epoch(date_trunc('second', ts))::bigint // 3600) * 3600)
        |           AS win_start,
        |         event_type, value
        |  FROM events)
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,

    // First-document-per-content-hash (the retained docs after online
    // exact dedup); streaming path equals this when doc_id-ordered
    // (StreamsSpec drives it through a MemoryStream).
    "stream_dedup" ->
      """SELECT min(doc_id) AS doc_id, md5(text) AS text_hash
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY doc_id""".stripMargin,

    // Stream-static enrichment: daily windowed agg per customer
    // segment after a broadcast dim join.
    "stream_enrich" ->
      """SELECT day_start, c_mktsegment, count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value
        |FROM (
        |  SELECT ((epoch(date_trunc('second', ts))::bigint // 86400) * 86400)
        |           AS day_start,
        |         user_id, value
        |  FROM events) e
        |JOIN customer ON e.user_id = c_custkey
        |GROUP BY day_start, c_mktsegment
        |ORDER BY day_start, c_mktsegment""".stripMargin,

    // Stream-stream interval join: every (view, click) pair by the
    // same user with the click in the view's trailing lag window —
    // the same ns→sec mapping as the funnel oracle.
    "stream_join" ->
      s"""WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch(date_trunc('second', ts))::bigint AS ep
        |  FROM events)
        |SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
        |  v.ep AS view_ep, c.ep AS click_ep, c.ep - v.ep AS lag_s
        |FROM e v JOIN e c
        |  ON v.user_id = c.user_id
        | AND c.ep >= v.ep
        | AND c.ep <= v.ep + ${graft.streaming.Streams.ViewClickLagMax}
        |WHERE v.event_type = 'view' AND c.event_type = 'click'
        |ORDER BY v.user_id, view_id, click_id""".stripMargin,

    // Identical sessions to events_sessionize — the stateful path must
    // reproduce the window-function batch form exactly.
    "stream_sessionize" ->
      s"""SELECT user_id, session_id::bigint AS session_id, count(*) AS n_events,
        |  min(ep) AS session_start, max(ep) AS session_end,
        |  round(sum(value), 4) AS session_value
        |FROM (
        |  SELECT user_id, event_id, value, ep,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ep, event_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM (
        |    SELECT *,
        |      CASE WHEN prev_ep IS NULL OR ep - prev_ep > ${graft.operators.Sessionize.GapSeconds}
        |           THEN 1 ELSE 0 END AS new_session
        |    FROM (
        |      SELECT user_id, event_id, value,
        |        epoch(date_trunc('second', ts))::bigint AS ep,
        |        lag(epoch(date_trunc('second', ts))::bigint, 1)
        |          OVER (PARTITION BY user_id
        |                ORDER BY epoch(date_trunc('second', ts))::bigint,
        |                         event_id) AS prev_ep
        |      FROM events)))
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    // G15 ingest-time decontamination. NOT the C9 oracle: the df cut
    // runs over the EVAL slice only (the honest ingest-time
    // semantics — an unbounded train stream has no knowable df), and
    // the train side keeps its full distinct shingle set (sh0, no
    // cut). Ingest window = doc_id seconds floored to the hour,
    // matching the batch entry's synthesized ep_ts.
    // G16 ingest-time BM25: the E14 CTE chain (same rational-idf
    // algebra and (1.2 + 1) literal discipline) without the top-k cut
    // — the stream emits every scored doc; ingest window = doc_id
    // seconds floored to the hour (the G15 convention).
    "stream_bm25" -> {
      val ts = graft.functions.TextQueries.Bm25Terms
      val k1 = graft.functions.TextQueries.Bm25K1
      val b = graft.functions.TextQueries.Bm25B
      val tfCols = ts.map(t =>
        s"count(*) FILTER (WHERE term = '$t') AS tf_$t").mkString(",\n|    ")
      val dfCols = ts.map(t =>
        s"count(*) FILTER (WHERE tf_$t > 0) AS df_$t").mkString(",\n|    ")
      val scoreSum = ts.map(t =>
        s"((n_docs - df_$t + 0.5) / (df_$t + 0.5)) * (tf_$t * ($k1 + 1)) / " +
          s"(tf_$t + $k1 * ((1 - $b) + $b * (dl / (sum_dl / n_docs))))")
        .mkString("\n|    + ")
      val tfList = ts.map(t => s"tf_$t").mkString(", ")
      raw"""WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
        |                       w -> w <> '')) AS term
        |  FROM documents),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS dl,
        |    $tfCols
        |  FROM toks GROUP BY 1),
        |stats AS (
        |  SELECT count(*) AS n_docs, sum(dl)::bigint AS sum_dl,
        |    $dfCols
        |  FROM perdoc)
        |SELECT (doc_id // 3600) * 3600 AS win_start, doc_id, $tfList, dl,
        |  round($scoreSum, 4) AS score
        |FROM perdoc CROSS JOIN stats
        |WHERE ${ts.map(t => s"tf_$t").mkString(" + ")} > 0
        |ORDER BY win_start, doc_id""".stripMargin
    },

    "stream_decontaminate" -> {
      val ev = graft.operators.Decontaminate.EvalSource
      val tau = graft.operators.Decontaminate.Tau
      s"""WITH evd AS (
        |  SELECT doc_id, text FROM documents WHERE source = '$ev'),
        |trd AS (
        |  SELECT doc_id, text FROM documents WHERE source <> '$ev'),
        |${shingleCtes("evd")},
        |${shingleDistinctCtes("trd", "_t")},
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT t.doc_id AS train_doc, a.doc_id AS eval_doc, count(*) AS c
        |  FROM sh0_t t JOIN sh a ON a.s = t.s
        |  GROUP BY 1, 2)
        |SELECT (train_doc // 3600) * 3600 AS win_start,
        |  train_doc, eval_doc, round(c::double / n, 4) AS contain
        |FROM inter JOIN sizes ON sizes.doc_id = eval_doc
        |WHERE c::double / n >= $tau
        |ORDER BY win_start, train_doc, eval_doc""".stripMargin
    }
  )
}
