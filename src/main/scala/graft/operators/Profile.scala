package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2H adjunct — generic per-column table profiling (the
  * datasheet pass a pipeline runs before trusting any new dataset):
  * row count, null count, exact distinct count, min/max per column,
  * one row per column.
  *
  * Scale shape: one aggregation branch PER COLUMN, unioned — not one
  * wide agg with N count(distinct)s, which Catalyst plans as an
  * Expand multiplying every input row by N before the exchange. Each
  * branch's scan is column-pruned to exactly its one column
  * (ProfileSpec asserts ReadSchema per scan), so on a columnar store
  * the N branches together read the same bytes as one full-width
  * scan — and each branch is an independent two-phase
  * partial-distinct aggregate, the shape that survives 100 TB.
  * min/max surface as strings so one long-format frame carries every
  * column type; profiled columns here are integer/varchar, whose
  * string forms are engine-identical (doubles/timestamps would need
  * a formatting contract, deliberately out of this entry's scope).
  */
object Profile {

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  /** The profiled lineitem columns — integer + varchar only (exact
    * cross-engine string forms; single-sourced into the oracle). */
  val LineitemCols: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_linenumber",
    "l_returnflag", "l_linestatus")

  /** H query entry: profile the biggest table. */
  def tableProfile(spark: SparkSession, dir: String): DataFrame =
    profileOf(Tables(spark, dir).lineitem, LineitemCols)

  /** Generic long-format profile of `cols` over any frame. */
  def profileOf(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(col(c)) // explicit prune: the branch sees ONE column
        .agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_.unionAll(_)).orderBy(col("col_name"))

  // ----- typed min/max (doubles + timestamps) ----------------------

  /** The EXPLICIT cross-engine formatting contract for typed min/max
    * (the gap the plain-cast entry deliberately left open):
    *  - `double` → fixed 6-decimal `%.6f` over the full binary value
    *    (never the shortest-repr string cast, whose scientific
    *    notation and trailing-digit choices differ between engines);
    *  - `timestamp` (micros) → `yyyy-MM-dd HH:mm:ss.SSSSSS`, DuckDB
    *    twin `%Y-%m-%d %H:%M:%S.%f` (both fixed 6-digit micros);
    *  - epoch-nanos `long` (events.ts) → truncate to micros with an
    *    INTEGRAL `div 1000` (never a double round-trip — CLAUDE.md)
    *    and format as above. The WHOLE branch (distinct included)
    *    runs at the micro grain: DuckDB reads the ns-parquet
    *    truncated to micro TIMESTAMP, so sub-micro grain is not
    *    cross-engine observable — a distinct over raw nanos would
    *    silently over-count the oracle's once two events share a
    *    micro (probable at sf ≥ 1: ~19% birthday odds at 1M events
    *    over 30 days).
    * Aggregate formatters apply to the two scalars only — per-row
    * work stays a codegen'd min/max over the native column type. */
  /** Spark-side formatter per type kind. */
  private def sparkFmt(kind: String)(x: String): String = kind match {
    case "plain" => s"cast($x AS string)"
    case "double" => s"format_string('%.6f', $x)"
    case "ts" => s"date_format($x, 'yyyy-MM-dd HH:mm:ss.SSSSSS')"
    // the branch column is already micros (see tableProfileTyped)
    case "tsns" => s"date_format(timestamp_micros($x), " +
      "'yyyy-MM-dd HH:mm:ss.SSSSSS')"
  }

  /** The typed-profile column set: (table, column, type kind) —
    * single-sourced into the oracle (which mirrors the contract with
    * `::varchar` / `printf('%.6f', …)` / `strftime(…, '%Y-%m-%d
    * %H:%M:%S.%f')` per kind). */
  val TypedCols: Seq[(String, String, String)] = Seq(
    ("events", "event_id", "plain"),
    ("events", "ts", "tsns"),
    ("events", "value", "double"),
    ("events", "event_type", "plain"),
    ("orders", "o_totalprice", "double"),
    ("orders", "o_orderdate", "ts"))

  /** H query entry 2: the datasheet over double/timestamp columns
    * with the pinned formatting contract. Same scale shape as
    * [[profileOf]]: one column-pruned two-phase branch per column. */
  def tableProfileTyped(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    TypedCols.map { case (table, c, kind) =>
      val df = table match {
        case "events" => t.events
        case "orders" => t.orders
      }
      val fmt = sparkFmt(kind) _
      val branchCol =
        if (kind == "tsns") expr(s"$c div 1000").as(c) // ns → µs, integral
        else col(c)
      df.select(branchCol)
        .agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).as("min_raw"),
          max(col(c)).as("max_raw"))
        .selectExpr(s"'$table' AS table_name", s"'$c' AS col_name",
          "n_rows", "n_null", "n_distinct",
          fmt("min_raw") + " AS min_val",
          fmt("max_raw") + " AS max_val")
    }.reduce(_.unionAll(_))
      .orderBy(col("table_name"), col("col_name"))
  }

  // ----- join-key skew report --------------------------------------

  /** The profiled join keys — the columns the suite's big joins and
    * aggregations actually shuffle on (single-sourced into the
    * oracle). */
  val SkewKeys: Seq[(String, String)] = Seq(
    ("events", "user_id"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"))

  /** H query entry 3: per-join-key skew datasheet — the measurement
    * pass that decides whether a key needs [[Skew]]'s salting before
    * a shuffle join/agg (heaviest key, its share, and the
    * heaviest-to-mean ratio: a skew_ratio near 1 is uniform; ≫ 1
    * means one task drags the stage and AQE skew-split or a salt is
    * warranted).
    *
    * Scale shape per key: one map-side-combined groupBy over the key
    * (the same exchange the join itself would pay — measuring skew
    * costs one count pass), then ONE global aggregate over the
    * |keys|-row counts frame: the heaviest key rides along as
    * min(struct(−cnt, key)) — lexicographic struct order gives
    * (max cnt, then min key), the deterministic tiebreak, with no
    * second pass and no 1×1 join (the blanket plan contract bans
    * BroadcastNestedLoop even at one row). Never a window over the
    * data, never a collect. Ratios are single divisions of exact
    * longs ⇒ correctly-rounded doubles, full hash gate. */
  def tableSkew(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    SkewKeys.map { case (table, c) =>
      val df = table match {
        case "events" => t.events
        case "lineitem" => t.lineitem
        case "orders" => t.orders
      }
      skewOf(df, s"$table.$c", c)
    }.reduce(_.unionAll(_)).orderBy(col("entity"))
  }

  /** One skew-report row for `keyCol` of any frame. */
  def skewOf(df: DataFrame, entity: String, keyCol: String): DataFrame = {
    val counts = df.select(col(keyCol).as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    val topCnt = -col("top.nc")
    counts.agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        min(struct((-col("cnt")).as("nc"), col("k").as("k"))).as("top"))
      .select(lit(entity).as("entity"),
        col("n_rows"), col("n_keys"),
        col("top.k").cast("string").as("top_key"),
        topCnt.as("top_cnt"),
        round(topCnt / col("n_rows"), 6).as("top_share"),
        round((topCnt * col("n_keys")) / col("n_rows"), 4)
          .as("skew_ratio"))
  }

  // ----- referential-integrity check -------------------------------

  /** The checked FK edges: (child table, child key, parent table,
    * parent key) — single-sourced into the oracle. */
  val FkEdges: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** H query entry 7: referential-integrity datasheet — orphan counts
    * per FK edge (child rows whose key misses the parent), the
    * trust-but-verify pass before joining a new snapshot (a silent
    * 2% orphan rate quietly drops 2% of revenue from every join
    * downstream). Per edge: one left-anti join (dims broadcast; the
    * one fact-fact edge shuffles on its key — the same exchange the
    * real join would pay, and the shape runtime bloom pruning
    * applies to) + exact counts; null child keys are counted
    * separately (null ∉ orphan — it never joins anywhere). Exact
    * integers + one exact division ⇒ full hash gate. */
  def tableFkCheck(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def tbl(n: String): DataFrame = n match {
      case "lineitem" => t.lineitem
      case "orders"   => t.orders
      case "customer" => t.customer
      case "supplier" => t.supplier
      case "nation"   => t.nation
      case "part"     => t.part
      case "region"   => t.region
    }
    // r15 restructure (guide §2.3 + the table_fds one-scan explode
    // discipline): the per-edge form scanned the FACT table once per
    // fact edge (lineitem ×3) and shuffled raw child rows into the
    // fact-fact join. Now every fact-side (lineitem) edge reads ONE
    // scan — each row explodes to its 3 (edge, key) probes, a
    // two-phase groupBy(edge, key) collapses them map-side to
    // (edge, key, multiplicity) BEFORE anything is joined (the
    // exchange carries distinct keys, not rows), and one left join
    // against the union of edge-tagged parent key sets + one
    // groupBy(edge) emits the same exact counts. Dim-child edges
    // (orders/customer/supplier/nation — each a single cheap scan)
    // keep the per-edge [[fkCheckOf]] shape. 14 scans → 12, and the
    // fact table is read once instead of three times (the linear-
    // factor term at 100 TB). Exact integers ⇒ hash gate unchanged.
    val liEdges = FkEdges.filter(_._1 == "lineitem")
    val liProbe = t.lineitem.select(explode(array(liEdges.map {
      case (ct, ck, pt, pk) =>
        struct(lit(s"$ct.$ck -> $pt.$pk").as("edge"), col(ck).as("k"))
    }: _*)).as("e"))
      .select(col("e.edge").as("edge"), col("e.k").as("k"))
      .groupBy(col("edge"), col("k"))
      .agg(count(lit(1)).as("cnt"))
    val liParents = liEdges.map { case (ct, ck, pt, pk) =>
      tbl(pt).select(lit(s"$ct.$ck -> $pt.$pk").as("edge"),
        col(pk).as("pk")).distinct()
    }.reduce(_.unionAll(_))
    val liAgg = liProbe
      .join(liParents,
        liProbe("edge") === liParents("edge") && col("k") === col("pk"),
        "left_outer")
      .groupBy(liProbe("edge"))
      .agg(
        sum(col("cnt")).as("n_child"),
        sum(when(col("k").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        sum(when(col("k").isNotNull && col("pk").isNull, col("cnt"))
          .otherwise(0L)).as("n_orphans"))
    // left-join the expected edge literals so an EMPTY fact table
    // still emits one row per edge — (edge, 0, null, null, null),
    // exactly what the per-edge fkCheckOf form produced on an empty
    // child (ADVICE r15: the groupBy over zero probe rows silently
    // dropped the edges). On non-empty data every edge matches, so
    // the output is byte-identical.
    val liEdgeNames = liEdges.map { case (ct, ck, pt, pk) =>
      s"$ct.$ck -> $pt.$pk" }
    val liStats = liEdgeNames
      .map(e => spark.range(1).select(lit(e).as("edge")))
      .reduce(_.unionAll(_))
      .join(liAgg, Seq("edge"), "left_outer")
      .select(col("edge"),
        coalesce(col("n_child"), lit(0L)).as("n_child"),
        col("n_null"), col("n_orphans"),
        round(col("n_orphans") / coalesce(col("n_child"), lit(0L)), 6)
          .as("orphan_share"))
    val dimStats = FkEdges.filterNot(_._1 == "lineitem")
      .map { case (ct, ck, pt, pk) =>
        fkCheckOf(tbl(ct).select(col(ck).as("k")),
          tbl(pt).select(col(pk).as("pk")),
          s"$ct.$ck -> $pt.$pk")
      }.reduce(_.unionAll(_))
    liStats.unionAll(dimStats).orderBy(col("edge"))
  }

  /** One FK-edge check over any child-key / parent-key frames: one
    * left-outer probe + ONE aggregate — no driver actions, no second
    * pass. orphan = non-null key with no parent; null keys count
    * separately (they never join anywhere). */
  def fkCheckOf(child: DataFrame, parent: DataFrame,
      edge: String): DataFrame = {
    child.join(parent.distinct(), col("k") === col("pk"), "left_outer")
      .select(col("k"), col("pk"))
      .agg(
        count(lit(1)).as("n_child"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(col("k").isNotNull && col("pk").isNull, 1L)
          .otherwise(0L)).as("n_orphans"))
      .select(lit(edge).as("edge"),
        col("n_child"), col("n_null"), col("n_orphans"),
        round(col("n_orphans") / col("n_child"), 6).as("orphan_share"))
  }

  // ----- equi-width histograms -------------------------------------

  /** Histogram bin count and the profiled numeric columns. */
  val HistBins = 16
  val HistCols: Seq[(String, String)] = Seq(
    ("lineitem", "l_extendedprice"),
    ("orders", "o_totalprice"),
    ("events", "value"))

  /** H query entry 5: per-column equi-width histogram — the value
    * -distribution datasheet next to [[tableProfile]]'s scalar stats
    * (is the column uniform, skewed, bimodal? what does a sane bin
    * range look like before choosing partition bounds?).
    *
    * Per column: ONE min/max aggregate (1-row frame, broadcast back —
    * the zorder_key stats-pass shape) and ONE map-side-combined
    * groupBy over ≤ [[HistBins]] keys; two scans per column,
    * column-pruned, the same "compute stats then apply" convention as
    * text_oov. The bin id is `floor((x−mn)·B/(mx−mn))` clamped to
    * B−1 at x = mx — IEEE `− * /` are correctly rounded, so both
    * engines compute the identical double and the identical floor:
    * full hash gate despite the FP bin edges. Bin bounds are emitted
    * rounded for the report; counts are exact longs. */
  def tableHistogram(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    HistCols.map { case (table, c) =>
      val df = table match {
        case "lineitem" => t.lineitem
        case "orders"   => t.orders
        case "events"   => t.events
      }
      val vals = df.select(col(c).cast("double").as("x"))
      val stats = vals.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      val b = lit(HistBins)
      val bin = least(
        floor((col("x") - col("mn")) * b / (col("mx") - col("mn"))),
        lit(HistBins - 1)).cast("int")
      vals.crossJoin(broadcast(stats))
        .select(bin.as("bin"), col("mn"), col("mx"))
        .groupBy(col("bin"), col("mn"), col("mx"))
        .agg(count(lit(1)).as("n"))
        .select(lit(s"$table.$c").as("entity"), col("bin"),
          round(col("mn") + col("bin") * (col("mx") - col("mn")) / b, 4)
            .as("lo"),
          round(col("mn") + (col("bin") + 1) * (col("mx") - col("mn")) / b, 4)
            .as("hi"),
          col("n"))
    }.reduce(_.unionAll(_)).orderBy(col("entity"), col("bin"))
  }

  // ----- snapshot diff ---------------------------------------------

  /** H query entry 4: corpus snapshot delta — diff "yesterday's"
    * snapshot A against "today's" snapshot B before promoting a new
    * crawl: which docs were added, removed, or content-changed. The
    * promotion gate every versioned-corpus pipeline runs (and the
    * input to dedup_incremental's "only process the delta" step).
    *
    * The corpus ships a single snapshot, so both sides derive
    * deterministically from doc_id algebra (the synthesized-corpus
    * pattern of mm_resize / text_pii): A omits doc_id % 7 = 3
    * (docs that hadn't been crawled yet), B omits doc_id % 11 = 7
    * (docs dropped since) and re-crawled doc_id % 5 = 0 with a
    * ' v2' suffix — all four outcomes (added / removed / changed /
    * unchanged) occur at every SF.
    *
    * Scale shape: each side is projected to (doc_id, md5) BEFORE the
    * join — the full-outer exchange carries 32-hex digests, never
    * document text; at catalog scale both snapshots are bucketed by
    * doc_id and the join is a zero-exchange sort-merge (SinksSpec's
    * co-bucketed pattern). Output is the delta only — the report a
    * gate reads; unchanged docs are the boring majority and stay out
    * of the result. Exact string algebra ⇒ full hash gate. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val a = docs.filter(col("doc_id") % 7 =!= 3)
      .select(col("doc_id"), md5(col("text")).as("md5_a"))
    val b = docs.filter(col("doc_id") % 11 =!= 7)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("md5_b"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("md5_a").isNull, lit("added"))
          .when(col("md5_b").isNull, lit("removed"))
          .when(col("md5_a") =!= col("md5_b"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"), col("md5_a"), col("md5_b"))
      .orderBy(col("doc_id"))
  }

  /** Column pairs for [[tableCorr]] (single-sourced into the oracle):
    * the lineitem numeric measures, each unordered pair once. */
  val CorrCols: Seq[String] =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** H: pairwise Pearson correlation over the lineitem measures — the
    * "are these columns redundant / is discount coupled to price"
    * datasheet read. ONE aggregate pass computes all C(4,2)=6 `corr`
    * aggregates plus the row count (N separate scans would re-read
    * the table N times — the percentile-array lesson of CLAUDE.md),
    * then a 1-row explode unpivots to the tidy (col_x, col_y, r)
    * shape. Zero shuffles beyond the single partial-agg exchange;
    * scan reads exactly the four measure columns.
    *
    * corr is the one double here whose partial-merge order differs
    * cross-engine; it is scale-free (|r| ≤ 1, relative FP noise
    * ~1e-13) so the 4dp round is stable — unlike covariances, whose
    * absolute magnitude would put FP noise inside the rounding grain
    * (measured consideration, documented not implemented). */
  def tableCorr(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val pairs = CorrCols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val aggs = pairs.map { case (a, b) =>
      corr(col(a), col(b)).as(s"r_${a}_$b")
    } :+ count(lit(1)).as("n_rows")
    val one = li.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("col_x"), lit(b).as("col_y"),
          round(col(s"r_${a}_$b"), 4).as("r"), col("n_rows"))
      }: _*)).as("c"))
      .select(col("c.col_x"), col("c.col_y"), col("c.r"),
        col("c.n_rows").as("n_rows"))
      .orderBy(col("col_x"), col("col_y"))
  }

  /** Columns scanned for functional dependencies (orders: the unique
    * key makes o_orderkey→* hold while every other direction fails —
    * the discovered set is non-trivial in both directions). */
  val FdCols: Seq[String] =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  /** H: functional-dependency discovery — for every ordered column
    * pair (det → dep), does each determinant value map to exactly one
    * dependent value? The key-inference / normalization-audit pass a
    * data profiler runs before trusting joins (`fd_holds` ⟺
    * |distinct(det, dep)| = |distinct det|; the difference counts the
    * violating determinant-pair surplus). All integer equality — no
    * tolerance.
    *
    * Shape (round 11): the 12 ordered-pair stats decompose into 10
    * independent SINGLE-distinct aggregations — n_det for pair
    * (a → b) is countDistinct(a) over the deduped (a, b) frame,
    * which equals countDistinct(a) over the table (every a value
    * survives the dedup), so it is a per-COLUMN stat (4 branches);
    * n_pairs is symmetric in (a, b) (6 unordered-pair branches of
    * countDistinct(struct(a, b))). Each branch is a pruned scan →
    * ONE partial-agg exchange (single-distinct plans as a two-phase
    * hash agg with map-side dedup, no Expand); the previous
    * branch-per-ordered-pair form paid 12 × (distinct exchange +
    * second agg exchange) = 3 stages/branch — measured 2.9 s at
    * sf0.001 (pure stage-count floor) and 4.2 s at sf0.1, vs
    * 0.55/0.85 s (median-of-7) for this form, identical output. The 10 one-row
    * frames crossJoin (1-row broadcast by construction — the
    * PlanContractSpec allow-listed shape) into a single stats row;
    * the 12 output rows then EXPLODE from one projection of it (an
    * N-times-referenced 1-row frame would recompute all 10 branches
    * N times — the no-subtree-dedup trap). The "obvious" single pass
    * with 16 countDistinct aggregates plans as one Expand ×16
    * (2.4M null-padded rows at sf0.1) whose multi-distinct partials
    * can't use the codegen fast hashmap — measured 3.79 s at sf0.1
    * in round 2, still rejected. */
  def tableFds(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    val fdPairs = for { a <- FdCols; b <- FdCols if a != b } yield (a, b)
    val unordered = for {
      i <- FdCols.indices; j <- FdCols.indices if i < j
    } yield (FdCols(i), FdCols(j))
    val dets = FdCols.map(a =>
      o.agg(countDistinct(col(a)).as(s"d_$a")))
    val pairs = unordered.map { case (a, b) =>
      o.agg(countDistinct(struct(col(a), col(b))).as(s"p_${a}_$b")) }
    val stats = (dets ++ pairs).reduce(_ crossJoin _)
    def pcol(a: String, b: String) =
      if (FdCols.indexOf(a) < FdCols.indexOf(b)) col(s"p_${a}_$b")
      else col(s"p_${b}_$a")
    val rows = fdPairs.map { case (a, b) =>
      struct(lit(a).as("det"), lit(b).as("dep"),
        col(s"d_$a").as("n_det"), pcol(a, b).as("n_pairs"),
        (pcol(a, b) === col(s"d_$a")).as("fd_holds"))
    }
    stats.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .orderBy(col("det"), col("dep"))
  }

  /** The entropy/MI column set — low-cardinality lineitem columns
    * only, so the JOINT cell count is bounded (≤ 7·2·50·3 ≈ 2100
    * cells whatever the row count; single-sourced into the oracle). */
  val EntropyCols: Seq[String] =
    Seq("l_linenumber", "l_linestatus", "l_quantity", "l_returnflag")

  /** H: column entropy + pairwise mutual information — for every
    * column pair, the Shannon entropies H(X), H(Y), H(X,Y) in bits
    * and MI = H(X)+H(Y)−H(X,Y) (the "which columns actually carry /
    * share information" datasheet read; MI ≈ 0 ⇒ independent, MI ≈
    * min(H) ⇒ redundant — the soft-dependency complement of
    * [[tableFds]]' hard FD test).
    *
    * Shape: ONE full-cardinality joint groupBy over the fact scan
    * (cells bounded by the pinned low-cardinality column set, NOT by
    * rows — the classic OLAP cube trick); every pair marginal, single
    * marginal and the global total then derive from those ≤2.1k cells
    * in ONE grouping-sets pass + one conditional-aggregate pivot —
    * zero further fact scans, ~4 shuffles total. Entropies use
    * the count form H = log2(n) − Σ c·log2(c)/n: integer counts
    * leave the aggregates and the FP expression per statistic is
    * mirrored op-for-op in the oracle — but this is the
    * [[tableCorr]] TOLERANCE class, not bit-exactness: Spark's log2
    * is ln(x)/ln(2) vs DuckDB's std::log2 (ulp-level differences),
    * and the Σ c·log2(c) sum over up to ~2.1k cells re-associates
    * per engine, so round(4) is doing real work and a half-boundary
    * flip is possible at larger SFs (include this query in any
    * sf0.1/sf1 re-certification of rounding-sensitive changes).
    * 1-row crossJoins assemble each output row (broadcast by
    * construction). */
  def tableEntropy(spark: SparkSession, dir: String): DataFrame = {
    // r15 restructure (stage-count-bound, guide §2.4 + the table_fds
    // EXPLODE discipline): the old form ran 4 branch aggregates per
    // pair × 6 pairs off the persisted joint cube — 24 metadata-sized
    // branches, 48 shuffles, and a measured ~2.3 s stage-count floor
    // with ≤ 2.1k rows in flight. Now ONE grouping-sets pass over the
    // joint cube computes every pair marginal, every single-column
    // marginal and the global total (Expand ×11 of ≤ 2.1k cells —
    // nothing), one tiny groupBy(gid) reduces each set to its
    // Σ c·log2(c) / cell-count / total, a single conditional-aggregate
    // pivot lands all 17 statistics in ONE row, and the 6 output rows
    // explode from one projection (K references to a 1-row frame
    // would recompute the upstream K times — CLAUDE.md). Fact scan
    // count unchanged (1); the joint persist is gone because the cube
    // is now referenced exactly once. Values are the same sums over
    // the same cell multisets (reassociation drift lives ~10⁹ ulps
    // from the round(4) boundaries — MARGINS_r15), hash-gated at
    // sf0.01/sf0.1.
    val li = Tables(spark, dir).lineitem
    val joint = li.groupBy(EntropyCols.map(col): _*)
      .agg(count(lit(1)).as("c"))
    val pairs =
      EntropyCols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    // grouping_id bit i (MSB-first over EntropyCols) = column i
    // aggregated out of the grouping set
    def gidOf(kept: Set[String]): Int =
      EntropyCols.zipWithIndex.map { case (cName, i) =>
        if (kept.contains(cName)) 0 else 1 << (EntropyCols.length - 1 - i)
      }.sum
    val sets: Seq[Seq[org.apache.spark.sql.Column]] =
      pairs.map { case (a, b) => Seq(col(a), col(b)) } ++
        EntropyCols.map(cn => Seq(col(cn))) :+
        Seq.empty[org.apache.spark.sql.Column]
    val cells = joint
      .groupingSets(sets, EntropyCols.map(col): _*)
      .agg(sum(col("c")).as("cc"), grouping_id().as("gid"))
    val stats = cells.groupBy(col("gid"))
      .agg(sum(col("cc") * log2(col("cc"))).as("s"),
        count(lit(1)).as("k"),
        sum(col("cc")).as("tot"))
    val aggs: Seq[org.apache.spark.sql.Column] =
      (max(when(col("gid") === gidOf(Set.empty), col("tot"))).as("n") +:
        pairs.flatMap { case (a, b) =>
          val g = gidOf(Set(a, b))
          Seq(max(when(col("gid") === g, col("s"))).as(s"s_${a}_$b"),
            max(when(col("gid") === g, col("k"))).as(s"k_${a}_$b"))
        }) ++
        EntropyCols.map { a =>
          max(when(col("gid") === gidOf(Set(a)), col("s"))).as(s"s_$a")
        }
    val one = stats.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        col(s"k_${a}_$b").as("n_xy"),
        round(log2(col("n")) - col(s"s_$a") / col("n"), 4).as("h_x"),
        round(log2(col("n")) - col(s"s_$b") / col("n"), 4).as("h_y"),
        round(log2(col("n")) - col(s"s_${a}_$b") / col("n"), 4).as("h_xy"),
        round(log2(col("n")) +
          (col(s"s_${a}_$b") - col(s"s_$a") - col(s"s_$b")) / col("n"), 4)
          .as("mi"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .orderBy(col("col_x"), col("col_y"))
  }

  /** H: Gini coefficient of customer spend per market segment — the
    * revenue-concentration datasheet read beside orders_pareto's
    * top-share cut (Gini ≈ 0 egalitarian, → 1 winner-take-all).
    * Formula on the sorted per-customer cent totals x_1 ≤ … ≤ x_n:
    * G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx), every sum an order-free
    * INTEGER (cents + row_number ranks over the (total, custkey)
    * total order), converted to double ONCE in the final mirrored
    * expression ⇒ full hash gate.
    *
    * Shape: fact-fact equi-join (lineitem ⋈ orders on orderkey) →
    * per-customer cents (two-phase agg) → the customer dim broadcast
    * onto the aggregated frame → ONE per-segment rank window (shards
    * sort in parallel) → 5-row aggregate. */
  def tableGini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val perCust = t.lineitem
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")).as("cents"))
    giniOf(perCust.join(
      t.customer.select(col("c_custkey"), col("c_mktsegment")),
      col("o_custkey") === col("c_custkey")))
  }

  /** Per-segment Gini over any (c_mktsegment, c_custkey, cents)
    * frame. */
  def giniOf(seg: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("cents"), col("c_custkey"))
    seg.withColumn("rk", row_number().over(w))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s0"),
        sum(col("rk") * col("cents")).as("s1"))
      .select(col("c_mktsegment").as("segment"),
        col("n").cast("int").as("n_customers"),
        col("s0").as("total_cents"),
        round((lit(2.0) * col("s1") - (col("n") + lit(1)).cast("double")
          * col("s0")) / (col("n").cast("double") * col("s0")), 6)
          .as("gini"))
      .orderBy(col("segment"))
  }

  /** The segment alphabet for [[tableKs]] (the generator's five
    * event types, pinned — single-sourced into the oracle). */
  val KsTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** KS critical-value coefficient at α = 0.05 (the classic
    * asymptotic c(α) = √(−ln(α/2)/2) ≈ 1.3581, inlined as the same
    * double literal on both sides — no cross-engine ln). */
  val KsCrit05 = 1.3581015157406195

  /** H: two-sample Kolmogorov–Smirnov drift test between every pair
    * of event-type segments over the value column — "did this
    * segment's value distribution shift" with a significance flag,
    * the distribution-drift tripwire beside table_outliers'
    * per-row tails.
    *
    * Exactness: the empirical CDFs are INTEGER cumulative counts
    * over the ordered distinct values; the D statistic maxes
    * |cum_a·N_b − cum_b·N_a| with each factor converted to double
    * ONCE (mirrored — the double hop also dodges bigint overflow at
    * extreme N), and max is order-free ⇒ full hash gate. The 10
    * output rows EXPLODE from one array of structs in one
    * projection (the table_fds lesson — K references to a 1-row
    * frame recompute upstream K times).
    *
    * Shape: one fact scan → per-(value) conditional-count groupBy
    * (persisted: cum + totals both read it), then the TWO-LEVEL
    * cumulative CDF (partSkyline bucketed-prefix pattern — the
    * distinct-value frame grows with the data, so one global-order
    * window over it is a single-partition sort, dead at 100 TB):
    * unit-width value buckets cumulate in parallel, the global stage
    * orders only the per-bucket count summary (bounded by the VALUE
    * DOMAIN, not the row count), and cum = bucket prefix + in-bucket
    * running count — pure long sums, bit-identical to the one-window
    * form the oracle runs. Totals ride a 1-row crossJoin
    * (allowlisted broadcast-scalar shape). */
  def tableKs(spark: SparkSession, dir: String): DataFrame =
    ksOf(Tables(spark, dir).events.select(col("event_type"), col("value")),
      KsTypes)

  /** All-pairs KS over any (event_type, value) frame and alphabet. */
  def ksOf(e: DataFrame, KsTypes: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    def cCol(t: String) =
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"c_$t")
    // NULL values are outside every CDF by definition — drop them
    // explicitly (mirrored in the oracle): floor(NULL) is a null
    // bucket key the prefix equi-join would silently discard while
    // totals still counted the rows, so the CDF would never reach 1
    // (ADVICE r14; gen_sf data is null-free, so hashes are unchanged)
    val counts = e.filter(col("value").isNotNull).groupBy(col("value"))
      .agg(cCol(KsTypes.head), KsTypes.tail.map(cCol): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // unit-width value buckets: floor is monotone, so bucket order ==
    // value order and the two-level sum equals the global cumsum
    val bts = counts.withColumn("b", floor(col("value")))
    val perB = bts.groupBy(col("b"))
      .agg(sum(col(s"c_${KsTypes.head}")).as(s"b_${KsTypes.head}"),
        KsTypes.tail.map(t => sum(col(s"c_$t")).as(s"b_$t")): _*)
    val wPre = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = perB.select(col("b") +:
      KsTypes.map(t =>
        coalesce(sum(col(s"b_$t")).over(wPre), lit(0L)).as(s"p_$t")): _*)
    val wIn = Window.partitionBy(col("b")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bts.join(broadcast(prefix), Seq("b"))
      .select(col("value") +:
        KsTypes.map(t =>
          (col(s"p_$t") + sum(col(s"c_$t")).over(wIn)).as(s"cum_$t")): _*)
    val totals = counts.agg(
      sum(col(s"c_${KsTypes.head}")).as(s"n_${KsTypes.head}"),
      KsTypes.tail.map(t => sum(col(s"c_$t")).as(s"n_$t")): _*)
    val pairs = for {
      i <- KsTypes.indices; j <- KsTypes.indices if i < j
    } yield (KsTypes(i), KsTypes(j))
    val dmax = cum.crossJoin(totals).agg(
      max(abs(col(s"cum_${pairs.head._1}").cast("double") *
            col(s"n_${pairs.head._2}") -
          col(s"cum_${pairs.head._2}").cast("double") *
            col(s"n_${pairs.head._1}")))
        .as(s"dn_${pairs.head._1}_${pairs.head._2}"),
      pairs.tail.map { case (a, b) =>
        max(abs(col(s"cum_$a").cast("double") * col(s"n_$b") -
            col(s"cum_$b").cast("double") * col(s"n_$a")))
          .as(s"dn_${a}_$b")
      }: _*)
    val rows = dmax.crossJoin(totals).select(explode(array(
      pairs.map { case (a, b) =>
        struct(lit(a).as("type_a"), lit(b).as("type_b"),
          col(s"n_$a").as("n_a"), col(s"n_$b").as("n_b"),
          col(s"dn_${a}_$b").as("dn"))
      }: _*)).as("p"))
    val nA = col("p.n_a").cast("double")
    val nB = col("p.n_b").cast("double")
    val d = col("p.dn") / (nA * nB)
    val crit = lit(KsCrit05) * sqrt((nA + nB) / (nA * nB))
    rows.select(col("p.type_a").as("type_a"), col("p.type_b").as("type_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"),
        round(d, 6).as("d"), round(crit, 6).as("crit_05"),
        (d > crit).as("significant"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Robust-z outlier threshold (Iglewicz–Hoban modified z-score:
    * 0.6745·(x − median)/MAD, flag |z| > 3.5). */
  val MadZThreshold = 3.5
  val MadK = 0.6745

  /** H: robust outlier detection over the events value stream —
    * per-event-type median/MAD modified z-scores, reporting every
    * row whose |z| exceeds [[MadZThreshold]]. The
    * heavy-tail tripwire a profiling pass runs where mean/stddev
    * would be dragged by the very outliers it hunts.
    *
    * Shape: THREE column-pruned passes over the fact — median per
    * type, MAD per type, then the score filter — the honest minimum
    * for two dependent order statistics (each stat frame is k rows,
    * broadcast onto the next pass; no fact-sized persist, no
    * fact-sized shuffle: `percentile` partial-aggregates map-side).
    * Exact per-group percentile carries the per-group value map —
    * the 100 TB dashboard route is approx_percentile (KLL,
    * q23_approx precedent); this is the exact form the audit runs.
    * Exactness: percentile ≡ quantile_cont (q23-proven), the score
    * is one mirrored FP expression with ::double-forced literals,
    * and the threshold compares the unrounded double; mad > 0
    * guards the div-by-zero IEEE/NULL divergence identically on
    * both sides ⇒ full hash gate. */
  def tableOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .select(col("event_id"), col("event_type"), col("value"))
    madOutliersOf(e)
  }

  /** Robust outliers over any (event_id, event_type, value) frame. */
  def madOutliersOf(e: DataFrame): DataFrame = {
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5D)").as("med"))
    val mad = e.join(med, "event_type")
      .groupBy(col("event_type"))
      .agg(expr("percentile(abs(value - med), 0.5D)").as("mad"))
    val z = lit(MadK) * (col("value") - col("med")) / col("mad")
    e.join(med, "event_type").join(mad, "event_type")
      .filter(col("mad") > 0.0 && abs(z) > MadZThreshold)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 6).as("value"),
        round(col("med"), 4).as("med"),
        round(col("mad"), 4).as("mad"),
        round(z, 4).as("robust_z"))
      .orderBy(col("event_id"))
  }

  /** Benford leading-digit probabilities log10(1+1/d), d = 1..9 —
    * computed ONCE here and interpolated into BOTH the Spark plan
    * and the oracle SQL as the same double literals, so no
    * cross-engine log10 sits in the gate (library log10 is not
    * guaranteed correctly rounded). */
  val BenfordP: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** H: Benford's-law first-digit audit of a monetary column — the
    * classic fabricated-data / unit-mixing tripwire a profiling pass
    * runs on any new numeric feed: observed leading-digit shares of
    * lineitem's extended price vs the Benford expectation, with the
    * per-digit χ² contribution (large terms name the suspect
    * digits).
    *
    * Shape: one column-pruned scan → 9-row groupBy (two-phase
    * partial agg — the count shuffle carries ≤ 9 rows per map task);
    * the dense 1..9 axis joins on the 9-row frame and the total is
    * an order-free integer window sum over those 9 rows. Leading
    * digit = first char of the integer part's decimal string —
    * integer-exact in both engines (no pow/log in the digit path).
    * χ² terms mirror op-for-op with `::double`-forced literals ⇒
    * full hash gate. */
  def tableBenford(spark: SparkSession, dir: String): DataFrame =
    benfordOf(Tables(spark, dir).lineitem
      .select(col("l_extendedprice").as("x")))

  /** Benford audit over any single-column (x: double) frame. */
  def benfordOf(vals: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = vals.sparkSession
    val obs = vals.filter(col("x") >= 1.0)
      .select(substring(floor(col("x")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val digits = spark.range(1, 10)
      .select(col("id").cast("int").as("digit"),
        element_at(array(BenfordP.map(lit): _*), col("id").cast("int"))
          .as("p"))
    val exp = col("p") * col("total")
    digits.join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("p"))
      .withColumn("total", sum(col("n_obs")).over(Window.partitionBy()))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs") / col("total"), 6).as("obs_share"),
        round(col("p"), 6).as("benford_p"),
        round((col("n_obs") - exp) * (col("n_obs") - exp) / exp, 4)
          .as("chi2_term"))
      .orderBy(col("digit"))
  }

  /** k threshold for [[tableKanon]] — classes smaller than this are
    * re-identification risks (the conventional k=5 release bar). */
  val KanonK = 5L

  /** Quasi-identifier sets audited by [[tableKanon]] (single-sourced
    * into the oracle). */
  val KanonQis: Seq[Seq[String]] = Seq(
    Seq("c_mktsegment", "o_orderpriority"),
    Seq("c_mktsegment", "o_orderpriority", "o_orderstatus"),
    Seq("c_nationkey", "c_mktsegment"))

  /** H: k-anonymity audit — for each quasi-identifier set, how many
    * equivalence classes the release would form, the smallest class,
    * and how many rows sit in classes below k=5 (re-identifiable
    * under linkage attack). The privacy datasheet a release review
    * reads BEFORE any export — the measurement half of k-anonymity
    * (generalization/suppression to fix failures is policy, not an
    * operator).
    *
    * Shape per QI set: one column-pruned fact scan → two-phase
    * groupBy to the class-size frame (≤ Π|domain| rows) → a 1-row
    * rollup; three branches unioned (the table_corr discipline).
    * Pure integer counts + one mirrored bigint/bigint division ⇒
    * full hash gate. */
  def tableKanon(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val src = t.orders
      .join(broadcast(t.customer
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
    KanonQis.map { qi =>
      src.groupBy(qi.map(col): _*)
        .agg(count(lit(1)).as("cls"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("cls")).as("n_rows"),
          min(col("cls")).as("min_class"),
          sum(when(col("cls") < KanonK, col("cls")).otherwise(0L))
            .as("n_rows_at_risk"))
        .select(lit(qi.mkString(",")).as("qi"), col("n_rows"),
          col("n_classes"), col("min_class"),
          (col("min_class") >= KanonK).as("k_anonymous"),
          col("n_rows_at_risk"),
          round(col("n_rows_at_risk") / col("n_rows"), 6).as("risk_share"))
    }.reduce(_ unionAll _)
      .orderBy(col("qi"))
  }

  /** Column pairs for [[tableCramersV]] — categorical columns of the
    * orders ⋈ customer frame (single-sourced into the oracle). */
  val CramersPairs: Seq[(String, String)] = Seq(
    ("c_mktsegment", "o_orderpriority"),
    ("c_mktsegment", "o_orderstatus"),
    ("o_orderpriority", "o_orderstatus"))

  /** H: Cramér's V association between categorical column pairs —
    * the categorical companion to table_corr (numeric Pearson) and
    * table_fds (exact determinism): V ∈ [0,1] from the χ² of the
    * contingency table, the "are these labels independent" datasheet
    * read before trusting a stratification or suspecting leakage.
    *
    * Shape per pair: fact scan → (a,b) two-phase groupBy to the ≤
    * |A|·|B| cell frame; margins/total are window sums OVER THE
    * CELLS (metadata-sized — never the fact rows); χ² is a STRICT
    * SEQUENTIAL fold over the (a,b)-sorted cell terms (aggregate
    * HOF ↔ list_reduce, the text_entropy pattern — ≤25 elements on
    * one row). ZERO cells (label pairs never co-occurring) carry
    * χ² mass eᵢⱼ that the sparse cell frame can't fold — recovered
    * analytically, no densifying cross join: Σ_zero e = n − Σ_exist
    * e, so χ² = fold((nᵢⱼ−e)²/e − e) + n (ProfileSpec's functional-
    * dependence fixture reads exactly 1 only with this term).
    * Expected counts convert to double BEFORE the rᵢ·cⱼ product
    * (mirrored; also dodges bigint overflow at extreme n). sqrt is
    * IEEE-exact cross-engine ⇒ full hash gate. Three branches
    * unioned (column-pruned scans — the table_corr discipline). */
  def tableCramersV(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val src = t.orders
      .join(broadcast(t.customer
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    CramersPairs.map { case (a, b) => cramersOf(src, a, b) }
      .reduce(_ unionAll _)
      .orderBy(col("col_x"), col("col_y"))
  }

  /** One Cramér's-V row for columns (a, b) of `src`. */
  def cramersOf(src: DataFrame, a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = src.groupBy(col(a).as("x"), col(b).as("y"))
      .agg(count(lit(1)).as("nij"))
    val e = (col("ri").cast("double") * col("cj")) / col("n")
    val m = cells
      .withColumn("ri", sum(col("nij")).over(Window.partitionBy(col("x"))))
      .withColumn("cj", sum(col("nij")).over(Window.partitionBy(col("y"))))
      .withColumn("n", sum(col("nij")).over(Window.partitionBy()))
      .withColumn("term", (col("nij") - e) * (col("nij") - e) / e - e)
    val one = m.agg(
      sort_array(collect_list(struct(col("x"), col("y"), col("term"))))
        .as("terms"),
      max(col("n")).as("n"),
      size(collect_set(col("x"))).as("r"),
      size(collect_set(col("y"))).as("c"))
    val chi2 = aggregate(transform(col("terms"), s => s.getField("term")),
      lit(0.0), (acc, x) => acc + x) + col("n")
    one.select(lit(a).as("col_x"), lit(b).as("col_y"), col("n"),
      ((col("r") - 1) * (col("c") - 1)).as("dof"),
      round(chi2, 4).as("chi2"),
      round(sqrt(chi2 / (col("n") * least(col("r") - 1, col("c") - 1))), 6)
        .as("cramers_v"))
  }

  /** Bucket width for [[tableSeqGaps]]' two-level adjacency scan —
    * keys within a bucket sort locally; only one (min,max) row per
    * bucket crosses the global stage. */
  val SeqGapBucket = 4096L

  /** H: sequence-gap audit of a surrogate-key column — which key
    * ranges inside [min, max] are absent. Run on the distinct
    * l_orderkey set it surfaces every order with NO lineitems (253
    * real gaps at sf0.01): the referential-completeness check a feed
    * audit runs beside table_fk_check's dangling-key direction.
    *
    * Scale shape: "adjacent key" is NOT computed with a global-order
    * window (single-partition sort — dead at 100 TB). Keys bucket by
    * k / 4096: in-bucket gaps come from a lead window PARTITIONED by
    * bucket (all shards sort in parallel), cross-bucket and
    * whole-missing-bucket gaps from a lead over the per-bucket
    * (min, max) aggregate — n/4096 rows, metadata-sized at any
    * scale. Pure integer algebra end to end ⇒ full hash gate. */
  def tableSeqGaps(spark: SparkSession, dir: String): DataFrame =
    seqGapsOf(Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("k")).distinct())

  /** Gap rows (gap_start, gap_end, gap_len) over any distinct
    * single-column (k: long) frame, ascending. */
  def seqGapsOf(keys: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = keys.withColumn("b", floor(col("k") / SeqGapBucket))
    val wIn = Window.partitionBy(col("b")).orderBy(col("k"))
    val inBucket = b
      .withColumn("nk", lead(col("k"), 1).over(wIn))
      .filter(col("nk") - col("k") > 1)
      .select((col("k") + 1).as("gap_start"), (col("nk") - 1).as("gap_end"))
    val spans = b.groupBy(col("b"))
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
    val wSp = Window.orderBy(col("b"))
    val acrossBucket = spans
      .withColumn("nlo", lead(col("lo"), 1).over(wSp))
      .filter(col("nlo") - col("hi") > 1)
      .select((col("hi") + 1).as("gap_start"), (col("nlo") - 1).as("gap_end"))
    inBucket.unionAll(acrossBucket)
      .select(col("gap_start"), col("gap_end"),
        (col("gap_end") - col("gap_start") + 1).as("gap_len"))
      .orderBy(col("gap_start"))
  }

  /** Fixed-width bin count for [[tablePsi]] (single-sourced into the
    * oracle). */
  val PsiBins = 20

  /** H: population stability index of order value between the early
    * and late half of the order history — the tabular drift monitor
    * (embed_drift's companion for plain columns): PSI < 0.1 is
    * stable, 0.1–0.25 drifting, > 0.25 a distribution break that
    * should block a model refresh or a mix re-weighting. Per-bin
    * rows carry both period shares and the PSI contribution; the
    * last row's running total IS the index.
    *
    * Shape: one 1-row min/max stats pass (persisted — referenced by
    * both the binning pass and the bin grid; CLAUDE.md: Catalyst
    * does not dedup repeated subtrees) + one binning scan into a
    * B-row aggregate; everything after is windows on the B-row
    * frame. Binning is pure integer algebra (fixed-width cents bins
    * off global min/max — no quantile edges, so no cross-engine
    * interpolation contract), Laplace-smoothed shares are one IEEE
    * division each, and the PSI total is a RUNNING ordered sum
    * (sequential fold in both engines — never a whole-frame FP sum);
    * ln is the table_entropy ulp class under round(6). */
  def tablePsi(spark: SparkSession, dir: String): DataFrame =
    psiOf(Tables(spark, dir).orders
      .select(floor(col("o_totalprice") * 100).cast("long").as("cents"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("day")))

  /** Core over any (cents: long, day: long) frame. */
  def psiOf(src: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = PsiBins
    val stats = src.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"),
      min(col("cents")).as("cmin"), max(col("cents")).as("cmax")).persist()
    val counts = src.crossJoin(broadcast(stats))
      .select(
        (col("day") <= expr("(dmin + dmax) div 2")).as("is_ref"),
        least(lit(b - 1L),
          expr(s"((cents - cmin) * $b) div (cmax - cmin + 1)")).as("bin"))
      .groupBy(col("bin"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("n_cur"))
    // empty bins still contribute their smoothed-share term: join the
    // counts onto the full static grid.
    val grid = src.sparkSession.range(b).select(col("id").as("bin"))
      .crossJoin(broadcast(stats))
    val full = grid.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        expr(s"cmin + (bin * (cmax - cmin + 1)) div $b").as("bin_lo_cents"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val term = (col("p_cur") - col("p_ref")) *
      log(col("p_cur") / col("p_ref"))
    full
      .withColumn("p_ref", (col("n_ref") + lit(1L)) /
        (sum(col("n_ref")).over(Window.partitionBy()) + lit(b.toLong)))
      .withColumn("p_cur", (col("n_cur") + lit(1L)) /
        (sum(col("n_cur")).over(Window.partitionBy()) + lit(b.toLong)))
      .select(col("bin"), col("bin_lo_cents"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p_cur"), 6).as("p_cur"),
        round(term, 6).as("psi_term"),
        round(sum(term).over(wCum), 6).as("psi_cum"))
      .orderBy(col("bin"))
  }

  /** H: mutual information between categorical column pairs — the
    * information-theoretic companion to table_cramers_v on the same
    * contingency cells: MI in nats plus the ln(min(r,c))-normalized
    * NMI ∈ [0,1], the redundancy read ("does knowing segment tell me
    * priority") that picks stratification keys and flags leaky
    * features before training.
    *
    * Shape per pair (the cramersOf discipline): fact scan → two-phase
    * groupBy to ≤ |A|·|B| cells; margins/total are window sums OVER
    * THE CELLS; MI is a STRICT sequential fold over the (x,y)-sorted
    * cell terms (collect_list∘sort_array + aggregate here,
    * list_reduce ORDER BY there — CLAUDE.md FP fold discipline), so
    * the only cross-engine bits are ln ulps: round(6) tolerance
    * class. All integer products fit bigint (nij·n ≤ n² ≈ 2e14 at
    * sf10). */
  def tableMutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val src = t.orders
      .join(broadcast(t.customer
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    CramersPairs.map { case (a, b) => mutualInfoOf(src, a, b) }
      .reduce(_ unionAll _)
      .orderBy(col("col_x"), col("col_y"))
  }

  /** Candidate key column sets probed by [[tableKeys]]
    * (single-sourced into the oracle). */
  val KeyCandidates: Seq[Seq[String]] = Seq(
    Seq("l_orderkey"),
    Seq("l_partkey"),
    Seq("l_orderkey", "l_linenumber"),
    Seq("l_orderkey", "l_partkey", "l_suppkey"))

  /** H: candidate-key discovery — for each probed column set of
    * lineitem: rows, distinct combinations, duplicate rows and the
    * is-key verdict. The uniqueness direction table_fds' determinism
    * scan doesn't answer ("can this column set BE the primary key"),
    * run before choosing a merge/upsert key (cdc_merge) or a
    * bucketing column. Finds the real composite key
    * (orderkey, linenumber) and rejects the near-keys.
    *
    * Shape: one column-pruned scan + two-phase distinct-count
    * aggregate PER candidate (the table_profile
    * branch-per-candidate discipline — never one wide Expand-plan
    * agg), unioned; pure integer algebra ⇒ full hash gate. */
  def tableKeys(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    KeyCandidates.map { cols =>
      t.lineitem.select(cols.map(col).toIndexedSeq: _*)
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(struct(cols.map(col).toIndexedSeq: _*))
            .as("n_distinct"))
        .select(lit(cols.mkString(",")).as("candidate"),
          col("n_rows"), col("n_distinct"),
          (col("n_rows") - col("n_distinct")).as("n_dup_rows"),
          (col("n_rows") === col("n_distinct")).as("is_key"))
    }.reduce(_ unionAll _)
      .orderBy(col("candidate"))
  }

  /** One mutual-information row for columns (a, b) of `src`. */
  def mutualInfoOf(src: DataFrame, a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = src.groupBy(col(a).as("x"), col(b).as("y"))
      .agg(count(lit(1)).as("nij"))
    val m = cells
      .withColumn("ri", sum(col("nij")).over(Window.partitionBy(col("x"))))
      .withColumn("cj", sum(col("nij")).over(Window.partitionBy(col("y"))))
      .withColumn("n", sum(col("nij")).over(Window.partitionBy()))
      .withColumn("term", (col("nij") / col("n")) *
        log((col("nij") * col("n")) / (col("ri") * col("cj"))))
    val one = m.agg(
      sort_array(collect_list(struct(col("x"), col("y"), col("term"))))
        .as("terms"),
      max(col("n")).as("n"),
      size(collect_set(col("x"))).as("r"),
      size(collect_set(col("y"))).as("c"))
    val mi = aggregate(transform(col("terms"), s => s.getField("term")),
      lit(0.0), (acc, x) => acc + x)
    one.select(lit(a).as("col_x"), lit(b).as("col_y"), col("n"),
      col("r"), col("c"),
      round(mi, 6).as("mi_nats"),
      when(least(col("r"), col("c")) > 1,
        round(mi / log(least(col("r"), col("c")).cast("double")), 6))
        .as("nmi"))
  }

  /** Tables and columns fingerprinted by [[tableChecksum]] —
    * integer/varchar columns only (exact cross-engine string forms,
    * the LineitemCols contract; single-sourced into the oracle). */
  val ChecksumCols: Seq[(String, Seq[String])] = Seq(
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
    "orders"   -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority"),
    "part"     -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey"))

  /** H: order-independent table/column fingerprints — per profiled
    * column: row count, null count, and a 60-bit XOR checksum of the
    * md5 of each non-null value's canonical string form. The
    * cross-snapshot integrity read ("did replication/backfill change
    * ANY value in this column") that a content diff like
    * snapshot_diff is too expensive for at fleet cadence: two
    * snapshots agree iff every (tbl, col) row agrees, and a mismatch
    * localizes drift to the column before anyone scans row-level.
    * XOR is the deliberate combiner: commutative/associative (one
    * canonical value regardless of row order or partitioning — the
    * property a distributed fingerprint NEEDS), with the documented
    * blind spot that values flipping in pairs cancel; n_rows/n_null
    * beside it catch the cardinality half of that.
    *
    * Scale shape: ONE column-pruned scan per table computing every
    * column's (n_null, xor_sig) in a single partial-aggregate row —
    * never a branch per column (the profile family's N-branch shape
    * is for count(distinct); XOR and null counts compose in one
    * two-phase agg with no Expand) — then K output rows from ONE
    * explode-of-struct-array projection (CLAUDE.md: K references to
    * a 1-row frame recompute upstream K times). All integer ⇒ full
    * hash gate; md5 prefix→long is the shared 0x-cast/conv contract
    * (sample_negatives' hashing class). */
  def tableChecksum(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val byName = Map[String, DataFrame](
      "customer" -> t.customer, "orders" -> t.orders,
      "part" -> t.part, "supplier" -> t.supplier)
    ChecksumCols.map { case (tbl, cols) => checksumOf(byName(tbl), tbl, cols) }
      .reduce(_ unionAll _)
      .orderBy(col("tbl"), col("col_name"))
  }

  /** H (round 13): declarative data-quality rule report — the
    * Deequ/dbt-tests pass a pipeline runs on every snapshot before
    * trusting it: per rule (not-null, domain, range, FK, uniqueness)
    * the row count, violation count and pass verdict. Violations are
    * COUNTED, not thrown — the report is the contract between the
    * data owner and the consumer, and a red row localizes the break
    * to one rule on one table.
    *
    * Scale shape: per-row rules evaluate in ONE column-pruned
    * aggregate pass per table (every rule a sum-of-indicator in the
    * same two-phase agg — no per-rule branch, no Expand), K rows out
    * of ONE explode-of-structs projection; the FK rule is a LEFT
    * ANTI equi-join count (shuffle-on-natural-key, the table_fk_check
    * shape) and uniqueness one two-phase distinct count. Pure
    * integers ⇒ full hash gate. */
  def tableDqRules(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def perRow(tbl: String, src: DataFrame,
        rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
      val aggs = rules.map { case (n, viol) =>
        sum(when(viol, 1L).otherwise(0L)).as(s"v_$n") }
      val one = src.agg(count(lit(1)).as("n_rows"), aggs.toIndexedSeq: _*)
      val entries = array(rules.map { case (n, _) =>
        struct(lit(n).as("rule"), col(s"v_$n").as("n_violations"))
      }: _*)
      one.select(lit(tbl).as("tbl"), col("n_rows"), explode(entries).as("e"))
        .select(col("tbl"), col("e.rule").as("rule"), col("n_rows"),
          col("e.n_violations").as("n_violations"))
    }
    val o = perRow("orders", t.orders, Seq(
      "totalprice_positive" ->
        (col("o_totalprice").isNull || col("o_totalprice") <= 0.0),
      "status_in_domain" ->
        (col("o_orderstatus").isNull ||
          !col("o_orderstatus").isin("F", "O", "P")),
      "orderdate_not_null" -> col("o_orderdate").isNull))
    // NULL in a range-checked column is an EXPLICIT violation (Deequ
    // convention) — bare NOT(range) is NULL for NULL input, which the
    // indicator sum would silently count as passing on both engines.
    val l = perRow("lineitem", t.lineitem, Seq(
      "quantity_in_range" ->
        (col("l_quantity").isNull ||
          !(col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0)),
      "discount_in_range" ->
        (col("l_discount").isNull ||
          !(col("l_discount") >= 0.0 && col("l_discount") <= 0.1))))
    val c = perRow("customer", t.customer, Seq(
      "name_not_blank" ->
        (col("c_name").isNull || length(col("c_name")) === 0)))
    val fk = t.lineitem.agg(count(lit(1)).as("n_rows"))
      .crossJoin(t.lineitem.select(col("l_orderkey"))
        .join(t.orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations")))
      .select(lit("lineitem").as("tbl"),
        lit("fk_orderkey_exists").as("rule"),
        col("n_rows"), col("n_violations"))
    val uq = t.orders.agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count_distinct(col("o_orderkey")))
          .as("n_violations"))
      .select(lit("orders").as("tbl"), lit("orderkey_unique").as("rule"),
        col("n_rows"), col("n_violations"))
    o.unionAll(l).unionAll(c).unionAll(fk).unionAll(uq)
      .select(col("tbl"), col("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
      .orderBy(col("tbl"), col("rule"))
  }

  /** H (round 15): per-stream freshness / liveness panel — for each
    * event_type: row count, last-seen epoch second, staleness lag
    * behind the corpus watermark, observed span, and the average
    * daily rate — the "is this feed still alive, and how far behind
    * is it" check an ingest SLA monitor runs before anything
    * downstream trusts the partition (table_seq_gaps' temporal
    * companion: that one finds holes in the key space, this one
    * finds stalls in time).
    *
    * Exactness: everything is epoch-second integer algebra off the
    * nanos contract; the one double is the per-day rate
    * (n·86400)::double / span::double — exact bigint numerator, ONE
    * division per side, round(4); single-instant types (span 0)
    * report NULL rate, mirrored.
    *
    * Shape: ONE events scan into a per-type two-phase hash agg
    * (alphabet-sized output); the corpus watermark folds off the
    * tiny aggregated frame — never a second pass over the fact
    * table — and joins back as a broadcast 1-row cross (the
    * events_survival censor-time pattern). */
  def tableFreshness(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables(spark, dir).events
      .select(col("event_type"), Tables.tsNsToSec("ts").as("ep"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ep")).as("first_sec"),
        max(col("ep")).as("last_sec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tmax = per.agg(max(col("last_sec")).as("tmax"))
    per.crossJoin(broadcast(tmax))
      .select(col("event_type"), col("n_events"), col("last_sec"),
        (col("tmax") - col("last_sec")).as("lag_sec"),
        (col("last_sec") - col("first_sec")).as("span_sec"),
        when(col("last_sec") > col("first_sec"),
          round((col("n_events") * 86400L).cast("double") /
            (col("last_sec") - col("first_sec")).cast("double"), 4))
          .as("per_day"))
      .orderBy(col("event_type"))
  }

  /** One fingerprint frame — (tbl, col_name, n_rows, n_null, xor_sig)
    * per column — over any source frame. */
  def checksumOf(srcDf: DataFrame, tbl: String,
      cols: Seq[String]): DataFrame = {
    val src = srcDf.select(cols.map(col).toIndexedSeq: _*)
    def sig(c: String) =
      conv(substring(md5(col(c).cast("string").cast("binary")), 1, 15),
        16, 10).cast("long")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nnull"),
        expr(s"bit_xor(sig_$c)").as(s"${c}__xor"))
    }
    val one = src
      .select(cols.map(col).toIndexedSeq ++
        cols.map(c => when(col(c).isNull, 0L).otherwise(sig(c))
          .as(s"sig_$c")): _*)
      .agg(count(lit(1)).as("n_rows"), aggs.toIndexedSeq: _*)
    val entries = array(cols.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}__nnull").as("n_null"),
        col(s"${c}__xor").as("xor_sig"))
    }: _*)
    one.select(lit(tbl).as("tbl"), col("n_rows"), explode(entries).as("e"))
      .select(col("tbl"), col("e.col_name").as("col_name"), col("n_rows"),
        col("e.n_null").as("n_null"), col("e.xor_sig").as("xor_sig"))
  }
}
