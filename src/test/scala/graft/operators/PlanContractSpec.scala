package graft.operators

import graft.SparkSuite

/** Blanket physical-plan contract over EVERY SparkEntry query: no
  * plan may contain a CartesianProduct or BroadcastNestedLoopJoin —
  * the two shapes that mean "this operator would not survive a 100×
  * scale-up". Any future operator that slips into a non-equi join
  * fails here by name, not in a production plan review. */
class PlanContractSpec extends SparkSuite {

  // BroadcastNestedLoopJoin is scale-safe ONLY when its broadcast
  // side is bounded by construction; each entry here names why:
  //  - ann_bruteforce: the broadcast side is the k-query set (10
  //    rows); scoring all n×q pairs IS the operator's definition,
  //    and the O(n·q) loop is the documented exact baseline.
  //  - embed_mmr: same n×q candidate-generation scan as
  //    ann_bruteforce (the greedy rerank itself is a bounded
  //    per-query flatMapGroups, no join at all).
  //  - ann_recall_eval: reuses the ann_bruteforce arm verbatim as
  //    its exact ground truth — the same bounded 10-row query-set
  //    broadcast (the eval's own joins are equi-joins on
  //    (q_id, n_id)).
  //  - q14_scalar_subquery: the broadcast side is a 1-row global
  //    aggregate — a broadcast scalar, O(n) total.
  //  - text_tfidf: same shape as q14 — the corpus-size N is a 1-row
  //    count() aggregate crossJoin-broadcast into the scorer.
  //  - text_typicality / corpus_stats: same 1-row-total
  //    crossJoin-broadcast shape as text_tfidf (corpus token count /
  //    corpus doc count respectively).
  //  - text_bm25 / stream_bm25: same 1-row shape — the corpus stats
  //    row (N, sum_dl, per-term dfs) broadcast into the per-doc
  //    scorer (crossJoin batch-side; constant-key stream-static join
  //    in the ingest twin, which the optimizer folds to the same
  //    1-row broadcast loop).
  //  - mix_curriculum: same 1-row shape — the three quartile
  //    boundaries ride a 1-row percentile aggregate crossJoin.
  //  - zorder_key: same 1-row shape — the min/max stats row of the
  //    in-plan bucketization pass.
  //  - table_histogram: same 1-row shape — each column's min/max
  //    stats row broadcast into the binning pass.
  //  - events_rfm / stream_rfm: same 1-row shape twice — the corpus
  //    max-epoch row and the quintile-boundaries row broadcast into
  //    the shared rfmScore stage (the stream twin scores the same
  //    frame in batch mode).
  //  - orders_pareto: same 1-row shape — the total-cents aggregate
  //    broadcast into the per-customer share/class projection.
  //  - text_collocations: same 1-row shape — the (n_uni, n_bi)
  //    corpus-totals row broadcast into the lift scorer.
  //  - stream_hitters: same 1-row shape — the snapshot-total row
  //    broadcast into the read-side blocklist cut.
  //  - table_entropy: same 1-row shape three times per pair — the
  //    (s_xy, n) / s_x / s_y single-row aggregates crossJoined to
  //    assemble each pair's output row; every side is an aggregate
  //    of the bounded joint cube (≤2.1k cells by the pinned
  //    low-cardinality column set).
  //  - table_fds: same 1-row shape — the 10 single-distinct count
  //    aggregates (4 per-column + 6 unordered-pair) crossJoined into
  //    one stats row the 12 output rows explode from.
  //  - sample_negatives: same 1-row shape — the scaled batch-count
  //    dial (count div 32) rides a 1-row aggregate crossJoin into
  //    the bucket projection.
  //  - table_ks: same 1-row shape twice — the per-type totals row
  //    crossJoined into the cumulative-CDF max pass, and the 1-row
  //    D-stat frame crossJoined back for the 10-pair explode.
  //  - decontaminate_semantic: the broadcast side is the FIXED
  //    10-vector eval set (benchmarks don't grow with the corpus) —
  //    the ann_bruteforce bounded-query-set class.
  //  - corpus_heaps: same 1-row shape — the max-doc-id row
  //    crossJoin-broadcast into the two bucket projections.
  //  - sample_time_split: same 1-row shape — the quantile-cutoff row
  //    crossJoin-broadcast into the assignment projection.
  //  - graph_assortativity: the five correlation sums collapse to a
  //    1-row frame before the final Pearson assembly crossJoin.
  //  - events_survival: the 1-row corpus-max censor time crossJoined
  //    into the per-subject duration projection.
  //  - cdc_merge: the 1-row integer-midpoint row crossJoined into the
  //    snapshot-side filter.
  //  - table_psi: the 1-row min/max stats frame crossJoined into the
  //    binning pass and the static 20-row grid.
  //  - mix_dsir: the 1-row model-totals frame crossJoined into the
  //    token scoring join.
  //  - pack_bestfit: the 1-row corpus-count frame (the scaled
  //    bin-count dial) crossJoined into the shard projection.
  //  - corpus_coverage: the 1-row totals frame crossJoined onto the
  //    1-row collected head before the ks explode.
  //  - dedup_stats: the 1-row corpus-count frame crossJoined into
  //    the histogram projection (and the 1-row clustered total into
  //    the singleton row).
  //  - stream_psi: three 1-row shapes — day-range stats into the
  //    reference filter, ref stats into the binning pass, and the
  //    n_ref total into the term projection.
  //  - graph_modularity: the 1-row edge-count m crossJoined into the
  //    per-community q_term projection.
  //  - ann_range: the broadcast side is the FIXED 10-query set on a
  //    non-equi (=!=) condition — the ann_bruteforce bounded class.
  //  - events_attribution_linear: the 1-row credit-fp frame
  //    crossJoined with the 1-row touch-totals frame.
  //  - sample_kfold: the 1-row corpus-total frame crossJoined into
  //    the per-fold share projection.
  //  - table_dq_rules: the 1-row lineitem-count frame crossJoined
  //    with the 1-row anti-join violation count (FK rule assembly).
  //  - table_freshness: the 1-row corpus-watermark max crossJoined
  //    onto the alphabet-sized per-type panel (the events_survival
  //    censor pattern).
  private val boundedBroadcastOk =
    Set("ann_bruteforce", "q14_scalar_subquery", "text_tfidf",
      "text_typicality", "corpus_stats", "text_bm25", "stream_bm25",
      "mix_curriculum", "zorder_key", "table_histogram", "events_rfm",
      "stream_rfm", "orders_pareto", "text_collocations",
      "stream_hitters", "table_entropy", "embed_mmr", "table_fds",
      "ann_recall_eval", "sample_negatives", "table_ks",
      "decontaminate_semantic", "corpus_heaps", "sample_time_split",
      "graph_assortativity", "events_survival", "cdc_merge",
      "table_psi", "mix_dsir", "pack_bestfit", "corpus_coverage",
      "dedup_stats", "stream_psi", "graph_modularity", "ann_range",
      "events_attribution_linear", "sample_kfold", "table_dq_rules",
      "table_freshness")

  test("no query plans a cartesian or unbounded nested-loop join") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val plan = q(spark, sfDir).queryExecution.executedPlan.toString
        val bad =
          (if (plan.contains("CartesianProduct")) Seq("CartesianProduct")
           else Seq.empty) ++
          (if (plan.contains("BroadcastNestedLoop") &&
               !boundedBroadcastOk(name)) Seq("BroadcastNestedLoop")
           else Seq.empty)
        bad.map(b => s"$name: $b")
    }
    assert(offenders.isEmpty,
      s"scale-hostile join shapes found:\n${offenders.mkString("\n")}")
  }

  // A WindowExec with an EMPTY partition spec moves its whole input
  // frame to one partition — fatal at 100 TB unless that frame is
  // bounded by construction (a per-bucket/per-day/per-type summary,
  // not the data). Swept over the full registry (round 14); every
  // entry names its bounded frame. The three growing-frame offenders
  // (orders_pareto, q27_window_funcs, table_ks) were de-globalized
  // onto the bucketed-prefix pattern that round — their remaining
  // global windows run over the per-bucket SUMMARY only:
  //  - corpus_heaps: the 10-row checkpoint axis (HeapsPoints).
  //  - embed_outliers / graph_pagerank: row_number over the
  //    post-limit top-k frame (OutlierK=50 / PrTopK rows).
  //  - events_survival: the day-grain KM frame — calendar-bounded.
  //  - mix_epochs / mix_sources / mix_temperature / stream_mix /
  //    mix_tokens_budget: per-source count frames — the source
  //    alphabet is fixed, a handful of rows at any corpus size.
  //  - orders_backlog / stream_backlog: day-grain open/close frame —
  //    calendar-bounded.
  //  - orders_pareto / q27_window_funcs / part_skyline /
  //    table_seq_gaps / table_ks / sample_weighted: the
  //    bucketed-prefix pattern's global stage — a prefix over the
  //    per-bucket summary (domain/width, n/4096, or 256 hash-prefix
  //    rows, metadata-sized at any SF).
  //  - table_benford: the 9-digit frame.
  //  - table_cramers_v / table_mutual_info: the joint cube of two
  //    pinned low-cardinality columns (≤2.1k cells).
  //  - table_psi: the 20-bin grid (PsiBins).
  private val boundedGlobalWindowOk: Set[String] =
    Set("corpus_heaps", "embed_outliers", "events_survival",
      "graph_pagerank", "mix_epochs", "mix_sources", "mix_temperature",
      "mix_tokens_budget", "orders_backlog", "orders_pareto",
      "part_skyline", "q27_window_funcs", "sample_weighted",
      "stream_backlog",
      "stream_mix", "table_benford", "table_cramers_v", "table_ks",
      "table_mutual_info", "table_psi", "table_seq_gaps")

  test("no global-order window runs over a frame that grows with the data") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def globalWindows(p: SparkPlan): Seq[String] = {
      val own = p match {
        case a: AdaptiveSparkPlanExec => globalWindows(a.executedPlan)
        case q: QueryStageExec => globalWindows(q.plan)
        // descend into cached lineages too: a global window hiding
        // inside a persisted frame is just as single-partition
        case m: InMemoryTableScanExec =>
          globalWindows(m.relation.cachedPlan)
        case w: WindowExec if w.partitionSpec.isEmpty =>
          Seq(w.windowExpression.map(_.sql).mkString(", ").take(80)) ++
            w.children.flatMap(globalWindows)
        case other => other.children.flatMap(globalWindows)
      }
      own ++ p.subqueries.flatMap(globalWindows)
    }
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) if !boundedGlobalWindowOk(name) =>
        val gw = globalWindows(q(spark, sfDir).queryExecution.executedPlan)
        gw.map(w => s"$name: $w")
      case _ => Seq.empty
    }
    assert(offenders.isEmpty,
      s"global-order windows found (bucket the key or allowlist with a " +
        s"bounded-frame reason):\n${offenders.mkString("\n")}")
  }

  test("de-globalized windows (r14) keep their global stage on the bucket summary") {
    // The allowlist above exempts whole queries, so this pins the
    // three r14 rewrites specifically: every empty-partition window
    // in their plans must aggregate a per-bucket summary column
    // (bsum / bn / b_<type>), never the data-sized frame's own
    // columns (rev_cents / c_<type>) — a revert to the one-window
    // global form fails here by name.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def globalWindowSql(p: SparkPlan): Seq[String] = {
      val own = p match {
        case a: AdaptiveSparkPlanExec => globalWindowSql(a.executedPlan)
        case q: QueryStageExec => globalWindowSql(q.plan)
        case m: InMemoryTableScanExec => globalWindowSql(m.relation.cachedPlan)
        case w: WindowExec if w.partitionSpec.isEmpty =>
          w.windowExpression.map(_.sql) ++ w.children.flatMap(globalWindowSql)
        case other => other.children.flatMap(globalWindowSql)
      }
      own ++ p.subqueries.flatMap(globalWindowSql)
    }
    for (name <- Seq("orders_pareto", "q27_window_funcs", "table_ks")) {
      val ws = globalWindowSql(
        graft.SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan)
      assert(ws.nonEmpty, s"$name lost its bucketed-prefix global stage")
      // windows computing over data-sized columns are the revert smell
      val badData = ws.filter(w =>
        w.contains("rev_cents") || w.contains("c_click") ||
          w.contains("ORDER BY value") || w.contains("cust_key"))
      assert(badData.isEmpty,
        s"$name: global window over a data-sized frame:\n${badData.mkString("\n")}")
    }
  }

  test("star-join dims are broadcast, not shuffled (q3, q5)") {
    for (name <- Seq("q3_join_agg", "q5_multijoin")) {
      val plan = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name should broadcast its dimension tables:\n$plan")
    }
  }
}
