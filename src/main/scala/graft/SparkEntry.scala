package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.TextQueries
import graft.mr.MrQueries
import graft.multimodal.Multimodal
import graft.operators.{AsOfJoin, Dedup, Relational, Sessionize, Similarity}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  type Q = (SparkSession, String) => DataFrame

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = Map[String, Q](
    "q1_agg"             -> Relational.q1Agg,
    "q2_topk_window"     -> Relational.q2TopkWindow,
    "q3_join_agg"        -> Relational.q3JoinAgg,
    "q4_semi_join"       -> Relational.q4SemiJoin,
    "q5_multijoin"       -> Relational.q5MultiJoin,
    "q6_filter_agg"      -> Relational.q6FilterAgg,
    "q7_anti_join"       -> Relational.q7AntiJoin,
    "q8_outer_join"      -> Relational.q8OuterJoin,
    "q9_rollup"          -> Relational.q9Rollup,
    "q10_having"         -> Relational.q10Having,
    "q11_case_agg"       -> Relational.q11CaseAgg,
    "q12_distinct"       -> Relational.q12Distinct,
    "q13_union"          -> Relational.q13Union,
    "q14_scalar_subquery"-> Relational.q14ScalarSubquery,
    "q15_in_subquery"    -> Relational.q15InSubquery,
    "q16_window_running" -> Relational.q16WindowRunning,
    "q17_sort_limit"     -> Relational.q17SortLimit,
    "q18_string_funcs"   -> Relational.q18StringFuncs,
    "q19_date_funcs"     -> Relational.q19DateFuncs,
    "q20_json"           -> Relational.q20Json,
    "q21_grouping_sets"  -> Relational.q21GroupingSets,
    "q22_pivot"          -> Relational.q22Pivot,
    "q23_percentiles"    -> Relational.q23Percentiles,
    // sketch-based scale paths of q12/q23 — rows-only gate, error
    // bounds asserted in ApproxSpec (sketches aren't cross-engine
    // reproducible, so no SQL oracle by design)
    "q23_approx_percentiles" -> Relational.q23ApproxPercentiles,
    "q12_approx_distinct"    -> Relational.q12ApproxDistinct,
    "q24_set_ops"        -> Relational.q24SetOps,
    "q25_range_window"   -> Relational.q25RangeWindow,
    "q26_cube"           -> Relational.q26Cube,
    "table_profile"      -> (graft.operators.Profile.tableProfile(_, _)),
    "table_profile_typed" -> (graft.operators.Profile.tableProfileTyped(_, _)),
    "table_skew"          -> (graft.operators.Profile.tableSkew(_, _)),
    "snapshot_diff"       -> (graft.operators.Profile.snapshotDiff(_, _)),
    "table_histogram"     -> (graft.operators.Profile.tableHistogram(_, _)),
    "table_fk_check"      -> (graft.operators.Profile.tableFkCheck(_, _)),
    "table_fds"           -> (graft.operators.Profile.tableFds(_, _)),
    "table_corr"          -> (graft.operators.Profile.tableCorr(_, _)),
    "zorder_key"          -> (graft.sources.ZOrder.zorderKey(_, _)),
    "topk_per_key"        -> (graft.plans.TopK.topkPerKey(_, _)),
    "asof_join"          -> (AsOfJoin.purchasesAsOfSignup(_, _)),
    "asof_join_forward"  -> (AsOfJoin.viewsAsOfNextPurchase(_, _)),
    "range_join"         -> (graft.operators.RangeJoin.eventsInWindows(_, _)),
    "events_sessionize"  -> (Sessionize.sessions(_, _)),
    "events_sessions_stats" -> (Sessionize.sessionsStats(_, _)),
    "events_funnel"      -> (graft.operators.Funnel.eventsFunnel(_, _)),
    "events_retention"   -> (graft.operators.Funnel.eventsRetention(_, _)),
    "events_anomaly"     -> (graft.operators.Funnel.eventsAnomaly(_, _)),
    "events_attribution" -> (graft.operators.Funnel.eventsAttribution(_, _)),
    "events_cooccurrence" -> (graft.operators.Funnel.eventsCooccurrence(_, _)),
    "events_engagement"   -> (graft.operators.Funnel.eventsEngagement(_, _)),
    "events_rfm"          -> (graft.operators.Funnel.eventsRfm(_, _)),
    "events_pathing"     -> (graft.operators.Funnel.eventsPathing(_, _)),
    "events_sequences"   -> (graft.operators.Funnel.eventsSequences(_, _)),
    "events_lifecycle"   -> (graft.operators.Lifecycle.eventsLifecycle(_, _)),
    "events_heatmap"     -> (graft.operators.Lifecycle.eventsHeatmap(_, _)),
    "events_dwell"       -> (graft.operators.Lifecycle.eventsDwell(_, _)),
    "events_ewma"        -> (graft.operators.Lifecycle.eventsEwma(_, _)),
    "interval_coverage"  -> (graft.operators.Lifecycle.intervalCoverage(_, _)),
    "orders_cohort"      -> (graft.operators.Lifecycle.ordersCohort(_, _)),
    "orders_pareto"      -> (graft.operators.Lifecycle.ordersPareto(_, _)),
    "orders_above_avg"   -> (graft.operators.Lifecycle.ordersAboveAvg(_, _)),
    "orders_streaks"     -> (graft.operators.Lifecycle.ordersStreaks(_, _)),
    "events_twap"        -> (graft.operators.Lifecycle.eventsTwap(_, _)),
    "events_rolling_uniques" -> (graft.operators.Lifecycle.eventsRollingUniques(_, _)),
    "events_abtest"      -> (graft.operators.Lifecycle.eventsAbtest(_, _)),
    "orders_basket"      -> (graft.operators.Lifecycle.ordersBasket(_, _)),
    "events_resample"    -> (graft.operators.Lifecycle.eventsResample(_, _)),
    "events_changepoint" -> (graft.operators.Lifecycle.eventsChangepoint(_, _)),
    "orders_backlog"     -> (graft.operators.Lifecycle.ordersBacklog(_, _)),
    "events_seasonality" -> (graft.operators.Lifecycle.eventsSeasonality(_, _)),
    "orders_sla"         -> (graft.operators.Lifecycle.ordersSla(_, _)),
    // §2A — MapReduce engine pipelines
    "mr_wordcount"       -> MrQueries.mrWordcount,
    "mr_sum"             -> MrQueries.mrSum,
    "mr_multiply"        -> MrQueries.mrMultiply,
    "mr_noop"            -> MrQueries.mrNoop,
    "mr_chain"           -> MrQueries.mrChain,
    // §2E — text analysis
    "text_tokens"        -> TextQueries.textTokens,
    "text_quality"       -> TextQueries.textQuality,
    "text_langid"        -> TextQueries.textLangid,
    "text_fingerprint"   -> TextQueries.textFingerprint,
    "text_winnow"        -> TextQueries.textWinnow,
    "text_rake"          -> TextQueries.textRake,
    "text_tfidf"         -> TextQueries.textTfidf,
    "text_bm25"          -> TextQueries.textBm25,
    "text_repetition"    -> TextQueries.textRepetition,
    "text_boilerplate"   -> TextQueries.textBoilerplate,
    "text_oov"           -> TextQueries.textOov,
    "text_typicality"    -> TextQueries.textTypicality,
    "text_pii"           -> TextQueries.textPii,
    "text_bigram_lm"     -> TextQueries.textBigramLm,
    "text_chunk"         -> TextQueries.textChunk,
    "text_entropy"       -> TextQueries.textEntropy,
    "corpus_stats"       -> TextQueries.corpusStats,
    "text_hapax"         -> TextQueries.textHapax,
    "text_collocations"  -> TextQueries.textCollocations,
    "corpus_ngrams"      -> TextQueries.corpusNgrams,
    "quality_deciles"    -> TextQueries.qualityDeciles,
    "ngram_blocklist"    -> (graft.operators.HeavyHitters.ngramBlocklist(_, _)),
    // §2C — deduplication
    "dedup_exact"         -> Dedup.dedupExact,
    "dedup_best_rep"      -> Dedup.dedupBestRep,
    "dedup_substring"     -> Dedup.dedupSubstring,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccard,
    "dedup_minhash_lsh"   -> Dedup.dedupMinhashLsh,
    "dedup_simhash"       -> Dedup.dedupSimhash,
    "dedup_embed_cosine"  -> Dedup.dedupEmbedCosine,
    "dedup_semantic"      -> Dedup.dedupSemantic,
    "dedup_components"    -> Dedup.dedupComponents,
    "graph_pagerank"      -> (graft.operators.Graph.graphPagerank(_, _)),
    "graph_triangles"     -> (graft.operators.Graph.graphTriangles(_, _)),
    "dedup_incremental"   -> (graft.operators.Incremental.dedupIncremental(_, _)),
    "sample_stratified"   -> (graft.operators.Sampling.sampleStratified(_, _)),
    "sample_importance"   -> (graft.operators.Sampling.sampleImportance(_, _)),
    "sample_exact_k"      -> (graft.operators.Sampling.sampleExactK(_, _)),
    "mix_balanced_batches" -> (graft.operators.Sampling.mixBalancedBatches(_, _)),
    "pack_sequences"      -> (graft.operators.Sampling.packSequences(_, _)),
    "mix_sources"         -> (graft.operators.Sampling.mixSources(_, _)),
    "mix_epochs"          -> (graft.operators.Sampling.mixEpochs(_, _)),
    "mix_temperature"     -> (graft.operators.Sampling.mixTemperature(_, _)),
    "corpus_shuffle"      -> (graft.operators.Sampling.corpusShuffle(_, _)),
    "mix_curriculum"      -> (graft.operators.Sampling.mixCurriculum(_, _)),
    "decontaminate"       -> (graft.operators.Decontaminate.decontaminate(_, _)),
    // §2I — composed curation pipeline
    "curate_corpus"       -> (graft.operators.Curate.curateCorpus(_, _)),
    "curate_train"        -> (graft.operators.Curate.curateTrain(_, _)),
    "curate_report"       -> (graft.operators.Curate.curateReport(_, _)),
    "curate_pack"         -> (graft.operators.Curate.curatePack(_, _)),
    // §2D — similarity search
    "ann_bruteforce"      -> Similarity.annBruteforce,
    "embed_stats"         -> Similarity.embedStats,
    "embed_quantize"      -> Similarity.embedQuantize,
    "ann_lsh"             -> Similarity.annLsh,
    "ann_ivf"             -> ((s, d) => Similarity.annIvf(s, d)),
    "ann_pq"              -> ((s, d) => Similarity.annPq(s, d)),
    "ann_rerank"          -> (Similarity.annRerank(_, _)),
    "embed_cluster"       -> (graft.operators.Cluster.embedCluster(_, _)),
    "embed_pca"           -> (graft.operators.Cluster.embedPca(_, _)),
    "embed_outliers"      -> Similarity.embedOutliers _,
    "embed_knn_graph"     -> (Similarity.embedKnnGraph(_, _)),
    // §2F — multimodal binary plumbing
    "mm_meta"             -> Multimodal.mmMeta,
    "mm_decode"           -> Multimodal.mmDecode,
    "mm_wavstats"        -> (Multimodal.mmWavStats(_, _)),
    "mm_silence"         -> (Multimodal.mmSilence(_, _)),
    "mm_framesample"      -> Multimodal.mmFramesample,
    "mm_phash"            -> (Multimodal.mmPhash(_, _)),
    "mm_resize"           -> ((s, d) => Multimodal.mmResizeQuery(s, d)),
    // §2G — streaming (batch-equivalent entries; stream path in specs)
    "stream_window_agg"   -> Streams.streamWindowAgg,
    "stream_sessionize"   -> Streams.streamSessionize,
    "stream_dedup"        -> Streams.streamDedup,
    "stream_neardup"      -> Streams.streamNeardup,
    "stream_funnel"       -> Streams.streamFunnel,
    "stream_retention"    -> Streams.streamRetention,
    "stream_attribution"  -> Streams.streamAttribution,
    "stream_anomaly"      -> Streams.streamAnomaly,
    "stream_enrich"       -> Streams.streamEnrich,
    "stream_sample"       -> Streams.streamSample,
    "stream_pack"         -> Streams.streamPack,
    "stream_mix"          -> Streams.streamMix,
    "stream_join"         -> Streams.streamJoin,
    "stream_pii"          -> Streams.streamPii,
    "stream_bm25"         -> Streams.streamBm25,
    "stream_decontaminate" -> Streams.streamDecontaminate,
    "stream_curate"       -> Streams.streamCurate,
    "stream_rfm"          -> Streams.streamRfm,
    "stream_coverage"     -> Streams.streamCoverage,
    "stream_hitters"      -> Streams.streamHitters,
    "stream_ewma"         -> Streams.streamEwma,
    "stream_twap"         -> Streams.streamTwap,
    "stream_abtest"       -> Streams.streamAbtest,
    "stream_topk"         -> Streams.streamTopk,
    "stream_seasonality"  -> Streams.streamSeasonality
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Oracles.relational ++ Oracles.mr ++ Oracles.text ++ Oracles.dedup ++
      Oracles.similarity ++ Oracles.multimodal ++ Oracles.streaming ++
      Oracles.curate
}
