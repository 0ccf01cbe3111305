package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => T}

/** SURVEY §2E query entries over the `documents` table. */
object TextQueries {

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  /** E1: token counting — whitespace tokens vs BPE-ish regex tokens. */
  def textTokens(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.select(
        col("doc_id"),
        T.wsTokenCount(col("text")).as("n_ws_tokens"),
        T.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        round(length(col("text")) / T.wsTokenCount(col("text")), 4)
          .as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  /** E2: quality scoring — length/stopword/punctuation signals. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val nTok = T.wsTokenCount(col("text"))
    val stopRatio = T.tokenCountIn(col("text"), T.EnStopwords) / nTok
    val punctRatio = T.punctCount(col("text")) / length(col("text"))
    d.select(
        col("doc_id"),
        nTok.as("n_tokens"),
        round(stopRatio, 4).as("stopword_ratio"),
        round(punctRatio, 4).as("punct_ratio"),
        round(T.qualityScore(nTok, stopRatio, punctRatio), 4)
          .as("quality"))
      .orderBy(col("doc_id"))
  }

  /** E3: language-ID heuristic — marker-word hit counts per candidate
    * language, argmax with a deterministic tiebreak (en>de>es>fr). */
  def textLangid(spark: SparkSession, dir: String): DataFrame =
    langidScanOf(Tables(spark, dir).documents).orderBy(col("doc_id"))

  /** The per-row language-ID projection over any (doc_id, text,
    * lang) frame — a pure scan → project (codegen'd marker-token
    * counts, no shuffle, no state), so it doubles as the STREAMING
    * classify-at-ingest transform (stream_langid): bit-identical
    * under any micro-batching or arrival order. */
  def langidScanOf(d: DataFrame): DataFrame = {
    val scores: Seq[(String, Column)] = T.LangMarkers.map {
      case (lang, words) => lang -> T.tokenCountIn(col("text"), words)
    }
    val Seq(en, de, es, fr) = scores.map(_._2)
    val pred = when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
    d.select(
        col("doc_id"),
        en.as("s_en"), de.as("s_de"), es.as("s_es"), fr.as("s_fr"),
        pred.as("pred_lang"),
        col("lang").as("true_lang"),
        (pred === col("lang")).as("is_match"))
  }

  /** E4: document fingerprint — rolling polynomial hash. */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.select(col("doc_id"), T.polyFingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** Top-k phrases per document for [[textRake]]. */
  val RakeTopK = 3

  /** E16: RAKE keyword extraction (Rose et al. 2010, "Automatic
    * Keyword Extraction from Individual Documents"): candidate
    * phrases are the maximal stopword-free token runs; word
    * statistics (freq = occurrences, deg = Σ length of containing
    * phrases) score each phrase. This implementation uses the
    * RATIO-OF-SUMS scoring variant — score = Σdeg / Σfreq over the
    * phrase's token occurrences — so the score is ONE division of
    * two exact integer sums (classic per-word Σ deg(w)/freq(w) sums
    * doubles in engine-dependent order and cannot hash-gate). Top-3
    * phrases per doc under a total (score, phrase, num) tiebreak;
    * duplicate phrases in one doc produce identical output rows, so
    * rank assignment among them cannot change the result set.
    *
    * Scale shape: the wordcount-style token explode feeds a per-doc
    * pos window (one doc_id exchange); the phrase/word statistics
    * are map-side-combined aggregates re-joined on (doc_id, …) keys
    * — all equi-joins that partition by doc at any corpus size. The
    * token-run frame is persisted across its three references
    * (Catalyst does not dedup repeated subtrees — the scan-count
    * rule); at 100 TB this materialization is the standard
    * intermediate, and eviction just recomputes lineage. Rank cut
    * plans a WindowGroupLimit. Full hash gate. */
  def textRake(spark: SparkSession, dir: String): DataFrame =
    rakeOf(Tables(spark, dir).documents)

  /** RAKE core over any (doc_id, text) frame — split out so the spec
    * can drive hand fixtures with known phrase scores. */
  def rakeOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = d.select(col("doc_id"),
        posexplode(split(col("text"), "\\s+")).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .withColumn("is_stop",
        when(col("w").isInCollection(T.EnStopwords), 1).otherwise(0))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ph = toks
      .withColumn("g", sum(col("is_stop")).over(wDoc))
      .filter(col("is_stop") === 0)
      .select(col("doc_id"), col("g"), col("pos"), col("w"))
      .persist()
    val plen = ph.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("plen"))
    val wstat = ph.join(plen, Seq("doc_id", "g"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
    val scored = ph.join(wstat, Seq("doc_id", "w"))
      .groupBy(col("doc_id"), col("g"))
      .agg(
        expr("concat_ws(' ', transform(array_sort(" +
          "collect_list(struct(pos, w))), p -> p.w))").as("phrase"),
        sum(col("deg")).as("num"), sum(col("freq")).as("den"))
    val wRank = Window.partitionBy(col("doc_id"))
      .orderBy((col("num") / col("den")).desc, col("phrase").asc,
        col("num").desc)
    scored
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= RakeTopK)
      .select(col("doc_id"), col("rk"), col("phrase"),
        round(col("num") / col("den"), 4).as("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Winnowing parameters: word-[[WinnowN]]-gram hashes, sliding
    * window of [[WinnowW]] — any shared run of W+N−1 = 6 tokens
    * between two documents shares a fingerprint (the winnowing
    * guarantee). Hash constants shared with [[TextFunctions.FpMod]]
    * so the oracle reproduces every hash. */
  val WinnowN = 3
  val WinnowW = 4

  /** E15: winnowing document fingerprints (Schleimer et al., SIGMOD
    * 2003 — the MOSS algorithm): select the minimum gram hash of
    * every sliding window; the distinct minima are the document's
    * fingerprint set — E4's single-value fingerprint generalized to
    * a set with a locality guarantee (plagiarism/boilerplate
    * detection picks ~1/W of the grams yet cannot miss a 6-token
    * overlap). Output pins the SET via order-free reductions (count,
    * xor-fold, min) instead of shipping it.
    *
    * One fused generated loop per row ([[WinnowStats]] — tokenize →
    * per-occurrence gram polyhash → sliding min → distinct stats);
    * zero shuffles, embarrassingly parallel at any corpus size.
    * Integer hash algebra mirrored by the oracle's list_reduce ⇒
    * full hash gate. */
  def textWinnow(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val st = WinnowStats(col("text"), WinnowN, WinnowW, 31L, T.FpMod)
    d.select(col("doc_id"), st.as("st"))
      .select(col("doc_id"),
        element_at(col("st"), 1).cast("int").as("n_grams"),
        element_at(col("st"), 2).cast("int").as("n_fp"),
        element_at(col("st"), 3).as("fp_xor"),
        element_at(col("st"), 4).as("fp_min"))
      .filter(col("n_grams") >= WinnowW)
      .orderBy(col("doc_id"))
  }

  /** E5: per-document top-3 keywords by TF-IDF over the whole corpus.
    *
    * Word-count-shaped and fully shuffle-parallel: explode tokens map
    * side, partial-agg `(doc_id, term)` counts, a `term`-keyed join for
    * document frequency, and a 1-row broadcast for the corpus size. The
    * top-3-per-doc window is rank-limited, so Spark plans a
    * WindowGroupLimit (each partition keeps ≤3 rows per doc before the
    * sort) rather than ranking every (doc, term) pair globally.
    *
    * The idf factor is the *rational* form `(N + 1) / (df + 1)` — no
    * `ln`. IEEE `+ * /` are correctly rounded and therefore
    * bit-identical across engines, while `ln`'s last ulp is
    * library-dependent; the rational form keeps the DuckDB oracle an
    * exact hash gate instead of a tolerance check. Monotone in the
    * classic idf, so top-k ranking is unchanged.
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir).documents
    // explode(split) + relational length-filter stays in codegen; a
    // filter() HOF here would drop the whole explode to interpreted.
    val toks = d.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val nTok = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(nTok, "doc_id")
      .join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        (col("tf") / col("n_tok")) * ((col("n_docs") + 1) / (col("df") + 1)))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
        round(col("tfidf"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** The fixed retrieval query for [[textBm25]] (single-sourced into
    * the oracle): three mid-df corpus terms, so scores discriminate. */
  val Bm25Terms: Seq[String] = Seq("spark", "join", "fast")
  /** Okapi constants (the universal defaults). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  /** Result size. */
  val Bm25TopK = 20

  /** E14: BM25 retrieval — the standard corpus-search scorer (Okapi
    * tf-saturation × idf, summed over query terms), the "find the
    * docs most about X" tool every corpus-curation/inspection loop
    * reaches for. Top-[[Bm25TopK]] docs for the fixed [[Bm25Terms]]
    * query with per-term tf, doc length and the composite score.
    *
    * The idf factor is the *rational* Robertson–Sparck Jones odds
    * `(N − df + 0.5) / (df + 0.5)` — the argument of BM25's usual
    * `ln`, without the `ln` ([[textTfidf]]'s exactness discipline:
    * IEEE `+ − * /` are correctly rounded and bit-identical across
    * engines, `ln`'s last ulp is library-dependent; monotone in the
    * canonical idf, so single-term ranking is unchanged and the
    * DuckDB oracle stays an exact hash gate). The per-term scores
    * sum in a FIXED left-fold expression tree (term order =
    * [[Bm25Terms]]) mirrored textually in the oracle, so the FP
    * addition order cannot drift.
    *
    * Shape (the 100 TB story): ONE corpus scan → token explode →
    * one map-side-combined groupBy(doc_id) carrying doc length and
    * the per-term tfs as conditional counts (|docs| rows out, never
    * a token-keyed shuffle), PERSISTED — the frame feeds both the
    * stats aggregate and the scorer, and Catalyst does not dedup the
    * subtrees → a 1-row corpus-stats aggregate (N, Σdl, per-term df)
    * broadcast back via crossJoin → per-row score algebra →
    * distributed top-k (TakeOrderedAndProject: each partition keeps
    * ≤ k rows; no global sort, no single-partition window).
    *
    * [[graft.streaming.Streams.streamBm25]] is the ingest-time twin:
    * the same tf/score algebra per arriving doc under an event-time
    * window, with the corpus stats as the static broadcast side. */
  /** Whitespace token stream for BM25, keeping `keep` alongside the
    * term (batch: doc_id; streaming: doc_id + event time). */
  private[graft] def bm25Toks(docs: DataFrame, keep: Seq[String]): DataFrame =
    docs.select(keep.map(col) :+
        explode(split(col("text"), "\\s+")).as("term"): _*)
      .filter(length(col("term")) > 0)

  /** The per-term tf aggregate columns (dl + one conditional count per
    * query term) — shared by the batch groupBy(doc_id) and the
    * streaming groupBy(window, doc_id). */
  private[graft] def bm25TfAggs: Seq[org.apache.spark.sql.Column] =
    count(lit(1)).as("dl") +: Bm25Terms.map(t =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$t"))

  /** Corpus stats (N, Σdl, per-term df) over a per-doc tf frame —
    * the static "index statistics" side. */
  private[graft] def bm25StatsOf(perDoc: DataFrame): DataFrame =
    perDoc.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("long").as("sum_dl") +:
        Bm25Terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))): _*)

  /** The composite score over columns (tf_<t>, df_<t>, dl, sum_dl,
    * n_docs) — a FIXED left-fold tree in [[Bm25Terms]] order; see
    * [[textBm25]] for the exactness contract. */
  private[graft] def bm25ScoreExpr: org.apache.spark.sql.Column = {
    def termScore(t: String) = {
      val tf = col(s"tf_$t"); val df = col(s"df_$t")
      val idf = (col("n_docs") - df + lit(0.5)) / (df + lit(0.5))
      val norm = tf + lit(Bm25K1) *
        (lit(1 - Bm25B) + lit(Bm25B) *
          (col("dl") / (col("sum_dl") / col("n_docs"))))
      idf * (tf * lit(Bm25K1 + 1)) / norm
    }
    Bm25Terms.map(termScore).reduce(_ + _)
  }

  /** Any-query-term row filter over the tf_<t> columns. */
  private[graft] def bm25AnyTerm: org.apache.spark.sql.Column =
    Bm25Terms.map(t => col(s"tf_$t")).reduce(_ + _) > 0

  def textBm25(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    // persisted: the frame feeds BOTH the stats aggregate and the
    // scorer, and Catalyst does not dedup the two subtrees — without
    // the cache the corpus is scanned twice (Curate.survivors
    // pattern: no unpersist in a query-returning function;
    // CacheManager dedups repeated calls by canonicalized plan).
    val perDoc = bm25Toks(d, Seq("doc_id"))
      .groupBy("doc_id").agg(bm25TfAggs.head, bm25TfAggs.tail: _*)
      .persist()
    perDoc.crossJoin(broadcast(bm25StatsOf(perDoc)))
      .filter(bm25AnyTerm)
      .withColumn("score", bm25ScoreExpr)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(Bm25TopK)
      .select(col("doc_id") +: Bm25Terms.map(t => col(s"tf_$t")) :+
        col("dl") :+ round(col("score"), 4).as("score"): _*)
      .orderBy(col("doc_id"))
  }

  /** Corpus-vocabulary size for [[textOov]] (single-sourced into the
    * oracle). The synthetic corpus draws from ~31 distinct tokens at
    * every SF, so K=16 makes the cut discriminate (K ≥ |vocab| would
    * mark every token in-vocabulary and gate nothing). */
  val OovVocabK = 16

  /** E7: out-of-vocabulary scoring — per-document fraction of tokens
    * outside the corpus' top-[[OovVocabK]] vocabulary (the "is this
    * document gibberish / the wrong domain for this corpus" signal a
    * curation pipeline thresholds on). Vocabulary cut is
    * deterministic: (count DESC, token ASC) is a total order, so the
    * boundary tie cannot flake the hash gate.
    *
    * Shape: one wordcount agg (map-side combined; output is |vocab|
    * rows, not |corpus|) → TakeOrderedAndProject for the top-K →
    * broadcast back onto the exploded token stream (K rows; never a
    * shuffle of the corpus by token) → one groupBy(doc_id) that
    * re-collapses to a row per document. The token explode itself is
    * shuffle-free. DELIBERATELY reads the corpus twice (vocab pass +
    * probe pass): persisting the exploded token stream to save one
    * column-pruned scan would materialize more bytes than the scan
    * reads at 100 TB — compute-stats-then-apply re-reads by design
    * (OovSpec locks the scan count at exactly 2). */
  def textOov(spark: SparkSession, dir: String): DataFrame =
    oovOf(Tables(spark, dir).documents, OovVocabK)

  /** Core OOV scoring over a (doc_id, text) frame with a caller-sized
    * vocabulary cut (specs plant fixtures with tiny vocabularies). */
  def oovOf(d: DataFrame, vocabK: Int): DataFrame = {
    // explode(split) + relational length-filter stays in codegen
    // (same pattern as textTfidf — a filter() HOF would drop the
    // whole explode to interpreted)
    val toks = d.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(vocabK)
      .select(col("tok"), lit(1).as("iv"))
    toks.join(broadcast(vocab), Seq("tok"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("iv").isNull, lit(1))).as("n_oov"))
      .select(col("doc_id"),
        col("n_tokens").cast("int").as("n_tokens"),
        col("n_oov").cast("int").as("n_oov"),
        round(col("n_oov") / col("n_tokens"), 4).as("oov_ratio"))
      .orderBy(col("doc_id"))
  }

  /** E8: token-typicality scoring — per-document mean corpus
    * frequency of its tokens, the "is this document drawn from this
    * corpus' distribution" OOD signal (rare-token-heavy docs score
    * low; [[textOov]]'s binary cut is its thresholded cousin). All
    * integer algebra until ONE double division — mean frequency =
    * Σ cnt(tok) / (n_tokens · N) with both operands exact longs, so
    * the IEEE quotient is correctly rounded and the DuckDB oracle
    * hash-gates it bit-exactly. min_cnt (the doc's rarest token) is
    * pure integer.
    *
    * Shape: one wordcount agg (map-side combined, |vocab| rows out),
    * its 1-row total via crossJoin(broadcast) [textTfidf's named
    * pattern], the vocab broadcast back over the token stream, one
    * groupBy(doc_id) re-collapse. Two deliberate corpus scans
    * (compute-stats-then-apply, the text_oov convention). The vocab
    * broadcast is right while |whitespace vocab| stays executor-sized
    * (~10⁶ tokens); a corpus beyond that flips the probe to a plain
    * shuffle join on tok — same algebra, one more exchange. */
  def textTypicality(spark: SparkSession, dir: String): DataFrame =
    typicalityOf(Tables(spark, dir).documents)

  /** Core typicality scoring over a (doc_id, text) frame (specs plant
    * skewed fixtures). */
  def typicalityOf(d: DataFrame): DataFrame = {
    val toks = d.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    // vocab is referenced TWICE (probe join + corpus total) and
    // Catalyst does not dedup repeated subtrees — unpersisted, the
    // full-corpus wordcount would run twice (CLAUDE.md). |vocab| rows
    // is KBs; CacheManager dedups by plan, no unpersist (Curate
    // .survivors pattern). TypicalitySpec locks the scan counts.
    val vocab = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTot = vocab.agg(sum(col("cnt")).as("n_total"))
    toks.join(broadcast(vocab), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("cnt")).as("sum_cnt"),
        min(col("cnt")).as("min_cnt"))
      .crossJoin(broadcast(nTot))
      .select(col("doc_id"),
        col("n_tokens").cast("int").as("n_tokens"),
        col("sum_cnt"), col("min_cnt"),
        round(col("sum_cnt") / (col("n_tokens") * col("n_total")), 6)
          .as("typicality"))
      .orderBy(col("doc_id"))
  }

  /** E9: corpus reporting card — per (source, lang) stratum: doc and
    * token volumes plus exact-rational density/share columns (the
    * numbers every corpus datasheet leads with, and what mix_sources /
    * sample_stratified decisions are made against). Integer sums with
    * single exact divisions only — no FP accumulation anywhere, so
    * the hash gate is trivial. One map-side-combined groupBy over
    * |sources|×|langs| keys + the 1-row corpus-total broadcast. */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val nTok = T.wsTokenCount(col("text"))
    val perDoc = d.select(col("source"), col("lang"),
      nTok.as("n_tok"), length(col("text")).as("n_chars"))
    val strata = perDoc.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
    val tot = perDoc.agg(count(lit(1)).as("total_docs"))
    strata.crossJoin(broadcast(tot))
      .select(col("source"), col("lang"),
        col("n_docs").cast("int").as("n_docs"),
        col("n_tokens"), col("n_chars"),
        round(col("n_tokens") / col("n_docs"), 4).as("tokens_per_doc"),
        round(col("n_docs") / col("total_docs"), 6).as("doc_share"))
      .orderBy(col("source"), col("lang"))
  }

  /** E23: CCNet-style per-language LM buckets (Wenzek et al.,
    * LREC'20) — rank each language's documents by the corpus
    * bigram-LM signal and cut into equal thirds: head (most typical
    * under the LM — CCNet's lowest-perplexity tier, the part kept
    * for training), middle, tail. The signal is [[bigramLmOf]]'s
    * cond_typicality — a ratio of two integer sums, monotone in the
    * doc's average conditional bigram probability, i.e. the no-`ln`
    * stand-in for LM perplexity (text_tfidf's exactness discipline) —
    * so ordering by it IS ordering by perplexity, without a
    * library-dependent log in the gate. Buckets are ntile(3) over
    * the TOTAL order (typicality desc, doc_id): pure integer rank
    * algebra, cross-engine identical (quality_deciles' proven ntile
    * parity), no quantile interpolation anywhere. Docs with no
    * bigram (< 2 tokens) carry no LM signal and drop, exactly as in
    * text_bigram_lm.
    *
    * Scale: the LM passes are text_bigram_lm's (word-count-shaped,
    * shuffle-parallel); the cut is ONE lang exchange + per-lang
    * sort — quality_deciles' exact-rank cost class, shards sorting
    * in parallel. The 100 TB dashboard route is histogram/KLL fences
    * (q23_approx_percentiles); this is the exact form the curation
    * decision runs. */
  def qualityLmBuckets(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir).documents
    val lm = bigramLmOf(d.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("cond_typicality"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cond_typicality").desc, col("doc_id"))
    lm.join(d.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("b", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("cond_typicality"),
        when(col("b") === 1, "head").when(col("b") === 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** quality_gopher_rules thresholds — a Gopher-style (Rae et al.
    * 2021, public) heuristic ruleset, re-ranged for this corpus's
    * observed distributions (single-line lowercase text, no
    * punctuation/digits, 10–99 tokens): the symbol/bullet/ellipsis
    * rules of the paper are degenerate here, so the repetition
    * family (distinct-token ratio, top-token share) stands in —
    * exactly the signals Gopher's repetition section uses. */
  val GopherTokMin = 30
  val GopherTokMax = 80
  val GopherWlenMin = 4.0
  val GopherWlenMax = 5.0
  val GopherDivMin = 0.45
  val GopherRepMax = 0.10
  val GopherStopMin = 2

  /** E24: Gopher-style document quality ruleset — per-doc boolean
    * rule flags plus the conjunction `pass`, the classic pre-training
    * quality gate (length band, mean-word-length band, lexical
    * diversity floor, top-token-share cap, stopword-kind floor).
    *
    * Shape: word-count-shaped and fully shuffle-parallel — ONE token
    * explode → map-side-combined groupBy(doc_id, w), then the per-doc
    * rollup rides a second partial-agg exchange on doc_id; every rule
    * input (Σc, #distinct, max c, Σlen·c, stopword kinds) comes out
    * of that single pass, so no row-level interpreted HOF and no
    * second scan of documents. Exactness: all aggregates are
    * integers; each ratio is ONE bigint/bigint division mirrored
    * op-for-op in the oracle, and every flag compares the unrounded
    * double — bit-identical cross-engine ⇒ full hash gate. */
  def qualityGopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesOf(Tables(spark, dir).documents)

  /** Core ruleset over any (doc_id, text) frame. */
  def gopherRulesOf(d: DataFrame): DataFrame = {
    val tf = d.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val per = tf.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_tok"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("top_c"),
      sum(length(col("w")) * col("c")).as("n_chars_tok"),
      sum(when(col("w").isInCollection(T.EnStopwords), 1).otherwise(0))
        .as("n_stop_kinds"))
    val meanW = col("n_chars_tok") / col("n_tok")
    val divR = col("n_distinct") / col("n_tok")
    val topR = col("top_c") / col("n_tok")
    val rLen = col("n_tok") >= GopherTokMin && col("n_tok") <= GopherTokMax
    val rWlen = meanW >= GopherWlenMin && meanW <= GopherWlenMax
    val rDiv = divR >= GopherDivMin
    val rRep = topR <= GopherRepMax
    val rStop = col("n_stop_kinds") >= GopherStopMin
    per.select(
        col("doc_id"),
        col("n_tok").cast("int").as("n_tok"),
        col("n_distinct").cast("int").as("n_distinct"),
        round(meanW, 4).as("mean_word_len"),
        round(divR, 4).as("distinct_ratio"),
        round(topR, 4).as("top_token_ratio"),
        col("n_stop_kinds").cast("int").as("n_stop_kinds"),
        rLen.as("r_len"), rWlen.as("r_wlen"), rDiv.as("r_div"),
        rRep.as("r_rep"), rStop.as("r_stop"),
        (rLen && rWlen && rDiv && rRep && rStop).as("pass"))
      .orderBy(col("doc_id"))
  }

  /** E25: Flesch-style readability scoring — the classic
    * reading-ease formula over whitespace words, terminator-run
    * sentences ([[graft.functions.TextFunctions.sentenceCount]] —
    * the seam text_sentences exposes) and vowel-run "syllables" (the
    * standard no-dictionary syllable estimate: maximal [aeiou]+
    * runs). A corpus difficulty signal a curation mix reads next to
    * quality/LM typicality.
    *
    * Shape: zero-shuffle scan+project — all three counts are codegen'd
    * regexp_count passes. Exactness: the formula is three double
    * literal multiplies and two subtractions mirrored op-for-op; the
    * oracle forces `::double` on every literal (DuckDB otherwise
    * computes the literal terms in DECIMAL and diverges — measured
    * 279/500 bit-mismatches without the casts), and the band
    * thresholds compare the identical unrounded double ⇒ full hash
    * gate. */
  def textReadability(spark: SparkSession, dir: String): DataFrame =
    readabilityOf(Tables(spark, dir).documents)

  /** Core readability projection over any (doc_id, text) frame. */
  def readabilityOf(d: DataFrame): DataFrame =
    readabilityScanOf(d).orderBy(col("doc_id"))

  /** The per-row readability projection — a pure scan → project
    * (codegen'd regexp counts, no shuffle, no state), so it doubles
    * as the STREAMING classify-at-ingest transform
    * (stream_readability): bit-identical under any micro-batching or
    * arrival order (the langidScanOf pattern). */
  def readabilityScanOf(d: DataFrame): DataFrame = {
    val nTok = T.wsTokenCount(col("text"))
    val nSent = T.sentenceCount(col("text"))
    val nSyl = regexp_count(col("text"), lit("[aeiou]+"))
    // words-per-sentence = n_tok / n_sent (r14 mis-modeled the whole
    // doc as ONE sentence — on 10³-token real corpora the −1.015·n_tok
    // term drove every doc to "hard"; ReadabilitySpec pins a
    // 2000-token multi-sentence fixture landing outside it). int/int
    // division and the literal multiplies are correctly rounded IEEE
    // doubles, mirrored op-for-op in the ::double-forced oracle.
    val flesch = lit(206.835) - lit(1.015) * (nTok / nSent) -
      lit(84.6) * (nSyl / nTok)
    d.filter(nTok > 0)
      .select(col("doc_id"),
        nTok.as("n_tok"),
        nSent.as("n_sent"),
        nSyl.as("n_syllable_runs"),
        round(nSyl / nTok, 4).as("syl_per_word"),
        round(flesch, 4).as("flesch"),
        when(flesch >= 60.0, "easy").when(flesch >= 30.0, "medium")
          .otherwise("hard").as("band"))
  }

  /** The same five rule inputs computed PER ROW — no explode, no
    * groupBy, no state: ONE generated loop
    * ([[graft.functions.GopherStats]]) produces every input —
    * token count, distinct-STRING count, top multiplicity, token
    * chars, stopword kinds — where the column-expression form paid
    * eight text passes. Identical integer inputs ⇒ identical
    * flags/ratios to [[gopherRulesOf]] (GopherRulesSpec proves
    * column-for-column equality on the corpus). This is the form
    * the STREAMING gate runs: a stateless scan → project that is
    * bit-identical under any micro-batching. */
  def gopherRulesRowOf(d: DataFrame): DataFrame = {
    val st = graft.functions.GopherStats(col("text"))
    val withStats = d.select(col("doc_id"), st.as("st"))
      .select(col("doc_id"),
        element_at(col("st"), 1).as("n_tok"),
        element_at(col("st"), 2).as("n_distinct"),
        element_at(col("st"), 3).as("top_c"),
        element_at(col("st"), 4).as("n_chars_tok"),
        element_at(col("st"), 5).as("n_stop_kinds"))
      .filter(col("n_tok") > 0)
    val meanW = col("n_chars_tok") / col("n_tok")
    val divR = col("n_distinct") / col("n_tok")
    val topR = col("top_c") / col("n_tok")
    val rLen = col("n_tok") >= GopherTokMin && col("n_tok") <= GopherTokMax
    val rWlen = meanW >= GopherWlenMin && meanW <= GopherWlenMax
    val rDiv = divR >= GopherDivMin
    val rRep = topR <= GopherRepMax
    val rStop = col("n_stop_kinds") >= GopherStopMin
    withStats.select(
      col("doc_id"),
      col("n_tok").cast("int").as("n_tok"),
      col("n_distinct").cast("int").as("n_distinct"),
      round(meanW, 4).as("mean_word_len"),
      round(divR, 4).as("distinct_ratio"),
      round(topR, 4).as("top_token_ratio"),
      col("n_stop_kinds").cast("int").as("n_stop_kinds"),
      rLen.as("r_len"), rWlen.as("r_wlen"), rDiv.as("r_div"),
      rRep.as("r_rep"), rStop.as("r_stop"),
      (rLen && rWlen && rDiv && rRep && rStop).as("pass"))
  }

  /** E2 adjunct: decile bucketing of the quality score per language —
    * the "rank the corpus into quality tiers" step a curation recipe
    * reads before choosing its floor (curate's MinQuality is exactly
    * such a tier boundary). ntile over the TOTAL order
    * (quality, doc_id) is deterministic cross-engine, and min/max of
    * the raw (unrounded) score are bit-exact because the score's
    * rational expression tree is single-sourced with the oracle
    * (the same raw-value contract curate's quality floor already
    * certifies).
    *
    * Scale note: exact deciles need one sort per lang shard — the
    * honest cost of exact ranks (and lang shards sort in parallel).
    * The sketch route for 100 TB dashboards is q23_approx_percentiles
    * (KLL); this entry is the exact form a one-off curation decision
    * runs. */
  def qualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir).documents
    val nTok = T.wsTokenCount(col("text"))
    val stopRatio = T.tokenCountIn(col("text"), T.EnStopwords) / nTok
    val punctRatio = T.punctCount(col("text")) / length(col("text"))
    val scored = d.select(col("doc_id"), col("lang"),
      T.qualityScore(nTok, stopRatio, punctRatio).as("quality"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality"), col("doc_id"))
    scored.withColumn("decile", ntile(10).over(w))
      .groupBy(col("lang"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("quality")), 4).as("q_min"),
        round(max(col("quality")), 4).as("q_max"))
      .orderBy(col("lang"), col("decile"))
  }

  /** Top-k cut for [[corpusNgrams]] (single-sourced into the oracle).
    * Small enough that the per-lang result is a screenful; the rank
    * cut is what makes the plan a WindowGroupLimit, not a global
    * sort of the whole n-gram table. */
  val TopNgramsK = 5

  /** E10: corpus-level top-k bigrams per language — the "what
    * boilerplate dominates this crawl" report (and the n-gram blocklist
    * feed for C4-style filtering). Word-count-shaped and fully
    * shuffle-parallel at any scale: one generated loop per row
    * ([[WordNgrams]] — no interpreted HOF) explodes per-occurrence
    * bigrams map-side, the (lang, bigram) groupBy partial-aggregates
    * before its single exchange, and the rank-limited window plans a
    * WindowGroupLimit (each partition keeps ≤ k rows per lang before
    * the final sort — the full bigram table is never globally
    * sorted; NgramsSpec locks the node). Counts are integers and the
    * tiebreak (n desc, bigram asc) is total ⇒ exact hash gate. */
  def corpusNgrams(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir).documents
    val grams = d.select(col("lang"),
      explode(WordNgrams(col("text"), 2)).as("bigram"))
    val counts = grams.groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("bigram").asc)
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopNgramsK)
      .select(col("lang"), col("rk"), col("bigram"), col("n"))
      .orderBy(col("lang"), col("rk"))
  }

  /** E6: repetition scoring (Gopher/C4-style quality signal) —
    * duplicate-word and duplicate-bigram fractions per document.
    * Token and bigram multisets come from [[ShingleHashes]] (one
    * generated loop per row, no interpreted HOF), so the whole query
    * is a zero-shuffle scan+project; distinct-hash counts equal
    * distinct-string counts absent a 64-bit collision (none in this
    * corpus; the DuckDB oracle counts the strings themselves). */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    // Token COUNT via the shared codegen'd helper (single source of
    // the whitespace-token definition) — size(tokenHashes(..)) would
    // hash every token into an array just to take its length, twice
    // (filter + project, no CSE across operators).
    val nWords = T.wsTokenCount(col("text"))
    val nDistinct = size(ShingleHashes(col("text"), 1))
    val nDistinctBigrams = size(ShingleHashes(col("text"), 2))
    d.filter(nWords >= 2)
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        nDistinct.as("n_distinct_words"),
        round(lit(1.0) - nDistinct / nWords, 4).as("word_dup_ratio"),
        round(lit(1.0) - nDistinctBigrams / (nWords - lit(1)), 4)
          .as("bigram_dup_ratio"))
      .orderBy(col("doc_id"))
  }

  /** E13: cross-document duplicated-shingle fraction — the
    * corpus-level boilerplate signal next to E6's within-doc
    * repetition (the Gopher/RefinedWeb "fraction of n-grams also seen
    * elsewhere" read): per doc, how many of its distinct 3-word
    * shingles occur in at least one OTHER document. High dup_frac =
    * template/boilerplate text; the ranking input to a
    * remove-duplicated-passages curation stage.
    *
    * Shape: [[ShingleHashes]] (one generated loop per row) explodes
    * the per-doc-distinct shingle set map-side; document frequency is
    * a count window over the shingle key — ONE hash exchange on `s`
    * (a groupBy-then-join-back would pay the same exchange twice AND
    * re-scan documents, the Catalyst-no-subtree-dedup trap) — then
    * one doc_id groupBy of integer conditional sums. Since the set is
    * per-doc distinct, df = #docs containing the shingle, so the
    * boilerplate test is `df >= 2`. Hot shingles skew the window
    * partition at corpus scale; the df≤cap cut dedup's inverted index
    * applies (Dedup.NgramDfMax) is the mitigation there — this
    * profiler deliberately keeps the exact tail. Counts are distinct
    * HASH counts (== string counts absent a 64-bit collision; the
    * oracle counts strings); the single division is the only double
    * ⇒ full hash gate. */
  def textBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir).documents
    val sh = d.select(col("doc_id"),
      explode(ShingleHashes(col("text"), 3)).as("s"))
    sh.withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_shingles"), 4)
          .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** E12: bigram-LM conditional typicality — the sequel to E8
    * text_typicality's unigram signal: how predictable is each
    * document's WORD ORDER under the corpus bigram statistics? A doc
    * of common words in a never-seen order (shuffled/spun text) scores
    * low here while scoring high on the unigram signal. Per doc:
    * Σ corpus-count(bigram) over its bigram occurrences divided by
    * Σ corpus-count(prefix unigram) — the ratio of two INTEGER sums
    * (order-free, exact), one correctly-rounded double division at
    * the end ⇒ full hash gate, the same no-log trick as text_tfidf's
    * rational idf (Σ log P would be fold-order-dependent FP).
    * n_unique_bigrams (corpus count = 1) is the "only this doc ever
    * said this" novelty counter.
    *
    * Shape: [[WordNgrams]] explodes per-occurrence bigrams map-side
    * (one generated loop per row, no interpreted HOF); corpus bigram
    * and prefix-unigram count tables are wordcount aggs
    * (map-side-combined); occurrences re-join them on the
    * bigram/word key — ordinary shuffle equi-joins that partition by
    * key at any corpus size (the count tables are NOT broadcast by
    * contract: at 100 TB the bigram table is itself huge) — then one
    * doc_id groupBy of integer sums. */
  def textBigramLm(spark: SparkSession, dir: String): DataFrame =
    bigramLmOf(Tables(spark, dir).documents)

  /** Core bigram-LM algebra over any (doc_id, text) frame — split out
    * so the spec can drive exact hand fixtures. Three deliberate
    * corpus passes (occurrences / bigram counts / unigram counts —
    * the compute-stats-then-apply convention of text_oov). */
  def bigramLmOf(d: DataFrame): DataFrame = {
    val occ = d.select(col("doc_id"),
        explode(WordNgrams(col("text"), 2)).as("bigram"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    val big = occ.groupBy(col("bigram")).agg(count(lit(1)).as("cnt2"))
    val uni = d.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt1"))
    occ.join(big, "bigram")
      .join(uni, col("w1") === col("w"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_bigrams"),
        sum(col("cnt2")).as("sum_bigram_cnt"),
        sum(col("cnt1")).as("sum_prefix_cnt"),
        sum(when(col("cnt2") === 1, 1).otherwise(0)).cast("int")
          .as("n_unique_bigrams"))
      .withColumn("cond_typicality",
        round(col("sum_bigram_cnt") / col("sum_prefix_cnt"), 6))
      .orderBy(col("doc_id"))
  }

  /** PII patterns for [[textPii]] — written in the RE2 ∩ java.util.regex
    * common dialect (no backreferences, no lookaround) so one literal
    * drives both Spark and the DuckDB oracle. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val IpRe = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** The deterministic PII augmentation for [[textPii]]: the synthetic
    * corpus carries no natural PII, so each doc's text is extended with
    * email/phone/IPv4 tokens derived from `doc_id` by pure integer
    * algebra (the mm_resize synthesized-corpus pattern — both engines
    * build the identical string, so detection AND redaction stay a
    * full hash gate). The three mod gates leave ~1/3 of docs with no
    * email, ~3/5 with no phone, ~6/7 with no IP — the no-op redaction
    * path is exercised, not just the rewrite path. */
  def piiAugmented(id: Column, text: Column): Column = {
    val s = (c: Column) => c.cast("string")
    val domain = when(id % 4 === 0, "example.com")
      .when(id % 4 === 1, "mail.example.org")
      .when(id % 4 === 2, "corp-site.net")
      .otherwise("test.io")
    val email = when(id % 3 =!= 0,
      concat(lit(" Contact user"), s(id), lit("."), s(id % 97),
        lit("@"), domain)).otherwise("")
    val phone = when(id % 5 < 2,
      concat(lit(" call +1-555-"), lpad(s((id * 7) % 10000), 4, "0")))
      .otherwise("")
    val ip = when(id % 7 === 0,
      concat(lit(" from "), s((id * 13) % 256), lit("."),
        s((id * 17) % 256), lit("."), s((id * 23) % 256), lit("."),
        s((id * 29) % 256))).otherwise("")
    concat(text, email, phone, ip)
  }

  /** E11: PII detection + redaction (C4/Dolma-style scrub step) —
    * count email/phone/IPv4 matches per document and rewrite each to a
    * typed placeholder. Counts are taken on the pre-redaction text;
    * redaction applies the three rewrites in a fixed order
    * (email→phone→IP, identical in the oracle). Every function here
    * (`regexp_count`/`regexp_replace`/`md5`) is a codegen'd builtin:
    * the whole operator is a zero-shuffle per-row scan — at 100 TB it
    * is map-only work that partitions perfectly, with the one orderBy
    * existing purely for the deterministic oracle dump. */
  def textPii(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    piiScanOf(d.select(col("doc_id"),
        piiAugmented(col("doc_id"), col("text")).as("pii_text")))
      .orderBy(col("doc_id"))
  }

  /** The redaction expression of [[textPii]], exposed so the spec can
    * assert zero residual matches on the rewritten text itself. */
  def piiRedacted(text: Column): Column = regexp_replace(
    regexp_replace(
      regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>")),
    lit(IpRe), lit("<IP>"))

  /** Detection + redaction core of [[textPii]] over any
    * (doc_id, pii_text) frame — separated so the spec drives hand
    * fixtures with real PII strings, not just the synthetic corpus. */
  def piiScanOf(aug: DataFrame): DataFrame = {
    val redacted = piiRedacted(col("pii_text"))
    val nEmails = regexp_count(col("pii_text"), lit(EmailRe))
    val nPhones = regexp_count(col("pii_text"), lit(PhoneRe))
    val nIps = regexp_count(col("pii_text"), lit(IpRe))
    aug.select(
      col("doc_id"),
      nEmails.cast("int").as("n_emails"),
      nPhones.cast("int").as("n_phones"),
      nIps.cast("int").as("n_ips"),
      (nEmails + nPhones + nIps > 0).as("has_pii"),
      md5(redacted).as("redacted_md5"),
      length(redacted).cast("int").as("redacted_len"))
  }

  /** Chunking geometry for [[textChunk]] (single-sourced into the
    * oracle): 64-token windows every 48 tokens (16-token overlap). */
  val ChunkWin = 64
  val ChunkStride = 48

  /** E: RAG/training chunking — split each document's whitespace
    * tokens into overlapping [[ChunkWin]]-token windows on a
    * [[ChunkStride]] grid, emitting per chunk its span and content
    * digest (the md5 stands in for the chunk payload so the gate
    * hashes content without shipping text twice).
    *
    * Purely per-row: tokenize once, explode the start grid
    * (`sequence` is ≤ n/stride elements), slice + digest — no
    * shuffle at all before the output sort; chunking 100 TB is
    * embarrassingly parallel and this plan keeps it that way. The
    * token-array materialization is one interpreted HOF filter pass
    * per document (same trade [[TextFunctions.tokens]] documents);
    * the slice/concat/md5 chain stays codegen'd. */
  /** E: character-level Shannon entropy per document — the cheap
    * gibberish/compression-ratio proxy (mojibake and base64 blobs
    * score high, boilerplate scores low) every corpus QC pass runs.
    *
    * Exactness: per-(doc, char) counts are integers; the entropy fold
    * runs over the count list SORTED BY CHARACTER, so the double
    * accumulation order is pinned cross-engine (a groupBy-sum of
    * p·log p terms would merge in partition order and break the
    * gate). The explode/split/count pipeline is all codegen'd —
    * only the final ≤ alphabet-size fold per doc is interpreted.
    * Scale: map-side combine collapses the char explosion to
    * ~alphabet rows per doc before the one exchange. */
  def textEntropy(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val counts = d
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= "")
      .groupBy(col("doc_id"), col("c"))
      .agg(count(lit(1)).as("n"))
    counts
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("c"), col("n")))).as("cn"),
        sum(col("n")).as("tot"))
      .select(col("doc_id"),
        col("tot").cast("int").as("n_chars"),
        size(col("cn")).as("n_distinct"),
        round(-aggregate(
          transform(col("cn"),
            s => (s.getField("n") / col("tot")) *
              log2(s.getField("n") / col("tot"))),
          lit(0.0), (acc, x) => acc + x), 4).as("entropy"))
      .orderBy(col("doc_id"))
  }

  def textChunk(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n_tok"))
      .filter(col("n_tok") > 0)
      .select(col("doc_id"), col("toks"), col("n_tok"),
        posexplode(sequence(lit(0), col("n_tok") - 1, lit(ChunkStride)))
          .as(Seq("chunk_id", "start_tok")))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        least(lit(ChunkWin), col("n_tok") - col("start_tok"))
          .as("chunk_tokens"),
        md5(concat_ws(" ",
          slice(col("toks"), col("start_tok") + 1, lit(ChunkWin))))
          .as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** E35 (round 15): sentence segmentation — the primitive
    * readability and the quality ensemble consume as a count
    * ([[graft.functions.TextFunctions.sentenceCount]]), exposed as
    * its own query so chunkers and scorers share one seam: per kept
    * sentence its 0-based position, token count and md5 digest (the
    * text_chunk convention — rows stay small and hash-gatable at any
    * document length).
    *
    * Shape: zero-shuffle scan → posexplode → project. Exactness: the
    * segmentation regex, space-trim and empty-drop are mirrored
    * op-for-op in the oracle (list_transform/list_filter +
    * unnest/generate_subscripts); every output is integer/string. */
  def textSentences(spark: SparkSession, dir: String): DataFrame =
    sentencesScanOf(Tables(spark, dir).documents)
      .orderBy(col("doc_id"), col("sent_id"))

  /** The per-row segmentation projection — a pure scan → posexplode
    * (no shuffle, no state), so it doubles as the STREAMING
    * split-at-ingest transform (stream_sentences): bit-identical
    * under any micro-batching or arrival order (the
    * readabilityScanOf pattern). */
  def sentencesScanOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        posexplode(T.sentences(col("text"))).as(Seq("sent_id", "sent")))
      .select(col("doc_id"), col("sent_id"),
        T.wsTokenCount(col("sent")).as("n_tok"),
        md5(col("sent")).as("sent_md5"))

  /** E: vocabulary profile per source — token count, vocabulary size,
    * hapax legomena (tokens seen exactly once), type-token ratio and
    * hapax share. The lexical-richness datasheet a corpus audit reads
    * to spot template spam (low TTR) or OCR noise (high hapax share)
    * per ingest source.
    *
    * Exactness: all counts are integers; the two ratios divide the
    * same integers in both engines. Shape: ONE token explode →
    * map-side-combined groupBy(source, term) — the only big exchange
    * is on the (source, term) key, the per-source rollup and the
    * tiny docs-per-source agg ride on |vocab|- and |docs|-sized
    * frames. No windows, no collects. */
  def textHapax(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val tf = d.select(col("source"),
        explode(split(col("text"), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docs = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    tf.groupBy(col("source"))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("hapax"))
      .join(docs, Seq("source"))
      .select(col("source"),
        col("n_docs").cast("int").as("n_docs"),
        col("n_tokens"), col("vocab"), col("hapax"),
        round(col("vocab") / col("n_tokens"), 4).as("ttr"),
        round(col("hapax") / col("vocab"), 4).as("hapax_ratio"))
      .orderBy(col("source"))
  }

  /** Minimum bigram count for [[textCollocations]] (single-sourced
    * into the oracle): rarer pairs have unstable lift. */
  val CollocMinCount = 5
  /** Collocations reported per corpus. */
  val CollocTopK = 30

  /** E: collocation mining — bigrams that co-occur more than token
    * frequencies predict, ranked by pointwise-lift
    * `p(xy) / (p(x)·p(y))` (the argument of PMI's log — monotone in
    * PMI, kept rational so the rank and the hash gate are exact; the
    * same no-`ln` discipline as [[textBm25]]'s idf). The standard
    * phrase-discovery pass (word2vec-style phrase joining, stopword
    * discovery) over a training corpus.
    *
    * Shape: the unigram and bigram counts are two map-side-combined
    * explodes of one corpus scan ([[WordNgrams]] generates both token
    * streams); the lift join brokers bigram rows to their two
    * unigram counts via two equi-joins on the token key — at corpus
    * scale both sides are |vocab|-bounded aggregates, tiny next to
    * the scan. Top-k via TakeOrderedAndProject (no global sort). */
  def textCollocations(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val uni = d.select(explode(WordNgrams(col("text"), 1)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val bi = d.select(explode(WordNgrams(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= CollocMinCount)
      .withColumn("x", split(col("bigram"), " ").getItem(0))
      .withColumn("y", split(col("bigram"), " ").getItem(1))
    val totals = uni.agg(sum(col("c")).as("n_uni"))
      .crossJoin(d.select(explode(WordNgrams(col("text"), 2)).as("b"))
        .agg(count(lit(1)).as("n_bi")))
    val lift = bi
      .join(uni.select(col("term"), col("c").as("c_x")), col("x") === col("term"))
      .drop("term")
      .join(uni.select(col("term"), col("c").as("c_y")), col("y") === col("term"))
      .drop("term")
      .crossJoin(broadcast(totals))
      .withColumn("lift",
        (col("c_xy").cast("double") * col("n_uni") * col("n_uni")) /
          (col("n_bi").cast("double") * col("c_x") * col("c_y")))
    lift
      .orderBy(col("lift").desc, col("bigram"))
      .limit(CollocTopK)
      .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        round(col("lift"), 4).as("lift"))
      .orderBy(col("bigram"))
  }

  /** Vocabulary head size for [[corpusZipf]]'s fit — the classic
    * Zipf regime; a FIXED cut, so the fit frame is 100 rows at any
    * corpus scale (the head ranks are the stable part of the law;
    * the tail is where Zipf breaks anyway). */
  val ZipfTopK = 100

  /** E27: Zipf's-law fit of the corpus rank-frequency curve — OLS of
    * log2(count) on log2(rank) over the top-100 tokens: slope (≈ −1
    * for natural language; |slope| far off flags synthetic/spun
    * text), intercept, and r² (how law-like the corpus is). The
    * corpus-level cousin of text_entropy's per-doc signal, read
    * beside corpus_stats when qualifying a new source.
    *
    * Shape: one token explode → map-side-combined groupBy(w) → a
    * top-100 TakeOrderedAndProject (no global sort materialization)
    * → ONE 100-element row. Exactness: the five OLS sums are STRICT
    * SEQUENTIAL folds in rank order (aggregate HOF ↔ seedless
    * list_reduce, 0.0+x₁ bit-equal to x₁ — the text_entropy
    * pattern); log2 on both engines with round(4) erasing last-ulp
    * libm noise; the fit algebra mirrors op-for-op ⇒ full hash
    * gate. Interpreted-HOF cost is 100 elements on ONE row — not a
    * hot loop. */
  def corpusZipf(spark: SparkSession, dir: String): DataFrame =
    zipfOf(Tables(spark, dir).documents)

  /** Core Zipf fit over any (text) frame. */
  def zipfOf(d: DataFrame): DataFrame = {
    val top = d.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(ZipfTopK)
    // (−c, w) sort key: ascending sort_array == (count desc, token asc)
    val one = top.agg(sort_array(collect_list(
      struct((-col("c")).as("negc"), col("w")))).as("arr"))
      .withColumn("k", size(col("arr")))
    val xs = transform(sequence(lit(1), col("k")), i => log2(i))
    val ys = transform(col("arr"), s => log2(-s.getField("negc")))
    def fsum(a: org.apache.spark.sql.Column) =
      aggregate(a, lit(0.0), (acc, x) => acc + x)
    val kd = col("k").cast("double")
    val withSums = one.select(col("k"), col("arr"),
      fsum(xs).as("sx"), fsum(ys).as("sy"),
      fsum(transform(xs, x => x * x)).as("sxx"),
      fsum(zip_with(xs, ys, (x, y) => x * y)).as("sxy"),
      fsum(transform(ys, y => y * y)).as("syy"))
    val den = kd * col("sxx") - col("sx") * col("sx")
    val deny = kd * col("syy") - col("sy") * col("sy")
    val num = kd * col("sxy") - col("sx") * col("sy")
    val slope = num / den
    // heapsOf's degenerate-variance guard (ADVICE r12): a single
    // distinct token gives k=1 ⇒ den=0 and a 0/0 slope/r2 — Spark
    // yields NaN where DuckDB's double 0/0 differs, breaking the
    // compare instead of agreeing on NULL. Epsilon, not == 0, for
    // the same last-ulp libm-log2 cancellation reason as heapsOf;
    // `+ 0.0` normalizes a rounded −0.0 (both mirrored in the
    // oracle).
    val eps = 1e-9
    withSums.select(
      col("k").as("n_ranks"),
      element_at(col("arr"), 1).getField("w").as("top_token"),
      (-element_at(col("arr"), 1).getField("negc")).as("top_count"),
      when(abs(den) > eps, round(slope, 4) + lit(0.0)).as("zipf_slope"),
      when(abs(den) > eps,
        round((col("sy") - slope * col("sx")) / kd, 4) + lit(0.0))
        .as("intercept"),
      when(abs(den) > eps && abs(deny) > eps,
        round(num * num / (den * deny), 4) + lit(0.0)).as("r2"))
  }

  /** E30 (round 13): pairwise Jensen–Shannon divergence between the
    * SOURCES' token distributions — the domain-shift read behind
    * mixture design: two sources with near-zero JSD are
    * interchangeable in a mix (reweighting between them buys no
    * diversity), a high-JSD source is the one worth upsampling;
    * the same number monitors drift when a source is re-crawled.
    * JSD(P,Q) = H(M) − (H(P)+H(Q))/2, M = (P+Q)/2, log2 ⇒ ∈ [0,1].
    *
    * Scale shape: ONE scan → one (source, token) map-side-combined
    * groupBy (the count frame, persisted — it feeds every pair);
    * per-source totals/entropy sums are a k-row aggregate (sources
    * are the bounded mix_* dial set — the k-row driver collect is
    * quantizer-training class, never data-plane); each pair is a
    * full-outer equi-join of two vocab-sized slices of the cached
    * count frame + a 1-row aggregate. Pair count k(k−1)/2 with k
    * bounded ⇒ corpus-linear total work.
    *
    * Exactness class: H(P)/H(Q) use the count form (integer sums,
    * one division); the H(M) sum is per-token FP over the pair's
    * vocab union and RE-ASSOCIATES per engine — the table_entropy
    * TOLERANCE class, not bit-exactness (round(4) does real work;
    * include in sf0.1/sf1 re-certification of rounding-sensitive
    * changes). Every per-term expression is mirrored op-for-op. */
  def corpusJsd(spark: SparkSession, dir: String): DataFrame =
    jsdOf(Tables(spark, dir).documents)

  /** Core JSD over any (source, text) frame. */
  def jsdOf(d: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val cnt = d
      .select(col("source"), explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = cnt.groupBy(col("source"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("v"),
        sum(col("c") * log2(col("c"))).as("slc"))
    val srcs = tot.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(_._1)
    // Pair metadata rides a tiny broadcast frame — NOT one query
    // branch per pair: k sources give k(k−1)/2 pairs, and a
    // per-pair join would make the PLAN quadratic in k (190 joins
    // at k=20). Instead each pair is doubled into per-SIDE rows, the
    // count frame equi-joins on its source (every word row fans out
    // to its source's k−1 pairs — data k·|cnt|, bounded), and one
    // (pair, word) groupBy pivots the two sides into c1/c2: the
    // whole query is TWO shuffles at any k.
    val s = cnt.sparkSession
    import s.implicits._
    if (srcs.length < 2)
      return s.range(0).select(
        lit("").as("source_a"), lit("").as("source_b"),
        lit(0L).as("n_tokens_a"), lit(0L).as("n_tokens_b"),
        lit(0L).as("vocab_a"), lit(0L).as("vocab_b"),
        lit(0L).as("v_shared"),
        lit(0.0).as("h_a"), lit(0.0).as("h_b"), lit(0.0).as("jsd"))
    val pairMeta = (for {
      i <- srcs.indices; j <- i + 1 until srcs.length
    } yield {
      val (s1, n1, v1, slc1) = srcs(i)
      val (s2, n2, v2, slc2) = srcs(j)
      Seq((s1, s1, n1, v1, slc1, s2, n2, v2, slc2),
        (s2, s1, n1, v1, slc1, s2, n2, v2, slc2))
    }).flatten
      .toDF("src", "sa", "na", "va", "slca", "sb", "nb", "vb", "slcb")
    val uw = cnt.join(broadcast(pairMeta), col("source") === col("src"))
      .groupBy(col("sa"), col("sb"), col("na"), col("nb"), col("va"),
        col("vb"), col("slca"), col("slcb"), col("w"))
      .agg(sum(when(col("source") === col("sa"), col("c"))).as("c1"),
        sum(when(col("source") === col("sb"), col("c"))).as("c2"))
    // m > 0 on every (pair, word) row (the word occurs in at least
    // one side), so m·log2(m) never sees 0
    val m = (coalesce(col("c1"), lit(0L)).cast("double") / col("na") +
      coalesce(col("c2"), lit(0L)).cast("double") / col("nb")) / lit(2.0)
    val hA = log2(col("na")) - col("slca") / col("na")
    val hB = log2(col("nb")) - col("slcb") / col("nb")
    uw.groupBy(col("sa"), col("sb"), col("na"), col("nb"), col("va"),
        col("vb"), col("slca"), col("slcb"))
      .agg((-sum(m * log2(m))).as("h_m"),
        sum(when(col("c1").isNotNull && col("c2").isNotNull, lit(1L))
          .otherwise(lit(0L))).as("v_shared"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("na").as("n_tokens_a"), col("nb").as("n_tokens_b"),
        col("va").as("vocab_a"), col("vb").as("vocab_b"),
        col("v_shared"),
        round(hA, 4).as("h_a"), round(hB, 4).as("h_b"),
        round(col("h_m") - (hA + hB) / lit(2.0), 4).as("jsd"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Checkpoint count for [[corpusHeaps]] — the vocab-growth curve is
    * sampled at 10 doc-id deciles. */
  val HeapsPoints = 10

  /** E28: Heaps'-law fit of vocabulary growth — OLS of log2(vocab)
    * on log2(tokens) across 10 corpus-prefix checkpoints: β ≈ 0.4–0.6
    * for natural language, β → 0 for fixed-vocabulary synthetic/spun
    * text (vocab saturates — exactly what this corpus's token soup
    * shows), the companion diagnostic to corpus_zipf's slope.
    *
    * Shape: the growth curve needs NO per-prefix rescan — V(d) =
    * #tokens whose FIRST doc (min doc_id per token, one groupBy) ≤ d
    * and N(d) = Σ per-doc counts ≤ d, so each checkpoint is a prefix
    * sum over a 10-row bucket aggregate (docs bucket by
    * doc_id·10/(max+1); two map-side-combined groupBys total). The
    * OLS sums are strict sequential folds in checkpoint order over
    * ONE 10-element row (zipf pattern); degenerate fits (zero
    * x-variance) emit NULL, guarded identically in the oracle ⇒
    * full hash gate. */
  def corpusHeaps(spark: SparkSession, dir: String): DataFrame =
    heapsOf(spark, Tables(spark, dir).documents)

  /** Core Heaps fit over any (doc_id, text) frame. */
  def heapsOf(spark: SparkSession, d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nP = HeapsPoints
    val tok = d.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val mx = d.agg(max(col("doc_id")).as("mx"))
    def bucket(idCol: org.apache.spark.sql.Column) =
      least(lit(nP.toLong), floor(idCol * nP / (col("mx") + 1)) + 1)
    val perBucketToks = tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(mx))
      .groupBy(bucket(col("doc_id")).as("k"))
      .agg(sum(col("n")).as("toks"))
    val perBucketVocab = tok.groupBy(col("w"))
      .agg(min(col("doc_id")).as("fd"))
      .crossJoin(broadcast(mx))
      .groupBy(bucket(col("fd")).as("k"))
      .agg(count(lit(1)).as("newv"))
    val axis = spark.range(1, nP + 1).select(col("id").as("k"))
    val wCum = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cps = axis
      .join(perBucketToks, Seq("k"), "left")
      .join(perBucketVocab, Seq("k"), "left")
      .select(col("k"),
        sum(coalesce(col("toks"), lit(0L))).over(wCum).as("nn"),
        sum(coalesce(col("newv"), lit(0L))).over(wCum).as("vv"))
      .filter(col("nn") >= 1)
    val one = cps.agg(sort_array(collect_list(
        struct(col("k"), col("nn"), col("vv")))).as("arr"))
      .withColumn("m", size(col("arr")))
    val xs = transform(col("arr"), s => log2(s.getField("nn")))
    val ys = transform(col("arr"), s => log2(s.getField("vv")))
    def fsum(a: org.apache.spark.sql.Column) =
      aggregate(a, lit(0.0), (acc, x) => acc + x)
    val md = col("m").cast("double")
    val withSums = one.select(col("m"), col("arr"),
      fsum(xs).as("sx"), fsum(ys).as("sy"),
      fsum(transform(xs, x => x * x)).as("sxx"),
      fsum(zip_with(xs, ys, (x, y) => x * y)).as("sxy"),
      fsum(transform(ys, y => y * y)).as("syy"))
    val den = md * col("sxx") - col("sx") * col("sx")
    val deny = md * col("syy") - col("sy") * col("sy")
    val num = md * col("sxy") - col("sx") * col("sy")
    val slope = num / den
    // Degenerate-variance guards use an EPSILON, not == 0: the two
    // engines' libm log2 differ in the last ulp, and the m·s − s·s
    // cancellation amplifies that into ±tiny (sign-flipping) values
    // exactly when the true variance is zero (constant vocab). The
    // `+ 0.0` normalizes a rounded −0.0 to +0.0 (IEEE) — both
    // mirrored in the oracle.
    val eps = 1e-9
    withSums.select(
      col("m").as("n_points"),
      element_at(col("arr"), col("m")).getField("nn").as("total_tokens"),
      element_at(col("arr"), col("m")).getField("vv").as("vocab"),
      when(abs(den) > eps, round(slope, 4) + lit(0.0)).as("heaps_beta"),
      when(abs(den) > eps,
        round((col("sy") - slope * col("sx")) / md, 4) + lit(0.0))
        .as("heaps_log2k"),
      when(abs(den) > eps && abs(deny) > eps,
        round(num * num / (den * deny), 4) + lit(0.0)).as("r2"))
  }

  /** Coverage checkpoints for [[corpusCoverage]] — small fixed ks
    * sized to this corpus's saturating synthetic vocabulary (a
    * natural corpus would read (100, 1k, 10k); the CURVE is the
    * deliverable either way). Single-sourced into the oracle. */
  val CoverageKs: Seq[Int] = Seq(1, 5, 25, 100)

  /** E31 (round 13): vocabulary coverage curve — for each k in
    * [[CoverageKs]], what fraction of ALL corpus tokens the top-k
    * most frequent types cover. THE tokenizer/vocab-budget read
    * (how big must a vocabulary be before OOV mass is negligible)
    * and the third corpus-law diagnostic beside corpus_zipf (head
    * shape) and corpus_heaps (growth): coverage saturating by tiny k
    * is the same synthetic-vocab signature heaps' β→0 shows.
    *
    * Shape: one token explode → map-side-combined groupBy(w) (the
    * vocab frame, persisted — it feeds the totals aggregate AND the
    * head cut; Catalyst no-subtree-dedup), top-max(k) via
    * orderBy+limit (TakeOrderedAndProject — distributed partial
    * top-k, never a global sort), then ALL k rows from ONE
    * explode-of-ks projection over the single collected head row.
    * Covered counts are integer prefix sums over the (count desc,
    * token asc)-sorted head array (slice truncates identically to
    * DuckDB's list slicing); coverage is one bigint/bigint division
    * ⇒ full hash gate. */
  def corpusCoverage(spark: SparkSession, dir: String): DataFrame =
    coverageOf(Tables(spark, dir).documents)

  /** Core coverage curve over any (text) frame. */
  def coverageOf(d: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val counts = d.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val top = counts.orderBy(col("c").desc, col("w")).limit(CoverageKs.max)
    // (−c, w) sort key: ascending sort_array == (count desc, token asc)
    val head = top.agg(sort_array(collect_list(
      struct((-col("c")).as("negc"), col("w")))).as("arr"))
    val tot = counts.agg(sum(col("c")).as("total_tokens"),
      count(lit(1)).as("n_vocab"))
    val ks = array(CoverageKs.map(k => lit(k)): _*)
    head.crossJoin(tot)
      .select(explode(ks).as("k"), col("arr"),
        col("total_tokens"), col("n_vocab"))
      .select(col("k"),
        least(col("k"), size(col("arr"))).as("n_types_used"),
        aggregate(slice(col("arr"), lit(1), col("k")), lit(0L),
          (acc, s) => acc - s.getField("negc")).as("covered_tokens"),
        col("total_tokens"), col("n_vocab"))
      .select(col("k"), col("n_types_used"), col("covered_tokens"),
        col("total_tokens"), col("n_vocab"),
        round(col("covered_tokens").cast("double") /
          col("total_tokens").cast("double"), 4).as("coverage"))
      .orderBy(col("k"))
  }

  /** E26: per-rule ablation of the Gopher quality gate — for each of
    * the five rules, how many docs it kills (n_fail) and how many it
    * ALONE kills (n_unique_fail: the rule's marginal yield — drop it
    * and exactly these docs come back). The report a curation owner
    * reads before tuning any threshold: a rule with large n_fail but
    * near-zero n_unique_fail is redundant with the others; a rule
    * owning most unique kills is the gate.
    *
    * Shape: the per-row rule form ([[gopherRulesRowOf]] — one
    * generated loop, zero shuffles) → ONE global aggregate (12
    * integer sums ride one 1-row exchange) → the 5 output rows
    * EXPLODE from one array of structs in ONE projection (the
    * table_fds lesson: K references to a 1-row frame recompute
    * upstream K times). All counts integers; the two shares are one
    * bigint/bigint division each, mirrored ⇒ full hash gate. */
  def qualityRuleAblation(spark: SparkSession, dir: String): DataFrame =
    ruleAblationOf(Tables(spark, dir).documents)

  /** Core ablation over any (doc_id, text) frame. */
  def ruleAblationOf(d: DataFrame): DataFrame = {
    val rules = Seq("r_div", "r_len", "r_rep", "r_stop", "r_wlen")
    val flags = gopherRulesRowOf(d).select(
      rules.map(r => (!col(r)).cast("long").as(s"f_$r")) :+
        col("pass").cast("long").as("p"): _*)
    val nFailTotal = rules.map(r => col(s"f_$r")).reduce(_ + _)
    val aggCols =
      Seq(count(lit(1)).as("n_docs"), sum(col("p")).as("n_pass")) ++
        rules.map(r => sum(col(s"f_$r")).as(s"k_$r")) ++
        rules.map(r => sum(when(col(s"f_$r") === 1L &&
          nFailTotal === 1L, 1L).otherwise(0L)).as(s"u_$r"))
    val agg = flags.agg(aggCols.head, aggCols.tail: _*)
    agg.select(
        explode(array(rules.map(r => struct(
          lit(r).as("rule"), col(s"k_$r").as("n_fail"),
          col(s"u_$r").as("n_unique_fail"))): _*)).as("x"),
        col("n_docs"), col("n_pass"))
      .select(col("x.rule").as("rule"), col("x.n_fail").as("n_fail"),
        col("x.n_unique_fail").as("n_unique_fail"),
        round(col("x.n_fail") / col("n_docs"), 6).as("fail_share"),
        round(col("x.n_unique_fail") / col("n_docs"), 6)
          .as("unique_fail_share"),
        col("n_docs"), col("n_pass"))
      .orderBy(col("rule"))
  }

  /** Ensemble weights for [[qualityEnsemble]] — fixed doubles,
    * single-sourced into the oracle (::double-forced there, the
    * text_readability literal discipline). */
  val EnsWQuality = 0.35
  val EnsWGopher = 0.30
  val EnsWTypicality = 0.25
  val EnsWFlesch = 0.10
  /** Flesch normalization window: fln = clamp((flesch+100)/250, 0, 1)
    * — covers the formula's realistic range on this corpus. */
  val EnsFleschShift = 100.0
  val EnsFleschSpan = 250.0
  /** Keep threshold, compared against the UNROUNDED ensemble. */
  val EnsKeepMin = 0.55

  /** E33 (round 14): doc-level quality ENSEMBLE — the one score per
    * document users actually filter on, combining the four signals
    * the registry already certifies separately: the E2 composite
    * quality score, the E24 Gopher rule pass count, the E12 bigram-LM
    * conditional typicality (the no-ln perplexity stand-in), and the
    * E25 Flesch readability (normalized). ensemble =
    * [[EnsWQuality]]·q + [[EnsWGopher]]·(pass/5) +
    * [[EnsWTypicality]]·typ + [[EnsWFlesch]]·fln, keep ⇔ ensemble ≥
    * [[EnsKeepMin]] — a linear opinion pool over per-signal scores,
    * the standard ensemble shape of production quality filters.
    *
    * Exactness: every component is exact algebra the registry already
    * gates — q and flesch are mirrored double-literal expressions
    * (::double-forced in the oracle), pass count is integer, typ is
    * the ROUNDED (bit-exact) E12 ratio, and the ensemble is one
    * left-associated mirrored expression of them — correctly-rounded
    * IEEE ops on identical bits, no transcendental anywhere, so both
    * the rounded score AND the unrounded keep comparison hash-gate.
    *
    * Scale shape: three of four signals are per-row codegen loops
    * (ONE GopherStats pass + two regexp counts — zero shuffle); the
    * LM signal reuses [[bigramLmOf]]'s word-count-shaped passes, left
    * join on doc_id (docs with no bigram carry typ = 0, mirrored). */
  def qualityEnsemble(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val lm = bigramLmOf(d.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("cond_typicality"))
    val st = graft.functions.GopherStats(col("text"))
    val nTok = T.wsTokenCount(col("text"))
    val stopRatio = T.tokenCountIn(col("text"), T.EnStopwords) / nTok
    val punctRatio = T.punctCount(col("text")) / length(col("text"))
    val nSyl = regexp_count(col("text"), lit("[aeiou]+"))
    val base = d.select(col("doc_id"), st.as("st"), nTok.as("n_tok"),
        stopRatio.as("stop_ratio"), punctRatio.as("punct_ratio"),
        nSyl.as("n_syl"), T.sentenceCount(col("text")).as("n_sent"))
      .filter(col("n_tok") > 0)
    val meanW = element_at(col("st"), 4) / element_at(col("st"), 1)
    val divR = element_at(col("st"), 2) / element_at(col("st"), 1)
    val topR = element_at(col("st"), 3) / element_at(col("st"), 1)
    val nPass =
      ((element_at(col("st"), 1) >= GopherTokMin &&
        element_at(col("st"), 1) <= GopherTokMax).cast("long") +
       (meanW >= GopherWlenMin && meanW <= GopherWlenMax).cast("long") +
       (divR >= GopherDivMin).cast("long") +
       (topR <= GopherRepMax).cast("long") +
       (element_at(col("st"), 5) >= GopherStopMin).cast("long"))
    val flesch = lit(206.835) -
      lit(1.015) * (col("n_tok") / col("n_sent")) -
      lit(84.6) * (col("n_syl") / col("n_tok"))
    val scored = base.select(col("doc_id"),
        T.qualityScore(col("n_tok"), col("stop_ratio"),
          col("punct_ratio")).as("q"),
        nPass.as("npass"),
        greatest(lit(0.0), least(lit(1.0),
          (flesch + lit(EnsFleschShift)) / lit(EnsFleschSpan))).as("fln"))
      .join(lm, Seq("doc_id"), "left")
      .withColumn("typ", coalesce(col("cond_typicality"), lit(0.0)))
    val ens = lit(EnsWQuality) * col("q") +
      lit(EnsWGopher) * (col("npass") / lit(5.0)) +
      lit(EnsWTypicality) * col("typ") +
      lit(EnsWFlesch) * col("fln")
    scored.select(col("doc_id"),
        round(col("q"), 4).as("quality"),
        col("npass").cast("int").as("n_rules_passed"),
        col("typ").as("cond_typicality"),
        round(col("fln"), 4).as("flesch_norm"),
        round(ens, 6).as("ensemble"),
        (ens >= lit(EnsKeepMin)).as("keep"))
      .orderBy(col("doc_id"))
  }
}
