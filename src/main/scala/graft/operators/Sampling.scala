package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2C/E adjunct — deterministic stratified sampling for corpus
  * rebalancing (the "sample sources/languages at different rates" step
  * of a training-data pipeline).
  *
  * Design for 100 TB: the sample is RATE-based, not exact-k. Each row's
  * fate is a pure function of its own key — keep iff the first 4 hex
  * chars of md5(seed || doc_id) sort below the stratum's threshold —
  * so the query is a single scan + filter with NO shuffle, no window,
  * no per-stratum sort, and it composes with predicate pushdown. An
  * exact-k variant needs a per-stratum sort (or a two-pass quantile of
  * the hash); at billions of rows per stratum the rate form is the
  * right primitive, and k's deviation is O(√n) binomial noise.
  *
  * Determinism/oracle: md5 of the UTF-8 bytes is identical in Spark and
  * DuckDB, and fixed-width lowercase-hex string comparison is numeric
  * comparison — so the selected set is bit-reproducible cross-engine
  * (full hash gate), re-runnable, and stable under repartitioning.
  * Changing [[Seed]] draws an independent sample.
  */
object Sampling {

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  // Added with mix_curriculum — the first Sampling query to round a
  // double — and promptly caught by the sf0.1 gate (5 half-boundary
  // rows), exactly as the CLAUDE.md convention predicts.
  private def round(c: Column, scale: Int): Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  /** Salt so resampling is a config change, not a code change. */
  val Seed = "graft-sample-42:"

  /** Per-language keep-rate as a 4-hex-digit threshold t: P(keep) =
    * parseInt(t,16) / 65536. Upsample rare languages, downsample en —
    * the canonical rebalance. */
  val LangThresholds: Seq[(String, String, Double)] = Seq(
    // (lang, hex threshold, nominal rate)
    ("en", "1999", 0.1000), // 0x1999 = 6553  / 65536
    ("de", "8000", 0.5000),
    ("es", "8000", 0.5000),
    ("fr", "e666", 0.9000)) // 0xe666 = 58982 / 65536

  /** u ∈ [0,1) proxy: first 16 bits of md5(seed || key), as hex text.
    * Comparing this 4-char lowercase-hex string with `<` IS the
    * numeric compare — no hex→int parse needed (DuckDB lacks a
    * portable one), no doubles anywhere. */
  def hashBucket(key: Column): Column = hashBucket(key, Seed)

  /** Same bucket, caller-chosen salt: [[mixSources]] draws with its
    * own seed so its sample is independent of [[sampleStratified]]'s
    * (the same salt would keep/drop the same doc_ids in both). */
  def hashBucket(key: Column, seed: String): Column =
    substring(md5(concat(lit(seed), key.cast("string")).cast("binary")), 1, 4)

  /** The per-row threshold for the current `lang` column value. */
  def langThresholdCol: Column =
    LangThresholds.foldLeft(lit("0000")) { case (acc, (lang, thr, _)) =>
      when(col("lang") === lang, lit(thr)).otherwise(acc)
    }

  /** The keep-predicate on any frame with (doc_id, lang) — pure
    * per-row, composable into other pipelines (see Curate). */
  def keepFilter: Column = hashBucket(col("doc_id")) < langThresholdCol

  /** Query entry: the sampled documents with their bucket + threshold
    * (audit columns), deterministic order. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.select(col("doc_id"), col("lang"),
        hashBucket(col("doc_id")).as("bucket"),
        langThresholdCol.as("thr"))
      .filter(col("bucket") < col("thr"))
      .orderBy(col("doc_id"))
  }

  /** Salt for [[sampleExactK]] — independent draw from [[Seed]]. */
  val ExactKSeed = "graft-exactk-7:"

  /** Per-stratum sample size for [[sampleExactK]]. Below every
    * stratum's population at every SF (the smallest sf0.01 language
    * holds ~50 docs), so the cut always discriminates. */
  val ExactK = 40

  /** J9: exact-k deterministic stratified sample — when the contract
    * is "exactly k docs per language" (eval slices, human-review
    * batches, few-shot pools), not a keep-rate. Each doc draws the
    * FULL 32-hex md5 of (salt ‖ doc_id) and a per-stratum
    * row_number over the (draw, doc_id) total order keeps rank ≤ k:
    * a salt-determined uniform-without-replacement choice,
    * re-runnable and independent of [[sampleStratified]]'s draw.
    *
    * Scale shape: ONE lang exchange for the per-stratum window, and
    * Catalyst plans the rank-≤-k filter as WindowGroupLimit — every
    * map task pre-cuts to its local top-k per stratum BEFORE the
    * exchange, so the shuffle carries O(k · tasks) rows, not the
    * corpus (node + row bound asserted in SamplingSpec). The
    * rate-based [[sampleStratified]] stays the zero-shuffle 100 TB
    * default; this is its exact-k sibling paying the honest
    * per-stratum top-k cost. Fixed-width-hex draw ⇒ bit-exact
    * cross-engine, full hash gate. */
  def sampleExactK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir).documents
    val drawn = d.select(col("doc_id"), col("lang"),
      md5(concat(lit(ExactKSeed), col("doc_id").cast("string"))).as("draw"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("draw"), col("doc_id"))
    drawn.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= ExactK)
      .select(col("lang"), col("rk"), col("doc_id"), col("draw"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Batch count and salt for [[mixBalancedBatches]]. */
  val NumBatches = 8
  val BatchSeed = "graft-batch-11:"

  /** J10: recipe-balanced training-batch assembly — assign every doc
    * to one of [[NumBatches]] batches so that EACH batch reproduces
    * the corpus' language mix (per (lang, batch) counts differ by
    * ≤ 1 within a language — a guarantee, not an expectation; an iid
    * split only gets the mix right in expectation). batch = (per-lang
    * rank over the salted-md5 order − 1) mod B: deterministic,
    * re-runnable, independent of every other J draw, and uniformly
    * shuffled within each language.
    *
    * Scale shape: one lang exchange + per-stratum sort (shards rank
    * in parallel — corpus_shuffle's cost class; ranks are consumed
    * whole so no WindowGroupLimit applies). Fixed-width-hex draw ⇒
    * full hash gate. */
  def mixBalancedBatches(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir).documents
    val drawn = d.select(col("doc_id"), col("lang"),
      md5(concat(lit(BatchSeed), col("doc_id").cast("string"))).as("draw"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("draw"), col("doc_id"))
    drawn.withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("lang"),
        ((col("rk") - 1) % NumBatches).cast("int").as("batch"))
      .orderBy(col("doc_id"))
  }

  /** Salt for [[mixSources]] — independent draw from [[Seed]]. */
  val MixSeed = "graft-mix-7:"

  /** The declared mixture recipe: source `srcN` gets integer weight
    * N % [[MixWeightMod]] + 1 (target share w_s / Σw). A function of
    * the source NAME so the recipe is data-independent, and
    * non-uniform so rebalancing actually thins (this corpus has equal
    * source counts — a uniform recipe would keep every row and prove
    * nothing; mod 4 yields TWO distinct sub-1.0 rates plus keep-all,
    * so the threshold algebra is exercised at more than one point).
    * Single-sourced into the oracle. */
  val MixWeightMod = 4

  /** J3: dataset-mixture rebalancing — downsample each source toward
    * its share of the declared recipe (the "mix the crawl snapshots /
    * code / books to a recipe" step of assembling a training corpus).
    * Over-represented sources are hash-thinned toward total·w_s/Σw
    * docs; under-represented sources are kept whole (a rate filter
    * cannot upsample — replication is a different operator, and real
    * recipes clamp at 1.0 exactly like this).
    *
    * Determinism/oracle: the acceptance threshold is PURE INTEGER
    * algebra — thr = min(65536, (total·w·65536) div (Σw·cnt)) — and
    * the per-row draw is the same fixed-width-hex md5 compare as
    * [[sampleStratified]] (independent salt), so the kept set is
    * bit-reproducible cross-engine. thr = 65536 (keep-all) bypasses
    * the string compare: its 5-hex-char form can't be compared
    * against a 4-char bucket lexicographically.
    *
    * Scale shape: the rate table is one tiny agg (|sources| rows, a
    * global window over those rows only) broadcast back onto the
    * corpus; the DATA PLANE is scan → broadcast-hash-join → per-row
    * hash filter — zero shuffles of the documents themselves, no
    * window over the corpus, composes with pushdown. Two scans
    * (count pass + probe pass) by design, same
    * compute-stats-then-apply rationale as text_oov; SamplingSpec
    * locks the count. */
  def mixSources(spark: SparkSession, dir: String): DataFrame =
    mixOf(Tables(spark, dir).documents)

  /** The per-source keep-threshold table for [[mixOf]] — one tiny agg
    * over the reference corpus (|sources| rows). Split out so the G13
    * stream_mix twin can compute it batch-side and broadcast it into
    * a live stream (rates from yesterday's corpus applied to today's
    * firehose — exactly how recipe thinning deploys). */
  def mixRatesOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val everyRow = Window.partitionBy() // |sources| rows, post-agg only
    d.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .withColumn("w",
        expr(s"cast(substring(source, 4) as bigint) % $MixWeightMod + 1"))
      .withColumn("total", sum(col("cnt")).over(everyRow))
      .withColumn("wsum", sum(col("w")).over(everyRow))
      .withColumn("thr",
        least(lit(65536L), expr("(total * w * 65536) div (wsum * cnt)")))
      .select(col("source"), col("thr"))
  }

  /** The stateless per-row mixture filter against a precomputed rate
    * table — works on any (doc_id, source) frame, batch or stream. */
  def mixApply(docs: DataFrame, rates: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(rates), "source")
      .withColumn("bucket", hashBucket(col("doc_id"), MixSeed))
      .withColumn("thr_hex",
        when(col("thr") >= 65536L, lit("10000"))
          .otherwise(lpad(lower(hex(col("thr"))), 4, "0")))
      .filter(col("thr") >= 65536L || col("bucket") < col("thr_hex"))
      .select(col("doc_id"), col("source"), col("bucket"), col("thr_hex"))
      // no orderBy here: a streaming caller cannot sort; batch
      // entries add their own presentation sort

  /** Core mixture rebalance over a (doc_id, source) frame (specs
    * plant skewed fixtures — the shipped corpus has uniform source
    * counts, which only exercises the keep-all branch at small SF). */
  def mixOf(d: DataFrame): DataFrame =
    mixApply(d, mixRatesOf(d)).orderBy(col("doc_id"))

  /** Context-window token budget for [[packSequences]] (single-sourced
    * into the oracle). */
  val PackBudget = 2048L

  /** J2: sequence packing — the "concatenate documents and chop into
    * fixed context windows" step every LLM training pipeline runs
    * before batching. Docs are laid out in deterministic (source,
    * doc_id) order as one token stream per source shard; each doc is
    * assigned the window containing its first token (seq_id) and its
    * offset inside that window. Whitespace token counts share
    * [[graft.functions.TextFunctions.wsTokenCount]] with text_tokens,
    * so the packer and the token-count query can never disagree.
    *
    * Scale shape: the running sum is a window per SOURCE shard in
    * (doc_id) order — shards pack independently and in parallel,
    * which is how a 100 TB corpus is packed in practice (per input
    * shard, never one global stream: a global order would serialize
    * the whole corpus through one sort). Pure integer algebra — exact
    * cross-engine hash gate. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val n = graft.functions.TextFunctions.wsTokenCount(col("text"))
    packOf(Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), n.as("n_tokens")))
  }

  /** Core packing algebra over any (doc_id, source, n_tokens) frame —
    * [[packSequences]] feeds it the raw corpus, [[Curate.curatePack]]
    * the curated training set. */
  def packOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    d.select(col("doc_id"), col("source"),
        col("n_tokens").cast("long").as("n_tokens"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("source"),
        col("n_tokens").cast("int").as("n_tokens"),
        // integral div, not Column./ (double division — CLAUDE.md)
        expr(s"start_off div ${PackBudget}L").cast("int").as("seq_id"),
        (col("start_off") % PackBudget).cast("int").as("seq_offset"))
      .orderBy(col("doc_id"))
  }

  /** Salt for [[mixTemperature]] — independent draw from every other
    * sampling salt in this file. */
  val TempSeed = "graft-temp-5:"

  /** J5: temperature-flattened language rebalancing — the mT5/XLM-R
    * "sample language l ∝ p_l^α" step (α = 1/T = 0.5 here), the
    * standard fix for high-resource languages drowning out rare ones.
    * Target share t_l ∝ √share_l, so en is thinned toward its square
    * root while rare languages keep every doc (a rate filter cannot
    * upsample — [[mixEpochs]] is the replication half, same contract
    * as [[mixSources]]).
    *
    * Determinism/oracle: the temperature weight is the INTEGER square
    * root w_l = floor(√cnt_l) — the normalizer cancels in w/Σw, so
    * √cnt is √share up to a constant — and from there the threshold
    * is [[mixSources]]' pure integer algebra verbatim:
    * thr = min(65536, (total·w·65536) div (wsum·cnt)). floor(√n) is
    * bit-safe cross-engine for any realistic count (IEEE sqrt is
    * correctly rounded; the double grid is fine enough below 2⁵² that
    * √(k²−1) never rounds up to k), and the isqrt quantization error
    * on the share is < 1/(2√cnt) — part of the operator contract,
    * negligible at corpus counts. Per-row draw = the fixed-width-hex
    * md5 compare under [[TempSeed]]. Full hash gate.
    *
    * Scale shape: identical to mix_sources — a |langs|-row agg
    * broadcast back onto the corpus; the data plane is scan →
    * broadcast-hash-join → per-row hash filter, zero corpus
    * shuffles. */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame =
    tempOf(Tables(spark, dir).documents)

  /** The per-language temperature threshold table (|langs| rows;
    * window runs post-agg over those rows only). */
  def tempRatesOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val everyRow = Window.partitionBy()
    d.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      .withColumn("w", floor(sqrt(col("cnt").cast("double"))).cast("long"))
      .withColumn("total", sum(col("cnt")).over(everyRow))
      .withColumn("wsum", sum(col("w")).over(everyRow))
      .withColumn("thr",
        least(lit(65536L), expr("(total * w * 65536) div (wsum * cnt)")))
      .select(col("lang"), col("thr"))
  }

  /** Core temperature rebalance over any (doc_id, lang) frame (specs
    * plant skewed fixtures; the shipped corpus' real lang skew —
    * en ≈ 44 % — exercises both the thinning and keep-all branches at
    * every SF). */
  def tempOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("lang"))
      .join(broadcast(tempRatesOf(d)), "lang")
      .withColumn("bucket", hashBucket(col("doc_id"), TempSeed))
      .withColumn("thr_hex",
        when(col("thr") >= 65536L, lit("10000"))
          .otherwise(lpad(lower(hex(col("thr"))), 4, "0")))
      .filter(col("thr") >= 65536L || col("bucket") < col("thr_hex"))
      .select(col("doc_id"), col("lang"), col("bucket"), col("thr_hex"))
      .orderBy(col("doc_id"))

  /** Salt for [[mixEpochs]] — independent draw from [[Seed]] and
    * [[MixSeed]] (the extra-copy lottery must not correlate with
    * which docs the downsampling mixes keep). */
  val EpochSeed = "graft-epoch-11:"

  /** J4: epoch-style UPsampling toward the recipe — the half of
    * mixture rebalancing that [[mixSources]] deliberately clamps
    * away. A rate filter cannot emit a row twice; trainers instead
    * repeat under-represented sources for fractional "epochs"
    * (e.g. books ×1.74): every doc of source s gets
    * `floor(rate_s)` copies plus one more with probability
    * `frac(rate_s)`, so E[copies] = rate_s exactly and a source's
    * effective share matches the declared weight recipe without any
    * doc being over-repeated (copies differ by at most 1 within a
    * source — the low-discrepancy repetition trainers want, not an
    * iid draw of the whole corpus).
    *
    * Determinism/oracle: thr_total = (total·w·65536) div (wsum·cnt)
    * is PURE INTEGER algebra (single-sourced recipe with
    * [[mixSources]]); base = thr_total div 65536 copies are
    * unconditional, and the fractional extra copy is the fixed-width
    * hex md5 compare of [[sampleStratified]] under [[EpochSeed]]
    * against rem = thr_total mod 65536 — bit-reproducible
    * cross-engine, rem = 0 (an exactly-integral rate) draws nothing.
    *
    * Scale shape: identical to mix_sources — the rate table is one
    * tiny agg broadcast back; the data plane is scan →
    * broadcast-hash-join → per-row explode of ≤ base+1 epoch ids.
    * Zero corpus shuffles, no window over the corpus; output size is
    * Σ rate_s·cnt_s = |corpus| rows per recipe epoch regardless of
    * skew. Two scans (count pass + probe pass) by design. */
  def mixEpochs(spark: SparkSession, dir: String): DataFrame =
    epochsOf(Tables(spark, dir).documents)

  /** Core epoch-replication algebra over any (doc_id, source) frame
    * (specs plant skewed fixtures hitting all three regimes:
    * fractional-only, exactly ×1, integral multiple). */
  def epochsOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val everyRow = Window.partitionBy() // |sources| rows, post-agg only
    val rates = d.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .withColumn("w",
        expr(s"cast(substring(source, 4) as bigint) % $MixWeightMod + 1"))
      .withColumn("total", sum(col("cnt")).over(everyRow))
      .withColumn("wsum", sum(col("w")).over(everyRow))
      .withColumn("thr_total", expr("(total * w * 65536) div (wsum * cnt)"))
      .select(col("source"),
        expr("thr_total div 65536").as("base"),
        (col("thr_total") % 65536L).as("rem"))
    d.select(col("doc_id"), col("source"))
      .join(broadcast(rates), "source")
      .withColumn("bucket", hashBucket(col("doc_id"), EpochSeed))
      // rem < 65536 ⇒ 4 hex chars; rem = 0 ⇒ "0000", beaten by no bucket
      .withColumn("rem_hex", lpad(lower(hex(col("rem"))), 4, "0"))
      .withColumn("n_copies",
        (col("base") +
          when(col("bucket") < col("rem_hex"), 1L).otherwise(0L)).cast("int"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(0), col("n_copies") - 1)).as("epoch"))
      .select(col("doc_id"), col("source"), col("epoch"), col("n_copies"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  /** Salt for [[corpusShuffle]] — independent of every sampling draw
    * (the shard a doc lands in must not correlate with whether any
    * mix kept it). */
  val ShuffleSeed = "graft-shuffle-17:"

  /** Hex-prefix width of the shard id: 16^k shards. 2 (256 shards)
    * here; a 100 TB corpus dials it to 4 (65 536 shards ≈ 1.5 GB
    * each) — the width is config, the algebra is unchanged. */
  val ShardHexWidth = 2

  /** J7: deterministic global corpus shuffle into training shards —
    * the last step before a trainer reads the corpus: break every
    * correlation the curation pipeline left in doc order (by-source
    * runs, by-crawl-date runs) by scattering docs pseudo-randomly
    * across shards and ordering them pseudo-randomly within each
    * shard. shard = the first [[ShardHexWidth]] hex chars of
    * md5([[ShuffleSeed]] ‖ doc_id); pos = the 1-based rank of the
    * FULL 32-char hash within the shard (doc_id tiebreak for the
    * astronomically-unlikely collision) — reading shards in any
    * order, each in pos order, is a uniform permutation of the
    * corpus determined entirely by the salt.
    *
    * Determinism/oracle: md5-of-UTF-8 is identical in Spark and
    * DuckDB and fixed-width lowercase hex compares numerically
    * ([[hashBucket]]'s contract), so shard AND pos are
    * bit-reproducible cross-engine — full hash gate — re-runnable,
    * and stable under any input partitioning.
    *
    * Scale shape: ONE hash-partition exchange on shard + a per-shard
    * sort — exactly the physical plan a sharded shuffled write needs
    * (`repartition($"shard").sortWithinPartitions($"h")` → write);
    * no global sort, no driver state, shards are independent so 16^k
    * reducers pack in parallel. The window is per-shard, never over
    * the whole corpus. */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame =
    shuffleOf(Tables(spark, dir).documents)

  /** Core shard assignment over any frame with doc_id. */
  def shuffleOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    d.select(col("doc_id"),
        md5(concat(lit(ShuffleSeed), col("doc_id").cast("string"))
          .cast("binary")).as("h"))
      .withColumn("shard", substring(col("h"), 1, ShardHexWidth))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** J8 (round 10): curriculum layout — stage the corpus by quality
    * quartile (stage 1 = the cleanest quarter, read first; stage 4 =
    * the noisiest, read last), then give each stage its own J7
    * deterministic shuffle — easy-to-hard pacing BETWEEN stages,
    * decorrelated order WITHIN each stage. A trainer consumes stages
    * in number order, shards within a stage in any order, docs within
    * a shard in pos order.
    *
    * Stage boundaries are the EXACT corpus quality quartiles via ONE
    * `percentile(quality, array(...))` aggregate (the q23 shared-
    * buffer discipline) broadcast back as a 1-row frame — per-row
    * bucketing against three literals, so there is no global sort
    * and no ntile window anywhere; the Spark↔DuckDB interpolation
    * equivalence is the one q23_percentiles already proves. Stage
    * membership compares UNROUNDED quality to the unrounded
    * boundaries (both bit-identical cross-engine: the E2 expression
    * and `quantile_cont`); a doc exactly ON a boundary goes to the
    * earlier (cleaner) stage, mirrored in the oracle.
    *
    * Scale shape: quality scan → 1-row percentile agg (the one
    * full-corpus aggregation; constant-size sketch-free buffer per
    * q23's measured discipline) → per-row stage/shard algebra → the
    * J7 per-(stage, shard) rank window. Same window economics as
    * corpus_shuffle: partitions are shard-sized, never corpus-sized. */
  def mixCurriculum(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => T}
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir).documents
    val nTok = T.wsTokenCount(col("text"))
    val stopRatio = T.tokenCountIn(col("text"), T.EnStopwords) / nTok
    val punctRatio = T.punctCount(col("text")) / length(col("text"))
    val q = d.select(col("doc_id"),
      T.qualityScore(nTok, stopRatio, punctRatio).as("quality"))
    val bounds = q.agg(
      expr("percentile(quality, array(0.25D, 0.5D, 0.75D))").as("bs"))
    val stage = (lit(1) +
      (col("quality") < element_at(col("bs"), 3)).cast("int") +
      (col("quality") < element_at(col("bs"), 2)).cast("int") +
      (col("quality") < element_at(col("bs"), 1)).cast("int")).as("stage")
    val w = Window.partitionBy(col("stage"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
    q.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("quality"), stage)
      .withColumn("h",
        md5(concat(lit(ShuffleSeed), col("doc_id").cast("string"))
          .cast("binary")))
      .withColumn("shard", substring(col("h"), 1, ShardHexWidth))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("stage"), col("shard"), col("pos"),
        round(col("quality"), 4).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Salt for [[sampleImportance]] — independent draw. */
  val ImportanceSeed = "graft-importance-13:"
  /** Bucket space: 16 bits, the same grain as [[hashBucket]];
    * a doc's keep threshold is floor(quality · 65536). */
  val ImportanceScale = 65536L

  /** J10: per-document importance sampling — P(keep) = the doc's OWN
    * quality score (the soft alternative to curate's hard floor:
    * high-quality docs survive ~always, low-quality docs survive in
    * proportion, nothing is categorically excluded — the standard
    * quality-weighted downsampling recipe). Same zero-shuffle fate
    * function discipline as [[sampleStratified]]: keep iff the
    * integer 16-bit md5 bucket of (salt ‖ doc_id) < floor(q·65536),
    * with q the single-sourced E2 quality score — so the kept set is
    * bit-reproducible cross-engine, re-runnable, stable under
    * repartitioning, and composable into pipelines as one filter. */
  def sampleImportance(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val nTok = T.wsTokenCount(col("text"))
    val stopRatio = T.tokenCountIn(col("text"), T.EnStopwords) / nTok
    val punctRatio = T.punctCount(col("text")) / length(col("text"))
    val q = T.qualityScore(nTok, stopRatio, punctRatio)
    Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"),
        conv(substring(md5(concat(lit(ImportanceSeed),
          col("doc_id").cast("string")).cast("binary")), 1, 4), 16, 10)
          .cast("long").as("bucket"),
        floor(q * ImportanceScale).cast("long").as("thr"),
        round(q, 4).as("quality"))
      .filter(col("bucket") < col("thr"))
      .orderBy(col("doc_id"))
  }

  /** Salt for [[sampleSplit]] — an independent draw from every other
    * sampling salt (the same salt would correlate the holdout with a
    * sampling decision). */
  val SplitSeed = "graft-split-11:"

  /** Hex fate boundaries: bucket < e666 → train (0xe666/0x10000 =
    * 58982/65536 ≈ 0.8999), < f333 → val (0xf333−0xe666 = 3277/65536
    * ≈ 0.0500), else test (≈ 0.0500). */
  val SplitTrainMax = "e666"
  val SplitValMax = "f333"

  /** J11 (round 11): deterministic train/val/test holdout split —
    * the assignment every training pipeline makes before anything
    * else, and the one that must NEVER drift: a document that
    * migrates from test to train between runs silently contaminates
    * every evaluation after it. Membership is a pure function of
    * doc_id (first 16 md5 bits of salt ‖ doc_id against fixed hex
    * fences), so the split is bit-reproducible cross-engine, stable
    * under repartitioning/re-ingestion, and new documents land in
    * splits at the same ≈90/5/5 rates without moving ANY existing
    * document — the property a random/row_number split cannot give.
    * Zero-shuffle fate function (the [[sampleStratified]] discipline,
    * plan-asserted in SamplingSpec); downstream consumers filter on
    * `split` as one predicate. Full hash gate (md5-hex compare is
    * integer-free and identical in DuckDB). */
  def sampleSplit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"),
        hashBucket(col("doc_id"), SplitSeed).as("bucket"))
      .withColumn("split",
        when(col("bucket") < SplitTrainMax, "train")
          .when(col("bucket") < SplitValMax, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))

  /** J12 (round 12): LEAKAGE-SAFE holdout split — [[sampleSplit]]'s
    * fate function keyed on the near-dup CLUSTER representative
    * instead of the document itself, so every member of a duplicate
    * cluster lands in the SAME split. A per-doc split (J11) leaks:
    * two near-identical documents can straddle train/test, and the
    * eval then scores memorization (Lee et al. '22 measured this on
    * C4 — dedup-unaware splits inflate held-out likelihood). Cluster
    * membership is the C2 shingle-Jaccard pair graph contracted by
    * the C6 large-star/small-star rounds (shared code — the split
    * agrees with dedup_components by construction); unclustered docs
    * (the vast majority) fall through `coalesce` to their own id,
    * so they get EXACTLY the J11 assignment (same salt/fences —
    * property-tested in SamplingSpec). Scale shape: the contraction
    * is O(log d) bounded-round (cluster members only, a small
    * fraction of the corpus); the corpus-wide part is one LEFT join
    * of documents against the (node, lbl) labels — shuffle on
    * doc_id — then the zero-shuffle fate projection. Full hash gate
    * (components + md5-hex fences both proven oracle algebra). */
  def sampleLeakageSplit(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramPairsOf(Tables(spark, dir).documents)
      .select(col("doc_a"), col("doc_b"))
      .persist()
    val labels = Dedup.componentLabels(pairs)
      .withColumnRenamed("node", "doc_id")
    val out = Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("lbl"), col("doc_id")).as("rep_doc"))
      .withColumn("bucket", hashBucket(col("rep_doc"), SplitSeed))
      .withColumn("split",
        when(col("bucket") < SplitTrainMax, "train")
          .when(col("bucket") < SplitValMax, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))
    pairs.unpersist()
    out
  }

  /** J13 (round 12): SOFT dedup — weight every document by the
    * reciprocal of its exact-duplicate multiplicity instead of
    * dropping copies (the "count each unique text once in
    * expectation" reweighting; Muennighoff et al. '23 show repeated
    * data degrades at high epoch counts — downweighting is the
    * continuous knob between keep-all and C1's keep-one). Emits the
    * sampling weight a mixer multiplies into its draw rate, so dup
    * clusters contribute one document's worth of gradient mass
    * regardless of copy count. ONE shuffle: a count window over the
    * md5(text) hash partition (AQE splits a pathological mega-dup's
    * skew); no join, no second pass. Full hash gate — count(*) OVER
    * is exact integer algebra and the reciprocal rounds via
    * roundDuck on both engines. */
  def mixSoftDedup(spark: SparkSession, dir: String): DataFrame =
    mixSoftDedupOf(Tables(spark, dir).documents)

  /** Salts, batch-size target and per-anchor negative count for
    * [[sampleNegatives]] (each J draw salts independently). */
  val NegSeed = "graft-negbatch-13:"
  val NegRankSeed = "graft-negrank-17:"
  val NegBatchTarget = 32
  val NegK = 4

  /** J14: in-batch negative sampling — the contrastive-training pair
    * generator: vectors land in salted-md5 batches of
    * ~[[NegBatchTarget]], every different-label pair within a batch
    * is a candidate negative, and each anchor keeps its
    * [[NegK]] rank-salted negatives — deterministic, re-runnable,
    * independent of every other J draw.
    *
    * Scale: the batch COUNT scales as n div target (the
    * knn_graph_ivf in-query-dial lesson — a fixed batch count would
    * make in-batch pair work quadratic), so batch size ~ the target
    * constant and pair work stays linear; n rides a 1-row count
    * aggregate crossJoin (the PlanContractSpec-allowlisted
    * broadcast-scalar shape). The per-anchor cut is a rank-≤-k
    * window over the (rank-hash, negative) total order —
    * WindowGroupLimit pre-cuts map-side. Hashes are fixed-width
    * lowercase hex (lexical compare = numeric compare) and every
    * output is an integer/string ⇒ full hash gate. */
  def sampleNegatives(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir).embeddings.select(col("vec_id"), col("label"))
    val nB = e.agg(greatest(lit(1L),
      expr(s"count(1) div $NegBatchTarget")).as("n_batches"))
    val b = e.crossJoin(nB)
      .select(col("vec_id"), col("label"),
        (conv(substring(md5(concat(lit(NegSeed),
            col("vec_id").cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast("long") % col("n_batches")).as("batch"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = b.as("a").join(b.as("b"),
        col("a.batch") === col("b.batch") &&
          col("a.label") =!= col("b.label"))
      .select(col("a.vec_id").as("anchor"),
        col("a.label").as("anchor_label"),
        col("b.vec_id").as("negative"), col("b.label").as("neg_label"),
        col("a.batch").as("batch"))
    val w = Window.partitionBy(col("anchor"))
      .orderBy(md5(concat(lit(NegRankSeed), col("anchor").cast("string"),
        lit(":"), col("negative").cast("string")).cast("binary")),
        col("negative"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= NegK)
      .select(col("anchor"), col("anchor_label"), col("negative"),
        col("neg_label"), col("batch"), col("rn"))
      .orderBy(col("anchor"), col("rn"))
  }

  /** Token budget for [[mixTokensBudget]] (single-sourced into the
    * oracle). */
  val TokBudget = 1000000L

  /** J19 (round 13): token-budget allocation — given a total token
    * budget for a training run, how many tokens each source gets
    * under a τ = 0.5 temperature (√-proportional — upweights tail
    * sources, the mix_temperature dial as a PLANNING table instead
    * of a sample), with EXACT largest-remainder apportionment:
    * Σ quota == budget to the token, deterministically. This is the
    * run-manifest number a mixture owner signs off on before
    * mix_sources/mix_epochs executes it.
    *
    * Exactness: pure integer end-to-end — w = ⌊√(tokens·10⁶)⌋ (IEEE
    * sqrt is correctly rounded ⇒ identical cross-engine, the
    * knn_graph_ivf dial precedent), quota = (B·w) div Σw, remainder
    * = (B·w) mod Σw, and the B − Σ quota deficit goes to the top
    * remainders under a (rem desc, source) total order. No FP share
    * ever materializes ⇒ full hash gate. Scale: one
    * map-side-combined groupBy(source) off the codegen'd token
    * count; everything after runs on the k-source rows (the
    * tempRatesOf window class). Headroom: B·w < 2⁶³ up to ~10¹³
    * corpus tokens. */
  def mixTokensBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{TextFunctions => T}
    val everyRow = Window.partitionBy()
    val b = TokBudget
    Tables(spark, dir).documents
      .select(col("source"),
        T.wsTokenCount(col("text")).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("w",
        floor(sqrt(col("n_tokens").cast("double") * lit(1000000.0)))
          .cast("long"))
      .withColumn("wsum", sum(col("w")).over(everyRow))
      .withColumn("quota0", expr(s"($b * w) div wsum"))
      .withColumn("rem", expr(s"($b * w) % wsum"))
      .withColumn("deficit", lit(b) - sum(col("quota0")).over(everyRow))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("w"),
        (col("quota0") +
          when(col("rk") <= col("deficit"), 1L).otherwise(0L)).as("quota"))
      .orderBy(col("source"))
  }

  /** Fold count and assignment salt for [[sampleKfold]]
    * (single-sourced into the oracle). */
  val KfoldK = 5
  val KfoldSeed = "graft-kfold-23:"

  /** J18 (round 13): k-fold cross-validation assignment — every doc
    * lands in exactly one of [[KfoldK]] salted-md5 folds; per fold
    * the test size, train size (= corpus − fold) and share. The
    * fourth member of the split family (random / temporal /
    * leakage-aware / k-fold): CV is how a quality-classifier or
    * reward-model trainer actually consumes a curated corpus, and
    * hash-based assignment keeps folds STABLE under corpus growth —
    * a doc never migrates folds when new data arrives (the property
    * a random split cannot give). One pass, map-side-combined
    * groupBy(fold) to K rows; integer algebra + one share division
    * ⇒ full hash gate. */
  def sampleKfold(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents.select(col("doc_id"))
    val fold = conv(substring(md5(concat(lit(KfoldSeed),
        col("doc_id").cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long") % KfoldK
    val tot = d.agg(count(lit(1)).as("n_total"))
    d.select(fold.as("fold"))
      .groupBy(col("fold")).agg(count(lit(1)).as("n_test"))
      .crossJoin(broadcast(tot))
      .select(col("fold"), col("n_test"),
        (col("n_total") - col("n_test")).as("n_train"),
        round(col("n_test").cast("double") /
          col("n_total").cast("double"), 4).as("share"))
      .orderBy(col("fold"))
  }

  /** Replicate count, draw salt and the cumulative Poisson(1) CDF
    * thresholds for [[sampleBootstrap]] — u ≥ k thresholds ⇒ draw
    * count k (capped at 6; P(k>6) ≈ 8e-5 folds into the cap).
    * Literal doubles round-trip IEEE-exactly through both engines'
    * parsers, so the threshold compares cannot drift. */
  val BootReps = 10
  val BootSeed = "graft-boot-19:"
  val BootCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  /** J17 (round 13): deterministic Poisson bootstrap — the standard
    * distributed bootstrap (per-element draw count ~ Poisson(1),
    * Chamandy et al./Google's "Estimating Uncertainty for Massive
    * Data Streams" construction: no global resample pass, each row
    * decides its own multiplicity independently per replicate).
    * [[BootReps]] replicates of the documents corpus, each reporting
    * resample size, unique-doc count and mean doc length — the
    * uncertainty read ("how stable is my corpus statistic under
    * resampling") behind every error bar a curation report prints.
    * Draws are salted-md5 inverse-CDF, so the replicate set is
    * deterministic, re-runnable, and independent of every other J
    * draw (the sample_importance hash contract).
    *
    * Scale: ONE pass — replicates explode from a literal array
    * ([[BootReps]]× amplification of the PROJECTED (id, n_chars)
    * frame, not raw text), map-side-combined groupBy(rep); k is a
    * chained-indicator sum (u ≥ t_i), all downstream sums exact
    * integers, one mean division ⇒ full hash gate. */
  def sampleBootstrap(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents.select(col("doc_id"), col("n_chars"))
    val reps = array((0 until BootReps).map(r => lit(r)): _*)
    val u = conv(substring(md5(concat(lit(BootSeed),
        col("rep").cast("string"), lit(":"),
        col("doc_id").cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    val k = BootCdf.map(t => when(u >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    d.select(col("doc_id"), col("n_chars"), explode(reps).as("rep"))
      .select(col("rep"), k.as("k"), col("n_chars"))
      .groupBy(col("rep"))
      .agg(sum(col("k")).as("n_drawn"),
        sum(when(col("k") > 0L, 1L).otherwise(0L)).as("n_unique"),
        sum(col("k") * col("n_chars")).as("sum_chars"))
      .select(col("rep"), col("n_drawn"), col("n_unique"),
        round(col("sum_chars").cast("double") /
          col("n_drawn").cast("double"), 4).as("mean_chars"))
      .orderBy(col("rep"))
  }

  /** [[mixSoftDedup]] over any (doc_id, lang, text) frame — split out
    * so the weighting is fixture-testable (the shipped corpus has no
    * exact dups below sf0.1; SamplingSpec plants some). */
  private[operators] def mixSoftDedupOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    d.select(col("doc_id"), col("lang"), md5(col("text")).as("text_hash"))
      .withColumn("n_dups",
        count(lit(1)).over(Window.partitionBy("text_hash")))
      .select(col("doc_id"), col("lang"), col("n_dups"),
        round(lit(1.0) / col("n_dups"), 6).as("weight"))
      .orderBy(col("doc_id"))
  }

  /** Train fraction of the time axis for [[sampleTimeSplit]] (the
    * cutoff is the 0.8 quantile of event seconds). */
  val TimeSplitQ = 0.8

  /** Embargo gap between train and test, in days — events inside it
    * belong to neither side. (Sized to the corpus: the event axis
    * spans 30 days, so the P80 cutoff leaves ~6 days; a 2-day purge
    * keeps a real test side at every sf.) */
  val TimeSplitEmbargoDays = 2L

  /** J15: TIME-based train/test split with an embargo — the
    * backtesting discipline for anything with temporal leakage
    * (user behavior, market-like series): train = everything up to
    * the 80th-percentile timestamp T, test = everything after
    * T + 2 days, the embargo window between them DROPPED so
    * slow-moving label/feature leakage across the boundary (the
    * purged split of de Prado's backtesting literature) cannot
    * reach the test side. Complements J11 (hash fate) and J12
    * (duplicate-cluster fate): the third leakage axis is TIME.
    *
    * Shape: one scan → a 1-row percentile aggregate crossJoin-
    * broadcast (the mix_curriculum class in PlanContractSpec) →
    * zero-shuffle assignment projection. The cutoff is Spark
    * `percentile` on integer epoch seconds — interpolation
    * bit-equal to DuckDB quantile_cont (q23 precedent); boundaries
    * compare the unrounded double ⇒ full hash gate. */
  def sampleTimeSplit(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .select(col("event_id"), col("user_id"),
        Tables.tsNsToSec("ts").as("ep"))
    val cut = e.agg(percentile(col("ep"), lit(TimeSplitQ)).as("t_cut"))
    val testFrom = col("t_cut") + lit(TimeSplitEmbargoDays * 86400L)
    e.crossJoin(broadcast(cut))
      .select(col("event_id"), col("user_id"), col("ep"),
        when(col("ep") <= col("t_cut"), "train")
          .when(col("ep") > testFrom, "test")
          .otherwise("embargo").as("split"))
      .orderBy(col("event_id"))
  }

  /** Target language whose documents define [[mixDsir]]'s target
    * distribution (single-sourced into the oracle). */
  val DsirTargetLang = "en"

  /** Docs per packing shard for [[packBestfit]] — bins never cross a
    * shard, so per-shard state is bounded at any corpus size. */
  val PackShardTarget = 2048L

  /** One packed document row (public: Dataset encoder). */
  final case class PackedDoc(doc_id: Long, source: String, shard: Long,
      bin_id: Long, n_tokens: Long)

  /** Best-fit-decreasing bin packing of (doc_id, n_tokens) items into
    * capacity-`budget` bins — deterministic: items descend by
    * (n_tokens, doc_id asc), each goes to the TIGHTEST bin that fits
    * (tie → lowest bin id), else opens a new bin. Shared by the
    * distributed shard pack and VerifyR's driver recompute. */
  def bestFitDecreasing(items: Seq[(Long, Long)], budget: Long)
      : Seq[(Long, Long)] = {
    val sorted = items.sortBy { case (id, n) => (-n, id) }
    val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Seq.newBuilder[(Long, Long)]
    sorted.foreach { case (id, n) =>
      var best = -1
      var bestRem = Long.MaxValue
      var i = 0
      while (i < remaining.length) {
        val r = remaining(i)
        if (r >= n && r < bestRem) { best = i; bestRem = r }
        i += 1
      }
      if (best < 0) { remaining += (budget - n); best = remaining.length - 1 }
      else remaining(best) -= n
      out += ((id, best.toLong))
    }
    out.result()
  }

  /** J: best-fit-decreasing sequence packing — documents placed WHOLE
    * into fixed-budget bins (the BERT-style "packing without
    * splitting" of Krell et al. '21; [[packSequences]] is the
    * GPT-style contiguous-split half). Emits each doc's
    * (source, shard, bin) assignment; bins are the training
    * sequences, padding = budget − bin fill.
    *
    * Scale shape: packing state is bounded by SHARDING, not by the
    * corpus — docs land in n div [[PackShardTarget]] deterministic
    * shards (pmod of doc_id; the scaled in-query dial, CLAUDE.md
    * bucket-count lesson) and bins never cross a shard, so each
    * group fold holds ~2048 docs regardless of corpus size; the
    * waste vs unsharded packing is at most one under-filled bin per
    * shard. Oversize docs (> budget) are excluded — they belong to
    * the splitting form. BFD itself is genuine per-shard imperative
    * logic (mapGroups, the sanctioned tier); not SQL-expressible ⇒
    * rows-only [R] gate: CORRECTNESS_R pins exact map-equality vs a
    * driver BFD recompute, capacity, the ≤-one-half-empty-bin-per-
    * shard fit property and the token-mass lower bound, plus
    * double-run hash. */
  def packBestfit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = graft.functions.TextFunctions.wsTokenCount(col("text"))
    val d = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), n.cast("long").as("n_tokens"))
      .filter(col("n_tokens") <= PackBudget)
    val nSh = d.agg(greatest(lit(1L),
      expr(s"count(1) div $PackShardTarget")).as("n_shards"))
    d.crossJoin(broadcast(nSh))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        pmod(col("doc_id"), col("n_shards")).as("shard"))
      .as[(Long, String, Long, Long)]
      .groupByKey { case (_, source, _, shard) => (source, shard) }
      .flatMapGroups { (key: (String, Long),
          it: Iterator[(Long, String, Long, Long)]) =>
        val (source, shard) = key
        val docs = it.toVector
        val toks = docs.map { case (id, _, n0, _) => id -> n0 }.toMap
        bestFitDecreasing(docs.map { case (id, _, n0, _) => (id, n0) },
          PackBudget).iterator.map { case (id, bin) =>
          PackedDoc(id, source, shard, bin, toks(id))
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** J: DSIR importance weights (Xie et al. '23, Data Selection with
    * Importance Resampling) — score every document by how much more
    * likely its unigrams are under the TARGET distribution (the 'en'
    * slice) than under the RAW corpus: log w(x) = Σ_tokens
    * [ln p̂_t(w) − ln p̂_r(w)], add-1 smoothed over the shared
    * vocabulary. The weight is the draw-rate multiplier a mixer uses
    * to importance-resample raw data toward a target domain —
    * positive = target-like, negative = out-of-domain; mix_sources /
    * mix_temperature consume exactly this column.
    *
    * Shape: the unigram model is ONE token-level groupBy persisted
    * (vocabulary-bounded — the dedup inverted-index discipline), its
    * totals a 1-row broadcast; scoring re-explodes the corpus and
    * equi-joins token counts — two pruned document scans, no
    * all-pairs, no global sort. Each token term is ONE double
    * product per side, one IEEE division, one ln (double conversion
    * BEFORE the product: (ct+1)·(Nr+V) overflows bigint at extreme
    * corpus sizes — the cramers_v discipline); the per-doc sum is a
    * STRICT position-ordered sequential fold (aggregate HOF ↔
    * list_reduce ORDER BY pos — CLAUDE.md FP fold discipline) ⇒ ln
    * ulp class under round(4), full hash gate. */
  def mixDsir(spark: SparkSession, dir: String): DataFrame =
    dsirOf(Tables(spark, dir).documents
      .select(col("doc_id"), col("text"),
        (col("lang") === DsirTargetLang).as("is_t")))

  /** Core over any (doc_id, text, is_t) frame. */
  def dsirOf(docs: DataFrame): DataFrame = {
    def toks =
      docs.select(col("doc_id"), col("is_t"),
        posexplode(split(col("text"), "\\s+")).as(Seq("pos", "w")))
    val model = toks.groupBy(col("w"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      .persist()
    val tot = model.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"),
      count(lit(1)).as("v"))
    val term = log(
      ((col("ct") + lit(1L)).cast("double") * (col("nr") + col("v"))) /
        ((col("cr") + lit(1L)).cast("double") * (col("nt") + col("v"))))
    toks.join(model, Seq("w")).crossJoin(broadcast(tot))
      .select(col("doc_id"), col("pos"), term.as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sort_array(collect_list(struct(col("pos"), col("term"))))
          .as("terms"))
      .select(col("doc_id"), col("n_tokens"),
        round(aggregate(transform(col("terms"), s => s.getField("term")),
          lit(0.0), (acc, x) => acc + x), 4).as("dsir_logratio"))
      .orderBy(col("doc_id"))
  }

  /** Pointer count for [[sampleWeighted]] (single-sourced into the
    * oracle). */
  val WSampleK = 100L

  /** Salt for [[sampleWeighted]]'s traversal order — independent of
    * every other draw (the [[ShuffleSeed]] isolation rule). */
  val WSampleSeed = "graft-wsample-14:"

  /** Hex-prefix width of the cumulative-weight bucket (256 buckets).
    * The bucket is a PREFIX of the (h, doc_id) traversal order, so
    * the two-level prefix sum equals the global one bit-for-bit. */
  val WSampleHexWidth = 2

  /** J21 (round 14): weighted (PPS) sampling without replacement —
    * [[WSampleK]] picks with inclusion probability k·wᵢ/W (wᵢ = the
    * doc's token count), via SYSTEMATIC selection over a salted-hash
    * traversal order (Madow '49; the GA literature's "stochastic
    * universal sampling"): k equally-spaced pointers pⱼ =
    * (2j+1)·W/(2k) walk the cumulative-weight axis of the
    * hash-shuffled corpus; doc i is picked n_hits = #pointers inside
    * its weight span [C_{i−1}, C_i) times (a doc heavier than the
    * stride W/k can be hit more than once — reported, as PPS theory
    * requires, not silently capped).
    *
    * Chosen over the A-ES exponential-key reservoir deliberately:
    * the ES key u^(1/w) (equivalently ln(u)/w) is a TRANSCENDENTAL of
    * the uniform — a cross-libm ulp can flip the rank-k boundary,
    * exactly the failure class events_survival exhibited in r13 —
    * while systematic PPS delivers the same first-order inclusion
    * probabilities in pure integer algebra: pointer-vs-boundary
    * comparisons are (2j+1)·W < 2k·C on longs, so the selected set
    * carries a FULL hash gate. Headroom: 2k·W must stay in long
    * range — safe to ~4·10¹⁶ corpus tokens at k = 100 (the
    * mix_tokens_budget headroom discipline).
    *
    * Scale shape: one pruned (doc_id, text) scan for the weights, the
    * partSkyline bucketed-prefix pattern for the cumulative axis
    * (in-bucket running sums sort in parallel; the global stage
    * orders only the 256-row per-bucket summary), and the pointer
    * count is a closed-form per-row expression — no per-pointer join,
    * no global sort of the corpus, no driver state. */
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame =
    weightedOf(Tables(spark, dir).documents.select(
      col("doc_id"),
      greatest(graft.functions.TextFunctions.wsTokenCount(col("text"))
        .cast("long"), lit(1L)).as("w")))

  /** Core systematic-PPS selection over any (doc_id, w > 0) frame. */
  def weightedOf(d0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = WSampleK
    val d = d0.select(col("doc_id"), col("w"),
        md5(concat(lit(WSampleSeed), col("doc_id").cast("string"))
          .cast("binary")).as("h"))
      .withColumn("bk", substring(col("h"), 1, WSampleHexWidth))
    val perB = d.groupBy(col("bk")).agg(sum(col("w")).as("bw"))
    val wPre = Window.orderBy(col("bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = perB.select(col("bk"),
      coalesce(sum(col("bw")).over(wPre), lit(0L)).as("p"),
      sum(col("bw")).over(Window.partitionBy()).as("tot"))
    val wIn = Window.partitionBy(col("bk")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // #pointers strictly below C: 0 if 2kC ≤ W, else
    // min(k, ceil((2kC − W) / 2W)) = min(k, (2kC + W − 1) div 2W) —
    // exact long algebra, all operands non-negative in the taken
    // branch (where Spark's truncating div == DuckDB's flooring //)
    def nPtr(c: String): Column =
      when(lit(2L * k) * col(c) <= col("tot"), lit(0L))
        .otherwise(least(lit(k),
          expr(s"(${2L * k} * $c + tot - 1) div (2 * tot)")))
    d.join(broadcast(pre), Seq("bk"))
      .withColumn("c_hi", col("p") + sum(col("w")).over(wIn))
      .withColumn("c_lo", col("c_hi") - col("w"))
      .withColumn("n_hits", nPtr("c_hi") - nPtr("c_lo"))
      .filter(col("n_hits") >= 1)
      .select(col("doc_id"), col("w").as("weight"),
        col("n_hits").cast("int").as("n_hits"))
      .orderBy(col("doc_id"))
  }
}
