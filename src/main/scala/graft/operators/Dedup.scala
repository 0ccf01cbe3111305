package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{HashFunctions => H, VectorFunctions => V}

/** SURVEY §2C — deduplication over `documents` / `embeddings`.
  *
  * Scale design (100 TB): candidate generation always goes through an
  * equi-join on a derived key — md5 (exact), shared shingle hash with
  * a document-frequency cut (inverted index), LSH band bucket
  * (minhash), 16-bit chunk (simhash pigeonhole), block-pair key
  * (embed cosine) — which Spark executes as an ordinary shuffle join;
  * AQE splits skewed buckets. `dedupEmbedCosine` is the one
  * inherently O(n²)-comparison operator (exact τ at a continuum
  * threshold admits no complete cut on dense vectors); its block-pair
  * join bounds task memory and avoids any broadcast, and
  * [[graft.operators.Similarity.annLsh]] is the approximate scale
  * path. `dedupComponents` turns the pair graph into clusters. */
object Dedup {

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  /** C1: exact duplicate groups by md5(text); canonical representative
    * = min(doc_id). One shuffle on the hash. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("rep_doc"),
        count(lit(1)).as("n_dups"))
      .orderBy(col("text_hash"))
  }

  /** Canonical form of a URL for exact-key dedup: drop the fragment,
    * drop the scheme, lowercase the host and strip a leading "www.",
    * strip trailing slashes off the path, drop tracking params
    * (utm_*, fbclid, gclid) and keep any survivors sorted. Pure
    * codegen string algebra (anchored regexps — at most one match
    * each, so DuckDB's replace-first and Spark's replace-all agree —
    * plus small per-row list ops over the param array), mirrored
    * op-for-op in the oracle. */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val afterScheme =
      regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val host = regexp_replace(
      lower(regexp_extract(afterScheme, "^[^/?]+", 0)), "^www\\.", "")
    val rest = regexp_replace(afterScheme, "^[^/?]+", "")
    val path = regexp_replace(regexp_replace(rest, "\\?.*$", ""), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"),
        p => length(p) > 0 &&
          !p.rlike("^(utm_[a-z]+|fbclid|gclid)="))), "&")
    concat(host, path,
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** C20 (round 15): canonicalized-URL exact dedup — the first pass
    * every web-corpus pipeline runs. documents carries no URL column,
    * so a deterministic messy URL is synthesized per doc from
    * (source, doc_id) — scheme/host case noise, www., trailing
    * slash, utm_ and fbclid tracking params, fragments; the oracle
    * mirrors the synthesis expression — and the OPERATOR under test
    * is [[canonicalUrl]]: group by the canonical key, min-doc_id
    * representative (the dedup_exact shape — ONE shuffle on the
    * canonical key, linear at any corpus size). */
  def dedupUrl(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val url = concat(
      when(col("doc_id") % 2 === 0, "https").otherwise("HTTP"),
      lit("://"),
      when(col("doc_id") % 5 === 0, "www.").otherwise(""),
      when(col("doc_id") % 3 === 0, upper(col("source")))
        .otherwise(col("source")),
      when(col("doc_id") % 3 === 1, ".EXAMPLE.COM")
        .otherwise(".example.com"),
      lit("/docs/"), (col("doc_id") % 40).cast("string"),
      when(col("doc_id") % 7 === 0, "/").otherwise(""),
      when(col("doc_id") % 4 === 0,
        concat(lit("?utm_source=feed&utm_campaign=c"),
          (col("doc_id") % 3).cast("string")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("?fbclid=x"), col("doc_id").cast("string")))
        .otherwise(""),
      when(col("doc_id") % 6 === 0,
        concat(lit("#sec"), (col("doc_id") % 5).cast("string")))
        .otherwise(""))
    d.select(col("doc_id"), canonicalUrl(url).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("rep_doc"), count(lit(1)).as("n_dups"))
      .orderBy(col("canon_url"))
  }

  /** Document-frequency cut for the shingle inverted index: shingles
    * present in more than this many docs are dropped from the index
    * (and from the Jaccard universe — the oracle applies the same
    * cut). A shingle in k docs emits k²/2 self-join rows; on a
    * Zipfian corpus a handful of stop-shingles would square the
    * index without this. 50 keeps every planted near-dup pair
    * bit-identical at sf0.01 and sf0.1 (max observed df there is
    * 7 / 25; J of the planted pairs is ≥ 0.8 vs τ = 0.5). */
  val NgramDfMax = 50

  /** Shared core of C2/C6: unordered, unrounded (doc_a, doc_b, jac)
    * pairs with jac >= 0.5, via an inverted shingle index — explode
    * distinct shingle *hashes* (fused native
    * [[graft.functions.ShingleHashes]]: tokenize+shingle+xxhash64 in
    * one codegen loop; the join key is the 64-bit hash, never the
    * string), df-cut the hot shingles, self-join on the shingle hash
    * (shuffle on shingle keys, not doc pairs), count intersections,
    * then Jaccard from |A|,|B|,|A∩B|.
    *
    * The df count is a window over the same `s` partitioning the
    * self-join shuffles on, so the df pass reuses the exchange
    * instead of re-scanning. C2 adds the oracle shape (rounding +
    * deterministic sort) on top; C6 caches this frame directly so the
    * cache carries no dangling orderBy exchange. */
  private def ngramPairs(spark: SparkSession, dir: String): DataFrame =
    ngramPairsOf(Tables(spark, dir).documents)

  /** Same pair pipeline over any (doc_id, text) frame — lets composed
    * pipelines (see [[Curate]]) run near-dup detection on an already
    * filtered corpus; the df cut then counts within that corpus. */
  /** The df-cut inverted shingle-hash index over any (doc_id, text)
    * frame: (doc_id, [carry...], s). Single Spark-side source for the
    * C2/C6 pair chain AND [[Decontaminate]] — the mirror of the
    * oracle-side shared `shingleCtes`, so the shingle definition and
    * df cut cannot drift between consumers on either side. */
  private[operators] def shingleIndexOf(d: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    d.select(col("doc_id") +: carry.map(col) :+
        explode(H.shingleHashes(col("text"), 3)).as("s"): _*)
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= NgramDfMax)
      .select(col("doc_id") +: carry.map(col) :+ col("s"): _*)
  }

  private[operators] def ngramPairsOf(d: DataFrame): DataFrame = {
    // NOTE (r15, measured-and-rejected): persisting `sh` to dedup its
    // three references (self-join sides + sizes) was tried and is NET
    // SLOWER at sf0.1 (2.0 → 2.5 s warm) — the cache build + columnar
    // write costs more than the two saved explode+window recomputes.
    val sh = shingleIndexOf(d)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jac",
        col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c")))
      .filter(col("jac") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  /** C16 (round 13): per-document shingle NOVELTY — for every doc
    * (in doc_id ingestion order), what fraction of its distinct
    * 3-gram shingles appears for the FIRST time in the corpus. The
    * marginal-content read between exact dedup and pair detection:
    * a crawl whose per-doc novelty curve collapses toward 0 has
    * stopped contributing new text (diminishing-returns signal for
    * crawl scheduling), and a single low-novelty doc is a
    * near-dup-lite flag without any pair join. The doc-grain twin of
    * corpus_heaps' aggregate vocabulary-growth curve, on shingles
    * instead of tokens.
    *
    * Scale shape: shingle explode (the fused native
    * [[graft.functions.ShingleHashes]] codegen — no df cut here:
    * there is no self-join for a hot shingle to square; the
    * first-doc groupBy is linear) → one min-per-shingle aggregate →
    * one equi-join back + per-doc counts, all
    * shuffle-on-natural-key. Counts are exact integers on both
    * engines as long as xxhash64 is collision-free on the corpus
    * (the C2-chain assumption, shared); one division ⇒ full hash
    * gate. */
  def corpusNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = noveltyShingles(Tables(spark, dir).documents)
      .persist() // feeds the first-doc aggregate AND the join side
    noveltyScore(sh, sh.groupBy(col("s")).agg(min(col("doc_id")).as("fd")))
  }

  /** The exploded (doc_id, s) distinct-shingle frame — shared by the
    * batch entry and the streaming twin (one shingle definition). */
  private[graft] def noveltyShingles(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(H.shingleHashes(col("text"), 3)).as("s"))

  /** The read-side scorer over the shingle frame and any
    * (s, fd) first-doc index — shared by the batch entry and the
    * streaming twin's snapshot read (one definition, one oracle). */
  private[graft] def noveltyScore(sh: DataFrame,
      first: DataFrame): DataFrame =
    sh.join(first, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") /
          col("n_shingles").cast("double"), 4).as("novelty"))
      .orderBy(col("doc_id"))

  /** C2: 3-gram shingle Jaccard >= 0.5 pair detection (see
    * [[ngramPairs]] for the index structure and df cut). */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Containment threshold for [[dedupContainment]] (single-sourced
    * into the oracle). */
  val ContainTau = 0.8

  /** C15 (round 13): asymmetric shingle CONTAINMENT pairs — the
    * doc-in-doc detector Jaccard structurally misses. A short
    * document fully quoted inside a long one (boilerplate-wrapped
    * rehosts, quote farms, template-inflated copies — the standard
    * web-corpus contamination shapes) has near-zero Jaccard (the
    * union is dominated by the long side) but containment
    * C(A,B) = |A∩B|/|A| ≈ 1 from the short side. Emits every pair
    * where EITHER direction's containment clears [[ContainTau]],
    * with both ratios, so the consumer can distinguish symmetric
    * near-dups (both high — also caught by C2) from true
    * engulfment (one high, one low — only caught here).
    *
    * Scale shape: identical to the C2 pair chain — the SAME df-cut
    * inverted shingle index ([[shingleIndexOf]]; the shingle
    * definition and df≤50 cut cannot drift between C2, C12 and this
    * operator on either engine side), intersection counts via the
    * shared-shingle equi-join, sizes joined back. Only the final
    * ratio differs: |A∩B|/|A| and /|B| instead of /|A∪B|. Both
    * divisions are single FP ops on identical integer operands ⇒
    * full hash gate. */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame =
    containmentPairsOf(Tables(spark, dir).documents)

  /** Same containment chain over any (doc_id, text) frame. */
  private[operators] def containmentPairsOf(d: DataFrame): DataFrame = {
    val sh = shingleIndexOf(d)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("c_ab", col("c").cast("double") / col("sa.n"))
      .withColumn("c_ba", col("c").cast("double") / col("sb.n"))
      .filter(greatest(col("c_ab"), col("c_ba")) >= ContainTau)
      .select(col("doc_a"), col("doc_b"),
        round(col("c_ab"), 4).as("contain_ab"),
        round(col("c_ba"), 4).as("contain_ba"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C3: MinHash(64) + banded LSH (16 bands × 4 rows): candidate pairs
    * are docs sharing any band bucket; est_jaccard = matching
    * signature positions / 64. P(candidate | J) = 1-(1-J⁴)¹⁶ — ≥0.9998
    * at J=0.8, ~0.04 at J=0.2. The shuffle is on (band, bucket) keys;
    * signature computation is per-row scan work. Rows-only oracle
    * (property-tested against exact Jaccard in DedupSpec). */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val coeffs = H.minhashCoeffs(64)
    // text → signature is fully native codegen (ShingleHashes →
    // MinHashSig). Docs with < 3 tokens (guarded by a codegen'd
    // regexp_count, no HOF, no shingle recompute) are dropped before
    // banding — their all-MaxValue signatures would otherwise bucket
    // together as spurious est_j = 1 candidates.
    val d = Tables(spark, dir).documents
      .filter(regexp_count(col("text"), lit("\\S+")) >= 3)
      .select(col("doc_id"),
        H.minhashSignatureNative(col("text"), 3, coeffs).as("sig"))
    val bands = d.select(col("doc_id"), col("sig"),
      posexplode(H.lshBandKeys(col("sig"), nBands = 16, rowsPerBand = 4))
        .as(Seq("band", "key")))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      // est_j is computed once per SHARED band before the distinct, so
      // a pair colliding in k bands pays k 64-element loops. Bounded
      // by 16× and measured cheaper than the dedup-then-rejoin shape
      // (distinct on ids, then a second join back to signatures) the
      // alternative would cost at this k — deliberate, don't "fix".
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        H.sigSimilarity(col("a.sig"), col("b.sig")).as("est_j"))
      .distinct()
      .filter(col("est_j") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("est_j"), 4).as("est_j"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Window width (tokens) of the repeated-substring probe, and the
    * minimum maximal-span length reported. k=8 makes accidental
    * repeats vanish (even a 30-word vocabulary has 30⁸ ≈ 6.6e11
    * 8-grams) while any real copied passage of ≥ MinSpan tokens is a
    * run of ≥ MinSpan−k+1 repeated 8-grams. Single-sourced into the
    * DuckDB oracle. */
  val SubstrK = 8
  val SubstrMinSpan = 15

  /** C9: exact repeated-substring spans — the "dedup training data at
    * the substring level" operator (cf. Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": exact duplicated
    * passages, not whole-doc near-dups, are what LLM corpora mostly
    * contain). Reports every maximal run of ≥ [[SubstrMinSpan]] tokens
    * whose [[SubstrK]]-gram windows ALL occur ≥ 2 times in the corpus
    * (across docs or within one).
    *
    * Spark-first shape — linear, never pairwise: tokenize via
    * posexplode, form k-grams with k−1 codegen'd `lead` windows (one
    * exchange on doc_id), find repeated k-grams with a partial-agg
    * groupBy + inner equi-join back, then merge consecutive repeated
    * positions per doc into maximal spans with the gaps-and-islands
    * rewrite (pos − row_number). Total shuffled volume is O(total
    * tokens) rows — no self-join, no candidate pairs, so a hot
    * boilerplate passage costs its token count, not its df².
    *
    * Deliberately NOT the shingle index's df-window idiom: a window
    * partitioned by the k-gram key cannot split a hot key (and unlike
    * the shingle index there is no df cut bounding it), while the
    * partial agg map-side-combines a hot k-gram to one row per
    * partition and AQE can skew-split the probe side of the join. At
    * 100 TB the k-gram shuffle key would additionally be
    * xxhash64-narrowed (collision-insensitive for counting ≥ 2 up to
    * 64-bit collision odds); here the key stays the literal k-gram so
    * the DuckDB oracle is exact. */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = SubstrK
    // Positions are assigned AFTER dropping empty split artifacts
    // (leading whitespace makes Spark's split emit a "" head token),
    // mirroring the oracle's list_filter — both engines number the
    // same token stream.
    val byDocRaw = Window.partitionBy(col("doc_id")).orderBy(col("p0"))
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"),
        posexplode(split(col("text"), "\\s+")).as(Seq("p0", "tok")))
      .filter(length(col("tok")) > 0)
      .withColumn("pos", row_number().over(byDocRaw) - 1)
      .select(col("doc_id"), col("pos"), col("tok"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = toks
      .withColumn("g", concat_ws(" ",
        col("tok") +: (1 until k).map(i => lead(col("tok"), i).over(byDoc)): _*))
      // the last k-1 positions of a doc have no full k-gram (window
      // exprs can't sit in a WHERE — materialize the probe column)
      .withColumn("full", lead(col("tok"), k - 1).over(byDoc).isNotNull)
      .filter(col("full"))
      .select(col("doc_id"), col("pos"), col("g"))
      // referenced twice below (aggregate + join probe): persist so the
      // tokenize + k-1-lead pipeline runs once, not per reference
      // (Curate.survivors pattern — CacheManager dedups, no unpersist)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // repeated-key set first (HAVING shrinks it to actual repeats), so
    // the join both filters and stays small on the build side
    val repKeys = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("g"))
    val repeated = grams.join(repKeys, "g")
    repeated
      .withColumn("grp", col("pos") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("start_pos"),
        (max(col("pos")) + lit(k - 1)).as("end_pos"))
      .withColumn("n_tokens", col("end_pos") - col("start_pos") + 1)
      .filter(col("n_tokens") >= SubstrMinSpan)
      .select(col("doc_id"), col("start_pos").cast("int").as("start_pos"),
        col("end_pos").cast("int").as("end_pos"),
        col("n_tokens").cast("int").as("n_tokens"))
      .orderBy(col("doc_id"), col("start_pos"))
  }

  /** C4: SimHash hamming-≤3 near-dup pairs. The simhash itself is a
    * native codegen expression ([[graft.functions.SimHash64]]); the
    * candidate join uses the 4×16-bit chunk pigeonhole (hamming ≤ 3 →
    * at least one chunk equal), then exact `bit_count(xor)` verify.
    * Rows-only oracle (property-tested in DedupSpec).
    *
    * SCALE ROUTE: the pigeonhole colludes candidate pairs at ~n²/2¹⁶
    * regardless of similarity — measured 13.1× time for 10× data at
    * sf1 (BASELINE.md), the one superlinear dedup construction. At
    * corpus scale route hamming-style near-dup through
    * [[dedupMinhashLsh]]'s banded buckets instead (linear growth,
    * 7.7 s at sf1); this operator remains the exact-hamming reference
    * and the property anchor for stream_neardup. SURVEY §4 records
    * the same routing. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
      .select(col("doc_id"), H.simhash(col("text")).as("sh"))
    val chunks = d.select(col("doc_id"), col("sh"),
      posexplode(H.simhashChunks(col("sh"))).as(Seq("chunk", "key")))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C6: near-dup *clusters* from the C2 pair graph — connected
    * components by alternating large-star/small-star edge rewrites
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14), the step a real dedup pipeline runs after pair
    * detection ("keep one representative per duplicate cluster").
    * Convergence is O(log diameter) rounds — a 10⁶-hop pathological
    * duplicate chain converges in ~20 rounds, where plain min-label
    * propagation would need 10⁶. Every round is a plain shuffle
    * join + groupBy on node ids, so the iteration distributes like
    * any other query. The driver-side loop only checks a convergence
    * probe per round (one aggregate — no data is collected). Output:
    * (doc_id, rep_doc = min doc_id in component, n_members). DuckDB
    * oracle: recursive CTE over the same pairs. */
  def dedupComponents(spark: SparkSession, dir: String): DataFrame = {
    val pairs = ngramPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .persist()
    val labels = componentLabels(pairs)
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
    val out = labels.join(sizes, "lbl")
      .select(col("node").as("doc_id"), col("lbl").as("rep_doc"),
        col("n_members"))
      .orderBy(col("doc_id"))
    pairs.unpersist()
    out
  }

  /** C17 (round 13): dedup yield report — the cluster-SIZE
    * distribution of the C6 near-dup graph plus the corpus-shrink
    * numbers a curation owner reads before running the drop: per
    * cluster size s — how many clusters, how many docs they hold,
    * how many docs dedup would REMOVE ((s−1) per cluster under
    * keep-one-rep), and the corpus share; the size-1 row counts the
    * unclustered remainder. The "what does dedup buy us / is one
    * mega-cluster eating the corpus" audit that decides whether the
    * pair threshold is tuned right — the same read SemDeDup-style
    * pipelines publish as their dedup table.
    *
    * Scale shape: the C2 pair graph + C6 star contraction produce
    * labels for CLUSTERED docs only; everything after is aggregates
    * over the label frame (cluster-count-sized, then size-histogram-
    * sized — tiny), one corpus count, and a broadcast of the 1-row
    * total. No new shuffle shape beyond the audited C6 substrate. */
  def dedupStats(spark: SparkSession, dir: String): DataFrame = {
    val pairs = ngramPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .persist()
    val labels = componentLabels(pairs)
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
      .persist() // feeds the histogram AND the clustered total
    val nTotal = Tables(spark, dir).documents.agg(count(lit(1)).as("n_total"))
    val nClustered = sizes.agg(
      coalesce(sum(col("n_members")), lit(0L)).as("n_clustered"))
    val hist = sizes.groupBy(col("n_members"))
      .agg(count(lit(1)).as("n_clusters"))
    val singleton = nTotal.crossJoin(nClustered)
      .select(lit(1L).as("n_members"),
        (col("n_total") - col("n_clustered")).as("n_clusters"))
    val out = hist.unionAll(singleton)
      .filter(col("n_clusters") > 0)
      .crossJoin(broadcast(nTotal))
      .select(col("n_members"), col("n_clusters"),
        (col("n_members") * col("n_clusters")).as("n_docs"),
        ((col("n_members") - lit(1L)) * col("n_clusters")).as("n_removable"),
        round((col("n_members") * col("n_clusters")).cast("double") /
          col("n_total").cast("double"), 4).as("pct_of_corpus"))
      .orderBy(col("n_members"))
    pairs.unpersist()
    out
  }

  /** C11 (round 10): quality-aware cluster representative selection —
    * for each C6 near-dup component, elect the HIGHEST-quality member
    * (total order: quality DESC, doc_id ASC) as the cluster's
    * representative, instead of C6's min-doc_id convention. This is
    * the refinement real curation pipelines run: among near-identical
    * documents, keep the best-scoring copy, not the one that happened
    * to arrive first. Output: one row per clustered doc —
    * (doc_id, rep_doc = elected best, quality, is_rep).
    *
    * Quality is the E2 composite ([[graft.functions.TextFunctions
    * .qualityScore]]) — the same single-sourced expression tree as
    * text_quality and the curate chain, so the election and the
    * quality report can never disagree; the ranking compares
    * UNROUNDED bit-identical doubles on both engines (ties between
    * exact-duplicate members break on doc_id).
    *
    * Scale shape: the C2 pair graph + C6 O(log d) star-contraction
    * produce (node, lbl) for CLUSTERED docs only — a small fraction
    * of the corpus — so the quality join and the per-cluster
    * row_number window run over cluster members, not the corpus;
    * cluster sizes are bounded by the dedup phenomenon itself and
    * the window partitions by cluster id (AQE splits a pathological
    * mega-cluster's skew). DuckDB oracle: recursive-CTE components ×
    * the shared quality CTE, full hash gate. */
  def dedupBestRep(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => T}
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir).documents
    val pairs = ngramPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .persist()
    val labels = componentLabels(pairs)
    val nTok = T.wsTokenCount(col("text"))
    val stopRatio = T.tokenCountIn(col("text"), T.EnStopwords) / nTok
    val punctRatio = T.punctCount(col("text")) / length(col("text"))
    val q = d.select(col("doc_id"),
      T.qualityScore(nTok, stopRatio, punctRatio).as("quality"))
    val scored = labels.join(q, labels("node") === q("doc_id"))
      .select(col("node"), col("lbl"), col("quality"))
    val w = Window.partitionBy("lbl")
      .orderBy(col("quality").desc, col("node"))
    val ranked = scored.withColumn("rn", row_number().over(w))
    val best = ranked.filter(col("rn") === 1)
      .select(col("lbl"), col("node").as("rep_doc"))
    val out = ranked.join(best, "lbl")
      .select(col("node").as("doc_id"), col("rep_doc"),
        round(col("quality"), 4).as("quality"),
        (col("node") === col("rep_doc")).as("is_rep"))
      .orderBy(col("doc_id"))
    pairs.unpersist()
    out
  }

  /** Connected-component labels over a (doc_a, doc_b) pair frame →
    * one (node, lbl) row per node, lbl = min doc_id reachable.
    * Callers should persist `pairs` first — the node set and initial
    * edge set both scan it. */
  private[operators] def componentLabels(pairs: DataFrame): DataFrame =
    componentLabelsWithRounds(pairs)._1

  /** Large-star/small-star alternation (Kiveris et al., SoCC'14,
    * Alg. 2 "Two-Phase"), returning (labels, rounds) so specs can
    * assert the O(log d) round bound. Edges are rewritten in place:
    *  - large-star: every node's neighbors larger than itself are
    *    re-attached to the min of its closed neighborhood —
    *    `(v, m(u)) for v ∈ Γ(u), v > u` — halving chain lengths;
    *  - small-star: every node's smaller neighbors (plus itself) are
    *    re-attached to its min smaller neighbor — merging the local
    *    minima large-star leaves behind.
    * Both emit exactly one edge per input edge (plus one per node for
    * small-star, cancelled by the dropped self-loop), so the edge set
    * never grows; the fixpoint is a forest of stars centered at each
    * component's min node, from which labels are read directly.
    *
    * Convergence probe: every emission rewrites an endpoint to a
    * value ≤ the old one, so sum(u + v) over the (distinct) edge set
    * is non-increasing, and it is strictly decreasing unless the
    * phase was a no-op (equality forces every emission to equal its
    * source edge and dedup to merge nothing). A round where neither
    * phase moved the sum is therefore exactly the fixpoint. The sum
    * is taken in decimal(38,0) — at 10¹⁰ edges × 10⁹-scale ids a long
    * would overflow.
    *
    * Each ROUND's output (the small-star frame) is eagerly
    * checkpointed, which both materializes every partition before
    * the previous round is freed (the take(1)-probe recompute trap —
    * see CLAUDE.md) and truncates the logical plan: each star phase
    * references its input 2–3 times, so without per-round truncation
    * the lineage grows ~4^rounds and plan analysis dies long before
    * the data does (hit in DedupSpec's 200-hop chain at round ~7;
    * plain persist does NOT truncate lineage for analysis). The
    * mid-round large-star frame is only persisted — see the loop
    * comment. Reliable `checkpoint` is used when the
    * session has a checkpoint dir (the cluster configuration —
    * survives executor loss); `localCheckpoint` otherwise. Old round
    * RDDs are freed explicitly on every exit, success or failure. */
  /** Cap on the driver union-find fast path of
    * [[componentLabelsWithRounds]] (pair ROWS collected): the kcore
    * driver-tail class of bounded driver work — a near-dup pair graph
    * is the corpus's DUPLICATE set, tiny relative to the corpus (256
    * pairs at sf0.1, ~2.5k at sf1), yet the distributed star loop's
    * per-round checkpoints + probes cost a fixed ~2.2 s of job floor
    * at ANY size (measured, ComponentsProbe). Over-cap graphs fall
    * back to the unchanged star rounds, so at adversarial scale the
    * distributed path — the O(log d) algorithm with all its
    * convergence discipline — is what runs.
    *
    * r16 (VERDICT r15 item 9): sized off the DRIVER HEAP instead of a
    * fixed 2M constant — see [[componentsTailCapForHeap]]. */
  def ComponentsTailMaxEdges: Long =
    componentsTailCapForHeap(Runtime.getRuntime.maxMemory())

  /** Heap-derived fast-path cap: budget ~5% of the driver's max heap
    * at a conservative 96 bytes per collected pair (a specialized
    * Tuple2[Long,Long] is ~32 bytes; the union-find's boxed
    * HashMap entries cost ~64 bytes per distinct node, and nodes ≤
    * 2·pairs). Floor 100k (any heap that can run Spark affords it),
    * cap 16M (past that the distributed star rounds' fixed job floor
    * is amortized anyway). 8 GiB heap → ~4.5M pairs; the old fixed
    * 2M corresponds to ~3.6 GiB. */
  private[operators] def componentsTailCapForHeap(maxHeap: Long): Long =
    math.max(100000L, math.min(16000000L, maxHeap / 20 / 96))

  private[operators] def componentLabelsWithRounds(
      pairs: DataFrame): (DataFrame, Int) =
    componentLabelsWithRounds(pairs, ComponentsTailMaxEdges)

  /** `tailMaxEdges` override is the test seam (DedupSpec forces the
    * distributed path with 0 to pin the O(log d) round bound and the
    * two-path equality). */
  private[operators] def componentLabelsWithRounds(
      pairs: DataFrame, tailMaxEdges: Long): (DataFrame, Int) = {
    // FAST PATH (r15): count first (a full action on the
    // caller-persisted pairs frame — never collect-then-check), then
    // run exact min-label union-find on the driver and emit the same
    // (node, lbl) rows the star fixpoint converges to. Identical
    // output by construction: union-by-min-root + path compression
    // labels every node with the least id reachable from it — the
    // definition the star rounds compute distributively.
    val nPairs = pairs.count()
    if (nPairs <= tailMaxEdges) {
      // collect as specialized (Long, Long) tuples, not generic Rows —
      // ~32 bytes per pair instead of ~100+ of boxed Row machinery
      // (ADVICE r15); the heap budget behind the cap is documented at
      // [[componentsTailCapForHeap]].
      import pairs.sparkSession.implicits._
      val rows = pairs
        .select(col(pairs.columns(0)).cast("long"),
          col(pairs.columns(1)).cast("long"))
        .as[(Long, Long)].collect()
      val parent = new java.util.HashMap[java.lang.Long, java.lang.Long](
        rows.length * 2)
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.get(x)
        if (p == null) { parent.put(x, x); return x }
        while (p.longValue() != x) { x = p.longValue(); p = parent.get(x) }
        // path-compress the walked chain
        var y = x0
        while (y != x) {
          val nxt = parent.get(y).longValue()
          parent.put(y, x)
          y = nxt
        }
        x
      }
      var i = 0
      while (i < rows.length) {
        val a = rows(i)._1
        val b = rows(i)._2
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
        i += 1
      }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](
        parent.size())
      val it = parent.keySet().iterator()
      while (it.hasNext) {
        val n = it.next().longValue()
        out += ((n, find(n)))
      }
      val spark = pairs.sparkSession
      val nSlices = math.max(1, out.length / 500000)
      val labels = spark.createDataFrame(
        spark.sparkContext.parallelize(out.toSeq, nSlices))
        .toDF("node", "lbl")
        .persist()
      labels.count() // materialize before the caller unpersists pairs
      return (labels, 0)
    }
    val reliable =
      pairs.sparkSession.sparkContext.getCheckpointDir.isDefined
    // Checkpointed round frames are tracked so ANY exit — success,
    // the non-convergence throw, or a failure mid-round — frees their
    // cached RDD blocks (repeated failing calls must not accumulate).
    val live = scala.collection.mutable.Set.empty[DataFrame]
    def snap(df: DataFrame): DataFrame = {
      val out = if (reliable) df.checkpoint() else df.localCheckpoint()
      live += out
      out
    }
    // deleteFiles: reliable checkpoints write files the ContextCleaner
    // does NOT delete by default (cleanCheckpoints=false) — a
    // long-lived driver would leak one dir per round. Mid-loop rounds
    // are dead once replaced, so their files go eagerly; the finally
    // block must NOT delete files on the success path — the returned
    // labels frame's lineage reads the final edges/nodes checkpoints
    // if its cache is ever evicted.
    def free(df: DataFrame, deleteFiles: Boolean): Unit = {
      live -= df
      df.queryExecution.logical.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach { rdd =>
        rdd.unpersist(blocking = false)
        if (deleteFiles) rdd.getCheckpointFile.foreach { p =>
          try {
            val path = new org.apache.hadoop.fs.Path(p)
            path.getFileSystem(
              pairs.sparkSession.sparkContext.hadoopConfiguration)
              .delete(path, true)
            ()
          } catch { case _: Throwable => () } // best-effort cleanup
        }
      }
      // (no match → the ContextCleaner reclaims it once unreferenced)
    }
    // Canonical greater→lesser orientation; both star phases preserve
    // it (every emission (v, m) has m strictly below v after the
    // self-loop filter).
    var edges = snap(pairs
      .filter(col("doc_a") =!= col("doc_b"))
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .distinct())
    val nodes = snap(pairs.select(col("doc_a").as("node"))
      .union(pairs.select(col("doc_b")))
      .distinct())
    def probe(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("u").cast("decimal(38,0)") + col("v")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")))
        .head().getDecimal(0)
    var converged = false
    var succeeded = false
    var iter = 0
    val maxIter = 30 // O(log d): 30 rounds covers any physical graph
    try {
      var sumPrev = probe(edges)
      while (!converged && iter < maxIter) {
        // large-star over the symmetric neighborhood view
        val sym = edges.union(edges.select(col("v"), col("u")))
          .toDF("u", "v")
        val mins = sym.groupBy(col("u"))
          .agg(min(col("v")).as("mn"))
          .select(col("u").as("c"), least(col("mn"), col("u")).as("m"))
        // The large phase is NOT checkpointed or probed (round-11):
        // by monotonicity sumPrev ≥ sumLarge ≥ sumSmall, so
        // sumSmall == sumPrev already proves BOTH phases were no-ops
        // — probing the mid-round frame bought nothing, and a plain
        // persist (materialized by the small phase's checkpoint job,
        // which reads `large` twice) replaces the second checkpoint
        // write. 4 jobs/round → 2 and one O(E) block-store write per
        // round removed. A/B at sf0.1 measured NO latency change
        // (3.03 → 3.01 s median-of-5 — the star shuffles dominate at
        // toy scale); kept for the halved job count and removed
        // per-round edge-frame write, which are the driver/IO terms
        // that grow with cluster scale. Lineage stays bounded: each
        // round still STARTS from a checkpointed frame, so the
        // analysis-time blowup the per-round truncation exists for
        // (~4^rounds) cannot re-accumulate — round-local depth is
        // two phases.
        val large = sym.filter(col("v") > col("u"))
          .join(mins, col("u") === col("c"))
          .select(col("v").as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // small-star: edges are already greater→lesser oriented, so
        // each node's smaller neighborhood is exactly its `v` rows
        val mins2 = large.groupBy(col("u")).agg(min(col("v")).as("m"))
        val small = snap(large.join(mins2, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .union(mins2.select(col("u"), col("m")))
          .filter(col("u") =!= col("v"))
          .distinct())
        val sumSmall = probe(small)
        large.unpersist(blocking = false)
        free(edges, deleteFiles = true) // dead round: nothing reads it
        edges = small
        converged = sumSmall.compareTo(sumPrev) == 0
        sumPrev = sumSmall
        iter += 1
      }
      // A silent non-converged return would emit labels that are not
      // the component min — wrong output that still looks plausible.
      // Fail loudly instead (unreachable for graphs of diameter
      // < 2^maxIter; the guard survives as a defect detector).
      if (!converged) throw new IllegalStateException(
        s"component labels did not converge within $maxIter star rounds")
      // Fixpoint = stars: every non-center node appears exactly once
      // as `u` with its component min as `v`; centers (and any node
      // whose edges all collapsed) label themselves.
      val leaf = edges.select(col("u").as("node"), col("v").as("lbl"))
      val labels = nodes.join(leaf, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("lbl"), col("node")).as("lbl"))
        .persist()
      labels.count() // materialize before freeing edges/nodes below
      succeeded = true
      (labels, iter)
    } finally {
      // On success the final edges/nodes checkpoints stay on disk:
      // the returned labels frame's lineage reads them if its cache
      // is evicted (ContextCleaner reclaims the files once the RDDs
      // are unreferenced). On failure nothing references them — files
      // go now, so repeated failing calls cannot leak disk.
      live.toSeq.foreach(free(_, deleteFiles = !succeeded))
    }
  }

  /** Number of blocks in the embed-cosine block-pair join. Each task
    * holds ~2n/B vectors and the shuffle carries ~(B+1)·n rows, so B
    * dials task memory and parallelism against shuffle volume; size
    * it near sqrt(desired tasks) on a cluster (B(B+1)/2 tasks). */
  val CosineBlocks = 8

  /** C5: embedding-cosine ≥ 0.4 near-dup pairs — exact, via a
    * block-pair equi-join. Vectors are hashed into [[CosineBlocks]]
    * blocks; every row is replicated to the (block_i ≤ block_j) pair
    * keys it participates in, and the join is an ordinary shuffle
    * hash/merge join on the pair key — per-pair work lands in
    * B(B+1)/2 equal-size tasks of bounded memory, with NO
    * BroadcastNestedLoopJoin and no full-table broadcast (DedupSpec
    * asserts the plan). The comparison count is still exactly n²/2:
    * τ = 0.4 sits on a continuum in this data (qualifying pairs at
    * cos 0.4005 vs non-qualifying at 0.3999), so any banded-LSH
    * candidate cut would drop boundary pairs and break the exact
    * oracle — probabilistic near-dup at scale is [[Similarity.annLsh]]
    * (hyperplane bands + rerank); this operator is the exact form,
    * organized so a cluster can actually execute it.
    *
    * Cosine is a strict sequential fold (see VectorFunctions) so the
    * DuckDB oracle agrees bit-for-bit and the τ filter is stable. */
  def dedupEmbedCosine(spark: SparkSession, dir: String): DataFrame = {
    val bCol = pmod(col("vec_id"), lit(CosineBlocks.toLong))
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), V.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", V.norm(col("v")))
      .withColumn("blk", bCol)
    // Pair key (k1, k2), k1 <= k2: the left side carries block k1's
    // rows, the right side block k2's. A cross-block pair meets in
    // exactly one key; same-block pairs meet in the diagonal key,
    // deduped by vec_id order.
    val blocks = (0 until CosineBlocks).map(b => lit(b.toLong))
    val left = e.withColumn("k2", explode(array(blocks: _*)))
      .filter(col("blk") <= col("k2"))
      .withColumnRenamed("blk", "k1")
    val right = e.withColumn("k1", explode(array(blocks: _*)))
      .filter(col("k1") <= col("blk"))
      .withColumnRenamed("blk", "k2")
    left.as("a")
      .join(right.as("b"),
        col("a.k1") === col("b.k1") && col("a.k2") === col("b.k2") &&
          (col("a.k1") =!= col("a.k2") || col("a.vec_id") < col("b.vec_id")))
      .withColumn("dot", V.dot(col("a.v"), col("b.v")))
      .withColumn("cos",
        V.cosineWithNorms(col("dot"), col("a.nrm"), col("b.nrm")))
      .filter(col("cos") >= 0.4)
      .select(least(col("a.vec_id"), col("b.vec_id")).as("id_a"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("id_b"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Cosine threshold for [[dedupSemantic]] — the same continuum
    * caveat as C5's τ applies; the compare is bit-exact cross-engine
    * (strict sequential folds), so the boundary cannot flake. */
  val SemTau = 0.4

  /** FLOOR on [[dedupSemantic]]'s IVF cell count (single-sourced into
    * the oracle) — the actual count scales as max(SemLists, ⌊√n⌋)
    * via [[Similarity.knnGraphNLists]], the bucketed-dial discipline
    * (CLAUDE.md): a fixed cell count leaves pair work quadratic. */
  val SemLists = 16

  /** Probe width for [[dedupSemantic]] (single-sourced into the
    * oracle): candidate pairs come from every vector's SemProbe
    * best-cosine cells, not just its argmax cell, so two near-dups
    * straddling a cell boundary are still compared whenever ANY of
    * their top-probed cells coincide. Pair work stays
    * Θ(p²·n²/nLists) = Θ(p²·n^1.5) at the √n cell count. */
  val SemProbe = 4

  /** C10: SemDeDup-style semantic dedup — cluster the embedding space
    * with the deterministic IVF coarse quantizer ([[Similarity
    * .ivfBase]] — the same Knuth-hash seed / first-max rules as
    * ann_ivf and knn_graph_ivf, so the cell structure cannot drift
    * between operators), then compare MULTI-PROBED candidate pairs:
    * each vector probes its [[SemProbe]] best-cosine cells (the
    * knn_graph_ivf probe tie rule, d DESC then cell DESC), a
    * candidate pair is any (lo < hi) sharing at least one probed
    * cell (deduped — a pair can meet in up to p cells), and a vector
    * is dropped iff a smaller-id candidate sits at cosine ≥
    * [[SemTau]] (rep = the smallest such neighbor — a local rule;
    * transitive closure across cells is [[dedupComponents]]' job,
    * and C5 is the exhaustive-pair exact form this approximates).
    * The argmax-only (p=1) form missed every near-dup pair whose
    * endpoints land in different cells with no shared member;
    * multi-probe closes most of that gap deterministically
    * (SemanticDedupSpec pins that cross-cell misses strictly shrink
    * vs p=1).
    *
    * This is the 100 TB shape of embedding dedup: candidate
    * generation is an equi-join on the probed cell id, so per-pair
    * work is p²·Σ|cell|²/... ≈ p²·n²/nLists — and nLists SCALES as
    * max([[SemLists]], ⌊√n⌋) in the query (the knn_graph_ivf dial:
    * ⌊√n⌋ is bit-identical cross-engine because IEEE sqrt is
    * correctly rounded), so total work is Θ(p²·n^1.5), never
    * quadratic. The assignment+probes frame is persisted once and
    * feeds both join sides AND the output spine from the cache (one
    * scan + one centroid-dot pass total — Catalyst does not dedup
    * repeated subtrees; SemanticDedupSpec walks the plan). The
    * probed-cell cut is deterministic — unlike banded-LSH candidate
    * cuts — which is what lets a *semantic* (approximate-by-
    * construction) dedup carry a FULL hash gate. */
  def dedupSemantic(spark: SparkSession, dir: String): DataFrame =
    dedupSemanticProbed(spark, dir, SemProbe)

  /** The probed assignment frame `(vec_id, v, nrm, list_id, probes)`
    * at the scaled cell count — the quantizer+probe stage of
    * [[dedupSemanticProbed]], exposed so SemanticDedupSpec can
    * verify candidate reachability against the very frame the
    * operator joins on. */
  private[operators] def semanticAssigned(spark: SparkSession,
      dir: String, probe: Int): DataFrame = {
    val nLists = Similarity.knnGraphNLists(
      Tables(spark, dir).embeddings.count())
    Similarity.ivfDots(spark, dir, nLists)
      .withColumn("list_id", expr("array_position(dots, array_max(dots))"))
      .withColumn("probes", slice(reverse(array_sort(
        zip_with(col("dots"),
          sequence(lit(1), lit(nLists)).cast("array<double>"),
          (d, i) => struct(d.as("d"), i.as("i"))))), 1, probe))
      .select(col("vec_id"), col("v"), col("nrm"), col("list_id"),
        expr("transform(probes, p -> cast(p.i as long))").as("probes"))
  }

  /** [[dedupSemantic]] at an explicit probe width (test seam — the
    * p=1 form is the argmax-only baseline SemanticDedupSpec measures
    * the multi-probe shrink against). */
  private[operators] def dedupSemanticProbed(spark: SparkSession,
      dir: String, probe: Int): DataFrame = {
    val assigned = semanticAssigned(spark, dir, probe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate ids first, vectors re-joined after the DISTINCT — the
    // dedup shuffles 2-long rows, not embedding payloads
    val probed = assigned
      .select(col("vec_id"), explode(col("probes")).as("cell"))
    val cand = probed.as("a")
      .join(probed.as("b"), col("a.cell") === col("b.cell") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("lo"), col("b.vec_id").as("hi"))
      .distinct()
    val vecs = assigned.select(col("vec_id"), col("v"), col("nrm"))
    val pairs = cand
      .join(vecs.select(col("vec_id").as("lo"), col("v").as("lv"),
        col("nrm").as("lnrm")), Seq("lo"))
      .join(vecs.select(col("vec_id").as("hi"), col("v").as("rv"),
        col("nrm").as("rnrm")), Seq("hi"))
      .withColumn("cos", V.cosineWithNorms(V.dot(col("lv"), col("rv")),
        col("lnrm"), col("rnrm")))
      .filter(col("cos") >= SemTau)
    val drops = pairs.groupBy(col("hi").as("vec_id"))
      .agg(min(col("lo")).as("rep_id"),
        count(lit(1)).cast("int").as("n_smaller_near"))
    assigned.select(col("vec_id"), col("list_id"))
      .join(drops, Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id"),
        col("rep_id").isNull.as("kept"),
        coalesce(col("rep_id"), col("vec_id")).as("rep_id"),
        coalesce(col("n_smaller_near"), lit(0)).as("n_smaller_near"))
      .orderBy(col("vec_id"))
  }
}
