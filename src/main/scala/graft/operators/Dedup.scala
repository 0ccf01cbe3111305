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
  private[operators] def ngramPairsOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = d.select(col("doc_id"),
        explode(H.shingleHashes(col("text"), 3)).as("s"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= NgramDfMax)
      .select(col("doc_id"), col("s"))
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

  /** C2: 3-gram shingle Jaccard >= 0.5 pair detection (see
    * [[ngramPairs]] for the index structure and df cut). */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
      .orderBy(col("doc_a"), col("doc_b"))

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
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        H.sigSimilarity(col("a.sig"), col("b.sig")).as("est_j"))
      .distinct()
      .filter(col("est_j") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("est_j"), 4).as("est_j"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C4: SimHash hamming-≤3 near-dup pairs. The simhash itself is a
    * native codegen expression ([[graft.functions.SimHash64]]); the
    * candidate join uses the 4×16-bit chunk pigeonhole (hamming ≤ 3 →
    * at least one chunk equal), then exact `bit_count(xor)` verify.
    * Rows-only oracle (property-tested in DedupSpec). */
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
    * components by iterative min-label propagation, the step a real
    * dedup pipeline runs after pair detection ("keep one
    * representative per duplicate cluster"). Each round every node
    * takes the min label among itself and its neighbors; convergence
    * is O(component diameter) rounds (dup clusters are shallow — the
    * cap is a guard, not a tuning knob). Every round is a plain
    * shuffle join + groupBy on node ids, so the iteration distributes
    * like any other query; at billions of edges the same loop body
    * with the large-star/small-star transforms (Kiveris et al.,
    * "Connected Components in MapReduce", SoCC'14) bounds the round
    * count for high-diameter graphs. The driver-side loop only
    * checks a converged flag per round (one count — no data is
    * collected). Output: (doc_id, rep_doc = min doc_id in component,
    * n_members). DuckDB oracle: recursive CTE over the same pairs. */
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

  /** Min-label propagation over a (doc_a, doc_b) pair frame → one
    * (node, lbl) row per node, lbl = min doc_id reachable. The loop
    * body is plain shuffle joins; the returned frame is fully
    * materialized in the cache (see the probe note below). Callers
    * should persist `pairs` first — every round references it. */
  private[operators] def componentLabels(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .persist()
    var converged = false
    var iter = 0
    val maxIter = 20
    // Convergence probe: labels only ever decrease, so the fixpoint
    // is reached exactly when sum(lbl) stops falling — one cheap
    // global aggregate per round instead of a change-detection join.
    // The full-scan agg also matters for a second reason: it
    // materializes EVERY partition of `next` into the cache (a
    // take(1)-style probe leaves partitions uncached, and once the
    // previous labels are unpersisted their recompute chains the
    // whole lineage back through the pair pipeline, once per round).
    var lblSum = Option.empty[Long]
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels, col("dst") === col("node"))
        .groupBy(col("src"))
        .agg(min(col("lbl")).as("nbr_lbl"))
      val next = labels
        .join(nbrMin, col("node") === col("src"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
        .persist()
      val s = next.agg(coalesce(sum(col("lbl")), lit(0L))).head().getLong(0)
      converged = lblSum.contains(s)
      lblSum = Some(s)
      labels.unpersist()
      labels = next
      iter += 1
    }
    // A silent non-converged return would emit labels that are not the
    // component min — wrong output that still looks plausible. Fail
    // loudly instead; a corpus whose duplicate chains exceed maxIter
    // hops needs the cap raised (or the large-star/small-star form),
    // not a quietly wrong answer.
    if (!converged) throw new IllegalStateException(
      s"component labels did not converge within $maxIter rounds — " +
        "component diameter exceeds the cap")
    edges.unpersist()
    labels
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
}
