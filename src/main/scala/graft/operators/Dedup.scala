package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{HashFunctions => H, VectorFunctions => V}

/** SURVEY §2C — deduplication over `documents` / `embeddings`.
  *
  * Scale design (100 TB): nothing here is O(n²) on the full corpus.
  * Candidate generation always goes through an equi-join on a derived
  * key — md5 (exact), shared shingle (inverted index), LSH band
  * bucket (minhash), 16-bit chunk (simhash pigeonhole) — which Spark
  * executes as an ordinary shuffle join; AQE splits skewed buckets.
  * Only `dedupEmbedCosine` does exact all-pairs, as the correctness
  * baseline for the LSH path (see
  * [[graft.operators.Similarity.annLsh]] for the scale variant).
  */
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

  /** C2: 3-gram shingle Jaccard >= 0.5 pair detection via an inverted
    * shingle index: explode distinct shingles, self-join on the
    * shingle (shuffle on shingle keys, not doc pairs), count
    * intersections, then Jaccard from |A|,|B|,|A∩B|. The synthetic
    * corpus has planted near-dups at J >= 0.9 and background pairs at
    * J <= 0.07, so τ=0.5 is far from any boundary.
    *
    * At 100 TB, add a document-frequency cut on shingles (drop
    * shingles present in > df_max docs) before the self-join — a
    * stop-shingle in every doc would otherwise square the index. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
      .filter(size(H.tokens(col("text"))) >= 3)
    val sh = d.select(col("doc_id"),
      explode(H.wordShingles(col("text"), 3)).as("s"))
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
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
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
    val d = Tables(spark, dir).documents
      .filter(size(H.tokens(col("text"))) >= 3)
      .select(col("doc_id"),
        H.minhashSignature(H.wordShingles(col("text"), 3), coeffs).as("sig"))
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

  /** C5: embedding-cosine ≥ 0.4 near-dup pairs, exact all-pairs — the
    * correctness baseline at test scale; the 100 TB path bucketizes
    * with hyperplane LSH first (annLsh) so the join is on band keys.
    * Cosine is a strict sequential fold (see VectorFunctions) so the
    * DuckDB oracle agrees bit-for-bit and the τ filter is stable. */
  def dedupEmbedCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), V.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", V.norm(col("v")))
    e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", V.dot(col("a.v"), col("b.v")))
      .withColumn("cos",
        V.cosineWithNorms(col("dot"), col("a.nrm"), col("b.nrm")))
      .filter(col("cos") >= 0.4)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
