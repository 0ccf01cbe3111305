package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2C adjunct — train/eval contamination detection, the
  * benchmark-hygiene step of an LLM training pipeline: find training
  * documents that contain (≥ [[Tau]] of) an eval document's 3-gram
  * shingle set.
  *
  * Same inverted shingle-hash index as [[Dedup.ngramPairsOf]] (native
  * codegen ShingleHashes, 64-bit keys, corpus-wide df ≤
  * [[Dedup.NgramDfMax]] cut bounding hot posting lists), but the join
  * is eval×train (asymmetric) and the score is CONTAINMENT
  * |A∩B| / |A| with A = the eval doc's cut shingle set — an eval
  * passage quoted inside a much larger training doc still scores ~1
  * where symmetric Jaccard would vanish. At 100 TB the eval side is
  * tiny (benchmarks), so the shingle equi-join is effectively a
  * broadcast-shaped probe of the training index.
  */
object Decontaminate {

  // Shadows functions.round: DuckDB-exact binary rounding (OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  /** Containment threshold: fraction of the eval doc's shingles that
    * must appear in the training doc. */
  val Tau = 0.5

  /** The held-out "benchmark" slice of the corpus. */
  val EvalSource = "src0"

  /** Query entry: (eval_doc, train_doc, contain) pairs with
    * containment ≥ Tau. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminateOf(Tables(spark, dir).documents)

  /** The static ingest side of the G15 stream twin
    * (Streams.decontamStreamTransform): each eval doc's distinct cut
    * shingle hashes plus its cut-set size. The df cut here runs over
    * the EVAL slice ONLY — at ingest time the unbounded train
    * stream's document frequencies are unknowable, which is the
    * honest semantic difference from this batch operator's
    * corpus-wide cut (both are documented, separately-oracled
    * contracts). Benchmarks are tiny at any corpus scale, so this
    * frame broadcasts. */
  def evalIndexOf(evalDocs: DataFrame): DataFrame = {
    val sh = Dedup.shingleIndexOf(evalDocs)
    val n = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    sh.join(n, "doc_id")
      .select(col("doc_id").as("eval_doc"), col("s"), col("n"))
  }

  /** Core over any (doc_id, source, text) frame. */
  private[operators] def decontaminateOf(d: DataFrame): DataFrame = {
    // df cut counts over the WHOLE corpus (eval + train), mirroring
    // the oracle: a shingle hot in train is cut from eval's set too,
    // keeping |A| consistent between numerator and denominator.
    // Shared index with the C2/C6 pair chain (Dedup.shingleIndexOf).
    val sh = Dedup.shingleIndexOf(d, carry = Seq("source"))
    val evalSh = sh.filter(col("source") === EvalSource)
    val trainSh = sh.filter(col("source") =!= EvalSource)
    val nEval = evalSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = evalSh.as("a")
      .join(trainSh.as("b"), col("a.s") === col("b.s"))
      .groupBy(col("a.doc_id").as("eval_doc"),
               col("b.doc_id").as("train_doc"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(nEval, col("eval_doc") === nEval("doc_id"))
      .withColumn("contain", col("c").cast("double") / col("n"))
      .filter(col("contain") >= Tau)
      .select(col("eval_doc"), col("train_doc"),
        round(col("contain"), 4).as("contain"))
      .orderBy(col("eval_doc"), col("train_doc"))
  }

  /** The held-out benchmark embedding set for
    * [[decontaminateSemantic]]: a FIXED id prefix (10 vectors at any
    * scale — benchmarks don't grow with the corpus), the same
    * bounded-query-set convention as ann_bruteforce. */
  val EvalVecIds = 10L

  /** Cosine threshold above which a training vector counts as a
    * semantic leak of an eval vector (sized to the synthetic
    * embeddings' neighbor structure: ~40 flagged pairs per sf). */
  val SemTau = 0.3

  /** C12: SEMANTIC decontamination — the embedding-space axis of
    * benchmark hygiene beside this file's n-gram containment:
    * paraphrased or translated eval material shares no shingles but
    * sits next to the eval doc in embedding space, so the leak check
    * must also run on vectors (the practice GPT-4/Llama tech
    * reports describe as embedding-similarity decontamination).
    * Flags every (train, eval) pair with cosine ≥ [[SemTau]].
    *
    * Scale shape: the eval side is a FIXED-size broadcast (10 rows
    * at any corpus scale), so the scan is ONE pass over train
    * vectors with a k-bounded nested-loop probe — the
    * ann_bruteforce shape, in PlanContractSpec's bounded-BNLJ
    * class. Dots are strict sequential folds (native [[DotProductD]]
    * codegen — no interpreted HOF in the hot path); threshold
    * compares the unrounded double, divisor order (train·eval)
    * mirrored ⇒ full hash gate. */
  def decontaminateSemantic(spark: SparkSession, dir: String): DataFrame = {
    val V = graft.functions.VectorFunctions
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), V.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", V.norm(col("v")))
    val eval = e.filter(col("vec_id") < EvalVecIds)
      .select(col("vec_id").as("eval_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val train = e.filter(col("vec_id") >= EvalVecIds)
    val cos = V.cosineWithNorms(V.dot(col("v"), col("qv")),
      col("nrm"), col("qnrm"))
    train.join(broadcast(eval))
      .withColumn("cos", cos)
      .filter(col("cos") >= SemTau)
      .select(col("vec_id").as("train_id"), col("eval_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("train_id"), col("eval_id"))
  }
}
