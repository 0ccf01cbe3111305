package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2E adjunct — byte-pair-encoding tokenization (Sennrich et
  * al. '16): learn the top-K merge table from the corpus word
  * vocabulary, then apply it corpus-wide. This is the real
  * subword-tokenizer step behind text_tokens' whitespace counts and
  * pack_sequences' budgets — piece counts, not word counts, are what
  * a training run actually pays for. (Reference surface: JobX users
  * run vocabulary builds as wordcount map/reduce chains —
  * mr/handlers wordcount — and apply fixed token tables in map
  * steps; here train is one distributed vocabulary aggregate plus a
  * bounded driver model fit, apply one vocabulary-bounded encode.)
  *
  * Scale contract: training NEVER collects corpus rows — only the
  * top-[[BpeVocab]] (word, count) head (an orderBy-limit =
  * TakeOrderedAndProject, O(V) per partition), the same bounded
  * model-training collect class as embed_quantize's codebook fit.
  * The merge loop is O(K · Σ|word|) on that V-row head. Apply
  * encodes each DISTINCT word once (mapPartitions over the
  * vocabulary frame — genuine per-word imperative merging, the
  * sanctioned last-resort tier; the corpus-sized side only explodes
  * and equi-joins). Both queries are deterministic (count-then-
  * lexicographic merge tiebreak, left-to-right replacement) but the
  * merge recursion is not cross-engine expressible ⇒ rows-only
  * registry gate + CORRECTNESS_R properties (reconstruction,
  * monotone compression, non-increasing merge counts, double-run
  * hash) — the dedup_minhash_lsh class.
  */
object BpeQueries {

  /** Number of merges learned / vocabulary head size (single-sourced
    * into specs and VerifyR). */
  val BpeMerges = 50
  val BpeVocab = 2000

  /** Word-end marker symbol (Sennrich's `</w>`): merges never cross
    * word boundaries and a word-final subword is distinct from the
    * same subword mid-word. */
  val EndMark = "</w>"

  /** Symbols of a word: one per char plus the end marker. */
  def symbols(w: String): Vector[String] =
    w.map(_.toString).toVector :+ EndMark

  /** Learn `k` merges from a (word → count) vocabulary. Deterministic:
    * best pair by (count desc, left asc, right asc); replacement is
    * left-to-right non-overlapping. Returns (left, right, countAtMerge)
    * in rank order; stops early when no adjacent pair remains with
    * count ≥ 2 (merging a count-1 pair memorizes a single word). */
  def train(vocab: Seq[(String, Long)], k: Int): Seq[(String, String, Long)] = {
    var words = vocab.map { case (w, c) => (symbols(w), c) }
    val out = Vector.newBuilder[(String, String, Long)]
    var i = 0
    var done = false
    while (i < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          counts.updateWith((syms(j), syms(j + 1)))(
            o => Some(o.getOrElse(0L) + c))
          j += 1
        }
      }
      val cands = counts.filter(_._2 >= 2L)
      if (cands.isEmpty) done = true
      else {
        val ((l, r), c) = cands.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, c))
        words = words.map { case (syms, wc) => (mergeOnce(syms, l, r), wc) }
        i += 1
      }
    }
    out.result()
  }

  /** One left-to-right non-overlapping replacement of adjacent
    * (l, r) with l+r. */
  def mergeOnce(syms: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
        b += (l + r); j += 2
      } else { b += syms(j); j += 1 }
    }
    b.result()
  }

  /** Encode one word by applying the merges in rank order. */
  def encode(w: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = symbols(w)
    merges.foreach { case (l, r) =>
      if (syms.length > 1) syms = mergeOnce(syms, l, r)
    }
    syms
  }

  /** The corpus (word, count) vocabulary head that trains the model:
    * top-[[BpeVocab]] by (count desc, word asc) — deterministic, and
    * an orderBy-limit plans as TakeOrderedAndProject (per-partition
    * top-V, no global sort). */
  def vocabHead(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(BpeVocab)

  /** Train on the given corpus dir (driver model fit on the bounded
    * vocabulary head). */
  def trainedMerges(spark: SparkSession, dir: String): Seq[(String, String, Long)] =
    train(vocabHead(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq, BpeMerges)

  /** E: the learned merge table — (rank, left, right, pair_count) in
    * rank order. Rows-only gate ([R]): the merge recursion has no
    * cross-engine oracle; CORRECTNESS_R pins non-increasing counts,
    * reconstruction and compression, plus double-run hash. */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainedMerges(spark, dir).zipWithIndex
      .map { case ((l, r, c), i) => (i + 1L, l, r, c) }
      .toDF("rank", "left", "right", "pair_count")
      .orderBy(col("rank"))
  }

  /** E: corpus-wide BPE apply — per document: whitespace tokens,
    * BPE pieces, and pieces-per-token (the number a packing budget
    * multiplies by). Each DISTINCT word is encoded ONCE
    * (mapPartitions with the broadcast merge table — work is
    * vocabulary-bounded, not corpus-bounded); the corpus side is one
    * explode + equi-join + per-doc integer aggregate. Rows-only gate
    * ([R]): CORRECTNESS_R pins exact map-equality vs a driver-side
    * re-encode plus piece-count bounds and double-run hash. */
  def bpeApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val merges = trainedMerges(spark, dir).map { case (l, r, _) => (l, r) }
    val bc = spark.sparkContext.broadcast(merges)
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
    val pieceLen = toks.select(col("w")).distinct().as[String]
      .mapPartitions { it =>
        val m = bc.value
        it.map(w => (w, encode(w, m).length.toLong))
      }.toDF("w", "n_pieces")
    toks.join(pieceLen, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ws_tokens"),
        sum(col("n_pieces")).as("n_bpe_pieces"))
      .select(col("doc_id"), col("n_ws_tokens"), col("n_bpe_pieces"),
        OracleMath.roundDuck(
          col("n_bpe_pieces") / col("n_ws_tokens"), 4).as("pieces_per_token"))
      .orderBy(col("doc_id"))
  }
}
