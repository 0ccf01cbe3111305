package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shingling, MinHash and SimHash column builders (SURVEY §2C).
  * Everything is per-row HOF/builtin work evaluated at the scan; the
  * only shuffles in the dedup pipelines are the bucket joins on
  * band/chunk keys.
  */
object HashFunctions {

  /** Non-empty whitespace tokens (same convention as TextFunctions). */
  def tokens(text: Column): Column = TextFunctions.tokens(text)

  /** Distinct word n-gram shingles, e.g. n=3:
    * "a b c d" → ["a b c", "b c d"]. Callers must filter docs with
    * fewer than n tokens (Spark's `sequence` would run backwards).
    *
    * HOF reference formulation — query code uses the fused native
    * [[ShingleHashes]] instead (each `transform`/`array_distinct`
    * pass here is CodegenFallback, interpreted per row; ShingleSpec
    * proves hash-level bit-equality between the two). */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
  }

  /** Distinct word-n-gram xxhash64 keys, fused native loop
    * (tokenize + shingle + hash + distinct in one codegen pass).
    * Empty array for docs with fewer than n tokens. */
  def shingleHashes(text: Column, n: Int): Column = ShingleHashes(text, n)

  /** MinHash parameters: universal hashing h_j(x) = (a_j*x + b_j) mod p
    * over a 31-bit prime field; shingle → field via xxhash64 mod p.
    * Products stay < 2^62, so ANSI overflow checking never trips. */
  val MinHashPrime = 2147483647L // 2^31 - 1

  def minhashCoeffs(nPerm: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPerm)(
      (1L + rng.nextInt(Int.MaxValue - 1).toLong,
        rng.nextInt(Int.MaxValue).toLong))
  }

  /** 64-perm MinHash signature as array<long>. One xxhash64 per
    * shingle (shared across perms), then the fused perms × shingles
    * min loop as a native codegen expression ([[MinHashSig]] — the
    * HOF formulation ran interpreted and was ~200× slower). */
  def minhashSignature(shingles: Column, coeffs: Seq[(Long, Long)]): Column = {
    val shHashes = transform(shingles, s => pmod(xxhash64(s), lit(MinHashPrime)))
    MinHashSig(shHashes, coeffs, MinHashPrime)
  }

  /** MinHash signature straight from text: [[ShingleHashes]] (native
    * tokenize+shingle+hash+pmod) feeding [[MinHashSig]] — the whole
    * text→signature path is two generated loops, no interpreted HOFs.
    * Bit-identical to `minhashSignature(wordShingles(text, n), _)`. */
  def minhashSignatureNative(text: Column, n: Int,
      coeffs: Seq[(Long, Long)]): Column =
    MinHashSig(ShingleHashes.modded(text, n, MinHashPrime), coeffs,
      MinHashPrime)

  /** Banded LSH keys: split the signature into `nBands` rows-per-band
    * groups, hash each group to one bucket key. Docs sharing any
    * (band_idx, key) are candidates. */
  def lshBandKeys(sig: Column, nBands: Int, rowsPerBand: Int): Column =
    array((0 until nBands).map { band =>
      xxhash64(
        (lit(band) +:
          (0 until rowsPerBand).map(r =>
            element_at(sig, band * rowsPerBand + r + 1))): _*)
    }: _*)

  /** Estimated Jaccard from two signatures: matching positions / n.
    * The denominator is the actual signature length, not a hardcoded
    * perm count — callers may size signatures differently. Matching
    * is one native loop ([[SigMatchCount]]); the HOF reference lives
    * in [[sigSimilarityRef]] for the bit-equality spec. */
  def sigSimilarity(sigA: Column, sigB: Column): Column =
    SigMatchCount(sigA, sigB) / size(sigA).cast("double")

  /** Interpreted HOF reference formulation of [[sigSimilarity]]. */
  def sigSimilarityRef(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, _ === _), b => b)) /
      size(sigA).cast("double")

  /** 64-bit SimHash of a document's tokens (native codegen expr).
    * Token hashing is [[ShingleHashes]] with n=1, non-distinct —
    * bit-identical to `transform(tokens(text), xxhash64)` but one
    * generated loop instead of an interpreted HOF pass. */
  def simhash(text: Column): Column =
    SimHash64(ShingleHashes.tokenHashes(text))

  /** Split a 64-bit simhash into 4 16-bit chunk keys — pigeonhole:
    * hamming(a,b) <= 3 guarantees at least one equal chunk. */
  def simhashChunks(sh: Column): Column =
    array((0 until 4).map(c =>
      shiftright(sh, c * 16).bitwiseAND(lit(0xFFFFL))): _*)
}
