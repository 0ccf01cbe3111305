package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.WordNgrams

/** SURVEY §2E adjunct — corpus-level heavy hitters (frequent n-grams)
  * via a bounded-memory sketch, the C4-style "build the boilerplate
  * blocklist" step: find every n-gram above an exact corpus share
  * without ever materializing the full n-gram count table.
  *
  * Scale shape (the whole point at 100 TB): a full
  * `groupBy(gram).count` shuffles |distinct grams| rows — at web
  * scale that's billions of keys, most of them singletons that can
  * never matter. Here every partition folds its grams into a
  * Misra-Gries summary of ≤ [[MgCapacity]] entries (partial
  * aggregation — the map-side combine Spark gives a typed
  * [[Aggregator]] for free), the exchange carries one k-row summary
  * per partition, and the single driver-side summary (quantizer-state
  * exception, as ann_ivf's centroids) yields a candidate set that
  * PROVABLY contains every gram with share > 1/([[MgCapacity]]+1) —
  * the classic MG guarantee, valid under ANY partitioning and merge
  * order. A second pass exact-counts only the ≤ k candidates
  * (hash-set filter + tiny groupBy), so the emitted counts are
  * EXACT and the final `cnt·ShareDenom > total` cut is deterministic
  * even though the sketch itself is merge-order-dependent — which is
  * what makes this oracle-gatable: DuckDB recomputes the same set
  * from the full count table, the sketch path must land on it
  * bit-for-bit. Two corpus passes by design (the
  * compute-stats-then-apply convention of text_oov/mix_sources).
  *
  * Precondition (checked): ShareDenom ≤ MgCapacity + 1, else the
  * guarantee does not cover the cut and a heavy gram could be
  * missed. The shipped corpus' bigram space (≈ 930 keys) sits below
  * this capacity, so the corpus entry never evicts; eviction,
  * summary bounds and the guarantee under real Zipf skew
  * (keyspace ≫ cap) are property-tested in HeavySpec.
  */
object HeavyHitters {

  /** Per-summary entry bound. 100 TB would raise this — memory per
    * task is the only cost, O(cap) per evicting insert amortized. */
  val MgCapacity = 1535

  /** Blocklist cut: keep gram iff cnt · ShareDenom > total
    * (share > 1/1024). Pure integer compare — no FP at the boundary. */
  val ShareDenom = 1024L

  require(ShareDenom <= MgCapacity + 1L,
    "MG guarantee must cover the cut: ShareDenom <= cap + 1")

  /** A Misra-Gries summary: bounded key→count map + exact item total
    * (the total rides along so the cut needs no extra pass). */
  final case class MgSummary(counts: Map[String, Long], n: Long)

  object MgBuffer {
    /** Test/seed constructor: a buffer holding exactly `counts`. */
    def from(counts: Map[String, Long], n: Long, cap: Int): MgBuffer = {
      val b = new MgBuffer(cap)
      counts.foreach { case (k, v) => b.add(k, v) }
      b.n = n
      b
    }
  }

  /** Mutable open-addressing MG summary buffer (linear probing,
    * power-of-two table sized ≥ 2·cap). Same summary semantics as an
    * immutable-`Map` fold — textbook decrement-all reduce, Agarwal et
    * al. offset merge — but a non-evicting insert is one probe + an
    * in-place increment instead of a persistent-map path copy, and an
    * eviction rebuilds two flat arrays instead of reallocating a Map.
    * (The previous immutable fold was the measured cause of
    * ngram_blocklist's worst-in-suite 4.0× sf0.1→sf1 ratio.) Crosses
    * the exchange kryo-encoded: k entries of plain arrays. */
  final class MgBuffer(val cap: Int) extends Serializable {
    private def tableFor(min: Int): Int = {
      var t = 4
      while (t < min) t <<= 1
      t
    }
    // ≥ 2·cap slots keeps load ≤ ½ in steady state; a merge may
    // briefly hold up to 2·cap entries before the offset cut, still
    // within the table.
    private var keys = new Array[String](tableFor(cap * 2 + 2))
    private var cnts = new Array[Long](keys.length)
    var size = 0
    var n = 0L

    private def slotOf(key: String): Int = {
      val mask = keys.length - 1
      var i = key.hashCode & mask
      while (keys(i) != null && keys(i) != key) i = (i + 1) & mask
      i
    }

    /** Unconditional count add (insert beyond cap allowed — merge
      * trims afterwards). */
    private[HeavyHitters] def add(key: String, v: Long): Unit = {
      val i = slotOf(key)
      if (keys(i) == null) { keys(i) = key; cnts(i) = v; size += 1 }
      else cnts(i) += v
    }

    /** Textbook MG reduce step for one item. */
    def inc(key: String): Unit = {
      n += 1L
      val i = slotOf(key)
      if (keys(i) != null) cnts(i) += 1L
      else if (size < cap) { keys(i) = key; cnts(i) = 1L; size += 1 }
      else rebuildSubtracting(1L) // decrement-all; the new key is dropped
    }

    /** Subtract `off` from every count, dropping non-positives —
      * one pass over the flat arrays, then reinsert survivors. */
    private def rebuildSubtracting(off: Long): Unit = {
      val ks = keys
      val cs = cnts
      keys = new Array[String](ks.length)
      cnts = new Array[Long](ks.length)
      size = 0
      var i = 0
      while (i < ks.length) {
        if (ks(i) != null && cs(i) > off) add(ks(i), cs(i) - off)
        i += 1
      }
      // n tracks items seen, not summary mass — deliberately unchanged
    }

    /** Agarwal et al. mergeable-summaries rule: sum, then subtract the
      * (cap+1)-th largest count so ≤ cap entries stay positive. */
    def absorb(b: MgBuffer): Unit = {
      var i = 0
      while (i < b.keys.length) {
        if (b.keys(i) != null) add(b.keys(i), b.cnts(i))
        i += 1
      }
      n += b.n
      if (size > cap) {
        val occupied = new Array[Long](size)
        var j = 0
        i = 0
        while (i < keys.length) {
          if (keys(i) != null) { occupied(j) = cnts(i); j += 1 }
          i += 1
        }
        java.util.Arrays.sort(occupied)
        rebuildSubtracting(occupied(size - 1 - cap)) // (cap+1)-th largest
      }
    }

    def toSummary: MgSummary = {
      val b = Map.newBuilder[String, Long]
      var i = 0
      while (i < keys.length) {
        if (keys(i) != null) b += (keys(i) -> cnts(i))
        i += 1
      }
      MgSummary(b.result(), n)
    }
  }

  /** Bounded-memory frequent-items sketch over a mutable [[MgBuffer]]:
    * reduce = textbook MG (decrement-all on a full summary seeing a
    * new key); merge = sum then subtract the (cap+1)-th largest count
    * — both keep ≤ cap entries and the estimate error ≤ n/(cap+1)
    * under any fold/merge order. */
  final class MisraGries(cap: Int)
      extends Aggregator[String, MgBuffer, MgSummary] {
    def zero: MgBuffer = new MgBuffer(cap)
    def reduce(b: MgBuffer, key: String): MgBuffer = { b.inc(key); b }
    def merge(a: MgBuffer, b: MgBuffer): MgBuffer = { a.absorb(b); a }
    def finish(b: MgBuffer): MgSummary = b.toSummary
    def bufferEncoder: Encoder[MgBuffer] =
      org.apache.spark.sql.Encoders.kryo[MgBuffer]
    def outputEncoder: Encoder[MgSummary] = ExpressionEncoder[MgSummary]()
  }

  /** E11 query entry: every corpus bigram above the exact 1/1024
    * share, found sketch-first. */
  def ngramBlocklist(spark: SparkSession, dir: String): DataFrame =
    blocklistOf(Tables(spark, dir).documents, MgCapacity, ShareDenom)

  /** Core two-pass sketch-then-recount over any frame with `text`
    * (specs plant Zipf fixtures with keyspace ≫ cap). */
  def blocklistOf(d: DataFrame, cap: Int, denom: Long): DataFrame = {
    require(denom <= cap + 1L,
      "MG guarantee must cover the cut: denom <= cap + 1")
    val spark = d.sparkSession
    import spark.implicits._
    val grams = d.select(explode(WordNgrams(col("text"), 2)).as("gram"))
    // pass 1: one k-row summary per partition → one merged summary
    val sketch = grams.as[String].select(new MisraGries(cap).toColumn).head()
    val total = sketch.n
    // pass 2: exact recount of candidates only (codegen'd InSet probe,
    // never a full-keyspace shuffle), then the exact integer cut.
    // Empty corpus ⇒ empty candidate set ⇒ nothing can pass the cut;
    // short-circuit rather than hand isInCollection an empty list.
    if (sketch.counts.isEmpty)
      return grams.limit(0)
        .select(col("gram"), lit(0L).as("n"), lit(0.0).as("share"))
    grams.filter(col("gram").isInCollection(sketch.counts.keys.toSeq))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .filter(col("n") * denom > lit(total))
      .select(col("gram"), col("n"),
        graft.functions.OracleMath.roundDuck(col("n") / lit(total), 6)
          .as("share"))
      .orderBy(col("n").desc, col("gram"))
  }
}
