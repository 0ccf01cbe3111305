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

  /** Per-summary entry bound. Production note: 100 TB would raise
    * this (memory per task is the only cost, O(cap) per evicting
    * insert amortized) and use a mutable open-addressing buffer;
    * semantics are identical. */
  val MgCapacity = 1535

  /** Blocklist cut: keep gram iff cnt · ShareDenom > total
    * (share > 1/1024). Pure integer compare — no FP at the boundary. */
  val ShareDenom = 1024L

  require(ShareDenom <= MgCapacity + 1L,
    "MG guarantee must cover the cut: ShareDenom <= cap + 1")

  /** A Misra-Gries summary: bounded key→count map + exact item total
    * (the total rides along so the cut needs no extra pass). */
  final case class MgSummary(counts: Map[String, Long], n: Long)

  /** Bounded-memory frequent-items sketch. reduce = textbook MG
    * (decrement-all on a full summary seeing a new key); merge = sum
    * then subtract the (cap+1)-th largest count (Agarwal et al.'s
    * mergeable-summaries rule) — both keep ≤ cap entries and the
    * estimate error ≤ n/(cap+1) under any fold/merge order. */
  final class MisraGries(cap: Int)
      extends Aggregator[String, MgSummary, MgSummary] {
    def zero: MgSummary = MgSummary(Map.empty, 0L)

    def reduce(s: MgSummary, key: String): MgSummary = {
      val c = s.counts
      val c2 =
        if (c.contains(key)) c.updated(key, c(key) + 1L)
        else if (c.size < cap) c.updated(key, 1L)
        else c.flatMap { case (k, v) => // decrement-all, drop zeros
          if (v > 1L) Some(k -> (v - 1L)) else None
        }
      MgSummary(c2, s.n + 1L)
    }

    def merge(a: MgSummary, b: MgSummary): MgSummary = {
      val summed = b.counts.foldLeft(a.counts) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      val kept =
        if (summed.size <= cap) summed
        else {
          // subtract the (cap+1)-th largest count; ≤ cap stay positive
          val off = summed.valuesIterator.toArray.sortBy(-_).apply(cap)
          summed.flatMap { case (k, v) =>
            if (v > off) Some(k -> (v - off)) else None
          }
        }
      MgSummary(kept, a.n + b.n)
    }

    def finish(s: MgSummary): MgSummary = s
    def bufferEncoder: Encoder[MgSummary] = ExpressionEncoder[MgSummary]()
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
