package graft.mr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2A — the JobX test-handler pipelines, run through
  * [[graft.mr.Engine]]. Each query re-expresses one reference handler
  * pair (dev/resources/handlers/{map,reduce}) as a typed Step and ends
  * in a DataFrame whose shape matches a DuckDB oracle.
  */
object MrQueries {

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  /** A1: canonical wordcount — map(tokenize → (word,1)) / combine(+) /
    * reduce(sum) over documents.text. The combiner makes the shuffle
    * carry one partial count per (partition, word), not one record per
    * token — the difference between shuffling ~n_tokens rows and
    * ~|vocab| rows at 100 TB. */
  def mrWordcount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents.select(col("text")).as[String]
    val step = Step[String, String, Long, (String, Long)](
      "wordcount",
      mapper = (_, text) =>
        text.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, 1L)),
      reducer = (_, k, vs) => Iterator((k, vs.sum)),
      combiner = Some(_ + _))
    Engine.run(docs, step).toDF("word", "n").orderBy(col("word"))
  }

  /** A2: per-key sum reducer (reference reduce/test/sum.py) over
    * events(user_id, value). */
  def mrSum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events
      .select(col("user_id"), col("value")).as[(Long, Double)]
    val step = Step[(Long, Double), Long, Double, (Long, Double)](
      "sum",
      mapper = (_, kv) => Iterator(kv),
      reducer = (_, k, vs) => Iterator((k, vs.sum)),
      combiner = Some(_ + _))
    Engine.run(ev, step).toDF("user_id", "sum_value")
      .select(col("user_id"), round(col("sum_value"), 4).as("sum_value"))
      .orderBy(col("user_id"))
  }

  /** A3: per-key product reducer (reference reduce/test/multiply.py):
    * product of (1 + discount) per order over lineitem. */
  def mrMultiply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir).lineitem
      .select(col("l_orderkey"), lit(1.0) + col("l_discount"))
      .as[(Long, Double)]
    val step = Step[(Long, Double), Long, Double, (Long, Double)](
      "multiply",
      mapper = (_, kv) => Iterator(kv),
      reducer = (_, k, vs) => Iterator((k, vs.product)),
      combiner = Some(_ * _))
    Engine.run(li, step).toDF("l_orderkey", "prod_disc")
      .select(col("l_orderkey"), round(col("prod_disc"), 4).as("prod_disc"))
      .orderBy(col("l_orderkey"))
  }

  /** A4: forwarding reducer (reference reduce/test/noop.py): group the
    * values per key and forward them — the no-combiner path, where the
    * reducer sees the full value list. Output is the sorted list as a
    * csv string (deterministic, oracle-comparable).
    *
    * Per-key memory bound: a forwarding reducer's buffer grows with
    * the group, so the value list is capped at [[NoopMaxValues]]
    * (mirrored by the oracle's list slice). TPC-H orders carry ≤ 7
    * lineitems at every SF, so the cap never fires on this data — it
    * exists so a hot key on 100 TB inputs degrades to a truncated
    * list instead of an executor OOM. A production forwarding
    * reducer over unbounded groups should emit rows per value
    * (mr_wordcount's shape) rather than concatenate. */
  val NoopMaxValues = 64

  def mrNoop(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir).lineitem
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber")).as[(Long, Int)]
    val step = Step[(Long, Int), Long, Int, (Long, String)](
      "noop",
      mapper = (_, kv) => Iterator(kv),
      reducer = (_, k, vs) =>
        Iterator((k, vs.sorted.take(NoopMaxValues).mkString(","))))
    Engine.run(li, step).toDF("l_orderkey", "linenumbers")
      .orderBy(col("l_orderkey"))
  }

  /** A5: dynamic step chaining (`MrConfigureToMap`, reference
    * map/test/split.py → random_yield_grouped.py → reduce sum):
    * scatter each order's total (as exact cents) into halves, then
    * quarters, then gather with a sum reducer. Invariant:
    * gather(scatter(x)) == x. The two scatter hops are MapSteps — they
    * fuse into one stage; the whole 3-step workflow shuffles exactly
    * once (at the reducing step). */
  def mrChain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir).orders
      .filter(col("o_orderkey") < 200)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .as[(Long, Long)]

    val split = MapStep[(Long, Long), Long, Long]("split",
      (_, kv) => { val (k, v) = kv; val h = v / 2; Iterator((k, h), (k, v - h)) })
    val scatter = MapStep[(Long, Long), Long, Long]("scatter",
      (_, kv) => { val (k, v) = kv; val q = v / 4
        Iterator((k, q), (k, q), (k, q), (k, v - 3 * q)) })
    val gather = Step[(Long, Long), Long, Long, (Long, Long)]("gather",
      mapper = (_, kv) => Iterator(kv),
      reducer = (_, k, vs) => Iterator((k, vs.sum)),
      combiner = Some(_ + _))

    Workflow.start[(Long, Long)]("chain")
      .andThenMap(split)
      .andThenMap(scatter)
      .andThen(gather)
      .run(o)
      .toDF("k", "cents")
      .orderBy(col("k"))
  }

  /** Literal scanned for by [[mrGrep]] (single-sourced into the
    * oracle). */
  val GrepPattern = "data"

  /** A6: distributed grep — THE canonical map-only MapReduce job: emit
    * each matching document with its non-overlapping match count;
    * non-matching docs produce nothing, so the shuffle-FREE pipeline's
    * output IS the match set (selection happens in the mapper, the
    * 100 TB shape: bytes stream through one narrow stage and only
    * hits survive). The pattern rides the session KV
    * ([[Ctx.sessionGet]] — the reference's request-scoped handler
    * arguments), not a closure capture, so one compiled workflow
    * serves any pattern. Counting is left-to-right greedy
    * non-overlapping (split-on-quoted-literal), exactly DuckDB's
    * replace-shrinkage count — one definition on both engines. */
  def mrGrep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
    val grep = MapStep[(Long, String, String), Long, (String, Long)]("grep",
      (ctx, rec) => {
        val pat = ctx.sessionGet("pattern").getOrElse("")
        val (id, src, text) = rec
        val n: Long =
          text.split(java.util.regex.Pattern.quote(pat), -1).length - 1L
        if (n > 0L) Iterator((id, (src, n))) else Iterator.empty
      })
    Workflow.start[(Long, String, String)]("grep",
        session = Map("pattern" -> GrepPattern))
      .andThenMap(grep)
      .run(docs)
      .map { case (id, (src, n)) => (id, src, n) }
      .toDF("doc_id", "source", "n_matches")
      .orderBy(col("doc_id"))
  }
}
