package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2H adjunct — warehouse dimension maintenance: type-2
  * slowly-changing-dimension history builds and changelog merges
  * (the MERGE INTO insert/update/delete contract), the two ops every
  * nightly pipeline runs between ingest and serving. (Reference
  * surface: JobX users maintain dimension snapshots as chained
  * map/reduce steps keyed by entity id — job_engine.py reduce picking
  * the latest record per key; here each is one declarative plan.)
  *
  * Pure integer/string algebra end to end (epoch days, row_number
  * over unique total orders) ⇒ both queries are full hash-gated.
  */
object Scd {

  /** H: type-2 SCD history of each customer's order-priority tier —
    * one row per (customer, consecutive run of equal priority) with
    * [valid_from, valid_to) day bounds, version number and the
    * current flag: the as-of-queryable dimension an asof_join serves.
    *
    * Shape: ONE exchange on o_custkey (every window below shares the
    * partitioning; the run/version pass and the valid_to lead are
    * sorts on the same shuffle), then a (cust, version) two-phase
    * aggregate. Change detection via lag over the unique
    * (day, o_orderkey) total order; versions are a running sum of
    * change flags — integer algebra only. */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    scd2Of(Tables(spark, dir).orders
      .select(col("o_custkey").as("k"),
        col("o_orderpriority").as("attr"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("day"),
        col("o_orderkey").as("seq")))

  /** Core over any (k, attr, day, seq) frame; seq breaks same-day
    * ties so the version history is a deterministic total order. */
  def scd2Of(src: DataFrame): DataFrame = {
    val wSeq = Window.partitionBy(col("k")).orderBy(col("day"), col("seq"))
    val runs = src
      .withColumn("chg",
        when(lag(col("attr"), 1).over(wSeq).isNull
          .or(lag(col("attr"), 1).over(wSeq) =!= col("attr")), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(wSeq))
    val wVer = Window.partitionBy(col("k")).orderBy(col("version"))
    runs.groupBy(col("k"), col("version"))
      .agg(min(col("attr")).as("attr"), // constant within a run
        min(col("day")).as("valid_from_day"),
        count(lit(1)).as("n_orders"))
      .withColumn("valid_to_day",
        lead(col("valid_from_day"), 1).over(wVer))
      .select(col("k").as("cust_key"), col("version"), col("attr"),
        col("valid_from_day"), col("valid_to_day"), col("n_orders"),
        col("valid_to_day").isNull.as("is_current"))
      .orderBy(col("cust_key"), col("version"))
  }

  /** H: changelog merge — MERGE INTO semantics over the event log:
    * the snapshot is each user's last event at or before the corpus
    * midpoint, the changelog everything after; the merged dimension
    * applies WHEN NOT MATCHED → INSERT, WHEN MATCHED → UPDATE, and
    * a WHEN MATCHED AND status='error' → DELETE tombstone rule
    * (error-terminal users drop from the serving table). Each
    * surviving row is tagged with the op that produced it — the
    * audit column a CDC reconciliation diff reads.
    *
    * Shape: two row_number branches (snapshot / final state) over the
    * same user_id partitioning joined on user_id, plus one 1-row
    * midpoint stat pass; the unique (ep, event_id) descending order
    * makes "last" deterministic. In production the snapshot is its
    * own table, so the pruned scans here model exactly the two-table
    * read a real merge pays. Integer algebra ⇒ full hash gate. */
  def cdcMerge(spark: SparkSession, dir: String): DataFrame =
    cdcMergeOf(Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep")))

  /** Core over any (user_id, event_id, event_type, ep) frame. */
  def cdcMergeOf(e: DataFrame): DataFrame = {
    val wLast = Window.partitionBy(col("user_id"))
      .orderBy(col("ep").desc, col("event_id").desc)
    // corpus midpoint from a 1-row min/max broadcast (integer algebra)
    val mid = e.agg(min(col("ep")).as("mn"), max(col("ep")).as("mx"))
      .selectExpr("(mn + mx) div 2 AS mid")
    val snap = e.crossJoin(broadcast(mid)).filter(col("ep") <= col("mid"))
      .withColumn("rn", row_number().over(wLast)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("snap_status"),
        col("ep").as("snap_ep"))
    val last = e // the changelog side needs no midpoint: last overall
      .withColumn("rn", row_number().over(wLast)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("status"),
        col("ep").as("last_ep"))
    last.join(snap, Seq("user_id"), "left")
      .withColumn("op",
        when(col("snap_ep").isNull, "insert")
          .when(col("last_ep") > col("snap_ep"), "update")
          .otherwise("unchanged"))
      // tombstone rule: matched rows whose new status is terminal
      // error are deleted from the serving table
      .filter(!(col("op") === "update" && col("status") === "error"))
      .select(col("user_id"), col("status"), col("last_ep"), col("op"))
      .orderBy(col("user_id"))
  }
}
