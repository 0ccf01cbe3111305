package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.streaming.Streams.Ev

/** The stateful streaming twins under the RocksDB state-store
  * provider — the scale contract for streaming state (VERDICT r12
  * task 4). The default HDFS-backed provider keeps EVERY key's state
  * in executor heap: at 100× key cardinality (sessionize/funnel keyed
  * by user, dedup keyed by content hash — all corpus-growing) that is
  * an executor-OOM path. RocksDB spills state to local disk with a
  * bounded block cache, which is the standard production answer; the
  * checkpoint contract (snapshot + changelog under the query's
  * checkpointLocation) is provider-transparent, so crash recovery
  * must behave identically. These tests re-run the core stateful
  * scenarios — session close, cross-batch dedup suppression, funnel
  * snapshots, and the restart-from-checkpoint exactly-once assertion
  * — with the provider swapped, and assert RocksDB actually engaged
  * via the per-operator custom metrics. */
class RocksDbStateSpec extends SparkSuite {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb = "org.apache.spark.sql.execution.streaming." +
    "state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  /** The provider is engaged iff the state operator reports rocksdb
    * custom metrics (the HDFS provider reports none of these). */
  private def assertRocksDbEngaged(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val ops = q.lastProgress.stateOperators
    assert(ops.nonEmpty, "query must have a state operator")
    val keys = ops.flatMap(_.customMetrics.keySet()
      .toArray(Array.empty[String])).toSet
    assert(keys.exists(_.startsWith("rocksdb")),
      s"state metrics carry no rocksdb* keys — provider not engaged: $keys")
  }

  test("sessionize closes sessions under RocksDB") { withRocksDb {
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val stream = MemoryStream[Ev]
    val sessions = Streams.sessionizeStateful(stream.toDS(), emitOpen = false)
    val query = sessions.writeStream.format("memory")
      .queryName("sess_rocks").outputMode("append").start()
    try {
      stream.addData(Ev(1, 1, 1000, 1.0), Ev(1, 2, 1010, 2.0))
      query.processAllAvailable()
      assert(s.table("sess_rocks").count() === 0, "open session must not emit")
      stream.addData(Ev(1, 3, 1000 + 7200, 5.0))
      query.processAllAvailable()
      val closed = s.table("sess_rocks").as[Streams.Session].collect()
      assert(closed.toSeq === Seq(Streams.Session(1, 1, 2, 1000, 1010, 3.0)))
      assertRocksDbEngaged(query)
    } finally query.stop()
  }}

  test("streaming dedup suppresses cross-batch duplicates under RocksDB") {
    withRocksDb {
      val s = spark; import s.implicits._
      implicit val sq = s.sqlContext
      val stream = MemoryStream[Streams.Doc]
      val query = Streams.dedupStateful(stream.toDS())
        .writeStream.format("memory").queryName("dedup_rocks")
        .outputMode("append").start()
      try {
        stream.addData(Streams.Doc(1, "h1"), Streams.Doc(2, "h2"),
          Streams.Doc(3, "h1"))
        query.processAllAvailable()
        stream.addData(Streams.Doc(4, "h1"), Streams.Doc(5, "h3"))
        query.processAllAvailable()
        val got = s.table("dedup_rocks").as[Streams.Doc]
          .collect().sortBy(_.doc_id).toSeq
        assert(got === Seq(Streams.Doc(1, "h1"), Streams.Doc(2, "h2"),
          Streams.Doc(5, "h3")))
        assertRocksDbEngaged(query)
      } finally query.stop()
    }
  }

  test("funnel snapshots under RocksDB equal the batch funnel") {
    withRocksDb {
      val s = spark; import s.implicits._
      implicit val sq = s.sqlContext
      val expected = Streams.streamFunnel(spark, sfDir).collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))
        .toMap
      val evs = graft.Tables(spark, sfDir).events
        .select(col("user_id"), col("event_type"),
          graft.Tables.tsNsToSec("ts").as("ep"))
        .as[Streams.FEv].collect().sortBy(_.ep)
      val stream = MemoryStream[Streams.FEv]
      val query = Streams.funnelStateful(stream.toDS())
        .writeStream.format("memory").queryName("funnel_rocks")
        .outputMode("append").start()
      try {
        evs.grouped(math.max(1, evs.length / 4)).foreach { batch =>
          stream.addData(batch.toSeq)
          query.processAllAvailable()
        }
        val snaps = s.table("funnel_rocks").as[Streams.FunnelRow].collect()
        snaps.groupBy(_.user_id).foreach { case (u, ss) =>
          val last = ss.maxBy(_.stage)
          assert(expected(u) === ((last.t1, last.t2, last.t3, last.stage)),
            s"user $u: stream $last != batch ${expected(u)}")
        }
        assert(snaps.map(_.user_id).distinct.length == expected.size,
          "every batch user must have at least one snapshot")
        assertRocksDbEngaged(query)
      } finally query.stop()
    }
  }

  test("dedup state survives a restart from its checkpoint under RocksDB " +
      "(exactly-once contract is provider-transparent)") { withRocksDb {
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_rocks").toString
    val outDir = java.nio.file.Files.createTempDirectory("ckpt_rocks_out")
      .toString
    val stream = MemoryStream[Streams.Doc]
    def start() = Streams.dedupStateful(stream.toDS())
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try {
      stream.addData(Streams.Doc(1L, "AAAA"), Streams.Doc(2L, "BBBB"))
      q1.processAllAvailable()
      assert(s.read.parquet(outDir).count() === 2)
      assertRocksDbEngaged(q1)
    } finally q1.stop()

    // restart the SAME logical query from the checkpoint: the
    // RocksDB-backed seen-hash state must be recovered, so a
    // post-restart duplicate of AAAA is suppressed while a genuinely
    // new hash still emits
    val q2 = start()
    try {
      stream.addData(Streams.Doc(3L, "AAAA"), Streams.Doc(4L, "CCCC"))
      q2.processAllAvailable()
      val got = s.read.parquet(outDir).as[Streams.Doc].collect()
        .map(d => d.doc_id -> d.text_hash).toSet
      assert(got === Set(1L -> "AAAA", 2L -> "BBBB", 4L -> "CCCC"),
        s"state must survive the restart: $got")
      assertRocksDbEngaged(q2)
    } finally q2.stop()
  }}
}
