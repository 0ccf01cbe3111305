package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Tables
import graft.functions.{HashFunctions => H}

/** SURVEY §2G — Structured Streaming jobs. Each job is ONE transform
  * shared verbatim between the batch entry (oracle-checked by the
  * driver) and the streaming path (ScalaTest drives it through a
  * MemoryStream + memory sink): the logical plan is the product, the
  * execution mode is a deployment detail — the JobX equivalent is
  * async job submission with streamed results
  * (reference: dev/post_map_flat_async.py, mr/result_writers/inline.py).
  */
object Streams {

  // Shadows functions.round: DuckDB-exact binary rounding so oracle
  // hashes cannot flake on decimal half boundaries (see OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  final case class Ev(user_id: Long, event_id: Long, ep: Long, value: Double)
  final case class Session(user_id: Long, session_id: Long, n_events: Long,
      session_start: Long, session_end: Long, session_value: Double)

  /** Per-key open-session state (public: the streaming state encoder
    * generates accessor calls at runtime and cannot see a private
    * class). */
  final case class SessAcc(sessionId: Long, start: Long,
      lastEp: Long, nEvents: Long, sumValue: Double)

  /** G1 transform: 1-hour tumbling window × event_type counts/sums.
    * Works on any (ts: long ns, event_type, value) frame, batch or
    * stream. A streaming caller that wants bounded state derives the
    * event-time column ITSELF (`ep_ts`, epoch-seconds timestamp) and
    * watermarks it before calling — the transform then groups on that
    * exact watermarked attribute, so append mode works and window
    * state is evicted. (Watermarking after the fact is impossible:
    * a fresh withColumn here would drop the watermark metadata.) */
  def windowAggTransform(events: DataFrame): DataFrame =
    (if (events.columns.contains("ep_ts")) events
     else events.withColumn("ep_ts",
       Tables.tsNsToSec("ts").cast("timestamp")))
      .groupBy(window(col("ep_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** G1 batch entry (driver-verified against the DuckDB oracle). */
  def streamWindowAgg(spark: SparkSession, dir: String): DataFrame =
    windowAggTransform(Tables(spark, dir).events)
      .orderBy(col("win_start"), col("event_type"))

  /** Gap-based sessionizer for flatMapGroupsWithState.
    *
    * `emitOpen=true` (batch): the group's full history arrives in one
    * call, so the trailing open session is final — emit it; output is
    * complete and matches the window-function batch oracle.
    * `emitOpen=false` (streaming append): the trailing session stays
    * in [[GroupState]] until more events or a timeout close it —
    * emitting it early would violate append semantics.
    *
    * Scale: state per key is ONE open-session accumulator (5 fields),
    * not the event history; a 1e9-user stream holds 1e9 tiny state
    * rows, evicted by watermark timeout. */
  def sessionizeFn(emitOpen: Boolean)(
      userId: Long, evs: Iterator[Ev], state: GroupState[SessAcc]): Iterator[Session] = {
    val sorted = evs.toIndexedSeq.sortBy(e => (e.ep, e.event_id))
    var acc = state.getOption.orNull
    val out = Seq.newBuilder[Session]
    sorted.foreach { e =>
      if (acc == null)
        acc = SessAcc(1L, e.ep, e.ep, 1L, e.value)
      else if (e.ep - acc.lastEp > Gap) {
        out += Session(userId, acc.sessionId, acc.nEvents, acc.start, acc.lastEp, acc.sumValue)
        acc = SessAcc(acc.sessionId + 1, e.ep, e.ep, 1L, e.value)
      } else
        // A late-but-in-watermark event (earlier batch already moved
        // lastEp forward) must not regress the session bounds or the
        // timeout horizon: clamp with min/max. Late events are folded
        // into the currently-open session — exact re-splitting would
        // require buffering the event history, which this operator
        // deliberately does not keep.
        acc = acc.copy(
          start = math.min(acc.start, e.ep),
          lastEp = math.max(acc.lastEp, e.ep),
          nEvents = acc.nEvents + 1,
          sumValue = acc.sumValue + e.value)
    }
    if (acc != null) {
      if (emitOpen) {
        out += Session(userId, acc.sessionId, acc.nEvents, acc.start, acc.lastEp, acc.sumValue)
        state.remove()
      } else state.update(acc)
    }
    out.result().iterator
  }

  /** Session gap — single-sourced from the batch operator so the
    * "stateful path shares the window form's oracle" contract cannot
    * drift (the sessionize oracle SQL interpolates the same val). */
  val Gap: Long = graft.operators.Sessionize.GapSeconds

  /** Shared stateful sessionize over a typed event stream. */
  def sessionizeStateful(events: Dataset[Ev], emitOpen: Boolean): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionizeFn(emitOpen))
  }

  /** Event-typed record for the watermarked streaming form. */
  final case class EvT(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, value: Double)

  /** Streaming sessionize with EventTimeTimeout: closed sessions emit
    * immediately (gap exceeded by a newer event); the OPEN session is
    * flushed when the event-time watermark passes `lastEp + gap` — no
    * session is held forever, state is evicted on flush. This is the
    * production shape: `sessionizeStateful(emitOpen=false)` is its
    * timeout-free core, the batch entry its oracle. */
  def sessionizeEventTime(events: Dataset[EvT],
      delaySeconds: Long = 600L): Dataset[Session] = {
    // The (user_id, session_start) identity below is unique ONLY
    // while the watermark delay stays within the gap: a late
    // in-watermark event arriving after a session was emitted could
    // otherwise clamp the open session's start onto the emitted
    // session's start (sessionizeFn's min-clamp) and collide the ids.
    require(delaySeconds <= Gap,
      s"watermark delay ${delaySeconds}s must be <= the session gap " +
        s"${Gap}s or (user_id, session_start) session identity breaks")
    import events.sparkSession.implicits._
    events.withWatermark("ts", s"$delaySeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[EvT], state: GroupState[SessAcc]) =>
          if (state.hasTimedOut) {
            val acc = state.get
            state.remove()
            Iterator(Session(userId, acc.sessionId, acc.nEvents,
              acc.start, acc.lastEp, acc.sumValue))
          } else {
            val asEv = evs.map(e =>
              Ev(e.user_id, e.event_id, e.ts.getTime / 1000, e.value))
            val out = sessionizeFn(emitOpen = false)(userId, asEv, state)
            // arm the flush: open session dies when the watermark
            // passes its gap horizon
            state.getOption.foreach(acc =>
              state.setTimeoutTimestamp((acc.lastEp + Gap) * 1000))
            out
          }
      }
      // Per-user ordinal session ids cannot survive a timeout flush
      // (state is removed, the counter with it), which would make ids
      // collide across flushes. In the timeout variant session
      // identity is (user_id, session_start) — unique and stable
      // without unbounded tombstone state.
      .map(s => s.copy(session_id = s.session_start))(
        org.apache.spark.sql.Encoders.product[Session])
  }

  /** One incoming document for the streaming dedup. */
  final case class Doc(doc_id: Long, text_hash: String)
  /** Per-hash dedup state: the retained representative. */
  final case class SeenRep(doc_id: Long)

  /** G3 dedup core: keep the first document per content hash.
    * Batch semantics ("first" = min doc_id overall) and streaming
    * semantics ("first" = min doc_id not yet emitted, per arrival
    * order) coincide when the stream is doc_id-ordered — the spec
    * drives exactly that and asserts equality with the batch form.
    *
    * Scale: state per key is ONE long (the representative id), never
    * document content — a 1e10-doc corpus holds hash→id pairs, which
    * is the minimum any online exact-dedup can store. State here
    * never expires by design (a duplicate may arrive years later);
    * bounding it is a retention decision — `NoTimeout` swapped for
    * `ProcessingTimeTimeout` + a TTL gives "dedup within N days". */
  def dedupFn(hash: String, docs: Iterator[Doc],
      state: GroupState[SeenRep]): Iterator[Doc] =
    if (state.exists) {
      docs.foreach(_ => ()) // duplicates of an already-kept doc: drop
      Iterator.empty
    } else {
      val rep = docs.minBy(_.doc_id)
      state.update(SeenRep(rep.doc_id))
      Iterator(Doc(rep.doc_id, hash))
    }

  /** Shared stateful dedup over a typed doc stream (batch or
    * streaming — one transform, two execution modes, like G1/G2). */
  def dedupStateful(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.text_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        dedupFn)
  }

  /** G3 batch entry: first-per-content-hash over `documents`
    * (md5(text), the dedup_exact convention) — in batch mode every
    * group arrives in one call, so output = min doc_id per hash,
    * which is the SQL oracle. */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), md5(col("text")).as("text_hash"))
      .as[Doc]
    dedupStateful(docs)
      .toDF()
      .select(col("doc_id"), col("text_hash"))
      .orderBy(col("doc_id"))
  }

  /** One simhash-chunked doc row for the near-dup stream: each doc
    * appears once per 16-bit chunk (idx 0..3, key = chunk value) —
    * the same pigeonhole blocking as the batch C4 join
    * ([[graft.operators.Dedup.dedupSimhash]]). */
  final case class ChunkedDoc(idx: Int, key: Int, doc_id: Long, sh: Long)
  /** A (doc_id, simhash) retained in a bucket's state. */
  final case class ShDoc(doc_id: Long, sh: Long)
  /** Per-bucket dedup state: every doc seen in this chunk bucket. */
  final case class ShBucket(docs: List[ShDoc])
  /** An emitted near-duplicate pair (doc_a < doc_b). */
  final case class NearDup(doc_a: Long, doc_b: Long, hamming: Int)

  val SimhashMaxHamming = 3

  private def chunkAt(sh: Long, i: Int): Int =
    ((sh >>> (i * 16)) & 0xFFFFL).toInt

  /** Smallest chunk index on which the two simhashes agree, -1 if
    * none. hamming <= 3 over 4 chunks guarantees >= 0 (pigeonhole). */
  private[streaming] def firstEqualChunk(a: Long, b: Long): Int = {
    var i = 0
    while (i < 4) {
      if (chunkAt(a, i) == chunkAt(b, i)) return i
      i += 1
    }
    -1
  }

  /** G4 near-dup core for one (idx, key) chunk bucket. Every new doc
    * is compared against the bucket's stored (doc_id, simhash) list
    * (and earlier arrivals in the same batch); a hamming-≤3 pair is
    * emitted from exactly ONE of the buckets both docs share — the
    * one whose idx is [[firstEqualChunk]] of the pair — so no
    * cross-group `distinct` is needed to get the batch join's
    * deduplicated pair set. Input is assumed exact-deduped upstream
    * ([[dedupFn]] is the preceding stage); re-sending a doc_id would
    * re-emit its pairs. */
  def neardupFn(bucket: (Int, Int), docs: Iterator[ChunkedDoc],
      state: GroupState[ShBucket]): Iterator[NearDup] = {
    val incoming = docs.toVector.sortBy(_.doc_id)
    val out = Vector.newBuilder[NearDup]
    var have = state.getOption.map(_.docs).getOrElse(Nil)
    incoming.foreach { d =>
      have.foreach { o =>
        val h = java.lang.Long.bitCount(o.sh ^ d.sh)
        if (o.doc_id != d.doc_id && h <= SimhashMaxHamming &&
            firstEqualChunk(o.sh, d.sh) == bucket._1) {
          out += (if (o.doc_id < d.doc_id) NearDup(o.doc_id, d.doc_id, h)
                  else NearDup(d.doc_id, o.doc_id, h))
        }
      }
      have = ShDoc(d.doc_id, d.sh) :: have
    }
    state.update(ShBucket(have))
    out.result().iterator
  }

  /** Shared stateful near-dup over a chunked doc stream (batch or
    * streaming — one transform, two execution modes, like G1–G3).
    *
    * Scale: state per bucket is the bucket's (doc_id, simhash) list —
    * 16 bytes per doc per bucket, 4 buckets per doc = 64 bytes/doc
    * total, never document content. Per-bucket compare cost is the
    * bucket's occupancy; 2^16 keys per chunk index spread a uniform
    * corpus 262 144 ways. Like [[dedupFn]], state never expires by
    * design (a near-dup may arrive much later); bounding it is a
    * retention decision — swap `NoTimeout` for
    * `ProcessingTimeTimeout` + a TTL for "near-dup within N days". */
  def neardupStateful(docs: Dataset[ChunkedDoc]): Dataset[NearDup] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => (d.idx, d.key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        neardupFn)
  }

  /** TTL-bounded variant of [[neardupStateful]] — the "near-dup
    * within N days" retention decision the contract above names, made
    * concrete. A bucket idle past `ttlMs` drops its whole
    * (doc_id, simhash) list on the next trigger, so a HOT pigeonhole
    * bucket's state is bounded by arrival-rate × ttl instead of
    * corpus size — the declared semantic trade being that a near-dup
    * arriving after the window pairs with nothing. Timeouts are
    * processing-time: they fire for buckets that receive no data in a
    * batch (a bucket receiving data instead re-arms its deadline).
    * StreamsSpec stresses this with a planted hot bucket.
    *
    * Operational note: with ProcessingTimeTimeout the state operator
    * reports `shouldRunAnotherBatch` unconditionally (a later wall
    * clock may fire timeouts), so the query keeps scheduling no-data
    * micro-batches and `processAllAvailable()` NEVER observes
    * quiescence — drive tests/tools by polling the sink, and give the
    * query a real trigger interval so idle eviction batches don't
    * spin (StreamsSpec does both). */
  def neardupStatefulTtl(docs: Dataset[ChunkedDoc],
      ttlMs: Long): Dataset[NearDup] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => (d.idx, d.key))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout) {
        (bucket: (Int, Int), ds: Iterator[ChunkedDoc],
            state: GroupState[ShBucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = neardupFn(bucket, ds, state)
            state.setTimeoutDuration(ttlMs)
            out
          }
      }
  }

  /** G4 batch entry: simhash hamming-≤3 near-dup pairs over
    * `documents`, computed through the streaming state machine. In
    * batch mode each bucket's full history arrives in one call, so
    * the output is exactly [[graft.operators.Dedup.dedupSimhash]]'s
    * pair set (StreamsSpec asserts set equality) — rows-only `[R]`
    * entry like C4 (simhash is not cross-engine reproducible). */
  def streamNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val chunked = Tables(spark, dir).documents
      .select(col("doc_id"), H.simhash(col("text")).as("sh"))
      .select(col("doc_id"), col("sh"),
        posexplode(H.simhashChunks(col("sh"))).as(Seq("idx", "key")))
      .select(col("idx").cast("int").as("idx"),
        col("key").cast("int").as("key"), col("doc_id"), col("sh"))
      .as[ChunkedDoc]
    neardupStateful(chunked)
      .toDF()
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** A funnel event (G5). */
  final case class FEv(user_id: Long, event_type: String, ep: Long)
  /** Per-user funnel state: first view / first click strictly after /
    * first purchase strictly after; -1 = not reached. Three longs per
    * user — never the event history. (Public: the streaming state
    * encoder's generated code cannot see a private class.) */
  final case class FunnelSt(t1: Long, t2: Long, t3: Long)
  /** A funnel snapshot row (same shape as the B-section
    * `events_funnel` batch query). */
  final case class FunnelRow(user_id: Long, t1: Option[Long],
      t2: Option[Long], t3: Option[Long], stage: Int)

  private def stageOf(s: FunnelSt): Int =
    if (s.t3 >= 0) 3 else if (s.t2 >= 0) 2 else if (s.t1 >= 0) 1 else 0

  /** G5 funnel core for one user. Events are folded in ep order; each
    * stage timestamp is set at most once (first view; first click
    * strictly after t1; first purchase strictly after t2), so the
    * state machine is monotone and a snapshot is emitted only when
    * the user is first seen or their stage advances — the LAST
    * emitted snapshot per user is their current funnel row.
    *
    * Exactness contract: equal to the batch funnel when each user's
    * events arrive in event-time order ACROSS batches (within a batch
    * any order is fine — the fold sorts). A late out-of-order view
    * cannot retroactively lower t1; that trade (3 longs of state vs
    * buffering the full per-user history) is the same one
    * [[sessionizeFn]] documents for late events. */
  def funnelFn(userId: Long, evs: Iterator[FEv],
      state: GroupState[FunnelSt]): Iterator[FunnelRow] = {
    val sorted = evs.toIndexedSeq.sortBy(_.ep)
    val first = !state.exists
    var s = state.getOption.getOrElse(FunnelSt(-1L, -1L, -1L))
    val before = stageOf(s)
    sorted.foreach { e =>
      e.event_type match {
        case "view" if s.t1 < 0 => s = s.copy(t1 = e.ep)
        case "click" if s.t1 >= 0 && e.ep > s.t1 && s.t2 < 0 =>
          s = s.copy(t2 = e.ep)
        case "purchase" if s.t2 >= 0 && e.ep > s.t2 && s.t3 < 0 =>
          s = s.copy(t3 = e.ep)
        case _ => ()
      }
    }
    state.update(s)
    val after = stageOf(s)
    if (first || after > before) {
      def opt(v: Long) = if (v >= 0) Some(v) else None
      Iterator(FunnelRow(userId, opt(s.t1), opt(s.t2), opt(s.t3), after))
    } else Iterator.empty
  }

  /** Shared stateful funnel over a typed event stream (batch or
    * streaming — one transform, two execution modes, like G1–G4).
    * State is 3 longs/user, forever by design (a funnel may complete
    * months after the first view); bound it with a TTL by swapping
    * `NoTimeout` for `ProcessingTimeTimeout` as in [[dedupFn]]. */
  def funnelStateful(evs: Dataset[FEv]): Dataset[FunnelRow] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        funnelFn)
  }

  /** G5 batch entry: the stateful funnel in batch mode — each user's
    * full history arrives in one call, so the output equals the
    * B-section `events_funnel` aggregate-join form and shares its SQL
    * oracle (StreamsSpec additionally drives the MemoryStream path
    * and asserts last-snapshot-per-user equality). */
  def streamFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep"))
      .as[FEv]
    funnelStateful(evs)
      .toDF()
      .select(col("user_id"), col("t1"), col("t2"), col("t3"), col("stage"))
      .orderBy(col("user_id"))
  }

  /** Typed hourly observation for anomaly: type key + hour index +
    * pre-folded count. A raw stream event carries n=1; the batch
    * entry feeds hourly-collapsed counts (see [[streamAnomaly]]) so
    * the |event_types| state shuffle moves ~25 rows per type, not the
    * whole event table. */
  final case class HEv(event_type: String, h: Long, n: Long)
  /** Per-type anomaly state: trailing hourly counts + the last hour
    * already scored. Bounded: hours older than maxSeen − 24 can never
    * appear in a future trailing window and are evicted each call.
    * (Public: streaming state encoder requirement.) */
  final case class AnomState(counts: Map[Long, Long], lastScored: Long)
  /** One scored hour (z unrounded: the batch entry applies the same
    * roundDuck column as events_anomaly so the shared oracle gates
    * bit-exactly). */
  final case class AnomScore(event_type: String, hour_ep: Long,
      n_events: Int, z: Double)

  /** G9 anomaly core for one event type. Merges the call's events
    * into the trailing per-hour count map, then scores every hour
    * whose window can no longer change: all hours below the max seen
    * (a later batch may still append events to the max hour itself —
    * the in-order contract of [[funnelFn]] applies across batches).
    * `emitTail=true` (batch): the full history arrived in one call,
    * so the max hour is final too — score it; output equals the
    * B-section `events_anomaly` RANGE-window form (shared oracle).
    * The z algebra mirrors that query operation-for-operation:
    * integer count/Σx/Σx² over the PRESENT hours in [h−24, h−1],
    * then one identical double expression tree — bit-exact.
    *
    * Scale: the group key is event_type — inherently low-cardinality,
    * so whatever crosses the groupByKey shuffle serializes through
    * ≤ |types| tasks. flatMapGroupsWithState has NO map-side partial
    * aggregation, so the caller must pre-fold where the planner
    * allows it: the batch entry collapses to hourly counts first
    * (`groupBy(event_type, h).count` — map-side combined, ~10⁴×
    * smaller than raw events) and this fn adds the pre-counted `n`s;
    * the streaming path feeds raw n=1 events because Structured
    * Streaming disallows an aggregate before fMGWS in append mode —
    * there the volume is bounded per micro-batch and inherent to
    * keyed state. State is ≤ 25 longs per type either way. */
  def anomalyFn(emitTail: Boolean)(tpe: String, evs: Iterator[HEv],
      state: GroupState[AnomState]): Iterator[AnomScore] = {
    val minN = graft.operators.Funnel.AnomalyMinBaseline
    var s = state.getOption.getOrElse(AnomState(Map.empty, Long.MinValue))
    val merged = evs.foldLeft(s.counts) { (m, e) =>
      m.updated(e.h, m.getOrElse(e.h, 0L) + e.n)
    }
    if (merged.isEmpty) return Iterator.empty
    val maxH = merged.keys.max
    val scoreUpTo = if (emitTail) maxH else maxH - 1
    val out = Seq.newBuilder[AnomScore]
    merged.keys.toSeq.sorted
      .filter(h => h > s.lastScored && h <= scoreUpTo)
      .foreach { h =>
        val win = ((h - 24) until h).flatMap(merged.get)
        val nw = win.size
        if (nw >= minN) {
          val sumx = win.sum
          val sumx2 = win.map(x => x * x).sum
          // same double tree as events_anomaly / the oracle
          val mean = sumx.toDouble / nw
          val varr = (sumx2.toDouble - sumx.toDouble * sumx / nw) / (nw - 1)
          if (varr > 0) {
            val cnt = merged(h)
            out += AnomScore(tpe, h * 3600,
              cnt.toInt, (cnt.toDouble - mean) / math.sqrt(varr))
          }
        }
      }
    s = AnomState(merged.filter { case (h, _) => h >= maxH - 24 },
      math.max(s.lastScored, scoreUpTo))
    state.update(s)
    out.result().iterator
  }

  /** Shared stateful anomaly scorer (batch or streaming). */
  def anomalyStateful(evs: Dataset[HEv],
      emitTail: Boolean): Dataset[AnomScore] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        anomalyFn(emitTail))
  }

  /** G9 batch entry: full history per type in one call with
    * `emitTail=true` ⇒ equals the B-section `events_anomaly` and
    * shares its SQL oracle (z rounded by the same roundDuck column,
    * spike flag from the same unrounded compare).
    *
    * The event table is collapsed to `(event_type, h, n)` hourly
    * counts BEFORE the stateful op: the groupBy gets Spark's map-side
    * partial aggregation, so the |event_types|-task state shuffle
    * moves ~hours×types pre-counted rows instead of replaying every
    * raw event through ≤ |types| tasks (StreamsSpec asserts the
    * partial aggregate sits below the state op in the executed
    * plan). Integer counts fold identically, so the shared oracle
    * stays bit-exact. */
  def streamAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).events
      .select(col("event_type"), Tables.tsNsToSec("ts").as("ep"))
      .selectExpr("event_type", "ep div 3600L AS h")
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"))
      .as[HEv]
    val zThr = graft.operators.Funnel.AnomalySpikeZ
    anomalyStateful(evs, emitTail = true)
      .toDF()
      .select(col("event_type"), col("hour_ep"), col("n_events"),
        graft.functions.OracleMath.roundDuck(col("z"), 4).as("z"),
        (abs(col("z")) > zThr).as("is_spike"))
      .orderBy(col("event_type"), col("hour_ep"))
  }

  /** Typed event for attribution: full ns timestamp + event_id so the
    * (ts, event_id) tiebreak matches the batch form exactly. */
  final case class AEv(event_id: Long, user_id: Long,
      event_type: String, ts: Long)
  /** Per-user attribution state: the first touch ever seen and the
    * latest touch so far, plus the touch count — 2 strings + 3 longs,
    * never history. (Public: streaming state encoder requirement.) */
  final case class AttState(firstType: String, firstId: Long,
      lastType: String, lastId: Long, n: Long)
  /** One attributed conversion (same column contract as the B-section
    * `events_attribution`). */
  final case class AttHit(purchase_id: Long, user_id: Long, ep: Long,
      first_touch_type: Option[String], first_touch_id: Option[Long],
      last_touch_type: Option[String], last_touch_id: Option[Long],
      n_touches: Int)

  /** G8 attribution core for one user. Folds events in (ts, event_id)
    * order: a view/click updates the touch state (first is set once,
    * last always, count increments); a purchase emits an attribution
    * row from the state AS OF strictly before it — same-call later
    * touches cannot leak in because the fold is ordered. No-touch
    * purchases emit NULL credit, matching the batch window form.
    * In-order contract across batches as [[funnelFn]]: a late
    * out-of-order touch cannot retroactively re-credit an
    * already-emitted purchase (3 longs + 2 strings of state vs
    * buffering full history — the same trade, documented). */
  def attributionFn(userId: Long, evs: Iterator[AEv],
      state: GroupState[AttState]): Iterator[AttHit] = {
    // Per-user memory contract (as funnelFn/retentionFn): this buffer
    // holds ONE user's events for ONE call — the whole corpus history
    // in batch (~10² events/user here; bounded by per-user activity,
    // not table size) and one micro-batch's slice in streaming
    // (bounded by trigger interval × per-user rate). It is never the
    // group-key cardinality or the table; cross-batch memory is the
    // fixed 2-string+3-long AttState.
    val sorted = evs.toIndexedSeq.sortBy(e => (e.ts, e.event_id))
    var s = state.getOption.orNull
    val out = Seq.newBuilder[AttHit]
    sorted.foreach { e =>
      e.event_type match {
        case "purchase" =>
          out += AttHit(e.event_id, userId, e.ts / 1000000000L,
            Option(s).map(_.firstType), Option(s).map(_.firstId),
            Option(s).map(_.lastType), Option(s).map(_.lastId),
            Option(s).map(_.n.toInt).getOrElse(0))
        case "view" | "click" =>
          s = if (s == null)
            AttState(e.event_type, e.event_id, e.event_type, e.event_id, 1L)
          else
            s.copy(lastType = e.event_type, lastId = e.event_id, n = s.n + 1)
        case _ => ()
      }
    }
    // Users with no touches keep no state row (absent state ==
    // no-credit sentinel), same footprint rule as retentionFn.
    if (s != null) state.update(s)
    out.result().iterator
  }

  /** Shared stateful attribution (batch or streaming). State lives
    * forever by design (a conversion may follow its first touch by
    * months); bound with ProcessingTimeTimeout as in [[dedupFn]]. */
  def attributionStateful(evs: Dataset[AEv]): Dataset[AttHit] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        attributionFn)
  }

  /** G8 batch entry: each user's full history in one call ⇒ equals
    * the B-section `events_attribution` window form and shares its
    * SQL oracle (StreamsSpec drives the MemoryStream path). */
  def streamAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .as[AEv]
    attributionStateful(evs)
      .toDF()
      .select(col("purchase_id"), col("user_id"), col("ep"),
        col("first_touch_type"), col("first_touch_id"),
        col("last_touch_type"), col("last_touch_id"), col("n_touches"))
      .orderBy(col("purchase_id"))
  }

  /** Per-user retention state: cohort week (-1 until the first
    * signup is seen) + the week offsets already emitted. (Public:
    * streaming state encoder requirement, as above.) */
  final case class RetState(cohortWeek: Long, emitted: Set[Long])
  /** A first-activity event: user was active in cohort_week+offset. */
  final case class RetHit(user_id: Long, cohort_week: Long, week_offset: Long)

  /** G6 retention core for one user. Folds events in ep order: the
    * first signup fixes the cohort week; every event at offset ≥ 0
    * emits (user, cohort, offset) the FIRST time that offset is
    * seen. Pre-signup activity is dropped (offset < 0 by
    * definition once the cohort is known; unknowable before — the
    * in-order contract of [[funnelFn]] applies across batches).
    * State is the cohort long + the emitted-offset set (≤ one entry
    * per active week — bounded by corpus age in weeks; a bitmask
    * packs the first 64). */
  def retentionFn(userId: Long, evs: Iterator[FEv],
      state: GroupState[RetState]): Iterator[RetHit] = {
    // The -1 cohort sentinel (and funnelFn's -1s) assumes epochs are
    // >= 0, i.e. no pre-1970 event times — true of any live stream
    // and of the test corpus; pre-1970 history would need a
    // nullable-state redesign AND floor (not truncating) division to
    // keep week indexes aligned with the batch oracle's `//`.
    val wk = graft.operators.Funnel.WeekSeconds
    val sorted = evs.toIndexedSeq.sortBy(_.ep)
    var s = state.getOption.getOrElse(RetState(-1L, Set.empty))
    val out = Seq.newBuilder[RetHit]
    sorted.foreach { e =>
      if (s.cohortWeek < 0 && e.event_type == "signup")
        s = s.copy(cohortWeek = e.ep / wk)
      if (s.cohortWeek >= 0) {
        val off = e.ep / wk - s.cohortWeek
        if (off >= 0 && !s.emitted.contains(off)) {
          out += RetHit(userId, s.cohortWeek, off)
          s = s.copy(emitted = s.emitted + off)
        }
      }
    }
    // Never-signed-up users keep no state row: the sentinel state is
    // indistinguishable from absent state, and persisting it would
    // grow the store by one permanent row per active user instead of
    // one per signed-up user.
    if (s.cohortWeek >= 0) state.update(s)
    out.result().iterator
  }

  /** Shared stateful first-activity stream (batch or streaming). */
  def retentionStateful(evs: Dataset[FEv]): Dataset[RetHit] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        retentionFn)
  }

  /** G6 batch entry: aggregate the stateful first-activity emissions
    * into the cohort table — in batch mode each user's full history
    * arrives in one call, so this equals the B-section
    * `events_retention` window form and shares its SQL oracle. */
  def streamRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep"))
      .as[FEv]
    retentionStateful(evs)
      .toDF()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** G7 transform: stream-static dimension enrichment. The static
    * customer dim is broadcast into every micro-batch — the join is
    * STATELESS (no watermark, no state store; only the windowed agg
    * after it holds state). At 100 TB the stream side never shuffles
    * for the join; the dim refreshes per micro-batch from its source,
    * which is exactly how a slowly-changing enrichment table should
    * ride along. Works on any (ts: long ns, user_id, value) frame,
    * batch or stream. */
  def enrichTransform(events: DataFrame, customer: DataFrame): DataFrame =
    // Same ep_ts pass-through contract as [[windowAggTransform]]: a
    // streaming caller watermarks its own ep_ts so the windowed agg
    // after the stateless join can run append mode and evict state.
    (if (events.columns.contains("ep_ts")) events
     else events.withColumn("ep_ts",
       Tables.tsNsToSec("ts").cast("timestamp")))
      .join(broadcast(customer.select(col("c_custkey").as("user_id"),
                                      col("c_mktsegment"))),
            Seq("user_id"))
      .groupBy(window(col("ep_ts"), "1 day"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("day_start"),
              col("c_mktsegment"), col("n_events"), col("sum_value"))

  /** One incoming doc for [[packFn]] (public: streaming state
    * encoder requirement). */
  final case class PDoc(doc_id: Long, source: String, n_tokens: Long)
  /** Per-source packer state: the next free offset in the shard's
    * token stream — ONE long per source, the smallest possible
    * streaming state (compare: the batch window form re-sorts the
    * shard; the stream just keeps a cursor). */
  final case class PackState(nextOff: Long)
  /** A doc placed into its context window. */
  final case class PackedDoc(doc_id: Long, source: String, n_tokens: Int,
      seq_id: Int, seq_offset: Int)

  /** G11 core for one source shard: lay incoming docs onto the
    * shard's running token stream, assigning each the window holding
    * its first token. In-order contract: docs arrive in doc_id order
    * per source across batches (the same per-key in-order contract as
    * [[funnelFn]]/[[retentionFn]]; within one call arrival order is
    * free — the fold sorts). Batch mode sees the whole shard in one
    * call, so output equals the J2 window form exactly — shared SQL
    * oracle. */
  def packFn(source: String, docs: Iterator[PDoc],
      state: GroupState[PackState]): Iterator[PackedDoc] = {
    val b = graft.operators.Sampling.PackBudget
    val sorted = docs.toIndexedSeq.sortBy(_.doc_id)
    var off = state.getOption.map(_.nextOff).getOrElse(0L)
    val out = sorted.map { d =>
      val start = off
      off += d.n_tokens
      PackedDoc(d.doc_id, source, d.n_tokens.toInt,
        (start / b).toInt, (start % b).toInt)
    }
    state.update(PackState(off))
    out.iterator
  }

  /** Shared stateful packer (batch or streaming). */
  def packStateful(docs: Dataset[PDoc]): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        packFn)
  }

  /** G11 batch entry: equals J2 pack_sequences row-for-row (shared
    * SQL oracle) — the online packer and the batch packer cannot
    * drift. */
  def streamPack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.wsTokenCount(col("text"))
          .cast("long").as("n_tokens"))
      .as[PDoc]
    packStateful(docs)
      .toDF()
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("seq_id"), col("seq_offset"))
      .orderBy(col("doc_id"))
  }

  /** G10 transform: streaming ingestion sampling — the J1
    * sample_stratified predicate applied to documents as they
    * arrive (sample the firehose at ingest, don't land it all and
    * thin later). Each row's fate is a pure function of its own key
    * (fixed-width-hex md5 draw vs the stratum threshold), so the
    * streaming plan is scan → project → filter: STATELESS — no state
    * store, no watermark, no shuffle, nothing to checkpoint but the
    * source offsets — and the kept set is bit-identical to the batch
    * sample over the same rows regardless of micro-batching or
    * arrival order (J1's determinism carried to the stream;
    * StreamsSpec drives both and asserts zero state operators).
    * Works on any (doc_id, lang) frame, batch or stream. */
  def sampleTransform(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        graft.operators.Sampling.hashBucket(col("doc_id")).as("bucket"),
        graft.operators.Sampling.langThresholdCol.as("thr"))
      .filter(col("bucket") < col("thr"))

  /** G10 batch entry — equals J1 sample_stratified row-for-row and
    * shares its SQL oracle. */
  def streamSample(spark: SparkSession, dir: String): DataFrame =
    sampleTransform(Tables(spark, dir).documents)
      .orderBy(col("doc_id"))

  /** G13 batch entry: streaming mixture thinning — the J3 recipe
    * filter applied to documents as they arrive. The per-source rate
    * table is computed BATCH-side from the reference corpus
    * ([[graft.operators.Sampling.mixRatesOf]] — rates from
    * yesterday's corpus, the way recipe thinning deploys) and
    * broadcast into each micro-batch; the stream side is then the
    * same stateless per-row md5-vs-threshold filter as
    * [[sampleTransform]] — no state store, no watermark, no stream
    * shuffle, and the kept set is bit-identical to batch mix_sources
    * under any micro-batching (StreamsSpec drives it live; shared
    * SQL oracle). */
  def streamMix(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    graft.operators.Sampling.mixApply(d, graft.operators.Sampling.mixRatesOf(d))
      .orderBy(col("doc_id"))
  }

  /** G14 batch entry: ingest-time PII scrubbing — E11 text_pii's
    * detection + redaction applied to documents as they arrive (scrub
    * at ingest so raw PII never lands in the lake — the deploy shape
    * privacy reviews actually ask for). Each row's counts and
    * rewritten text are pure functions of that row alone
    * ([[graft.functions.TextQueries.piiScanOf]] — codegen'd
    * regexp_count/regexp_replace/md5), so the streaming plan is
    * scan → project: STATELESS — no state store, no watermark, no
    * stream shuffle, nothing checkpointed but source offsets — and
    * the output is bit-identical to the batch scrub over the same
    * rows under any micro-batching or arrival order (StreamsSpec
    * drives a real MemoryStream and asserts zero state operators).
    * Shares E11's SQL oracle. */
  def streamPii(spark: SparkSession, dir: String): DataFrame =
    graft.functions.TextQueries.textPii(spark, dir)

  /** G28 transform + batch entry: ingest-time Gopher quality gate —
    * the streaming twin of E24 `quality_gopher_rules` reduced to its
    * production use (admit only passing docs at ingest, before they
    * land in the lake). The per-row form
    * ([[graft.functions.TextQueries.gopherRulesRowOf]]) computes all
    * five rule inputs in ONE generated loop (GopherStats) — no
    * explode, no groupBy, no repeated text passes — so the streaming plan is
    * scan → project: STATELESS, no state store, no watermark,
    * bit-identical to the batch rules under any micro-batching
    * (StreamsSpec drives a real MemoryStream and asserts zero state
    * operators; GopherRulesSpec proves row-form == agg-form on the
    * corpus). Shares the E24 oracle CTEs with the pass-filter
    * applied. */
  def streamQualityGate(spark: SparkSession, dir: String): DataFrame =
    qualityGateTransform(graft.Tables(spark, dir).documents)
      .orderBy(col("doc_id"))

  /** G29 batch entry: ingest-time language ID — E3 text_langid's
    * per-row marker-count classifier applied as docs arrive (route/
    * tag by language BEFORE landing, the shape multilingual ingest
    * actually needs). The transform
    * ([[graft.functions.TextQueries.langidScanOf]]) is a pure
    * scan → project (codegen'd token counts, no shuffle): STATELESS
    * — no state store, no watermark — and bit-identical to the
    * batch classifier under any micro-batching or arrival order
    * (StreamsSpec drives a real MemoryStream and asserts zero state
    * operators). Shares E3's SQL oracle. */
  def streamLangid(spark: SparkSession, dir: String): DataFrame =
    graft.functions.TextQueries.textLangid(spark, dir)

  /** G39 (round 14): ingest-time readability scoring — the stateless
    * streaming twin of E25 text_readability (the langid/pii twin
    * class): a difficulty/band label the moment a doc arrives, per-row
    * codegen'd regexp counts, zero state, bit-identical under any
    * micro-batching (StreamsSpec drives readabilityScanOf through a
    * real MemoryStream and asserts no state operator). Shares E25's
    * oracle verbatim. */
  def streamReadability(spark: SparkSession, dir: String): DataFrame =
    graft.functions.TextQueries.textReadability(spark, dir)

  /** G40 (round 15): ingest-time sentence segmentation — the
    * stateless streaming twin of E35 text_sentences (the
    * langid/pii/readability twin class): split each arriving doc
    * into per-sentence rows at the edge (the chunk-before-land shape
    * ingest tokenizers want), a pure scan → posexplode, zero state,
    * bit-identical under any micro-batching (StreamsSpec drives
    * sentencesScanOf through a real MemoryStream and asserts no
    * state operator). Shares E35's oracle verbatim. */
  def streamSentences(spark: SparkSession, dir: String): DataFrame =
    graft.functions.TextQueries.textSentences(spark, dir)

  /** The stream-or-batch gate: kept docs with their rule inputs. */
  def qualityGateTransform(docs: DataFrame): DataFrame =
    graft.functions.TextQueries.gopherRulesRowOf(docs)
      .filter(col("pass"))
      .select(col("doc_id"), col("n_tok"), col("n_distinct"),
        col("mean_word_len"), col("distinct_ratio"),
        col("top_token_ratio"), col("n_stop_kinds"))

  /** G15 transform: ingest-time eval-set decontamination — the
    * stream-static twin of C9 `decontaminate` (quarantine a training
    * doc the moment it arrives if it contains ≥ Tau of any eval doc's
    * 3-gram shingle set, instead of sweeping the corpus after the
    * fact). The static side is the eval shingle index
    * (Decontaminate.evalIndexOf: per-doc distinct cut hashes + cut
    * set size, df cut over the eval slice only — the honest
    * ingest-time semantics; the unbounded train stream's df is
    * unknowable). The stream side explodes each arriving doc's
    * distinct shingles (native codegen ShingleHashes), equi-joins the
    * index — broadcast-shaped: benchmarks are tiny at any corpus
    * scale, so NO stream state for the join itself — and counts
    * matches per (ingest window, train doc, eval doc) under the
    * caller's watermark, so aggregation state is evicted and append
    * mode works. A train doc's shingles all carry its single ingest
    * timestamp, so the per-pair count completes within one window by
    * construction. Emits containment ≥ Tau — the quarantine feed. */
  def decontamStreamTransform(train: DataFrame, evalIdx: DataFrame): DataFrame =
    train
      .select(col("doc_id").as("train_doc"), col("ep_ts"),
        explode(H.shingleHashes(col("text"), 3)).as("s"))
      .join(broadcast(evalIdx), "s")
      .groupBy(window(col("ep_ts"), "1 hour"), col("train_doc"),
        col("eval_doc"), col("n"))
      .agg(count(lit(1)).as("c"))
      .withColumn("contain", col("c").cast("double") / col("n"))
      .filter(col("contain") >= graft.operators.Decontaminate.Tau)
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("train_doc"), col("eval_doc"),
        round(col("contain"), 4).as("contain"))

  /** G15 batch entry (driver-verified against the DuckDB oracle):
    * ingest time synthesized as doc_id seconds — deterministic,
    * spreads docs across 1-hour windows as the corpus grows. */
  def streamDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val ev = graft.operators.Decontaminate.EvalSource
    val evalIdx = graft.operators.Decontaminate.evalIndexOf(
      d.filter(col("source") === ev))
    val train = d.filter(col("source") =!= ev)
      .withColumn("ep_ts", col("doc_id").cast("timestamp"))
    decontamStreamTransform(train, evalIdx)
      .orderBy(col("win_start"), col("train_doc"), col("eval_doc"))
  }

  /** G16 transform: ingest-time BM25 scoring — the stream-static twin
    * of E14 `text_bm25` (score each document for the fixed retrieval
    * query the moment it arrives, instead of ranking the corpus after
    * the fact — the "route the docs most about X" ingest tap). The
    * static side is the corpus index statistics (N, Σdl, per-term df
    * — what a production scorer holds as its index metadata),
    * broadcast into every micro-batch via a constant-key equi-join
    * (stream-static, no state). The stream side explodes each
    * arriving doc's tokens and aggregates dl + per-term conditional
    * tfs per (ingest window, doc) — a doc's tokens all carry its
    * single ingest timestamp, so the count completes within one
    * window by construction and append mode works under the caller's
    * watermark (the decontaminate-twin pattern). Emits every scored
    * doc containing a query term; there is deliberately NO top-k cut
    * — a global cut over an unbounded stream is undefined in append
    * mode, so ranking is the batch consumer's job
    * ([[graft.functions.TextQueries.textBm25]]).
    *
    * Score algebra and FP-order contract are single-sourced with the
    * batch entry ([[graft.functions.TextQueries.bm25ScoreExpr]]) —
    * stream and batch cannot disagree. */
  def bm25StreamTransform(docs: DataFrame, stats: DataFrame): DataFrame = {
    import graft.functions.{TextQueries => TQ}
    TQ.bm25Toks(docs, Seq("doc_id", "ep_ts"))
      .groupBy(window(col("ep_ts"), "1 hour"), col("doc_id"))
      .agg(TQ.bm25TfAggs.head, TQ.bm25TfAggs.tail: _*)
      .withColumn("one", lit(1))
      .join(broadcast(stats.withColumn("one", lit(1))), "one")
      .filter(TQ.bm25AnyTerm)
      .withColumn("score", TQ.bm25ScoreExpr)
      .select(unix_timestamp(col("window.start")).as("win_start") +:
        col("doc_id") +: TQ.Bm25Terms.map(t => col(s"tf_$t")) :+
        col("dl") :+
        graft.functions.OracleMath.roundDuck(col("score"), 4).as("score"): _*)
  }

  /** G16 batch entry (driver-verified against the DuckDB oracle):
    * ingest time synthesized as doc_id seconds (the G15 convention);
    * stats computed over the full corpus — the steady-state index a
    * long-running scorer would hold. */
  def streamBm25(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextQueries => TQ}
    val d = Tables(spark, dir).documents
    val stats = TQ.bm25StatsOf(
      TQ.bm25Toks(d, Seq("doc_id"))
        .groupBy("doc_id").agg(TQ.bm25TfAggs.head, TQ.bm25TfAggs.tail: _*))
    bm25StreamTransform(
      d.withColumn("ep_ts", col("doc_id").cast("timestamp")), stats)
      .orderBy(col("win_start"), col("doc_id"))
  }

  /** Max view→click lag in seconds for the G12 stream-stream interval
    * join (single-sourced into the DuckDB oracle). */
  val ViewClickLagMax = 1800L

  /** G12 transform: STREAM-STREAM interval join — attribute each
    * click to every view by the same user within the preceding
    * [[ViewClickLagMax]] seconds. Works on any pair of
    * (user_id, event_id, ep_ts) frames, batch or stream.
    *
    * The one Structured Streaming capability class the G section
    * lacked: both sides are unbounded, so unlike the stream-static
    * [[enrichTransform]] the join itself must hold state. A streaming
    * caller derives AND WATERMARKS both ep_ts columns itself (the
    * [[windowAggTransform]] contract); with watermarks on both
    * inputs and this predicate bounding both event times against
    * each other, Spark derives a state watermark and EVICTS buffered
    * rows older than watermark − lag — bounded state at any rate
    * (asserted live in StreamsSpec). At 100 TB the join is an
    * equi-join on user_id: both sides hash-partition by user, state
    * is per-partition, and the lag bound keeps each partition's
    * buffer a sliding window rather than the full history. Batch
    * mode is the same logical join (two column-pruned scans of one
    * source — a genuine self-join, not a repeated-subtree accident),
    * so the entry shares one SQL oracle with the stream path. */
  def viewClickJoinTransform(views: DataFrame, clicks: DataFrame): DataFrame =
    views
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ep_ts").as("view_ts"))
      .join(
        clicks.select(col("user_id").as("c_user"),
          col("event_id").as("click_id"), col("ep_ts").as("click_ts")),
        expr(s"""v_user = c_user
                |AND click_ts >= view_ts
                |AND click_ts <= view_ts + interval $ViewClickLagMax seconds
                |""".stripMargin))
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        unix_timestamp(col("view_ts")).as("view_ep"),
        unix_timestamp(col("click_ts")).as("click_ep"),
        (unix_timestamp(col("click_ts")) - unix_timestamp(col("view_ts")))
          .as("lag_s"))

  /** G12 batch entry (driver-verified against the DuckDB oracle). */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .withColumn("ep_ts", Tables.tsNsToSec("ts").cast("timestamp"))
    viewClickJoinTransform(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "click"))
      .orderBy(col("user_id"), col("view_id"), col("click_id"))
  }

  /** G7 batch entry (driver-verified against the DuckDB join oracle). */
  def streamEnrich(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    enrichTransform(t.events, t.customer)
      .orderBy(col("day_start"), col("c_mktsegment"))
  }

  /** G2 batch entry: the same flatMapGroupsWithState path, batch mode
    * (full history per group, open sessions emitted) — output is
    * byte-identical to the window-function batch form
    * ([[graft.operators.Sessionize]]), so it shares that SQL oracle. */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"),
        Tables.tsNsToSec("ts").as("ep"), col("value"))
      .as[Ev]
    sessionizeStateful(evs, emitOpen = true)
      .toDF()
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("session_start"), col("session_end"),
        round(col("session_value"), 4).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  // ----- G17: composed ingest-time curation gate -------------------

  /** A post-scrub document entering [[curateFn]]'s stateful dedup
    * stage (public: the streaming state encoder's generated code
    * cannot see a private class). */
  final case class CurDoc(doc_id: Long, text_hash: String,
      n_pii: Int, quality: Double)

  /** Re-ingest offset for [[streamCurate]]'s replay feed. Divisible
    * by 3·5·7 so a replayed doc draws the SAME PII augmentation
    * GATES as its original (email/phone/IP present or not), while
    * the synthesized values themselves (local part, phone digits)
    * differ — the two copies are distinct strings BEFORE the scrub
    * and byte-identical AFTER it. */
  val ReingestOffset = 1050000L

  /** The deterministic ingest feed: every document, plus a "crawled
    * again" replay of each doc_id % 10 = 6 doc under a new id. The
    * corpus ships no exact duplicates at small SF, so without the
    * replay the dedup stage would be vacuous at the gate scale; with
    * it, scrub-then-dedup provably collapses pairs at every SF. */
  def curateFeed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionAll(
        docs.filter(col("doc_id") % 10 === 6)
          .select((col("doc_id") + ReingestOffset).as("doc_id"),
            col("text")))

  /** G17 stateless prefix: PII scrub (E11's augment + redact,
    * single-sourced from TextQueries) → quality floor over the
    * SCRUBBED text (the gate scores what it would keep — Curate's
    * E2 expression tree over the redacted string, same MinQuality
    * floor). Everything here is per-row codegen'd builtins: at
    * 100 TB this prefix is map-only work with zero shuffles. */
  def curatePrep(feed: DataFrame): DataFrame = {
    import graft.functions.{TextFunctions => T, TextQueries => TQ}
    val aug = feed.select(col("doc_id"),
      TQ.piiAugmented(col("doc_id"), col("text")).as("pii_text"))
    val red = aug.select(col("doc_id"), col("pii_text"),
      TQ.piiRedacted(col("pii_text")).as("red"))
    val nTok = T.wsTokenCount(col("red"))
    val stopRatio = T.tokenCountIn(col("red"), T.EnStopwords) / nTok
    val punctRatio = T.punctCount(col("red")) / length(col("red"))
    val nPii = (regexp_count(col("pii_text"), lit(TQ.EmailRe)) +
      regexp_count(col("pii_text"), lit(TQ.PhoneRe)) +
      regexp_count(col("pii_text"), lit(TQ.IpRe))).cast("int")
    red.select(col("doc_id"),
        md5(col("red")).as("text_hash"),
        nPii.as("n_pii"),
        T.qualityScore(nTok, stopRatio, punctRatio).as("q_raw"))
      // floor on the RAW value (Curate's convention — the rounded
      // form is presentation only), round for output
      .filter(col("q_raw") >= graft.operators.Curate.MinQuality)
      .select(col("doc_id"), col("text_hash"), col("n_pii"),
        round(col("q_raw"), 4).as("quality"))
  }

  /** G17 dedup core: first (min doc_id) doc per POST-SCRUB content
    * hash — the privacy-correct order (two docs differing only in
    * their PII are the same document once scrubbed; deduping
    * pre-scrub would keep both). Same one-long-per-key state shape
    * as [[dedupFn]]. */
  def curateFn(hash: String, docs: Iterator[CurDoc],
      state: GroupState[SeenRep]): Iterator[CurDoc] =
    if (state.exists) {
      docs.foreach(_ => ())
      Iterator.empty
    } else {
      val rep = docs.minBy(_.doc_id)
      state.update(SeenRep(rep.doc_id))
      Iterator(rep)
    }

  /** Shared stateful stage over the prepped stream (batch or
    * streaming — one transform, two execution modes). */
  def curateStateful(docs: Dataset[CurDoc]): Dataset[CurDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.text_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        curateFn)
  }

  // ----- G18: online RFM metric tracking ---------------------------

  /** One purchase for the RFM stream. */
  final case class PEvt(user_id: Long, ep: Long, cents: Long)
  /** Per-user running RFM metrics (public for the state encoder). */
  final case class RfmAcc(last_ep: Long, freq: Long, cents: Long)

  /** G18 core: per-user running (last purchase epoch, purchase
    * count, exact cents) — the metrics half of B's events_rfm
    * maintained online. State is THREE longs per user, never
    * history; cents stay exact integers (the batch entry's Σ floor
    * (value·100) discipline), so the running sum is order-free and
    * a later batch's update commutes. One updated metrics row per
    * user per batch that saw activity. Scoring (quintile boundaries
    * — corpus-level state) stays a batch-side pass over the metrics
    * ([[graft.operators.Funnel.rfmScore]]); maintaining metrics
    * online and scoring on read is exactly how production RFM
    * dashboards run. */
  def rfmFn(user: Long, evs: Iterator[PEvt],
      state: GroupState[RfmAcc]): Iterator[(Long, Long, Long, Long)] = {
    val es = evs.toVector
    if (es.isEmpty) return Iterator.empty
    val prev = state.getOption.getOrElse(RfmAcc(Long.MinValue, 0L, 0L))
    val next = RfmAcc(
      math.max(prev.last_ep, es.map(_.ep).max),
      prev.freq + es.length,
      prev.cents + es.map(_.cents).sum)
    state.update(next)
    Iterator((user, next.last_ep, next.freq, next.cents))
  }

  /** Shared stateful metrics stage (batch or streaming). */
  def rfmStateful(evs: Dataset[PEvt]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        rfmFn)
      .toDF("user_id", "last_ep", "freq", "cents")
  }

  // ----- G19: online interval-union coverage -----------------------

  /** One event for the coverage stream. */
  final case class CovEv(user_id: Long, ep: Long, event_id: Long)
  /** Per-user sweep state (public for the state encoder): the
    * frontier end plus three running totals — never history. */
  final case class CovAcc(cur_end: Long, n_events: Long,
    covered: Long, segments: Long)

  /** G19 core: B's interval_coverage sweep-line maintained online.
    * Because interval width is constant, the batch query's "max end
    * over strictly preceding rows" is just the PREVIOUS FRONTIER —
    * so the whole union-coverage state is four longs per user. Each
    * call folds its (sorted) events into the frontier: a new
    * interval either starts a segment past the frontier or extends
    * it by its uncovered suffix; integers throughout. In-order
    * event-time replay is the same contract as the other stateful
    * twins (a pre-frontier straggler would need the batch form).
    * One updated snapshot row per user per active batch. */
  def covFn(user: Long, evs: Iterator[CovEv],
      state: GroupState[CovAcc]): Iterator[(Long, Long, Long, Long)] = {
    val es = evs.toVector.sortBy(e => (e.ep, e.event_id))
    if (es.isEmpty) return Iterator.empty
    var acc = state.getOption.getOrElse(CovAcc(Long.MinValue, 0L, 0L, 0L))
    es.foreach { e =>
      val end = e.ep + CoverageWin
      acc =
        if (acc.n_events == 0L || e.ep >= acc.cur_end)
          CovAcc(end, acc.n_events + 1, acc.covered + CoverageWin,
            acc.segments + 1)
        else
          CovAcc(math.max(acc.cur_end, end), acc.n_events + 1,
            acc.covered + math.max(0L, end - acc.cur_end), acc.segments)
    }
    state.update(acc)
    Iterator((user, acc.n_events, acc.covered, acc.segments))
  }

  /** Interval width — single-sourced from the batch operator. */
  def CoverageWin: Long = graft.operators.Lifecycle.CoverageWindowSec

  /** Shared stateful coverage stage (batch or streaming). */
  def covStateful(evs: Dataset[CovEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        covFn)
      .toDF("user_id", "n_events", "covered_sec", "n_segments")
  }

  /** G19 batch entry: each user's history in one call ⇒ the full
    * sweep — output identical to B's interval_coverage, same SQL
    * oracle. */
  def streamCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).events
      .select(col("user_id"), Tables.tsNsToSec("ts").as("ep"),
        col("event_id"))
      .as[CovEv]
    covStateful(evs).orderBy(col("user_id"))
  }

  /** G18 batch entry: metrics via the stateful path (each user's
    * history in one call ⇒ the per-user aggregate), then the SHARED
    * scoring stage — output identical to B's events_rfm, same SQL
    * oracle. */
  def streamRfm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val purchases = Tables(spark, dir).events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), Tables.tsNsToSec("ts").as("ep"),
        floor(col("value") * 100).cast("long").as("cents"))
      .as[PEvt]
    // rfmScore already ends in the deterministic user_id order
    graft.operators.Funnel.rfmScore(rfmStateful(purchases))
  }

  /** G17 batch entry: the whole ingest gate — scrub → quality floor
    * → exact-dup suppression — as ONE pass over the replayed feed.
    * In batch mode each hash group arrives in one call, so the kept
    * set is min doc_id per redacted hash over the floor survivors,
    * which is the SQL oracle. The replayed copies are dropped HERE
    * (not by the floor): they differ pre-scrub, collide post-scrub. */
  def streamCurate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val prepped = curatePrep(curateFeed(Tables(spark, dir).documents))
      .as[CurDoc]
    curateStateful(prepped)
      .toDF()
      .select(col("doc_id"), col("text_hash"), col("n_pii"),
        col("quality"))
      .orderBy(col("doc_id"))
  }

  // ----- G20: online heavy hitters (ngram blocklist twin) ----------

  /** One bigram occurrence for the hitters stream. */
  final case class GramEv(gram: String)
  /** Per-gram running count (public for the state encoder). */
  final case class HitAcc(cnt: Long)

  /** G20 core: exact per-gram running counts maintained online —
    * the counting half of E's ngram_blocklist. State is ONE long per
    * distinct gram (vocabulary-bounded, the standard streaming-count
    * trade: the batch form's Misra-Gries sketch caps memory at the
    * cost of a second exact pass; online, hot grams are touched
    * every batch so idle-key timeout eviction is the production
    * dial). Addition commutes, so late batches only advance the
    * snapshot. One updated count row per gram per batch that saw it. */
  def hitFn(gram: String, evs: Iterator[GramEv],
      state: GroupState[HitAcc]): Iterator[(String, Long)] = {
    val add = evs.size.toLong
    if (add == 0L) return Iterator.empty
    val next = HitAcc(state.getOption.map(_.cnt).getOrElse(0L) + add)
    state.update(next)
    Iterator((gram, next.cnt))
  }

  /** Shared stateful counting stage (batch or streaming). */
  def hitStateful(grams: Dataset[GramEv]): DataFrame = {
    import grams.sparkSession.implicits._
    grams.groupByKey(_.gram)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        hitFn)
      .toDF("gram", "n")
  }

  /** Read-side blocklist cut over a count snapshot — the exact
    * integer `n · denom > total` cut and share of E's blocklist,
    * computed on read (the stream maintains counts; corpus-total
    * state is a 1-row broadcast at read time, the rfmScore pattern). */
  def hitterCut(counts: DataFrame, denom: Long): DataFrame = {
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .filter(col("n") * denom > col("total"))
      .select(col("gram"), col("n"),
        round(col("n") / col("total"), 6).as("share"))
      .orderBy(col("n").desc, col("gram"))
  }

  // ----- G22: online TWAP (events_twap twin) -----------------------

  /** One event for the TWAP stream. */
  final case class TwapEv(user_id: Long, ep: Long, event_id: Long, cents: Long)
  /** Per-user running TWAP state (public for the state encoder): the
    * held (last) sample plus three exact integer accumulators. */
  final case class TwapAcc(lastEp: Long, lastEvId: Long, lastCents: Long,
      n: Long, dur: Long, wsum: Long)

  /** G22 core: B's events_twap maintained online — each event closes
    * the previous sample's hold period (`dur += ep − lastEp`,
    * `wsum += lastCents·gap`, exact integers), then becomes the held
    * sample. State is SIX longs per user, never history. One updated
    * snapshot row per user per active batch; the division to the
    * double TWAP happens on read ([[Tables]]-style cents discipline,
    * the rfmScore read-side pattern). In-order replay contract. */
  def twapFn(user: Long, evs: Iterator[TwapEv],
      state: GroupState[TwapAcc]): Iterator[(Long, Long, Long, Long)] = {
    val es = evs.toVector.sortBy(e => (e.ep, e.event_id))
    if (es.isEmpty) return Iterator.empty
    var acc = state.getOption.getOrElse(
      TwapAcc(Long.MinValue, 0L, 0L, 0L, 0L, 0L))
    es.foreach { e =>
      acc =
        if (acc.n == 0L)
          TwapAcc(e.ep, e.event_id, e.cents, 1L, 0L, 0L)
        else {
          val gap = e.ep - acc.lastEp
          TwapAcc(e.ep, e.event_id, e.cents, acc.n + 1,
            acc.dur + gap, acc.wsum + acc.lastCents * gap)
        }
    }
    state.update(acc)
    Iterator((user, acc.n, acc.dur, acc.wsum))
  }

  /** Shared stateful TWAP stage (batch or streaming). */
  def twapStateful(evs: Dataset[TwapEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        twapFn)
      .toDF("user_id", "n_events", "dur_sec", "wsum")
  }

  // ----- G25: online seasonality profile (events_seasonality twin) -

  /** One event for the seasonality stream. */
  final case class SeaEv(event_type: String, dow: Int, hour: Int)
  /** Per-type marginal counters (public for the state encoder):
    * 7 day-of-week + 24 hour-of-day longs — the FULL seasonality
    * state is 31 counters per type, never history. */
  final case class SeaAcc(dows: Array[Long], hours: Array[Long])

  /** G25 core: the (type → dow/hour histogram) cube maintained
    * online. Addition commutes — replay-order free; every active
    * batch emits the nonzero bins of the held snapshot in long
    * format (type, dim, bin, c); the χ²/peak scoring runs on READ
    * over the snapshot via the shared
    * [[graft.operators.Lifecycle.seasonalityScore]] stage (ratios of
    * corpus aggregates — the abtest read-side rule). */
  def seaFn(tp: String, evs: Iterator[SeaEv],
      state: GroupState[SeaAcc]): Iterator[(String, String, Int, Long)] = {
    val acc = state.getOption.getOrElse(
      SeaAcc(new Array[Long](7), new Array[Long](24)))
    var n = 0
    evs.foreach { e =>
      n += 1; acc.dows(e.dow) += 1L; acc.hours(e.hour) += 1L
    }
    if (n == 0) return Iterator.empty
    state.update(acc)
    val out = Seq.newBuilder[(String, String, Int, Long)]
    var i = 0
    while (i < 7) {
      if (acc.dows(i) > 0L) out += ((tp, "dow", i, acc.dows(i))); i += 1
    }
    i = 0
    while (i < 24) {
      if (acc.hours(i) > 0L) out += ((tp, "hour", i, acc.hours(i))); i += 1
    }
    out.result().iterator
  }

  /** Shared stateful cube stage (batch or streaming). */
  def seaStateful(evs: Dataset[SeaEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        seaFn)
      .toDF("event_type", "dim", "bin", "c")
  }

  /** G25 batch entry: each type's history in one call ⇒ the final
    * marginals — scored output identical to B's events_seasonality,
    * same SQL oracle. */
  def streamSeasonality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).events
      .select(col("event_type"), Tables.tsNsToSec("ts").as("ep"))
      .selectExpr("event_type",
        "cast(((ep div 86400) + 3) % 7 AS int) AS dow",
        "cast((ep div 3600) % 24 AS int) AS hour")
      .as[SeaEv]
    // referenced by both marginal reads — persist, or the stateful
    // pass runs twice (no-subtree-dedup)
    val snap = seaStateful(evs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.operators.Lifecycle.seasonalityScore(
      snap.filter(col("dim") === "dow")
        .select(col("event_type"), col("bin").as("dow"), col("c")),
      snap.filter(col("dim") === "hour")
        .select(col("event_type"), col("bin").as("hour"), col("c")))
  }

  // ----- G26: online change-point (events_changepoint twin) --------

  /** One event for the change-point stream. */
  final case class CpEv(event_type: String, day: Long)
  /** Per-type daily counters (public for the state encoder):
    * day → count. State is bounded by the type's ACTIVE-day span
    * (calendar days, not events — the same cardinality the batch
    * scorer's dense grid explodes); gap days hold no entry. */
  final case class CpAcc(days: Map[Long, Long])

  /** G26 core: the (type, day) count matrix maintained online.
    * Addition commutes — replay-order free; each active batch emits
    * ONLY the (day, c) entries this batch touched (counts are
    * monotone, so a max-on-read consumer reconstructs the full
    * snapshot — StreamsSpec's replay check does exactly that), which
    * bounds per-batch sink volume by the batch's distinct days
    * instead of the type's whole active-day span (the round-10
    * ADVICE: full-snapshot re-emission grew O(span) per batch). The
    * CUSUM argmax runs on READ via the shared
    * [[graft.operators.Lifecycle.changepointScore]] stage (the
    * prefix/argmax needs the FULL dense span, so it is a corpus
    * aggregate — the abtest read-side rule). */
  def cpFn(tp: String, evs: Iterator[CpEv],
      state: GroupState[CpAcc]): Iterator[(String, Long, Long)] = {
    var m = state.getOption.map(_.days).getOrElse(Map.empty[Long, Long])
    var touched = Set.empty[Long]
    evs.foreach { e =>
      touched += e.day; m = m.updated(e.day, m.getOrElse(e.day, 0L) + 1L)
    }
    if (touched.isEmpty) return Iterator.empty
    state.update(CpAcc(m))
    touched.iterator.map(d => (tp, d, m(d)))
  }

  /** Shared stateful daily-counter stage (batch or streaming). */
  def cpStateful(evs: Dataset[CpEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        cpFn)
      .toDF("event_type", "day", "c")
  }

  /** G26 batch entry: each type's history in one call ⇒ the final
    * daily counters — scored output identical to B's
    * events_changepoint, same SQL oracle. */
  def streamChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).events
      .select(col("event_type"), Tables.tsNsToSec("ts").as("ep"))
      .selectExpr("event_type", "ep div 86400 AS day")
      .as[CpEv]
    graft.operators.Lifecycle.changepointScore(cpStateful(evs))
  }

  // ----- G38: online shingle novelty (corpus_novelty twin) ---------

  /** One shingle arrival for the novelty stream. */
  final case class NovEv(doc_id: Long, s: Long)
  /** Per-shingle first-doc state (public for the state encoder). */
  final case class NovAcc(fd: Long)

  /** G38 core: the first-occurrence shingle index maintained online —
    * state per shingle is ONE long (the running min doc_id; min
    * commutes ⇒ replay-order free), the stream_dedup state-cardinality
    * class (keys = the shingle vocabulary; RocksDB is the 100×
    * answer, SURVEY §4). Each active batch emits the shingle's
    * current min — a min-on-read consumer reconstructs the index
    * (the cpFn monotone-emission discipline, with min in place of
    * max). Per-doc novelty runs on READ via the shared
    * [[Dedup.noveltyScore]] stage. */
  def novFn(s: Long, evs: Iterator[NovEv],
      state: GroupState[NovAcc]): Iterator[(Long, Long)] = {
    var fd = state.getOption.map(_.fd).getOrElse(Long.MaxValue)
    var n = 0
    evs.foreach { e => n += 1; if (e.doc_id < fd) fd = e.doc_id }
    if (n == 0) return Iterator.empty
    state.update(NovAcc(fd))
    Iterator((s, fd))
  }

  /** Shared stateful first-doc index stage (batch or streaming). */
  def novStateful(evs: Dataset[NovEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.s)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        novFn)
      .toDF("s", "fd")
  }

  /** G38 batch entry: each shingle's full history in one call ⇒ the
    * final first-doc index, scored — output identical to C16's
    * corpus_novelty, same SQL oracle. The crawl-scheduling read AT
    * INGEST TIME (where it matters: stop crawling a source whose
    * arriving docs' novelty has collapsed), without waiting for a
    * batch sweep. */
  def streamNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = graft.operators.Dedup.noveltyShingles(
        Tables(spark, dir).documents)
      .persist() // feeds the stateful index AND the score join
    graft.operators.Dedup.noveltyScore(sh, novStateful(sh.as[NovEv]))
  }

  // ----- G37: online robust anomaly (events_anomaly_mad twin) ------

  /** G37 batch entry: the SAME per-type daily-counter state machine
    * as G26 (stream_changepoint) — one state family serves both
    * monitors, exactly the G30/G33 shared-gap-state precedent —
    * scored on read by the shared [[graft.operators.Funnel.madScore]]
    * median/MAD stage (percentiles need the full series — the
    * abtest read-side rule). The robust online detector for series
    * that contain the spikes they hunt; output identical to B's
    * events_anomaly_mad, same SQL oracle. */
  def streamAnomalyMad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).events
      .select(col("event_type"), Tables.tsNsToSec("ts").as("ep"))
      .selectExpr("event_type", "ep div 86400 AS day")
      .as[CpEv]
    graft.operators.Funnel.madScore(
      cpStateful(evs).withColumnRenamed("c", "cnt"))
  }

  // ----- G36: online behavioral entropy (events_entropy twin) ------

  /** One event for the entropy stream. */
  final case class EntEv(user_id: Long, event_type: String)
  /** Per-user event-type counters (public for the state encoder). */
  final case class EntAcc(types: Map[String, Long])

  /** G36 core: per-user type counters maintained online — addition
    * commutes (replay-order free), each active batch emits ONLY the
    * (user, type, c) entries it touched (monotone counts, the cpFn
    * emission discipline). Entropy/evenness run on READ via the
    * shared [[graft.operators.Funnel.entropyScore]] stage (the
    * log-fold needs the full per-user type vector — the abtest
    * read-side rule). State per user is ≤ |type vocabulary| longs
    * (a handful). */
  def entFn(user: Long, evs: Iterator[EntEv],
      state: GroupState[EntAcc]): Iterator[(Long, String, Long)] = {
    var m = state.getOption.map(_.types).getOrElse(Map.empty[String, Long])
    var touched = Set.empty[String]
    evs.foreach { e =>
      touched += e.event_type
      m = m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
    }
    if (touched.isEmpty) return Iterator.empty
    state.update(EntAcc(m))
    touched.iterator.map(t => (user, t, m(t)))
  }

  /** Shared stateful counter stage (batch or streaming). */
  def entStateful(evs: Dataset[EntEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        entFn)
      .toDF("user_id", "event_type", "c")
  }

  /** G36 batch entry: each user's history in one call ⇒ the final
    * counters, scored — output identical to B's events_entropy,
    * same SQL oracle. The bot-filter read at ingest time: a user
    * whose evenness stays ≈ 0 across batches is flagged before any
    * engagement metric consumes them. */
  def streamEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"))
      .as[EntEv]
    graft.operators.Funnel.entropyScore(entStateful(evs))
  }

  // ----- G35: online feed fingerprint (table_checksum twin) --------

  /** Document columns fingerprinted by [[streamChecksum]]
    * (single-sourced into the oracle). */
  val ChecksumDocCols: Seq[String] = Seq("doc_id", "lang", "source", "text")

  /** The shared per-row fingerprint projection: each document row
    * explodes to one (col_name, is_null, sig) entry per fingerprinted
    * column in ONE projection — sig is the table_checksum 60-bit md5
    * prefix (0 for NULLs; XOR-identity, nulls counted separately). */
  def ckPrep(docs: DataFrame): DataFrame = {
    val entries = array(ChecksumDocCols.map { c =>
      struct(lit(c).as("col_name"),
        when(col(c).isNull, 1L).otherwise(0L).as("is_null"),
        when(col(c).isNull, 0L).otherwise(
          conv(substring(md5(col(c).cast("string").cast("binary")), 1, 15),
            16, 10).cast("long")).as("sig"))
    }: _*)
    docs.select(explode(entries).as("e"))
      .select(col("e.col_name").as("col_name"),
        col("e.is_null").as("is_null"), col("e.sig").as("sig"))
  }

  /** G35 core: the running fingerprint as a plain streaming
    * AGGREGATION (the built-in stateful-agg path, not a custom state
    * fn): count/sum/bit_xor are all commutative-merge declarative
    * aggs, so the micro-batch partials combine map-side BEFORE the
    * K-key exchange (K = #columns — without the partial, every raw
    * row would shuffle to K hot keys; with it, each batch ships one
    * partial row per (partition, column), the mr_wordcount combiner
    * argument) and replay order cannot change the result. */
  def ckStateful(rows: DataFrame): DataFrame =
    rows.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("is_null")).as("n_null"),
        expr("bit_xor(sig)").as("xor_sig"))

  /** G35 batch entry: the whole feed in one batch ⇒ the final
    * fingerprint — the "did the re-crawl deliver byte-identical
    * content" read beside stream_curate's re-ingest gate, same
    * column contract as H's table_checksum. */
  def streamChecksum(spark: SparkSession, dir: String): DataFrame =
    ckStateful(ckPrep(Tables(spark, dir).documents))
      .select(lit("documents").as("tbl"), col("col_name"),
        col("n_rows"), col("n_null"), col("xor_sig"))
      .orderBy(col("col_name"))

  // ----- G34: online PSI drift monitor (table_psi twin) ------------

  /** One pre-binned event for the PSI stream. */
  final case class PsiEv(day: Long, bin: Long)
  /** Per-day bin counters (public for the state encoder). */
  final case class PsiAcc(bins: Map[Long, Long])

  /** G34 core: the per-day value-histogram maintained online.
    * Addition commutes — replay-order free; each active batch emits
    * ONLY the (day, bin, c) entries it touched (counts monotone ⇒ a
    * max-on-read consumer reconstructs the snapshot — the cpFn
    * emission discipline). Bin EDGES are training-time constants
    * ([[psiRefStats]] off the static table — an online monitor
    * cannot re-derive edges from data it hasn't seen; that is the
    * production PSI contract, reference window frozen at deploy).
    * State per day is ≤ PsiBins longs. */
  def psiFn(day: Long, evs: Iterator[PsiEv],
      state: GroupState[PsiAcc]): Iterator[(Long, Long, Long)] = {
    var m = state.getOption.map(_.bins).getOrElse(Map.empty[Long, Long])
    var touched = Set.empty[Long]
    evs.foreach { e =>
      touched += e.bin; m = m.updated(e.bin, m.getOrElse(e.bin, 0L) + 1L)
    }
    if (touched.isEmpty) return Iterator.empty
    state.update(PsiAcc(m))
    touched.iterator.map(b => (day, b, m(b)))
  }

  /** Shared stateful histogram stage (batch or streaming). */
  def psiStateful(evs: Dataset[PsiEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.day)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        psiFn)
      .toDF("day", "bin", "c")
  }

  /** The frozen reference stats 1-row frame (dmin, dmax, cmin, cmax):
    * value-cents range over the FIRST-HALF reference window of the
    * static table. */
  def psiRefStats(ev: DataFrame): DataFrame = {
    val st = ev.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
    ev.crossJoin(broadcast(st))
      .filter(col("day") <= expr("(dmin + dmax) div 2"))
      .agg(min(col("cents")).as("cmin"), max(col("cents")).as("cmax"))
  }

  /** The shared binning projection: raw (day, cents) → [[PsiEv]]
    * against a broadcast stats row; out-of-reference-range values
    * CLAMP to the edge bins (greatest/least — which also erases the
    * Spark-div-vs-DuckDB-floor negative-operand difference: any
    * negative offset clamps to bin 0 on both engines). */
  def psiBinnedOf(ev: DataFrame, refStats: DataFrame): DataFrame = {
    val b = graft.operators.Profile.PsiBins
    ev.crossJoin(broadcast(refStats))
      .select(col("day"),
        least(lit(b - 1L), greatest(lit(0L),
          expr(s"((cents - cmin) * $b) div (cmax - cmin + 1)"))).as("bin"))
  }

  /** Read-side PSI scorer over any (day, bin, c) histogram snapshot:
    * reference histogram = the first-half days of the snapshot
    * itself; Laplace-smoothed shares over the full static bin grid
    * (empty bins contribute — the tablePsi definition); per-day PSI
    * is a STRICT bin-sorted sequential fold (sort_array∘aggregate ↔
    * list_reduce ORDER BY). ln ulp class under round(6). */
  def psiScore(binnedIn: DataFrame): DataFrame = {
    val b = graft.operators.Profile.PsiBins
    val spark = binnedIn.sparkSession
    // referenced by ref/grid/full — persist, or the stateful pass
    // runs three times (no-subtree-dedup)
    val bn = binnedIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val st = bn.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
    val ref = bn.crossJoin(broadcast(st))
      .filter(col("day") <= expr("(dmin + dmax) div 2"))
      .groupBy(col("bin")).agg(sum(col("c")).as("rc"))
    val nRef = ref.agg(coalesce(sum(col("rc")), lit(0L)).as("n_ref"))
    val grid = bn.select(col("day")).distinct()
      .crossJoin(spark.range(b).select(col("id").as("bin")))
    val full = grid.join(bn, Seq("day", "bin"), "left")
      .join(ref, Seq("bin"), "left")
      .select(col("day"), col("bin"),
        coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("rc"), lit(0L)).as("rc"))
    val nd = full.groupBy(col("day")).agg(sum(col("c")).as("n_d"))
    val terms = full.join(nd, Seq("day")).crossJoin(broadcast(nRef))
      .withColumn("p_cur",
        (col("c") + lit(1L)) / (col("n_d") + lit(b.toLong)))
      .withColumn("p_ref",
        (col("rc") + lit(1L)) / (col("n_ref") + lit(b.toLong)))
      .withColumn("term",
        (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
    terms.groupBy(col("day"), col("n_d"))
      .agg(sort_array(collect_list(struct(col("bin"), col("term"))))
        .as("ts"))
      .select(col("day"), col("n_d").as("n_events"),
        round(aggregate(transform(col("ts"), s => s.getField("term")),
          lit(0.0), (acc, x) => acc + x), 6).as("psi"))
      .orderBy(col("day"))
  }

  /** G34 batch entry: each day's full histogram in one call ⇒ the
    * final snapshot, scored — the per-day drift series vs the frozen
    * first-half reference (near-zero inside the reference window,
    * the mixture-shift read outside it). The events projection is
    * persisted: it feeds the edge-stats pass AND the binning pass
    * (no-subtree-dedup). */
  def streamPsi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events
      .select(Tables.tsNsToSec("ts").as("ep"),
        floor(col("value") * 100).cast("long").as("cents"))
      .select(expr("ep div 86400L").as("day"), col("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val binned = psiBinnedOf(ev, psiRefStats(ev)).as[PsiEv]
    psiScore(psiStateful(binned))
  }

  // ----- G27: online order backlog (orders_backlog twin) -----------

  /** One order-lifecycle event: kind 0 = the order placed on `day`,
    * kind 1 = one of its lineitems shipped on `day`. */
  final case class BklEv(okey: Long, kind: Int, day: Long)
  /** Per-order lifecycle state (public for the state encoder):
    * openDay (−1 until the placement arrives) and closeDay = max
    * ship day seen so far (−1 until any ship arrives — an order
    * closes on its LAST ship, so the running max converges to the
    * batch close day). Set-once / max ⇒ replay-order free. */
  final case class BklAcc(openDay: Long, closeDay: Long)

  /** G27 core: per-ORDER lifecycle state — the first
    * high-cardinality-keyed twin whose read is a corpus-level time
    * series: each active batch emits the order's current
    * (open, close) snapshot; the dense-grid prefix runs on READ via
    * the shared [[graft.operators.Lifecycle.backlogScore]] stage
    * (a prefix over ALL days is a corpus aggregate — the abtest
    * read-side rule). State is two longs per order forever. */
  def bklFn(okey: Long, evs: Iterator[BklEv],
      state: GroupState[BklAcc]): Iterator[(Long, Long, Long)] = {
    var acc = state.getOption.getOrElse(BklAcc(-1L, -1L))
    var n = 0
    evs.foreach { e =>
      n += 1
      acc =
        if (e.kind == 0) BklAcc(math.max(acc.openDay, e.day), acc.closeDay)
        else BklAcc(acc.openDay, math.max(acc.closeDay, e.day))
    }
    if (n == 0) return Iterator.empty
    state.update(acc)
    Iterator((okey, acc.openDay, acc.closeDay))
  }

  /** Shared stateful lifecycle stage (batch or streaming). */
  def bklStateful(evs: Dataset[BklEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.okey)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        bklFn)
      .toDF("okey", "open_day", "close_day")
  }

  /** Read-side assembly: final per-order snapshot → per-day
    * open/close deltas → the shared prefix scorer. Shared by the
    * batch entry and the replayed-stream spec. */
  def backlogOfSnapshot(snapIn: DataFrame): DataFrame = {
    // referenced by both delta groupBys — persist, or the stateful
    // pass runs twice (no-subtree-dedup)
    val snap = snapIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val starts = snap.filter(col("open_day") >= 0L)
      .groupBy(col("open_day").as("day"))
      .agg(count(lit(1)).as("opened"))
    val closes = snap.filter(col("close_day") >= 0L)
      .groupBy(col("close_day").as("cday"))
      .agg(count(lit(1)).as("closed"))
    graft.operators.Lifecycle.backlogScore(
      starts.join(closes, col("day") === col("cday"), "full")
        .select(coalesce(col("day"), col("cday")).as("day"),
          coalesce(col("opened"), lit(0L)).as("opened"),
          coalesce(col("closed"), lit(0L)).as("closed")))
  }

  /** G27 batch entry: each order's full lifecycle in one call ⇒ the
    * final (open, close) snapshot — scored output identical to B's
    * orders_backlog, same SQL oracle. */
  def streamBacklog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val opens = t.orders.select(col("o_orderkey").as("okey"),
      lit(0).as("kind"),
      datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"))
    val ships = t.lineitem.select(col("l_orderkey").as("okey"),
      lit(1).as("kind"),
      datediff(col("l_shipdate"), lit("1970-01-01")).cast("long").as("day"))
    backlogOfSnapshot(bklStateful(opens.unionAll(ships).as[BklEv]))
  }

  // ----- G24: online top-k per key (TopKPerKey twin) ---------------

  /** One order for the top-k stream. */
  final case class TopEv(prio: String, okey: Long, price: Double)
  /** Per-key held top-k (public for the state encoder): parallel
    * arrays sorted by (price desc, okey asc), plus the monotone
    * processed count the read side uses to pick the final snapshot. */
  final case class TopAcc(n: Long, prices: Array[Double], keys: Array[Long])

  /** Top-k held per key, single-sourced with the batch registry
    * entry's k ([[graft.plans.TopK.topkPerKey]]). */
  val TopStreamK = 3

  /** G24 core: the custom TopKPerKey physical operator's heap — ≤ k
    * (order, price) pairs per key — maintained as streaming state:
    * the partial-heap in the batch plan IS the state update rule
    * online (selection, not sorting; insertion into ≤ k entries per
    * event). State is 2k+1 scalars per key regardless of history;
    * insertion commutes, so replay order is free. Emits the held
    * top-k snapshot per key per active batch. */
  def topkFn(prio: String, evs: Iterator[TopEv],
      state: GroupState[TopAcc]): Iterator[(String, Long, Long, Double)] = {
    var acc = state.getOption.getOrElse(
      TopAcc(0L, Array.emptyDoubleArray, Array.emptyLongArray))
    var held = acc.prices.zip(acc.keys).toVector
    var n = acc.n
    var touched = false
    evs.foreach { e =>
      touched = true; n += 1L
      held = ((e.price, e.okey) +: held)
        .sortBy { case (p, k) => (-p, k) }
        .take(TopStreamK)
    }
    if (!touched) return Iterator.empty
    state.update(TopAcc(n, held.map(_._1).toArray, held.map(_._2).toArray))
    held.iterator.map { case (p, k) => (prio, n, k, p) }
  }

  /** Shared stateful top-k stage (batch or streaming). */
  def topkStateful(evs: Dataset[TopEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.prio)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        topkFn)
      .toDF("o_orderpriority", "n_seen", "o_orderkey", "o_totalprice")
  }

  /** G24 batch entry: each key's history in one call ⇒ the final held
    * heap — output identical to B's topk_per_key custom-operator
    * entry, same row_number-window SQL oracle. */
  def streamTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).orders
      .select(col("o_orderpriority").as("prio"),
        col("o_orderkey").as("okey"), col("o_totalprice").as("price"))
      .as[TopEv]
    topkStateful(evs)
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
        col("o_orderkey"))
  }

  // ----- G23: online A/B readout (events_abtest twin) --------------

  /** One event for the A/B stream: purch = 1 iff a purchase. */
  final case class AbEv(user_id: Long, purch: Long)
  /** Per-user purchase-count state (public for the state encoder). */
  final case class AbAcc(c: Long)

  /** G23 core: the per-user experiment metric (purchases per exposed
    * user) maintained online. State is ONE long per user; addition
    * commutes, so replay order is free (unlike the hold-period
    * twins). Every event marks exposure — a user's first batch emits
    * a (user, 0) row even with no purchases, exactly the batch
    * groupBy's semantics. One updated snapshot row per user per
    * active batch; the variant split and the Welch z happen on read
    * over the snapshot ([[graft.operators.Lifecycle.abtestScore]],
    * the rfmScore read-side pattern), because the z statistic is a
    * ratio of corpus aggregates — maintaining it per-event would
    * re-derive the same 1-row agg the read pays anyway. */
  def abFn(user: Long, evs: Iterator[AbEv],
      state: GroupState[AbAcc]): Iterator[(Long, Long)] = {
    var n = 0L
    var add = 0L
    evs.foreach { e => n += 1L; add += e.purch }
    if (n == 0L) return Iterator.empty
    val next = AbAcc(state.getOption.map(_.c).getOrElse(0L) + add)
    state.update(next)
    Iterator((user, next.c))
  }

  /** Shared stateful metric stage (batch or streaming). */
  def abStateful(evs: Dataset[AbEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        abFn)
      .toDF("user_id", "c")
  }

  /** G23 batch entry: each user's history in one call ⇒ the final
    * per-user metric — scored output identical to B's events_abtest,
    * same SQL oracle. */
  def streamAbtest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).events
      .select(col("user_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("purch"))
      .as[AbEv]
    graft.operators.Lifecycle.abtestScore(abStateful(evs))
  }

  /** G22 batch entry: each user's history in one call ⇒ the full
    * integral — output identical to B's events_twap, same SQL
    * oracle. */
  def streamTwap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir).events
      .select(col("user_id"), Tables.tsNsToSec("ts").as("ep"),
        col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      .as[TwapEv]
    twapStateful(evs)
      .select(col("user_id"), col("n_events"), col("dur_sec"),
        when(col("dur_sec") === 0L, lit(null).cast("double"))
          .otherwise(round(col("wsum") / (col("dur_sec") * 100.0), 4))
          .as("twap"))
      .orderBy(col("user_id"))
  }

  // ----- G21: online EWMA trend (events_ewma twin) -----------------

  /** One event for the EWMA stream (pre-bucketed to its epoch day). */
  final case class DayEv(event_type: String, day: Long)
  /** Per-type trend state (public for the state encoder): the open
    * day, its running count, the smoothed level, and whether a level
    * exists yet — never history. */
  final case class EwmaAcc(day: Long, n: Long, ewma: Double, hasPrev: Boolean)
  /** One finalized day. */
  final case class EwmaOut(event_type: String, day: Long, n: Long,
      ewma: Double, resid: Option[Double])

  /** G21 core: B's events_ewma α=1/2 recurrence folded one day at a
    * time. A day finalizes when a later day arrives: e' = first day ?
    * n : (e + n)/2 — the SAME double halving sequence as the batch
    * prefix fold, so finalized rows are bit-identical; resid = n − e
    * (what the batch form reconstructs as n − (2e′ − n), exactly).
    * In-order event-time replay is the stateful-twin contract;
    * `flush` closes the still-open day (batch mode / end of stream). */
  def ewmaFold(tpe: String, days: Seq[Long], st: Option[EwmaAcc],
      flush: Boolean): (Vector[EwmaOut], EwmaAcc) = {
    var acc = st.getOrElse(EwmaAcc(Long.MinValue, 0L, 0.0, false))
    val out = Vector.newBuilder[EwmaOut]
    def roll(): Unit = if (acc.n > 0) {
      val e = if (!acc.hasPrev) acc.n.toDouble else (acc.ewma + acc.n) / 2.0
      val resid = if (!acc.hasPrev) None else Some(acc.n.toDouble - acc.ewma)
      out += EwmaOut(tpe, acc.day, acc.n, e, resid)
      acc = EwmaAcc(acc.day, 0L, e, true)
    }
    days.foreach { d =>
      if (acc.n == 0L && !acc.hasPrev) acc = EwmaAcc(d, 1L, 0.0, false)
      else if (d == acc.day && acc.n > 0L) acc = acc.copy(n = acc.n + 1)
      else { roll(); acc = EwmaAcc(d, 1L, acc.ewma, acc.hasPrev) }
    }
    if (flush) roll()
    (out.result(), acc)
  }

  /** G21 stateful stage: finalized-day rows as later days arrive. */
  def ewmaFn(tpe: String, evs: Iterator[DayEv],
      state: GroupState[EwmaAcc]): Iterator[EwmaOut] = {
    val ds = evs.map(_.day).toVector.sorted
    if (ds.isEmpty) return Iterator.empty
    val (out, acc) = ewmaFold(tpe, ds, state.getOption, flush = false)
    state.update(acc)
    out.iterator
  }

  /** G21 streaming stage (spec-driven; batch mode goes through
    * [[streamEwma]]'s flushing fold so the final open day appears). */
  def ewmaStateful(evs: Dataset[DayEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        ewmaFn)
      .toDF()
  }

  /** G21 batch entry: full history per type through the SAME fold,
    * with the tail day flushed — output identical to B's events_ewma,
    * same SQL oracle. */
  def streamEwma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables(spark, dir).events
      .select(col("event_type"), Tables.tsNsToSec("ts").as("ep"))
      .select(col("event_type"), expr("ep div 86400L").as("day"))
      .as[DayEv]
      .groupByKey(_.event_type)
      .flatMapGroups { (tpe: String, it: Iterator[DayEv]) =>
        ewmaFold(tpe, it.map(_.day).toVector.sorted, None, flush = true)
          ._1.iterator
      }
      .toDF()
    raw.select(col("event_type"), col("day"), col("n"),
        round(col("ewma"), 4).as("ewma"),
        round(col("resid"), 4).as("resid"))
      .orderBy(col("event_type"), col("day"))
  }

  /** G20 batch entry: every occurrence through the stateful counter
    * (one call per gram ⇒ final exact counts), then the read-side
    * cut — output identical to E's ngram_blocklist, same SQL oracle. */
  def streamHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grams = Tables(spark, dir).documents
      .select(explode(
        graft.functions.WordNgrams(col("text"), 2)).as("gram"))
      .as[GramEv]
    hitterCut(hitStateful(grams),
      graft.operators.HeavyHitters.ShareDenom)
  }

  // ----- G30: online inter-arrival gaps (events_interarrival twin) --

  /** One event keyed by (user, type) for the gap stream. */
  final case class GapEv(user_id: Long, event_id: Long,
      event_type: String, ep: Long)
  /** Per-(user,type) state: the last seen event's (ep, event_id) —
    * one pair per live key, never history (public for the state
    * encoder). */
  final case class GapAcc(ep: Long, event_id: Long)
  /** One closed gap. */
  final case class GapOut(event_type: String, gap: Long)

  /** G30 core: fold a (ep, event_id)-sorted run of ONE (user, type)
    * key's events over the last-seen state, emitting one gap per
    * consecutive pair — exactly the lead() window's gap set, so the
    * read-side summary is bit-identical to B's events_interarrival.
    * In-order event-time replay is the stateful-twin contract. */
  def gapFold(evs: Seq[GapEv], st: Option[GapAcc])
      : (Vector[GapOut], Option[GapAcc]) = {
    var last = st
    val out = Vector.newBuilder[GapOut]
    evs.foreach { e =>
      last.foreach(l => out += GapOut(e.event_type, e.ep - l.ep))
      last = Some(GapAcc(e.ep, e.event_id))
    }
    (out.result(), last)
  }

  /** G30 stateful stage: gaps close as the next same-key event
    * arrives; state is ONE (ep, event_id) pair per live key. */
  def gapFn(key: (Long, String), evs: Iterator[GapEv],
      state: GroupState[GapAcc]): Iterator[GapOut] = {
    val sorted = evs.toVector.sortBy(e => (e.ep, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    val (out, acc) = gapFold(sorted, state.getOption)
    acc.foreach(state.update)
    out.iterator
  }

  /** G30 streaming stage (spec-driven). */
  def gapStateful(evs: Dataset[GapEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(gapFn)
      .toDF()
  }

  /** G30 batch entry: every gap through the SAME fold (per-key sort =
    * the in-order replay), then the read-side percentile summary —
    * output identical to B's events_interarrival, same SQL oracle.
    * Scale shape: one (user, type) keyed exchange (the same key grain
    * as the batch lead() window), per-key runs are session-sized;
    * the summary is a 5-key two-phase agg with ONE percentile(array)
    * buffer (CLAUDE.md). */
  def streamInterarrival(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gaps = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep"))
      .as[GapEv]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroups { (_: (Long, String), it: Iterator[GapEv]) =>
        gapFold(it.toVector.sortBy(e => (e.ep, e.event_id)), None)
          ._1.iterator
      }
      .toDF()
    gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap")).as("total_gap_s"),
        percentile(col("gap"), array(lit(0.5), lit(0.9))).as("q"),
        max(col("gap")).as("max_gap_s"))
      .select(col("event_type"), col("n_gaps"), col("total_gap_s"),
        round(col("total_gap_s") / col("n_gaps"), 4).as("mean_gap_s"),
        round(element_at(col("q"), 1), 4).as("p50_gap_s"),
        round(element_at(col("q"), 2), 4).as("p90_gap_s"),
        col("max_gap_s"))
      .orderBy(col("event_type"))
  }

  // ----- G33: online burstiness off the SAME gap state as G30 -------

  /** G33 batch entry: the G30 stateful gap fold scored by the SAME
    * read stage as B's events_burstiness — identical output, same
    * SQL oracle. One state machine serves both monitors (the gap
    * STREAM is the product; quantile and burstiness summaries are
    * read-side views of it). */
  def streamBurstiness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gaps = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep"))
      .as[GapEv]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroups { (_: (Long, String), it: Iterator[GapEv]) =>
        gapFold(it.toVector.sortBy(e => (e.ep, e.event_id)), None)
          ._1.iterator
      }
      .toDF()
    graft.operators.Lifecycle.burstinessAggOf(gaps)
  }

  // ----- G32: online transition pairs (events_markov twin) ----------

  final case class TrEv(user_id: Long, event_id: Long,
      event_type: String, ep: Long)
  /** One (ep, event_id, type) last-event triple per live user — the
    * whole per-key state (public: streaming state encoder). */
  final case class TrAcc(ep: Long, eventId: Long, eventType: String)
  final case class TrOut(from_type: String, to_type: String)

  /** Shared batch/stream fold: each arriving event closes one
    * transition from the last-seen event and becomes the new state. */
  def trFold(evs: Seq[TrEv], st: Option[TrAcc])
      : (Vector[TrOut], Option[TrAcc]) = {
    var last = st
    val out = Vector.newBuilder[TrOut]
    evs.foreach { e =>
      last.foreach(l => out += TrOut(l.eventType, e.event_type))
      last = Some(TrAcc(e.ep, e.event_id, e.event_type))
    }
    (out.result(), last)
  }

  /** G32 stateful stage: state is ONE last-event triple per live
    * user; every arrival emits exactly one transition (or none for
    * the user's first event). */
  def trFn(key: Long, evs: Iterator[TrEv],
      state: GroupState[TrAcc]): Iterator[TrOut] = {
    val sorted = evs.toVector.sortBy(e => (e.ep, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    val (out, acc) = trFold(sorted, state.getOption)
    acc.foreach(state.update)
    out.iterator
  }

  /** G32 streaming stage (spec-driven). */
  def trStateful(evs: Dataset[TrEv]): DataFrame = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(trFn)
      .toDF()
  }

  /** G32 batch entry: the stateful pair fold scored by the SAME
    * read stage as B's events_markov — identical output, same SQL
    * oracle. The matrix aggregate runs on read over the transition
    * log, never inside the stream. */
  def streamMarkov(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.tsNsToSec("ts").as("ep"))
      .as[TrEv]
      .groupByKey(_.user_id)
      .flatMapGroups { (_: Long, it: Iterator[TrEv]) =>
        trFold(it.toVector.sortBy(e => (e.ep, e.event_id)), None)
          ._1.iterator
      }
      .toDF()
    graft.operators.Lifecycle.markovAggOf(pairs)
  }

  // ----- G31: online daily counters + lag autocorr (events_autocorr
  // twin) ------------------------------------------------------------

  /** G31 shared stage: daily activity counters off the 1-day tumbling
    * window of the event time. Under the repo's UTC session contract
    * the window start divides exactly by 86 400 s, so the day bucket
    * equals B's `ep div 86400` integer algebra. A streaming caller
    * derives and watermarks `ep_ts` ITSELF (the windowAggTransform
    * pass-through contract) — append mode then finalizes a day
    * counter when the watermark passes, which is exactly the online
    * shape of this monitor: bounded state (open windows only), one
    * row per closed day. */
  def dayCountTransform(events: DataFrame): DataFrame =
    (if (events.columns.contains("ep_ts")) events
     else events.withColumn("ep_ts",
       Tables.tsNsToSec("ts").cast("timestamp")))
      .groupBy(window(col("ep_ts"), "1 day"))
      .agg(count(lit(1)).as("v"))
      .select(expr("unix_timestamp(window.start) div 86400").as("day"),
        col("v"))

  /** G31 batch entry: the windowed day counters scored by the SAME
    * lag-OLS read stage as B's events_autocorr — identical output,
    * same SQL oracle. The lag scoring runs on read over the closed-
    * day table (≤ thousands of rows for years of data), never inside
    * the stream. */
  def streamAutocorr(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Lifecycle.autocorrOfDaily(
      dayCountTransform(Tables(spark, dir).events))
}
