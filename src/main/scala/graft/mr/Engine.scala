package graft.mr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, Encoder}

/** Job-scoped session KV, shared by the map and reduce phases of a
  * job — the Spark re-expression of JobX's `ctx.session_set/get`
  * (reference: mr/job_engine.py:55). The map is fixed at submit time
  * and broadcast once; handlers read it on executors. Mutation from
  * inside handlers is deliberately not offered: at 1000 executors a
  * mutable cross-phase KV is a coordination bottleneck, so job-wide
  * constants ride a broadcast and per-key state belongs in the data.
  *
  * `scratch` is the FS scope (reference: mr/fs/, used by
  * dev/resources/handlers/map/test/random_yield_grouped.py): a
  * per-task scratch directory, created lazily on first use and
  * released when the task completes. WHERE it lives is the
  * [[ScratchBackend]] seam (reference: mr/fs/backend/fs_factory.py) —
  * executor-local disk by default, a shared mount if a deployment
  * installs one via [[ScratchFs.use]]; the active backend is captured
  * here at job-build time and ships with the Ctx.
  */
final class Ctx private[mr] (bc: Broadcast[Map[String, String]],
    backend: ScratchBackend = ScratchFs.backend)
    extends Serializable {
  def sessionGet(key: String): Option[String] = bc.value.get(key)
  def session: Map[String, String] = bc.value

  @transient lazy val scratch: java.nio.file.Path = {
    val dir = backend.newScratchDir()
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ => backend.release(dir) })
    dir
  }
}

/** One JobX step = (map handler, optional combine handler, reduce
  * handler) — reference: mr/models/kv/step.py:16-18.
  *
  *  - `mapper` receives one input record and yields `(key, value)`
  *    pairs (reference mapper handlers `yield` kv tuples,
  *    dev/resources/handlers/map/test/split.py:32).
  *  - `combiner`, when given, must be associative+commutative; Spark
  *    then runs it map-side as a partial aggregate before the shuffle
  *    (the reference's per-step combine handler, mr/job_engine.py:275).
  *  - `reducer` receives `(key, value_list)` and yields output records
  *    (reference reducer handlers fold `(key, value_list)` pairs,
  *    dev/resources/handlers/reduce/test/sum.py).
  *
  * With a combiner the reducer sees a single pre-combined value per
  * key; without one it sees the full grouped value list — exactly the
  * reference's "default combiner" behaviour (group by key, no fold).
  * At scale, always supply a combiner when the fold is associative:
  * the no-combiner path must materialize every value of a key on one
  * executor.
  */
final case class Step[I, K, V, O](
    name: String,
    mapper: (Ctx, I) => IterableOnce[(K, V)],
    reducer: (Ctx, K, Seq[V]) => IterableOnce[O],
    combiner: Option[(V, V) => V] = None)

/** A map-only step: yields kv pairs straight into the next step's
  * mapper with no reduction in between — the Spark re-expression of
  * `MrConfigureToMap('stepN')` dynamic chaining (reference:
  * mr/handlers/scope.py:9-19, map/test/split.py:27). Chained MapSteps
  * fuse into one Spark stage (narrow flatMap composition): zero extra
  * shuffles, unlike the reference where every hop re-queues messages
  * through NSQ.
  */
final case class MapStep[I, K, V](
    name: String,
    mapper: (Ctx, I) => IterableOnce[(K, V)])

/** Runs steps as Catalyst-typed pipelines. */
object Engine {

  private def ctxOf[I](ds: Dataset[I], session: Map[String, String]): Ctx =
    new Ctx(ds.sparkSession.sparkContext.broadcast(session))

  /** Map phase: one `flatMap`, Ctx built once per partition. */
  private def mapPhase[I, K, V](ds: Dataset[I], ctx: Ctx,
      mapper: (Ctx, I) => IterableOnce[(K, V)])(
      implicit kvEnc: Encoder[(K, V)]): Dataset[(K, V)] =
    ds.mapPartitions { it => it.flatMap(i => mapper(ctx, i).iterator) }

  /** Run one full step: map → (combine) → reduce. One shuffle on K. */
  def run[I, K, V, O](ds: Dataset[I], step: Step[I, K, V, O],
      session: Map[String, String] = Map.empty)(
      implicit kEnc: Encoder[K], kvEnc: Encoder[(K, V)],
      oEnc: Encoder[O]): Dataset[O] = {
    val ctx = ctxOf(ds, session)
    val mapped = mapPhase(ds, ctx, step.mapper)
    val reducer = step.reducer
    step.combiner match {
      case Some(comb) =>
        // reduceGroups = typed ReduceAggregator → map-side partial
        // aggregation before the shuffle (verify: executed plan shows
        // partial ObjectHashAggregate). Reducer sees the single
        // combined value, as after a JobX combine handler.
        mapped.groupByKey(_._1)
          .reduceGroups((a, b) => (a._1, comb(a._2, b._2)))
          .flatMap { case (k, (_, v)) => reducer(ctx, k, Seq(v)).iterator }
      case None =>
        // Default-combiner semantics: group values per key, hand the
        // reducer the whole list (reference __default_combiner).
        mapped.groupByKey(_._1)
          .flatMapGroups { (k, it) =>
            reducer(ctx, k, it.map(_._2).toSeq).iterator
          }
    }
  }

  /** Run a map-only step (no shuffle). */
  def runMap[I, K, V](ds: Dataset[I], step: MapStep[I, K, V],
      session: Map[String, String] = Map.empty)(
      implicit kvEnc: Encoder[(K, V)]): Dataset[(K, V)] =
    mapPhase(ds, ctxOf(ds, session), step.mapper)

  /** Route a mapped dataset into named branches — the fan-out half of
    * `MrConfigureToMap` when a mapper targets *different* downstream
    * steps per record. Each branch is a filtered view of the same
    * parent plan; feed each to its own step. (Spark has no
    * side-output; N filters over one cached/scanned parent is the
    * idiomatic equivalent and Catalyst pushes each filter down.) */
  def fanOut[K, V](mapped: Dataset[(String, (K, V))], routes: Seq[String])(
      implicit kvEnc: Encoder[(K, V)]): Map[String, Dataset[(K, V)]] =
    routes.map { r =>
      r -> mapped.filter(_._1 == r).map(_._2)
    }.toMap
}

/** A named chain of steps — JobX's workflow+job (reference:
  * mr/models/kv/workflow.py, job.py): a workflow scopes steps, a job
  * names the entry step; here the chain *is* the composition, built
  * step-by-step so the Scala types line up, and the whole thing stays
  * one Catalyst plan (shuffles only where a reducing Step sits).
  *
  * Each chained stage's output is aliased `step:<name>` — a
  * `SubqueryAlias` marker in the ANALYZED plan that [[Trace]] reads to
  * reconstruct the per-step invocation tree (the reference's
  * mr/trace.py request graph). The optimizer erases aliases before
  * physical planning, so the markers cost nothing at runtime.
  */
final case class Workflow[I, O] private (
    name: String,
    stepNames: Vector[String],
    session: Map[String, String],
    pipe: Dataset[I] => Dataset[O]) {

  def andThen[K, V, O2](step: Step[O, K, V, O2])(
      implicit kEnc: Encoder[K], kvEnc: Encoder[(K, V)],
      oEnc: Encoder[O2]): Workflow[I, O2] =
    copy(stepNames = stepNames :+ step.name,
      pipe = ds => Engine.run(pipe(ds), step, session)
        .alias(Trace.StepAliasPrefix + step.name))

  def andThenMap[K, V](step: MapStep[O, K, V])(
      implicit kvEnc: Encoder[(K, V)]): Workflow[I, (K, V)] =
    copy(stepNames = stepNames :+ step.name,
      pipe = ds => Engine.runMap(pipe(ds), step, session)
        .alias(Trace.StepAliasPrefix + step.name))

  def run(ds: Dataset[I]): Dataset[O] = pipe(ds)

  /** Run plus the submit-time invocation-tree trace of the result —
    * the reference's per-request forensic graph for callers that
    * bypass [[Jobs]] (which records the same trace on its handles). */
  def runTraced(ds: Dataset[I], requestId: String):
      (Dataset[O], Trace.RequestTrace) = {
    val out = run(ds)
    (out, Trace.RequestTrace(requestId, name, Trace.ofDataset(out)))
  }
}

object Workflow {
  def start[I](name: String,
      session: Map[String, String] = Map.empty): Workflow[I, I] =
    Workflow(name, Vector.empty, session, identity)
}
