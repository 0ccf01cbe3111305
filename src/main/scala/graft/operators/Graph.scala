package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2B/C adjunct — iterative graph analytics: PageRank over
  * the co-purchase graph (parts are linked when they appear in the
  * same order), the canonical "which items anchor the catalog"
  * centrality read and the classic iterative-join workload on Spark.
  *
  * Exactness: the whole iteration is INTEGER arithmetic — ranks are
  * fixed-point longs (scale [[PrScale]]), each round is
  * q'(v) = (15·q₀) div 100 + (85·Σ_u q(u) div deg(u)) div 100
  * with integral `div` everywhere, so sums are order-free and the
  * DuckDB oracle (the same recurrence unrolled as CTE stages)
  * hash-gates all [[PrIters]] rounds exactly. The mass shaved by
  * integral division is the documented, deterministic trade — this
  * is "integer PageRank", one definition on both engines.
  *
  * Scale shape: the edge explode is bounded by order size (≤ a few
  * lineitems per order — never a row-explosion); edges+degrees are
  * computed once and persisted; each round is ONE equi-join
  * (edges ⋈ ranks on src) and ONE groupBy(dst) — the
  * shuffle-on-natural-key pattern that scales to billion-edge
  * graphs, with per-round materialization truncating the lineage
  * (the dedup_components discipline). Top-k is TakeOrderedAndProject,
  * never a global sort. */
object Graph {

  /** Fixed-point scale: rank 1.0 ≡ 1e12 (headroom: 85·Σ < 2⁶³). */
  val PrScale = 1000000000000L

  /** Power-iteration rounds (unrolled identically in the oracle). */
  val PrIters = 10

  /** Reported top-k nodes. */
  val PrTopK = 100

  /** B: per-node triangle counting over the co-purchase graph — the
    * local-clustering / community-density read next to PageRank's
    * centrality (a part in many triangles sits inside a tightly
    * bundled product cluster, not just on many orders). Output:
    * (node, deg, n_tri) for every node of the undirected co-purchase
    * graph, all exact integers ⇒ full hash gate.
    *
    * Algorithm: the standard degree-ordered orientation — each
    * undirected edge points from its (deg, id)-smaller endpoint to
    * the larger, so every triangle a≺b≺c survives as exactly the
    * oriented wedge a→b, b→c closed by a→c, found by two equi-joins.
    * Orientation bounds each wedge fan-out by the SMALLER endpoint
    * degree (Σ min-degree ≤ O(m^1.5) — the hot-hub explosion of a
    * naive wedge join never happens), which is what makes the triple
    * self-join survive a billion-edge graph; all joins are
    * shuffle-on-natural-key, AQE splits residual skew. The oriented
    * edge frame is persisted (referenced 3×; Catalyst would otherwise
    * recompute the whole edge derivation three times — the
    * no-subtree-dedup trap), as is `und` (2×: degree + orientation). */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    trianglesOf(li)
  }

  /** Per-node (node, deg, n_tri) over any (k, p) membership frame —
    * nodes are linked iff they share a k (the [[pagerankOf]] graph,
    * kept undirected src<dst here). */
  def trianglesOf(li: DataFrame): DataFrame = {
    val (_, deg, tri) = orientedTriangles(li)
    val cnt = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
    deg.join(cnt, Seq("n"), "left")
      .select(col("n").as("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .orderBy(col("node"))
  }

  /** Shared triangle substrate: the distinct undirected edge frame
    * (src < dst), the degree frame, and the enumerated triangle frame
    * (x, y, z — orientation order, NOT id order). und/deg are
    * persisted (multi-referenced by every caller). */
  private def orientedTriangles(li: DataFrame):
      (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.storage.StorageLevel
    val a = li.select(col("k"), col("p").as("src"))
    val b = li.select(col("k"), col("p").as("dst"))
    val und = a.join(b, "k").filter(col("src") < col("dst"))
      .select("src", "dst").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("src").as("n"))
      .unionAll(und.select(col("dst").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dd = und
      .join(deg.as("da"), col("src") === col("da.n"))
      .join(deg.as("db"), col("dst") === col("db.n"))
      .select(col("src"), col("dst"),
        col("da.deg").as("ds"), col("db.deg").as("dt"))
    // (deg, id) total order — ties impossible beyond id (src < dst)
    val lower = struct(col("ds"), col("src")) < struct(col("dt"), col("dst"))
    val o = dd.select(
        when(lower, col("src")).otherwise(col("dst")).as("a"),
        when(lower, col("dst")).otherwise(col("src")).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Compact-forward closure: a triangle a≺b≺c is a common
    // out-neighbor c ∈ N⁺(a) ∩ N⁺(b) of the edge (a,b). The naive
    // alternative — wedge join o⋈o on b=a, then closing against o —
    // materializes EVERY wedge through a shuffle (~70M narrow rows on
    // this graph at sf0.1, measured 27 s); intersecting the two
    // out-lists per edge does the same Σ(d⁺(a)+d⁺(b)) work inside one
    // codegen'd array_intersect with no wedge exchange. Out-lists are
    // orientation-bounded (d⁺ ≤ O(√m)), so the carried array payload
    // stays small on any graph.
    val adj = o.groupBy(col("a")).agg(collect_list(col("b")).as("nbrs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tri = o
      .join(adj.select(col("a"), col("nbrs").as("na")), Seq("a"))
      .join(adj.select(col("a").as("b"), col("nbrs").as("nb")), Seq("b"))
      .select(col("a").as("x"), col("b").as("y"),
        explode(array_intersect(col("na"), col("nb"))).as("z"))
    (und, deg, tri)
  }

  /** Reported top-k strongest edges for [[graphEdgeJaccard]]. */
  val EdgeJacTopK = 100

  /** B (round 13): edge embeddedness — per EXISTING co-purchase edge,
    * its triangle support |N(a)∩N(b)| and neighborhood Jaccard
    * (endpoints excluded), top-[[EdgeJacTopK]] by (support desc, src,
    * dst). The adjacent-pair twin of graph_link_predict's
    * non-adjacent scoring: high-embeddedness edges are Simmelian
    * ties (redundant, safe to sparsify; the k-truss building block),
    * zero-support edges are bridges — the read that picks which
    * co-purchase links are structural vs incidental.
    *
    * Scale shape: the shared compact-forward triangle substrate
    * (orientation-bounded intersection — no wedge shuffle), each
    * triangle exploded to its 3 canonical id-ordered edges in ONE
    * projection, per-edge support via map-side-combined groupBy,
    * LEFT join back onto the full edge frame (zero-support edges
    * kept), cut = TakeOrderedAndProject under a total order. Support
    * and degrees are exact integers; Jaccard is one division with
    * the 0-denominator (isolated edge) NULL CASE mirrored ⇒ full
    * hash gate. */
  def graphEdgeJaccard(spark: SparkSession, dir: String): DataFrame =
    edgeJaccardOf(Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")))

  /** Top embedded edges over any (k, p) membership frame. */
  def edgeJaccardOf(li: DataFrame): DataFrame = {
    val (und, deg, tri) = orientedTriangles(li)
    val etri = tri.select(explode(array(
        struct(least(col("x"), col("y")).as("u"),
          greatest(col("x"), col("y")).as("v")),
        struct(least(col("x"), col("z")).as("u"),
          greatest(col("x"), col("z")).as("v")),
        struct(least(col("y"), col("z")).as("u"),
          greatest(col("y"), col("z")).as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val sup = etri.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("sup"))
    val j = und
      .join(deg.select(col("n").as("src"), col("deg").as("deg_src")),
        Seq("src"))
      .join(deg.select(col("n").as("dst"), col("deg").as("deg_dst")),
        Seq("dst"))
      .join(sup, col("src") === col("u") && col("dst") === col("v"), "left")
      .select(col("src"), col("dst"), col("deg_src"), col("deg_dst"),
        coalesce(col("sup"), lit(0L)).as("support"))
    val denom = col("deg_src") + col("deg_dst") - lit(2L) - col("support")
    j.select(col("src"), col("dst"), col("deg_src"), col("deg_dst"),
        col("support"),
        when(denom > 0L,
          round(col("support").cast("double") / denom.cast("double"), 4))
          .as("jaccard"))
      .orderBy(col("support").desc, col("src"), col("dst"))
      .limit(EdgeJacTopK)
  }

  // Shadows functions.round: DuckDB-exact binary rounding (OracleMath).
  private def round(c: org.apache.spark.sql.Column, scale: Int):
      org.apache.spark.sql.Column =
    graft.functions.OracleMath.roundDuck(c, scale)

  /** Centers with degree > this contribute no wedges — the hub cut
    * that bounds wedge work to Σ_{deg≤cap} deg² ≤ cap·|E| (linear in
    * edges for the fixed cap), the same Zipfian-tail discipline as
    * dedup's df≤50 posting-list cut. Hubs are also the WEAKEST
    * link-prediction evidence (resource-allocation/Adamic-Adar
    * downweight them toward zero), so the cut approximates the score
    * it feeds. */
  val LinkDegCap = 80

  /** Reported top-k predicted links. */
  val LinkTopK = 100

  /** Fixed-point scale for the resource-allocation sum (1.0 ≡ 1e12):
    * Σ_c (RaScale div deg(c)) is an order-free INTEGER sum — the
    * pagerank determinism discipline — so the score hash-gates
    * exactly where a double Σ 1/deg would flake on add order. */
  val RaScale = 1000000000000L

  /** B: link prediction over the co-purchase graph — for every
    * non-adjacent part pair, how strongly their shared neighborhoods
    * predict a future co-purchase: selective common-neighbor count
    * (centers of degree ≤ [[LinkDegCap]]), fixed-point
    * resource-allocation score, and the capped-numerator Jaccard.
    * Top-[[LinkTopK]] by (cn desc, ra_fp desc, a, b) — a total
    * order, so the cut is deterministic cross-engine.
    *
    * Scale: the wedge self-join fans out ONLY from capped centers
    * (Σ deg² ≤ cap·|E|); the candidate groupBy and the two degree
    * joins are shuffle-on-natural-key; the final cut is
    * TakeOrderedAndProject, never a global sort. All scores are
    * integers or one division of integers ⇒ full hash gate. */
  def graphLinkPredict(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    linkPredictOf(li)
  }

  /** Top predicted links over any (k, p) membership frame. */
  def linkPredictOf(li: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val a = li.select(col("k"), col("p").as("src"))
    val b = li.select(col("k"), col("p").as("dst"))
    // und referenced twice (wedge source + adjacency anti-join) and
    // deg three times — persist both or Catalyst recomputes the
    // whole edge derivation per reference (no-subtree-dedup).
    val und = a.join(b, "k").filter(col("src") < col("dst"))
      .select("src", "dst").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("src").as("n"))
      .unionAll(und.select(col("dst").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e = und.select(col("src").as("c"), col("dst").as("m"))
      .unionAll(und.select(col("dst").as("c"), col("src").as("m")))
    val ec = e.join(
      deg.filter(col("deg") <= LinkDegCap)
        .select(col("n").as("c"), col("deg").as("cdeg")), Seq("c"))
    val pairs = ec.select(col("c"), col("cdeg"), col("m").as("pa"))
      .join(ec.select(col("c"), col("m").as("pb")), Seq("c"))
      .filter(col("pa") < col("pb"))
    val scored = pairs.groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("cn"),
        sum(expr(s"${RaScale}L div cdeg")).as("ra_fp"))
    val newPairs = scored.join(und,
      scored("pa") === und("src") && scored("pb") === und("dst"),
      "left_anti")
    newPairs
      .join(deg.select(col("n").as("pa"), col("deg").as("deg_a")), Seq("pa"))
      .join(deg.select(col("n").as("pb"), col("deg").as("deg_b")), Seq("pb"))
      .select(col("pa").as("node_a"), col("pb").as("node_b"),
        col("cn").cast("int").as("cn"),
        col("deg_a").cast("int").as("deg_a"),
        col("deg_b").cast("int").as("deg_b"),
        round(col("cn") / (col("deg_a") + col("deg_b") - col("cn")), 6)
          .as("jaccard"),
        col("ra_fp"))
      .orderBy(col("cn").desc, col("ra_fp").desc,
        col("node_a"), col("node_b"))
      .limit(LinkTopK)
  }

  def graphPagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    val ranks = pagerankOf(li)
    val top = ranks
      .orderBy(col("q").desc, col("node"))
      .limit(PrTopK)
    import org.apache.spark.sql.expressions.Window
    top.withColumn("rk", row_number()
        .over(Window.orderBy(col("q").desc, col("node"))))
      .select(col("rk"), col("node").as("part"), col("deg"), col("q"))
      .orderBy(col("rk"))
  }

  /** Full fixed-point ranks (node, deg, q) over any (k, p)
    * membership frame — nodes are linked iff they share a k. */
  def pagerankOf(li: DataFrame): DataFrame = {
    val a = li.select(col("k"), col("p").as("src"))
    val b = li.select(col("k"), col("p").as("dst"))
    val edges = a.join(b, "k")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // (src, dst, deg) once — re-read every round (one cache entry).
    // Hash-partitioned on src BEFORE the persist: every round's join
    // keys on src, so the cached edge side already sits on the join
    // partitioning and each round's only exchange is the |V|-row rank
    // frame (canChangeCachedPlanOutputPartitioning keeps the cached
    // layout visible to the planner).
    val edgesD = edges.join(deg, "src")
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = edgesD.select(col("src")).distinct().count()
    val q0 = PrScale / n
    val base = (15L * q0) / 100L
    // The rounds UNROLL LAZILY into one plan — a fixed-count
    // iteration needs no convergence probe, so the
    // persist+count-per-round discipline (dedup_components) does not
    // apply, and paying it here was measured as pure plan overhead:
    // 10 × (persist + count job + broadcast warm-up + AQE replan)
    // ≈ 24 s at sf0.001 AND sf0.1 alike (the BASELINE.md plan-bound
    // probe). Unrolled, each round is ONE equi-join of the rank frame
    // against the cached, src-partitioned edge frame feeding the next
    // agg — a linear chain (each frame referenced exactly once, no
    // subtree duplication), executed as ONE query. Measured: 23.8 s
    // → 7.9 s median at sf0.1 when first unrolled, bit-identical
    // output. Deliberately NO broadcast() hint on the rank side: the
    // rank frame has one row per NODE — O(|V|) — and forcing a
    // per-round driver collect+broadcast of it is driver OOM by
    // construction on a billion-node graph. As a shuffle equi-join on
    // src the per-round exchange carries only the |V|-row rank frame
    // (the edge side reuses its cached partitioning); at toy scale
    // AQE still converts to broadcast on its own when the frame fits
    // — the planner keeps the choice at exactly the scale where the
    // hint would take it away (round-11 re-time: 5.5 s median-of-7 at
    // sf0.1, vs 7.9 s with the forced hint — the shuffle form is
    // FASTER even at toy scale, on top of the scale-safety).
    // GraphIterSpec pins the no-O(|V|)-broadcast contract.
    var ranks = deg.select(col("src").as("node"), lit(q0).as("q"))
    for (_ <- 1 to PrIters) {
      val prev = ranks
      ranks = edgesD.join(prev, edgesD("src") === prev("node"))
        .select(col("dst"), expr("q div deg").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(base) + expr("(85 * s) div 100")).as("q"))
    }
    ranks.join(deg, ranks("node") === deg("src"))
      .select(col("node"), col("deg"), col("q"))
  }

  /** Safety bound on [[kcoreOf]]'s h-index rounds. NOT a small
    * constant: h-index convergence is bounded by the graph's
    * "erosion depth" — a path of 1-core nodes hanging off a dense
    * region sheds ONE node per round from each end, so a chain of
    * length L needs ~L/2 rounds (measured: sf0.001 converges in 5,
    * sf1's percolated co-purchase tail needs 60+). 512 covers any
    * physically plausible erosion depth; the throw is the
    * componentLabels non-convergence discipline. */
  val KcoreMaxIters = 512

  /** Unrolled bulk h-rounds executed lazily as ONE query before the
    * probe-driven loop (the measured bulk-convergence knee; the loop
    * exit is still the empty frontier, so the count only trades
    * materializations for plan depth, never correctness). */
  val KcoreBulkRounds = 8

  /** Frontier size below which [[kcoreWithRounds]] attempts the
    * driver tail finish (the erosion regime — round count, not data,
    * is the cost there). */
  val KcoreTailFrontier = 20000L

  /** Caps on the collected periphery subgraph (nodes / in-S edges):
    * the driver tail finish is the quantizer-training class of
    * driver work, never a data-plane collect — an over-cap periphery
    * falls back to the distributed rounds. */
  val KcoreTailMaxNodes = 500000L
  val KcoreTailMaxEdges = 5000000

  /** B: k-core decomposition of the co-purchase graph — every node's
    * CORENESS (the largest k such that the node survives in the
    * subgraph where everyone keeps ≥ k neighbors), the standard
    * density peel that separates load-bearing catalog clusters from
    * tail attachments (and, on web/spam graphs, farms from organic
    * neighborhoods). Completes the graph family: triangles = local
    * density, pagerank = centrality, components = connectivity,
    * kcore = cohesion depth.
    *
    * Algorithm: the h-index fixpoint (Lü et al. 2016, "The H-index
    * of a network node") — c₀(v) = deg(v); each round replaces c(v)
    * with the H-INDEX of its neighbors' values (the largest h with
    * ≥ h neighbors at ≥ h); the sequence is pointwise monotone
    * decreasing and converges exactly to the coreness. Distributed
    * shape: DELTA iteration — each round recomputes h only for
    * nodes ADJACENT to the last round's changed set (a node's
    * h-index can't move unless a neighbor's value did), so round
    * cost is O(deg(frontier)), not O(|E|): the erosion tail (a
    * 1-core chain shedding one node per round — the regime that
    * makes the ROUND COUNT large, measured 60+ rounds on sf1's
    * percolated co-purchase tail vs 5 at sf0.001) costs a few rows
    * per round instead of a full-graph join. All equi-joins on
    * natural keys + one per-affected-node sort window, no O(|V|)
    * broadcast (GraphIterSpec), per-round checkpoint + FULL-action
    * frontier count as the convergence probe (empty frontier ==
    * fixpoint; the componentLabels discipline), replaced round
    * frames eagerly unpersisted. The h-index off the sort window is
    * max(min(rank, value)) — deterministic under ties (equal values
    * occupy interchangeable rank positions).
    *
    * No cross-engine oracle: a converging fixpoint is the
    * WITH-RECURSIVE shape DuckDB 1.0 can't express without the
    * reach-explosion (CLAUDE.md) — rows-only [R] gate; VerifyR
    * proves set-equality vs an exact sequential peel plus the
    * double-run hash. */
  def graphKcore(spark: SparkSession, dir: String): DataFrame =
    kcoreOf(Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")))

  /** (node, deg, coreness) over any (k, p) membership frame — same
    * undirected shared-k graph as [[trianglesOf]]/[[pagerankOf]]. */
  def kcoreOf(li: DataFrame): DataFrame = kcoreWithRounds(li)._1

  /** [[kcoreOf]] plus the h-index round count it converged in.
    * `tailMaxNodes`/`tailMaxEdges` override the driver-tail caps
    * (test seam — GraphSpec's over-cap fixture pins the distributed
    * fallback with a tiny edge cap). */
  def kcoreWithRounds(
      li: DataFrame,
      tailMaxNodes: Long = KcoreTailMaxNodes,
      tailMaxEdges: Long = KcoreTailMaxEdges): (DataFrame, Int) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val spark = li.sparkSession
    val a = li.select(col("k"), col("p").as("src"))
    val b = li.select(col("k"), col("p").as("dst"))
    val und = a.join(b, "k").filter(col("src") < col("dst"))
      .select("src", "dst").distinct()
    val adj = und.unionAll(und.select(col("dst"), col("src")))
      .toDF("node", "nbr")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    // every live round checkpoint is tracked; retireAllBut frees the
    // replaced ones (deg0 is always kept — the output reads it)
    val live = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def snap(df: DataFrame): DataFrame = {
      val out = if (reliable) df.checkpoint() else df.localCheckpoint()
      live += out
      out
    }
    def freeRdd(df: DataFrame): Unit =
      df.queryExecution.logical.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach { rdd =>
        rdd.unpersist(blocking = false)
        // retired rounds' RELIABLE checkpoint FILES are dead weight:
        // without deleting them a 60+-round run accretes one
        // materialized O(|V|) frame per round on disk for the
        // application lifetime (getCheckpointFile is None for local
        // checkpoints — block-only, already freed by unpersist)
        rdd.getCheckpointFile.foreach { f =>
          try {
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(p, true)
            ()
          } catch { case _: Throwable => () } // best-effort cleanup
        }
      }
    val deg0 = snap(adj.groupBy(col("node")).agg(count(lit(1)).as("c")))
    def retireAllBut(keep: DataFrame*): Unit = {
      val keepSet = keep.toSet + deg0
      live.filterNot(keepSet.contains).foreach(freeRdd)
      val kept = live.filter(keepSet.contains)
      live.clear()
      live ++= kept
    }
    // DELTA iteration: a node's h-index can only change when a
    // NEIGHBOR's value changed, so each round recomputes h ONLY for
    // nodes adjacent to the previous round's changed set. Round cost
    // is O(deg(frontier)), not O(|E|) — the erosion tail (a chain
    // shedding one node per round, the regime that makes the round
    // COUNT large) then costs a few rows per round instead of a
    // full-graph join, which is what keeps a large round count
    // affordable at scale. Convergence = empty frontier (the count
    // is a full action on the checkpointed frontier frame).
    // BULK phase: the first rounds touch nearly every node anyway
    // (measured frontier 19.5k→1.3k over 10 rounds at sf0.1), so
    // per-round materialization there is pure overhead — unroll
    // [[KcoreBulkRounds]] full h-updates LAZILY as one chained query
    // (the pagerank lazy-unroll pattern: one execution, one
    // checkpoint) and let the probe-driven delta loop below finish.
    // Correctness is unroll-count independent: the loop still exits
    // only on an empty frontier.
    def hRound(cc: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("node")).orderBy(col("cn").desc)
      adj.join(cc.select(col("node").as("nbr"), col("c").as("cn")), "nbr")
        .withColumn("rk", row_number().over(w).cast("long"))
        .groupBy(col("node"))
        .agg(max(least(col("rk"), col("cn"))).as("c"))
    }
    // cPre feeds BOTH the final h-round and the change-detection
    // join — persist it or the 7-stage prefix executes twice
    // (no-subtree-dedup, CLAUDE.md)
    val cPre = (1 until KcoreBulkRounds).foldLeft(deg0: DataFrame) {
      (cc, _) => hRound(cc) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bulk = snap(hRound(cPre)
      .join(cPre.select(col("node"), col("c").as("cPrev")), Seq("node"))
      .select(col("node"),
        least(col("c"), col("cPrev")).as("c"), col("cPrev")))
    cPre.unpersist(blocking = false)
    var c: DataFrame = bulk.select(col("node"), col("c"))
    var changed: DataFrame =
      bulk.filter(col("c") =!= col("cPrev")).select(col("node"))
    var nChanged = changed.count()
    val nNodes = deg0.count()
    // driver-tail trigger scales with the graph so small corpora
    // still exercise the distributed rounds (|V|/10 floor)
    val tailTrigger = math.min(KcoreTailFrontier, nNodes / 10)
    var iter = KcoreBulkRounds
    while (nChanged > 0L && iter < KcoreMaxIters) {
      // DRIVER TAIL FINISH: once the frontier is small, the cascade
      // is the slow erosion regime (one chain hop per round — the
      // round count, not the data, is the cost). h-index updates are
      // a MONOTONE fixpoint, so any asynchronous update order
      // converges to the same coreness: collect the low-value
      // periphery S = {c ≤ max frontier value} with out-of-S
      // neighbors CLAMPED to B (exact for computing any h ≤ B),
      // run its cascade to stability on the driver in one shot, and
      // let the next distributed round re-check the S boundary —
      // global convergence (empty frontier) is still the only exit.
      // Caps below keep the collect to the quantizer-training class
      // of driver work; an over-cap periphery falls back to the
      // distributed rounds.
      if (nChanged <= tailTrigger) {
        val b = changed.join(c, Seq("node"))
          .agg(max(col("c"))).head().getLong(0)
        val s = c.filter(col("c") <= b)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val sCount = s.count()
        if (sCount <= tailMaxNodes) {
          // Edge cap is checked with a FULL action BEFORE collecting:
          // coreness ≤ B does NOT bound degree (a star center has
          // coreness 1 and unbounded degree), so the in-S edge list
          // must be counted distributed-side first — collect-then-
          // check would materialize the over-cap case on the driver,
          // the exact OOM the cap exists to refuse. Over-cap → fall
          // through to the distributed round below (always correct,
          // just slower per erosion hop).
          val sEdgesDf = adj
            .join(s.select(col("node")), Seq("node"))
            .join(s.select(col("node").as("nbr")), Seq("nbr"))
            .select(col("node"), col("nbr"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          val nSEdges = sEdgesDf.count()
          if (nSEdges <= tailMaxEdges) {
            val sEdges = sEdgesDf.collect()
              .map(r => (r.getLong(0), r.getLong(1)))
            val cur = scala.collection.mutable.Map(
              s.collect().map(r => r.getLong(0) -> r.getLong(1)): _*)
            val inDeg = scala.collection.mutable.Map
              .empty[Long, Int].withDefaultValue(0)
            sEdges.foreach { case (u, _) => inDeg(u) += 1 }
            // out-of-S neighbor count = full degree − in-S degree;
            // every such neighbor has value > B, which for any h ≤ B
            // is equivalent to value == B (the clamp's exactness)
            val degMap = deg0.join(s.select(col("node")), Seq("node"))
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            val nbrs = sEdges.groupBy(_._1).map { case (k, v) =>
              k -> v.map(_._2) }
            val queue = scala.collection.mutable.Queue(cur.keys.toSeq: _*)
            val queued = scala.collection.mutable.Set(cur.keys.toSeq: _*)
            val changedS = scala.collection.mutable.Set.empty[Long]
            while (queue.nonEmpty) {
              val v = queue.dequeue(); queued -= v
              val outN = (degMap(v) - inDeg(v)).toInt
              val vals = nbrs.getOrElse(v, Array.empty[Long])
                .map(u => math.min(cur(u), b)) ++
                Array.fill(outN)(b)
              java.util.Arrays.sort(vals)
              var h = 0L
              var i = vals.length - 1
              while (i >= 0) {
                val rank = vals.length - i
                val m = math.min(rank.toLong, vals(i))
                if (m > h) h = m
                i -= 1
              }
              if (h < cur(v)) {
                cur(v) = h; changedS += v
                nbrs.getOrElse(v, Array.empty[Long]).foreach { u =>
                  if (!queued.contains(u)) { queue.enqueue(u); queued += u }
                }
              }
            }
            if (changedS.nonEmpty) {
              // merge driver results; the pending frontier STAYS
              // pending (its out-of-S neighbors still need the
              // distributed recheck below) and the driver-changed
              // nodes join it
              val updates = spark.createDataFrame(
                spark.sparkContext.parallelize(
                  changedS.toSeq.map(n => (n, cur(n))), 4))
                .toDF("node", "cNew")
              val nextC = snap(c.join(updates, Seq("node"), "left")
                .select(col("node"),
                  coalesce(col("cNew"), col("c")).as("c")))
              val nextChanged = snap(changed
                .unionAll(updates.select(col("node"))).distinct())
              c = nextC
              changed = nextChanged
              nChanged = changed.count()
              retireAllBut(nextC, nextChanged)
            }
            if (sys.env.contains("GRAFT_KCORE_TRACE"))
              println(s"[kcore] round=$iter driver-tail S=$sCount " +
                s"merged=${changedS.size}")
          } else if (sys.env.contains("GRAFT_KCORE_TRACE"))
            println(s"[kcore] round=$iter driver-tail SKIPPED " +
              s"(in-S edges=$nSEdges > cap $tailMaxEdges)")
          sEdgesDf.unpersist(blocking = false)
        }
        s.unpersist(blocking = false)
      }
      {
        val affected = adj
          .join(changed.withColumnRenamed("node", "nbr"), "nbr")
          .select(col("node")).distinct()
        val w = Window.partitionBy(col("node")).orderBy(col("cn").desc)
        val hNew = adj.join(affected, Seq("node"))
          .join(c.select(col("node").as("nbr"), col("c").as("cn")), "nbr")
          .withColumn("rk", row_number().over(w).cast("long"))
          .groupBy(col("node"))
          .agg(max(least(col("rk"), col("cn"))).as("h"))
        // ONE checkpoint per round; next values, the frontier and the
        // count probe are all cheap projections/scans OF that frame
        // (lineage stays depth-1 off the checkpoint) — three snaps
        // per round measured 23.9 s at sf0.1, all fixed job cost.
        val merged = snap(c.join(hNew, Seq("node"), "left")
          .select(col("node"), col("c"),
            least(col("c"), coalesce(col("h"), col("c"))).as("c2")))
        val nextChanged = merged
          .filter(col("c2") =!= col("c")).select(col("node"))
        nChanged = nextChanged.count()
        if (sys.env.contains("GRAFT_KCORE_TRACE"))
          println(s"[kcore] round=$iter frontier=$nChanged")
        retireAllBut(merged)
        c = merged.select(col("node"), col("c2").as("c"))
        changed = nextChanged
        iter += 1
      }
    }
    if (nChanged > 0L)
      throw new IllegalStateException(
        s"kcore did not converge in $KcoreMaxIters h-index rounds")
    val out = deg0.select(col("node"), col("c").as("deg"))
      .join(c.select(col("node"), col("c").as("coreness")), Seq("node"))
      .orderBy(col("node"))
    adj.unpersist(blocking = false)
    (out, iter)
  }

  /** B (round 13): degree assortativity of the co-purchase graph —
    * the Pearson correlation of endpoint degrees over the symmetric
    * edge list (Newman 2002, "Assortative mixing in networks"): r > 0
    * means hubs link to hubs (social-graph mixing), r < 0 means hubs
    * link to leaves (star/hub-and-spoke catalogs — the typical
    * co-purchase shape). Completes the graph-stats family: triangles
    * = local density, pagerank = centrality, kcore = cohesion depth,
    * components = connectivity, assortativity = degree MIXING.
    *
    * Scale shape: one distinct-edge build (the shared trianglesOf/
    * pagerankOf/kcoreOf graph), one degree aggregate, two equi-joins
    * to attach endpoint degrees, ONE global aggregate row. The
    * undirected edge frame is persisted — it feeds the mirror union
    * AND (via adj) the degree aggregate and both join sides
    * (no-subtree-dedup). All six correlation sums are EXACT integer
    * aggregates (order-free, overflow-safe: Σd³-scale terms stay
    * far under 2⁶³); the Pearson assembly then casts each sum to
    * double ONCE and combines in FP — identical operands + correctly
    * rounded IEEE ops ⇒ bit-identical cross-engine even where
    * m·Σd² would overflow int64. Degenerate (regular) graphs have
    * exactly-zero variance ⇒ NULL, same CASE in the oracle ⇒ full
    * hash gate. */
  def graphAssortativity(spark: SparkSession, dir: String): DataFrame =
    assortativityOf(Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")))

  /** Single-row (n_nodes, n_edges, assortativity) over any (k, p)
    * membership frame. */
  def assortativityOf(li: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val a = li.select(col("k"), col("p").as("src"))
    val b = li.select(col("k"), col("p").as("dst"))
    val und = a.join(b, "k").filter(col("src") < col("dst"))
      .select("src", "dst").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val adj = und.unionAll(und.select(col("dst"), col("src")))
      .toDF("u", "v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = adj.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
    val scored = adj
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
    val stats = scored.agg(
      count(lit(1)).as("m"),
      sum(col("du")).as("su"), sum(col("dv")).as("sv"),
      sum(col("du") * col("dv")).as("suv"),
      sum(col("du") * col("du")).as("suu"),
      sum(col("dv") * col("dv")).as("svv"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val md = col("m").cast("double")
    val vu = md * col("suu").cast("double") -
      col("su").cast("double") * col("su").cast("double")
    val vv = md * col("svv").cast("double") -
      col("sv").cast("double") * col("sv").cast("double")
    val covn = md * col("suv").cast("double") -
      col("su").cast("double") * col("sv").cast("double")
    stats.crossJoin(nNodes)
      .select(col("n_nodes"), expr("m div 2").as("n_edges"),
        when(vu > 0.0 && vv > 0.0,
          round(covn / (sqrt(vu) * sqrt(vv)), 6)).as("assortativity"))
  }

  /** B (round 13): modularity of the BRAND partition over the
    * co-purchase graph — per community c: within-community edges
    * e_c, total degree d_c, and the Newman–Girvan modularity term
    * q_c = e_c/m − (d_c/2m)²; Σ q_c is the partition's modularity.
    * The "do catalog brands form real co-purchase communities"
    * read — an ATTRIBUTE partition scored against graph structure
    * (the evaluation half of community detection, the same Q any
    * Louvain implementation maximizes; here the candidate partition
    * comes from metadata, which is how curation pipelines sanity-
    * check a taxonomy against behavior).
    *
    * Scale shape: one distinct-edge build (the shared co-purchase
    * graph, persisted), brand attachment via two shuffle
    * equi-joins on the part dim (NO broadcast hint — part GROWS
    * with the corpus; AQE broadcasts from runtime stats when it
    * actually fits, the pagerank rule), then three
    * map-side-combined aggregates over the labeled edge frame
    * (persisted — 3 references) and one node-grain groupBy. All
    * counts exact integers; each q_term is IEEE on exact operands,
    * mirrored ⇒ full hash gate. */
  def graphModularity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    modularityOf(
      t.lineitem.select(col("l_orderkey").as("k"), col("l_partkey").as("p")),
      t.part.select(col("p_partkey").as("p"), col("p_brand").as("brand")))
  }

  /** Core over any (k, p) membership frame and (p, brand) label
    * frame. */
  def modularityOf(li: DataFrame, part: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val a = li.select(col("k"), col("p").as("src"))
    val b = li.select(col("k"), col("p").as("dst"))
    val und = a.join(b, "k").filter(col("src") < col("dst"))
      .select("src", "dst").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e = und
      .join(part.select(col("p").as("src"), col("brand").as("b_src")),
        Seq("src"))
      .join(part.select(col("p").as("dst"), col("brand").as("b_dst")),
        Seq("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m = e.agg(count(lit(1)).as("m"))
    val ec = e.filter(col("b_src") === col("b_dst"))
      .groupBy(col("b_src").as("brand")).agg(count(lit(1)).as("e_in"))
    val dc = e.select(col("b_src").as("brand"))
      .unionAll(e.select(col("b_dst").as("brand")))
      .groupBy("brand").agg(count(lit(1)).as("d_tot"))
    val nodes = und.select(col("src").as("p"))
      .unionAll(und.select(col("dst").as("p"))).distinct()
      .join(part, Seq("p"))
      .groupBy("brand").agg(count(lit(1)).as("n_nodes"))
    val dShare = col("d_tot").cast("double") /
      (lit(2L) * col("m")).cast("double")
    nodes
      .join(dc, Seq("brand"))
      .join(ec, Seq("brand"), "left")
      .crossJoin(broadcast(m))
      .select(col("brand"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_tot"),
        round(coalesce(col("e_in"), lit(0L)).cast("double") /
          col("m").cast("double") - dShare * dShare, 6).as("q_term"))
      .orderBy(col("brand"))
  }

  /** Number of pinned BFS sources for [[graphKhop]] (single-sourced
    * into the oracle). */
  val KhopSources = 10

  /** B: k-hop neighborhood expansion (k = 1..3) from the
    * [[KhopSources]] smallest part ids of the co-purchase graph —
    * per source the CUMULATIVE reach at each depth, the
    * influence/blast-radius read ("how much of the catalog is within
    * 3 recommendation hops") and the expansion-rate profile that
    * sizes any message-passing operator's frontier. Exactly the
    * neighborhood-growth numbers a closeness estimate samples.
    *
    * Scale shape: depth is FIXED (k = 3), so the whole query is
    * three unrolled distinct-equi-join rounds — no recursion, no
    * driver loop, and the DuckDB oracle is the same three CTE stages
    * (the graph_pagerank one-definition discipline, minus the
    * fixed-point algebra: everything here is set-distinct integer).
    * Frontier frames are persisted (each feeds the next round AND
    * its own count — Catalyst no-subtree-dedup); every round is
    * shuffle-on-natural-key; reach is bounded by 10·|V| rows. The
    * pinned-source set is an orderBy-limit on the node frame
    * (TakeOrderedAndProject, no global sort). */
  def graphKhop(spark: SparkSession, dir: String): DataFrame =
    khopOf(Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")))

  /** Core over any (k, p) membership frame. */
  def khopOf(li: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val a = li.select(col("k"), col("p").as("src"))
    val b = li.select(col("k"), col("p").as("dst"))
    val und = a.join(b, "k").filter(col("src") < col("dst"))
      .select("src", "dst").distinct()
    val adj = und.unionAll(
        und.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sources = adj.select(col("src").as("s")).distinct()
      .orderBy(col("s")).limit(KhopSources)
      .select(col("s"))
    // reach frames INCLUDE the source itself (depth-0 seed keeps the
    // expansion uniform); counts subtract the self row.
    def expand(r: DataFrame): DataFrame = r
      .join(adj, r("v") === adj("src"))
      .select(col("s"), col("dst").as("v"))
      .unionAll(r)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val r0 = sources.select(col("s"), col("s").as("v"))
    val r1 = expand(r0)
    val r2 = expand(r1)
    val r3 = expand(r2)
    def cnt(r: DataFrame, name: String): DataFrame =
      r.groupBy(col("s")).agg((count(lit(1)) - 1L).as(name))
    cnt(r1, "n_1hop")
      .join(cnt(r2, "n_2hop"), Seq("s"))
      .join(cnt(r3, "n_3hop"), Seq("s"))
      .select(col("s").as("source"), col("n_1hop"), col("n_2hop"),
        col("n_3hop"))
      .orderBy(col("source"))
  }
}
