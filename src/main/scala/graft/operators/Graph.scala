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

  /** Distinct undirected (src < dst) co-membership edges over a
    * (k, p) frame — the shared graph build of the whole family.
    *
    * r15: ONE scan — per-k distinct item sets + in-row pair
    * expansion — instead of the 2-scan self-join on k (measured
    * 2.40 → 1.70 s at sf0.1, bit-identical 1 196 000-edge set; the
    * UndAB probe). The k-exchange carries one array row per key
    * instead of every membership row twice, and the pair fan-out
    * happens AFTER the exchange (guide §3.3: explode after the
    * shuffle, not before). Arrays are order-width-bounded (single
    * digits here; bounded by basket width generally), so the
    * interpreted HOF stays under CLAUDE.md's >50-element native-
    * expression rule. */
  private[graft] def undEdges(li: DataFrame): DataFrame =
    li.groupBy(col("k")).agg(collect_set(col("p")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> " +
          "struct(least(x, y) as src, greatest(x, y) as dst))))")).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()

  /** Both-directions variant of [[undEdges]] (src ≠ dst, each edge in
    * both orientations) in ONE subtree — `und ∪ und.flip` would
    * reference (and recompute) the unpersisted build twice. */
  private[graft] def symEdges(li: DataFrame): DataFrame =
    li.groupBy(col("k")).agg(collect_set(col("p")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, x -> " +
          "transform(ps, y -> struct(x as src, y as dst))))")).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

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
    val und = undEdges(li)
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
    // und referenced twice (wedge source + adjacency anti-join) and
    // deg three times — persist both or Catalyst recomputes the
    // whole edge derivation per reference (no-subtree-dedup).
    val und = undEdges(li)
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
    val edges = symEdges(li)
    // (src, dst, deg) once — re-read every round (one cache entry).
    // Hash-partitioned on src BEFORE the persist: every round's join
    // keys on src, so the cached edge side already sits on the join
    // partitioning and each round's only exchange is the |V|-row rank
    // frame (canChangeCachedPlanOutputPartitioning keeps the cached
    // layout visible to the planner). r15: deg rides a count window
    // over the same src partitioning instead of a separate
    // groupBy+join — the old form referenced the `edges` subtree
    // twice (no-subtree-dedup, CLAUDE.md), so the whole self-join +
    // distinct pipeline ran TWICE per call (4 fact scans → 2); the
    // window's exchange doubles as the repartition the persist wants.
    val edgesD = edges
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // V-sized (src, deg) projection OF the cache — not a second build
    val deg = edgesD.select(col("src"), col("deg")).groupBy("src")
      .agg(first(col("deg")).as("deg"))
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

  /** One h-index round over an adjacency frame: for every node, the
    * h-index of its neighbors' current values `cc(c)`.
    *
    * Shape (r15 optimization — guide §2.3/§2.4): the row_number DESC
    * window + max(least(rk, cn)) h-index, with two changes from the
    * r14 form. (1) Only (node, cn) flows into the window — the old
    * form carried the dead `nbr` column through the exchange and the
    * partition sort. (2) [[kcoreWithRounds]] persists `adj`
    * hash-partitioned by `node`, so when the value-frame join
    * broadcasts (AQE, from the realized round frame's runtime size)
    * the window and the groupBy both reuse the cache partitioning and
    * the round runs with ZERO exchange of the O(|E|) adjacency; at
    * cluster scale, where the O(|V|) value frame stops fitting a
    * broadcast, the round's exchanges are V-sized, never E-sized.
    * A counts-collapse variant (two-phase groupBy(node, cn) + a native
    * h-from-counts expression) was measured-and-rejected: 0.86 s vs
    * 0.59 s per materialized round at sf0.1 (KcoreAB probe) — the
    * partition-local sort beats the ObjectHashAggregate collect once
    * no exchange precedes it. */
  private[graft] def kcoreHRound(adj: DataFrame, cc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("node")).orderBy(col("cn").desc)
    adj.join(cc.select(col("node").as("nbr"), col("c").as("cn")), "nbr")
      .select(col("node"), col("cn"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy(col("node"))
      .agg(max(least(col("rk"), col("cn"))).as("c"))
  }

  /** The per-round plan [[PlanDump]] captures for the optimization
    * evidence: one [[kcoreHRound]] over the round-0 inputs, exactly
    * the sub-plan the fixpoint loop executes every round (the final
    * query frame truncates at checkpoints and can't show it). */
  private[graft] def kcoreHRoundForPlan(
      spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    val adj = symEdges(li)
      .toDF("node", "nbr")
      .repartition(col("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    kcoreHRound(adj, adj.groupBy(col("node")).agg(count(lit(1)).as("c")))
  }

  /** [[kcoreOf]] plus the h-index round count it converged in.
    * `tailMaxNodes`/`tailMaxEdges` override the driver-tail caps
    * (test seam — GraphSpec's over-cap fixture pins the distributed
    * fallback with a tiny edge cap). */
  def kcoreWithRounds(
      li: DataFrame,
      tailMaxNodes: Long = KcoreTailMaxNodes,
      tailMaxEdges: Long = KcoreTailMaxEdges): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel
    val spark = li.sparkSession
    // Hash-partitioned by node ONCE at build (r15): every h-round
    // aggregate, the delta rounds' affected/changed joins and deg0
    // then reuse this partitioning instead of re-exchanging the
    // O(|E|) frame per round (guide §2.4 — operations keyed the same
    // way share one exchange).
    val adj = symEdges(li)
      .toDF("node", "nbr")
      .repartition(col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    val trace = sys.env.contains("GRAFT_KCORE_TRACE")
    var tPhase = System.nanoTime()
    def mark(label: String): Unit = if (trace) {
      val now = System.nanoTime()
      println(f"[kcore-t] $label ${(now - tPhase) / 1e9}%.2f s")
      tPhase = now
    }
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
    mark("adj+deg0")
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
    // (measured frontier 19.5k→1.3k over 10 rounds at sf0.1), so the
    // affected-set delta machinery below is pure overhead there —
    // run [[KcoreBulkRounds]] FULL h-rounds first. r15: each bulk
    // round is MATERIALIZED (one checkpoint + one frontier count per
    // round) instead of the old 8-round lazy chain: inside one lazy
    // chain there are no exchange boundaries, so the value-frame
    // join is planned statically as sort-merge (an agg subtree has
    // no usable size estimate) and every round re-exchanged the
    // O(|E|) adjacency; a materialized round lets AQE broadcast the
    // realized O(|V|) value frame, and the node-partitioned adj
    // cache then makes the round exchange-free (KcoreAB probe:
    // 0.59 s vs ~1.4 s per round at sf0.1, bulk 11.5 s → ~5 s).
    // The per-round count doubles as an EARLY EXIT — small corpora
    // converge before KcoreBulkRounds and now stop there (the old
    // chain always paid all 8) — and correctness stays unroll-count
    // independent: the loop below still exits only on an empty
    // frontier.
    var c: DataFrame = deg0
    var changed: DataFrame = deg0.select(col("node"))
    // the delta loop's entry condition (nChanged > 0) relies on at
    // least one bulk round having produced a real frontier count —
    // a 0 constant would return deg0 unconverged (ADVICE r15)
    require(KcoreBulkRounds >= 1,
      s"KcoreBulkRounds must be >= 1 (the -1 seed below is only " +
        s"replaced by a bulk-round probe), got $KcoreBulkRounds")
    var nChanged = -1L
    var iter = 0
    while (iter < KcoreBulkRounds && nChanged != 0L) {
      val prev = c
      val next = snap(kcoreHRound(adj, prev)
        .join(prev.select(col("node"), col("c").as("cPrev")), Seq("node"))
        .select(col("node"),
          least(col("c"), col("cPrev")).as("c"), col("cPrev")))
      changed = next.filter(col("c") =!= col("cPrev")).select(col("node"))
      nChanged = changed.count()
      c = next.select(col("node"), col("c"))
      retireAllBut(next)
      iter += 1
      mark(s"bulk round=${iter - 1} frontier=$nChanged")
    }
    val nNodes = deg0.count()
    // driver-tail trigger scales with the graph so small corpora
    // still exercise the distributed rounds (|V|/10 floor)
    val tailTrigger = math.min(KcoreTailFrontier, nNodes / 10)
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
        mark(s"tail.b round=$iter")
        val s = c.filter(col("c") <= b)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val sCount = s.count()
        mark(s"tail.sCount round=$iter")
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
          mark(s"tail.edgeCount round=$iter")
          if (nSEdges <= tailMaxEdges) {
            // r15: the cascade runs on primitive CSR arrays instead
            // of boxed Scala Maps/Queues (the old Map[Long,_] lookups
            // and sEdges.groupBy were ~2.5 s of driver time at sf0.1;
            // this is the same monotone async cascade, same result,
            // on int indexes — measured ~0.3 s).
            val sEdges = sEdgesDf.collect()
            mark(s"tail.collect round=$iter")
            val sNodes = s.collect()
            val nS = sNodes.length
            val ids = new Array[Long](nS)
            val curA = new Array[Long](nS)
            val c0A = new Array[Long](nS)
            val idx = new java.util.HashMap[java.lang.Long, Integer](nS * 2)
            var i = 0
            while (i < nS) {
              val r = sNodes(i)
              ids(i) = r.getLong(0); curA(i) = r.getLong(1)
              c0A(i) = curA(i)
              idx.put(ids(i), i)
              i += 1
            }
            // out-of-S neighbor count = full degree − in-S degree;
            // every such neighbor has value > B, which for any h ≤ B
            // is equivalent to value == B (the clamp's exactness)
            val degA = new Array[Long](nS)
            deg0.join(s.select(col("node")), Seq("node")).collect()
              .foreach { r => degA(idx.get(r.getLong(0))) = r.getLong(1) }
            // CSR adjacency over the in-S symmetric edge rows
            val mE = sEdges.length
            val srcI = new Array[Int](mE)
            val dstI = new Array[Int](mE)
            val start = new Array[Int](nS + 1)
            i = 0
            while (i < mE) {
              val r = sEdges(i)
              val u = idx.get(r.getLong(0)).intValue()
              srcI(i) = u
              dstI(i) = idx.get(r.getLong(1)).intValue()
              start(u + 1) += 1
              i += 1
            }
            i = 0
            while (i < nS) { start(i + 1) += start(i); i += 1 }
            val fillPos = java.util.Arrays.copyOf(start, nS)
            val nbrA = new Array[Int](mE)
            i = 0
            while (i < mE) {
              val u = srcI(i); nbrA(fillPos(u)) = dstI(i); fillPos(u) += 1
              i += 1
            }
            mark(s"tail.maps round=$iter")
            // primitive FIFO worklist (order is free for CORRECTNESS —
            // monotone h-updates converge to the same fixpoint in any
            // order — but not for WORK: LIFO re-processes nodes before
            // their neighborhoods settle, measured 5.0 s vs 1.6 s at
            // sf0.1; breadth order matches the old Queue behavior)
            var qArr = new Array[Int](nS * 2)
            var qHead = 0
            var qTail = 0
            val queued = new Array[Boolean](nS)
            i = 0
            while (i < nS) { qArr(i) = i; queued(i) = true; i += 1 }
            qTail = nS
            var nChangedS = 0
            while (qHead < qTail) {
              val v = qArr(qHead); qHead += 1; queued(v) = false
              val s0 = start(v); val s1 = start(v + 1)
              val inN = s1 - s0
              val outN = (degA(v) - inN).toInt
              val vals = new Array[Long](inN + outN)
              var k = 0
              while (k < inN) {
                val cu = curA(nbrA(s0 + k))
                vals(k) = if (cu < b) cu else b
                k += 1
              }
              while (k < inN + outN) { vals(k) = b; k += 1 }
              java.util.Arrays.sort(vals)
              var h = 0L
              var j = vals.length - 1
              while (j >= 0) {
                val rank = vals.length - j
                val m = math.min(rank.toLong, vals(j))
                if (m > h) h = m
                j -= 1
              }
              if (h < curA(v)) {
                if (curA(v) == c0A(v)) nChangedS += 1
                curA(v) = h
                k = s0
                while (k < s1) {
                  val u = nbrA(k)
                  if (!queued(u)) {
                    if (qTail == qArr.length) {
                      // compact the consumed prefix or grow
                      if (qHead > qArr.length / 2) {
                        System.arraycopy(qArr, qHead, qArr, 0, qTail - qHead)
                        qTail -= qHead; qHead = 0
                      } else {
                        qArr = java.util.Arrays.copyOf(qArr, qArr.length * 2)
                      }
                    }
                    qArr(qTail) = u; qTail += 1; queued(u) = true
                  }
                  k += 1
                }
              }
            }
            val changedS = new scala.collection.mutable.ArrayBuffer[
              (Long, Long)](nChangedS)
            i = 0
            while (i < nS) {
              if (curA(i) != c0A(i)) changedS += ((ids(i), curA(i)))
              i += 1
            }
            mark(s"tail.cascade round=$iter")
            if (changedS.nonEmpty) {
              // merge driver results; the pending frontier STAYS
              // pending (its out-of-S neighbors still need the
              // distributed recheck below) and the driver-changed
              // nodes join it
              val updates = spark.createDataFrame(
                spark.sparkContext.parallelize(changedS.toSeq, 4))
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
        mark(s"tail round=$iter")
      }
      {
        val affected = adj
          .join(changed.withColumnRenamed("node", "nbr"), "nbr")
          .select(col("node")).distinct()
        val hNew = kcoreHRound(adj.join(affected, Seq("node")), c)
          .withColumnRenamed("c", "h")
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
        mark(s"delta round=${iter - 1}")
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
    val und = undEdges(li)
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
    val und = undEdges(li)
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
    val adj = symEdges(li)
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
