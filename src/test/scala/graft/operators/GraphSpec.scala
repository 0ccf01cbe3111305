package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** `graph_pagerank` / `graph_kcore` — hand-fixture structure, mass
  * conservation, and the exactness contracts at sf0.001. */
class GraphSpec extends SparkSuite {

  test("hub node out-ranks leaves on a path graph (hand fixture)") {
    val s = spark; import s.implicits._
    // groups {1,2} and {2,3}: path 1–2–3; node 2 is the hub
    val li = Seq((10L, 1L), (10L, 2L), (20L, 2L), (20L, 3L))
      .toDF("k", "p")
    val out = Graph.pagerankOf(li).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._1 == 1 && out(2L)._1 == 2 && out(3L)._1 == 1)
    assert(out(2L)._2 > out(1L)._2, s"hub must out-rank a leaf: $out")
    // symmetric leaves get identical integer ranks
    assert(out(1L)._2 == out(3L)._2)
  }

  test("mass is conserved up to integral-division dust at sf0.001") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables(spark, sfDir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    val ranks = Graph.pagerankOf(li)
    val agg = ranks.agg(sum("q"), count(lit(1))).collect()(0)
    val (mass, n) = (agg.getLong(0), agg.getLong(1))
    assert(mass <= Graph.PrScale)
    // per round each node sheds < 100 units at each of its two
    // integral divisions, plus the q0 remainder
    val slack = Graph.PrIters.toLong * 200L * n + n * 100L
    assert(mass >= Graph.PrScale - slack, s"mass $mass, n $n")
    ranks.collect().foreach(r => assert(r.getLong(2) > 0))
  }

  test("triangles: hand fixture — K3, bridge, K4") {
    val s = spark; import s.implicits._
    // order 10 → K3 {1,2,3}; order 20 → bridge 3–4;
    // order 30 → K3 {4,5,6}; order 40 → K4 {7,8,9,10}
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 3L), (20L, 4L),
      (30L, 4L), (30L, 5L), (30L, 6L),
      (40L, 7L), (40L, 8L), (40L, 9L), (40L, 10L)
    ).toDF("k", "p")
    val out = Graph.trianglesOf(li).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == (1L to 10L).toSet)
    assert(out(1L) == ((2L, 1L)) && out(2L) == ((2L, 1L)))
    assert(out(3L) == ((3L, 1L)) && out(4L) == ((3L, 1L)))
    assert(out(5L) == ((2L, 1L)) && out(6L) == ((2L, 1L)))
    // K4: every node deg 3, in C(3,2)=3 triangles
    (7L to 10L).foreach(n => assert(out(n) == ((3L, 3L)), s"node $n"))
  }

  test("triangles: sf invariants — role sum divisible by 3, deg bound, deterministic") {
    val r1 = Graph.graphTriangles(spark, sfDir).collect()
    assert(r1.nonEmpty)
    var total = 0L
    r1.foreach { r =>
      val (deg, tri) = (r.getLong(1), r.getLong(2))
      assert(tri <= deg * (deg - 1) / 2, s"node ${r.getLong(0)}")
      total += tri
    }
    assert(total % 3 == 0, s"each triangle counted in 3 roles: $total")
    assert(total > 0, "co-purchase graph at sf0.001 should close triangles")
    val r2 = Graph.graphTriangles(spark, sfDir).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  test("query entry: contiguous ranks, descending q, deterministic rerun") {
    val r1 = Graph.graphPagerank(spark, sfDir).collect()
    assert(r1.length == Graph.PrTopK)
    r1.zipWithIndex.foreach { case (r, i) => assert(r.getInt(0) == i + 1) }
    val qs = r1.map(_.getLong(3))
    assert(qs.zip(qs.tail).forall { case (a, b) => a >= b })
    val r2 = Graph.graphPagerank(spark, sfDir).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
      "integer pagerank must be bit-deterministic")
  }

  test("kcore: hand fixture — K4 with a two-hop tail") {
    val s = spark; import s.implicits._
    // k=100 makes {1,2,3,4} a clique; 4–5 and 5–6 hang off it.
    // Cores: the K4 nodes peel at 3; 5 and 6 peel at 1 (node 6 has
    // degree 1, and removing it strands 5 at degree 1 too).
    val li = Seq(
      (100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (101L, 4L), (101L, 5L),
      (102L, 5L), (102L, 6L)
    ).toDF("k", "p")
    val got = Graph.kcoreOf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, 3L, 3L), (2L, 3L, 3L), (3L, 3L, 3L), (4L, 4L, 3L),
      (5L, 2L, 1L), (6L, 1L, 1L)))
  }

  test("assortativity: star is maximally disassortative, path matches " +
      "a driver OLS recompute, regular graph is NULL") {
    val s = spark; import s.implicits._
    // star: center 0 linked to 8 leaves (one order per spoke) — every
    // edge joins deg-8 to deg-1 nodes ⇒ r = −1 exactly
    val star = (1 to 8).flatMap(i =>
      Seq((i.toLong, 0L), (i.toLong, i.toLong))).toDF("k", "p")
    val rs = Graph.assortativityOf(star).collect().head
    assert(rs.getLong(0) === 9L && rs.getLong(1) === 8L)
    assert(math.abs(rs.getDouble(2) - (-1.0)) < 1e-9, s"star r=${rs.get(2)}")

    // triangle (3-regular on degrees 2,2,2): zero degree variance ⇒
    // the Pearson r is undefined — NULL, never NaN
    val tri = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 3L),
      (3L, 1L)).toDF("k", "p")
    val rt = Graph.assortativityOf(tri).collect().head
    assert(rt.getLong(0) === 3L && rt.getLong(1) === 3L)
    assert(rt.isNullAt(2), s"regular graph must be NULL, got ${rt.get(2)}")

    // path 1-2-3-4: driver-side Pearson over the 6 directed (du,dv)
    // pairs
    val path = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L),
      (3L, 3L), (3L, 4L)).toDF("k", "p")
    val rp = Graph.assortativityOf(path).collect().head
    val degs = Map(1L -> 1.0, 2L -> 2.0, 3L -> 2.0, 4L -> 1.0)
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val pairs = es.flatMap { case (u, v) =>
      Seq((degs(u), degs(v)), (degs(v), degs(u))) }
    val m = pairs.length.toDouble
    val (su, sv) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val suv = pairs.map(p => p._1 * p._2).sum
    val suu = pairs.map(p => p._1 * p._1).sum
    val svv = pairs.map(p => p._2 * p._2).sum
    val expect = (m * suv - su * sv) /
      (math.sqrt(m * suu - su * su) * math.sqrt(m * svv - sv * sv))
    assert(math.abs(rp.getDouble(2) - expect) < 1e-6,
      s"path r=${rp.get(2)} vs $expect")
  }

  test("kcore: over-cap driver tail falls back to distributed rounds") {
    val s = spark; import s.implicits._
    // 60-node path (erosion regime: sheds one node per end per
    // round, ~30 h-rounds — far past the 8 bulk rounds, so the loop
    // attempts the driver tail every round). tailMaxEdges=0 refuses
    // the collect BEFORE materializing it; the distributed rounds
    // must then converge on their own to the same coreness.
    val n = 60
    val li = (1 until n).flatMap(i =>
      Seq((i.toLong, i.toLong), (i.toLong, (i + 1).toLong)))
      .toDF("k", "p")
    val (dfCapped, roundsCapped) =
      Graph.kcoreWithRounds(li, tailMaxEdges = 0L)
    val capped = dfCapped.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    capped.foreach { case (node, d, c) =>
      assert(c == 1L, s"path coreness must be 1, node $node got $c")
      assert(d == (if (node == 1L || node == n.toLong) 1L else 2L),
        s"node $node deg $d")
    }
    // bulk alone cannot finish a 60-node path — proves the refused
    // tail actually fell back to live distributed rounds
    assert(roundsCapped > Graph.KcoreBulkRounds,
      s"expected distributed fallback rounds, got $roundsCapped")
    // identical output with the driver tail allowed (default caps)
    val viaTail = Graph.kcoreOf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaTail == capped,
      "tail and distributed paths must agree (monotone fixpoint)")
  }

  test("kcore: sf invariants — coreness ≤ deg, max-core subgraph " +
    "has min degree ≥ k_max, deterministic rerun") {
    val r1 = Graph.graphKcore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(r1.nonEmpty)
    r1.foreach { case (n, d, c) =>
      assert(c >= 1 && c <= d, s"node $n: coreness $c vs deg $d") }
    val kMax = r1.map(_._3).max
    val coreNodes = r1.filter(_._3 == kMax).map(_._1).toSet
    assert(coreNodes.size > kMax, "a k-core needs > k nodes")
    // induced-degree check on the max core
    val li = graft.Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size)
        yield (ps(i), ps(j))
    }.toSet
    coreNodes.foreach { n =>
      val indDeg = coreNodes.count(m => m != n &&
        (edges.contains((math.min(n, m), math.max(n, m)))))
      assert(indDeg >= kMax, s"node $n induced degree $indDeg < $kMax")
    }
    val r2 = Graph.graphKcore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(r1.toSeq == r2.toSeq, "kcore must be deterministic")
  }

  test("khop reach on a path graph counts exact BFS balls " +
    "(hand fixture)") {
    val s = spark; import s.implicits._
    // path 1-2-3-4-5 via pairwise memberships
    val li = Seq((10L, 1L), (10L, 2L), (20L, 2L), (20L, 3L),
      (30L, 3L), (30L, 4L), (40L, 4L), (40L, 5L)).toDF("k", "p")
    val got = Graph.khopOf(li).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got(1L) == ((1L, 2L, 3L)))  // 2 | +3 | +4
    assert(got(2L) == ((2L, 3L, 4L)))  // 1,3 | +4 | +5
    assert(got(3L) == ((2L, 4L, 4L)))  // 2,4 | +1,5 | saturated
    assert(got(5L) == ((1L, 2L, 3L)))
  }

  test("khop at sf0.001: reach is monotone in depth and bounded " +
    "by the node count") {
    val rows = Graph.graphKhop(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == Graph.KhopSources ||
      (rows.length < Graph.KhopSources && rows.nonEmpty))
    rows.foreach { case (src, n1, n2, n3) =>
      assert(n1 >= 1, s"source $src has an edge by construction")
      assert(n1 <= n2 && n2 <= n3, s"reach not monotone at $src")
    }
  }

  test("edge jaccard: triangle edges read support 1 / jaccard 1; a " +
    "bridge reads support 0 / NULL; corpus run is support-bounded") {
    val s = spark; import s.implicits._
    // triangle {1,2,3} plus a pendant bridge 3–4 (deg: 1,2 → 2;
    // 3 → 3; 4 → 1). Edge (1,2): support 1, union\endpoints = {3}
    // ⇒ 1/1; edges touching 3: support 1 but 3's extra neighbor 4
    // pads the union ⇒ 1/2; the bridge: support 0 over union {1,2}
    // ⇒ 0.0.
    val li = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 3L), (20L, 4L))
      .toDF("k", "p")
    val got = Graph.edgeJaccardOf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(got((1L, 2L)) == (1L, Some(1.0)))
    assert(got((1L, 3L)) == (1L, Some(0.5)))
    assert(got((2L, 3L)) == (1L, Some(0.5)))
    assert(got((3L, 4L)) == (0L, Some(0.0)))
    // corpus: support can never exceed min endpoint degree − 1
    val rows = Graph.graphEdgeJaccard(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Graph.EdgeJacTopK)
    rows.foreach { r =>
      val (ds, dt, sup) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sup <= math.min(ds, dt) - 1,
        s"support exceeds shared-neighbor bound: $r")
    }
  }

  test("modularity: two disjoint same-brand triangles score Q = 1/2 " +
    "exactly; corpus run reconciles") {
    val s = spark; import s.implicits._
    // two triangles {1,2,3} (brand A) and {4,5,6} (brand B):
    // m = 6, e_c = 3, d_c = 6 ⇒ q_c = 3/6 − (6/12)² = 1/4 each
    val li = Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 4L), (20L, 5L), (20L, 6L)).toDF("k", "p")
    val brands = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B")).toDF("p", "brand")
    val fx = Graph.modularityOf(li, brands).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(fx.keySet == Set("A", "B"))
    fx.values.foreach { case (n, e, d, q) =>
      assert(n == 3L && e == 3L && d == 6L && q == 0.25)
    }
    val rows = Graph.graphModularity(spark, sfDir).collect()
    val m2 = rows.map(_.getLong(3)).sum // Σ d_tot = 2m
    assert(m2 % 2 == 0)
    assert(rows.map(_.getLong(2)).sum <= m2 / 2, "Σ e_in ≤ m")
    val qTot = rows.map(_.getDouble(4)).sum
    assert(qTot > -1.0 && qTot <= 1.0, s"Q out of range: $qTot")
  }
}
