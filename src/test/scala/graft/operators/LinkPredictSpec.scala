package graft.operators

import graft.SparkSuite

/** `graph_link_predict` — hand-fixture score recompute, the
  * existing-edge exclusion, and the hub-cap contract. */
class LinkPredictSpec extends SparkSuite {

  test("path fixture: endpoints predicted through the shared hub") {
    val s = spark; import s.implicits._
    // orders {1,2}, {2,3}: path 1–2–3. The only non-adjacent pair is
    // (1,3), common neighbor 2 with deg 2 ≤ cap:
    // cn=1, ra_fp = 1e12 div 2, jaccard = 1/(1+1-1) = 1.0
    val li = Seq((10L, 1L), (10L, 2L), (20L, 2L), (20L, 3L))
      .toDF("k", "p")
    val rows = Graph.linkPredictOf(li).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 3L)
    assert(r.getInt(2) === 1)
    assert(r.getInt(3) === 1 && r.getInt(4) === 1)
    assert(r.getDouble(5) === 1.0)
    assert(r.getLong(6) === Graph.RaScale / 2)
  }

  test("wedge through two centers sums both RA terms") {
    val s = spark; import s.implicits._
    // K4 minus the (1,4) edge: orders give edges 1–2,1–3,2–3,2–4,3–4.
    // Pair (1,4) has common neighbors {2,3}, each deg 3; deg(1) =
    // deg(4) = 2: cn=2, ra_fp = 2*(1e12 div 3),
    // jaccard = 2/(2+2-2) = 1.0
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),   // triangle 1-2-3
      (20L, 2L), (20L, 4L),              // 2-4
      (30L, 3L), (30L, 4L)               // 3-4
    ).toDF("k", "p")
    val rows = Graph.linkPredictOf(li).collect()
    assert(rows.length === 1, rows.mkString(";"))
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 4L)))
    assert(r.getInt(2) === 2)
    assert(r.getDouble(5) === 1.0)
    assert(r.getLong(6) === 2L * (Graph.RaScale / 3))
  }

  test("a center above the degree cap contributes no wedges") {
    val s = spark; import s.implicits._
    // star: hub 0 linked to leaves 1..cap+2 (one order per pair), so
    // deg(hub) = cap+2 > cap and every leaf has deg 1 — no capped
    // center exists, so no pair is predicted despite cap+2 choose 2
    // hub wedges.
    val n = Graph.LinkDegCap + 2
    val li = (1 to n).flatMap(i =>
      Seq((i.toLong, 0L), (i.toLong, i.toLong))).toDF("k", "p")
    assert(Graph.linkPredictOf(li).collect().isEmpty)
  }

  test("corpus: predictions are non-edges with consistent scores") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables(spark, sfDir).lineitem
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    val out = Graph.linkPredictOf(li)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= Graph.LinkTopK)
    // no predicted pair is an existing co-purchase edge
    val edges = li.as("a").join(li.as("b"), "k")
      .filter(col("a.p") < col("b.p"))
      .select(col("a.p"), col("b.p")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val pair = (r.getLong(0), r.getLong(1))
      assert(!edges.contains(pair), s"predicted existing edge $pair")
      assert(r.getInt(2) >= 1)
      val j = r.getDouble(5)
      assert(j > 0.0 && j <= 1.0)
      assert(r.getLong(6) > 0L)
    }
    // ranking is the declared total order
    val key = rows.map(r =>
      (-r.getInt(2).toLong, -r.getLong(6), r.getLong(0), r.getLong(1)))
    assert(key.sameElements(key.sorted), "rows not in (cn, ra, a, b) order")
  }
}
