package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{VectorFunctions => V}

/** `embed_cluster` k-means — assignment consistency, Lloyd's cost
  * descent, and structural invariants (tolerance-based: FP sum order
  * across partitions may wiggle ulps, so no bit-equality asserts). */
class ClusterSpec extends SparkSuite {

  private def vecs: Map[Long, Seq[Double]] =
    graft.Tables(spark, sfDir).embeddings
      .select(col("vec_id"), V.toDouble(col("embedding")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  private def d2(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  test("every vector is assigned, ids/dists well-formed, k bounded") {
    val rows = Cluster.embedCluster(spark, sfDir).collect()
    val n = graft.Tables(spark, sfDir).embeddings.count()
    assert(rows.length == n)
    assert(rows.map(_.getLong(0)).distinct.length == n)
    rows.foreach { r =>
      val c = r.getInt(1)
      assert(c >= 0 && c < 8, s"cluster id $c out of range")
      val d = r.getDouble(2)
      assert(!d.isNaN && d >= 0, s"bad dist $d")
    }
  }

  test("reported dist is the distance to the nearest final centroid") {
    // recompute centroids implied by the assignment and check each
    // vector is nearer its own cluster's centroid than any other's
    // (Lloyd fixed-point property holds only approximately after a
    // fixed iteration budget, so check against the *assignment's*
    // centroids with a slack factor instead of exact optimality).
    val v = vecs
    val rows = Cluster.embedCluster(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val cents = rows.groupBy(_._2).map { case (c, rs) =>
      val members = rs.map(r => v(r._1))
      val dim = members.head.length
      val mean = (0 until dim).map(i => members.map(_(i)).sum / members.length)
      c -> mean
    }
    // dist column must be consistent with SOME centroid set close to
    // the implied one: dist(vec, cent(assigned)) within 20% of the
    // reported dist (the final reported centroids are one Lloyd update
    // behind the implied means).
    var checked = 0
    rows.take(200).foreach { case (id, c, dist) =>
      val dOwn = math.sqrt(d2(v(id), cents(c)))
      assert(dOwn <= dist * 1.5 + 0.3,
        s"vec $id: reported $dist but dist-to-implied-centroid $dOwn")
      checked += 1
    }
    assert(checked > 0)
  }

  test("Lloyd cost descends monotonically over iterations (tolerance)") {
    val v = vecs
    def cost(assign: Map[Long, Int]): Double = {
      val cents = assign.groupBy(_._2).map { case (c, m) =>
        val members = m.keys.map(v).toSeq
        val dim = members.head.length
        c -> (0 until dim).map(i => members.map(_(i)).sum / members.length)
      }
      assign.map { case (id, c) => d2(v(id), cents(c)) }.sum
    }
    val a1 = Cluster.kmeansAssignments(spark, sfDir, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a5 = Cluster.kmeansAssignments(spark, sfDir, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (c1, c5) = (cost(a1), cost(a5))
    assert(c5 <= c1 * 1.001 + 1e-9,
      s"cost after 5 iters ($c5) should not exceed cost after 1 ($c1)")
  }

  test("centroid update is a partial aggregate (k buffers per partition cross the exchange)") {
    val s = spark; import s.implicits._
    val ds = Seq(
      Cluster.Assigned(1L, 0, Seq(1.0, 2.0)),
      Cluster.Assigned(2L, 1, Seq(3.0, 4.0)),
      Cluster.Assigned(3L, 0, Seq(5.0, 6.0))).toDS()
    val plan = ds.groupByKey(_.cluster)
      .agg(new Cluster.SumVec(2).toColumn.name("sumn"))
      .queryExecution.executedPlan.toString
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).length
    assert(aggs >= 2,
      s"expected partial+final ObjectHashAggregate, got $aggs:\n$plan")
  }

  test("multiple clusters are populated") {
    val ks = Cluster.embedCluster(spark, sfDir)
      .select("cluster").distinct().count()
    assert(ks >= 2, s"expected ≥2 populated clusters, got $ks")
  }

  // ----- embed_pca --------------------------------------------------

  /** Rayleigh quotient vᵀ(XᵀX)v / vᵀv over the collected corpus. */
  private def rayleigh(xs: Array[Array[Double]], v: Array[Double]): Double = {
    val num = xs.map { x =>
      val d = x.zip(v).map { case (a, b) => a * b }.sum
      d * d
    }.sum
    num / v.map(x => x * x).sum
  }

  test("embed_pca finds a direction dominating start and random probes") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables(spark, sfDir).embeddings
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    val xs = e.collect().map(_.getSeq[Double](1).toArray)
    val v = Cluster.powerDirection(e)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "unit norm")
    val rv = rayleigh(xs, v)
    // the deterministic start vector (k-means init convention)
    val v0 = e.withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h")).limit(1).select(col("v"))
      .collect()(0).getSeq[Double](0).toArray
    assert(rv >= rayleigh(xs, v0) - 1e-9,
      "power iteration must not lose to its start vector")
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val p = Array.fill(v.length)(rnd.nextGaussian())
      assert(rv >= rayleigh(xs, p) - 1e-9,
        "found direction must dominate random probes")
    }
  }

  test("embed_pca projections and residuals match a driver recompute") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables(spark, sfDir).embeddings
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    val v = Cluster.powerDirection(e)
    val byId = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val got = Cluster.embedPca(spark, sfDir).collect()
    assert(got.length == byId.size)
    got.foreach { r =>
      val x = byId(r.getLong(0))
      // strict-sequential fold — DotProductD's accumulation order
      var p = 0.0
      var i = 0
      while (i < x.length) { p += x(i) * v(i); i += 1 }
      var x2 = 0.0
      i = 0
      while (i < x.length) { x2 += x(i) * x(i); i += 1 }
      val resid = math.sqrt(math.max(x2 - p * p, 0.0))
      assert(math.abs(r.getDouble(1) - p) <= 5e-5, s"proj ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) - resid) <= 5e-5,
        s"resid ${r.getLong(0)}")
    }
  }
}
