package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the [[Similarity.ivfDots]] literal-vs-broadcast switch
  * (VERDICT r13 #6): above [[Similarity.IvfBroadcastCentroidsFrom]]
  * cells the centroid-dot array assembles from a broadcast centroid
  * table instead of a constant-folded literal array. Every downstream
  * consumer (assignment argmax, probe ordering, silhouette margins,
  * the oracles) is a pure function of the dots array, so BIT equality
  * of the arrays here is exactly the "identical hashes for both
  * forms" contract. */
class IvfFormsSpec extends SparkSuite {

  /** `GRAFT_IVF_FORMS_SF=/root/testdata/sf0.1 sbt "testOnly
    * *IvfFormsSpec"` re-runs the equality proof at a bigger SF (the
    * r14 sf0.1 evidence run); default is the suite's toy scale. */
  private val formsSf = sys.env.getOrElse("GRAFT_IVF_FORMS_SF", sfDir)

  test("broadcast-form dots are bit-identical to the literal form") {
    val nLists = 16
    def dotsOf(broadcastFrom: Int): Map[Long, Seq[Double]] =
      Similarity.ivfDots(spark, formsSf, nLists, broadcastFrom)
        .select(col("vec_id"), col("dots"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1))
        .toMap
    val lit = dotsOf(broadcastFrom = Int.MaxValue) // forced literal
    val bc = dotsOf(broadcastFrom = 1) // forced broadcast
    assert(lit.keySet == bc.keySet, "same vector set")
    assert(lit.nonEmpty)
    lit.foreach { case (id, a) =>
      val b = bc(id)
      assert(a.length == nLists && b.length == nLists, s"vec $id arity")
      a.indices.foreach { i =>
        // bit equality, not tolerance: the strict-fold dot is the
        // same op order in both forms, so the doubles must be the
        // SAME doubles — anything else would eventually flip a tie
        // rule or an oracle hash
        assert(java.lang.Double.doubleToLongBits(a(i)) ==
          java.lang.Double.doubleToLongBits(b(i)),
          s"vec $id centroid ${i + 1}: ${a(i)} vs ${b(i)}")
      }
    }
  }

  test("a full query under the forced broadcast form matches the default output") {
    // annIvf's output is a deterministic function of the dots array;
    // rebuilding its assignment+probe chain from the forced-broadcast
    // frame must reproduce the registry output row-for-row
    val default = Similarity.annIvf(spark, formsSf).collect().map(_.toString)
    val e = Similarity.ivfDots(spark, formsSf, nLists = 16,
      broadcastFrom = 1)
    val assigned = e
      .withColumn("list_id", expr("array_position(dots, array_max(dots))"))
      .select(col("vec_id"), col("v"), col("nrm"), col("list_id"))
    val qLists = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"),
        explode(slice(reverse(array_sort(
          zip_with(col("dots"),
            sequence(lit(1), lit(16)).cast("array<double>"),
            (d, i) => struct(d.as("d"), i.as("i"))))), 1, 4))
          .as("probe"))
      .select(col("q_id"), col("qv"), col("qnrm"),
        col("probe.i").cast("long").as("list_id"))
    val pairs = assigned.join(broadcast(qLists), Seq("list_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        graft.functions.VectorFunctions.cosineWithNorms(
          graft.functions.VectorFunctions.dot(col("qv"), col("v")),
          col("qnrm"), col("nrm")).as("cos"))
    val forced = Similarity.topK(spark, pairs, k = 5)
      .collect().map(_.toString)
    assert(forced.toSeq == default.toSeq,
      "forced-broadcast annIvf output diverged from the default form")
  }
}
