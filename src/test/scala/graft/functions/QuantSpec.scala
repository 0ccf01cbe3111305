package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{VectorFunctions => V}

/** [[QuantStatsI8]] — digest correctness vs an independent driver-side
  * reference, the round-trip error bound, and eval/codegen parity. */
class QuantSpec extends SparkSuite {

  /** Independent reference of the declared semantics. */
  private def refDigest(v: Seq[Double])
      : (Double, Long, Int, Int, Int, Int, Double) = {
    var m = 0.0
    v.foreach { x =>
      val ax = math.abs(x)
      if (ax > m || ax.isNaN) m = ax
    }
    val scale = m / 127.0
    val qs = v.map { x =>
      val y = if (scale == 0.0) 0.0 else x / scale
      val qd = if (y >= 0.0) math.floor(y + 0.5) else -math.floor(-y + 0.5)
      math.max(-127.0, math.min(127.0, qd)).toLong
    }
    var sq = 0.0
    v.zip(qs).foreach { case (x, q) => val e = x - q * scale; sq += e * e }
    (scale, qs.sum,
      if (qs.isEmpty) 0 else qs.min.toInt,
      if (qs.isEmpty) 0 else qs.max.toInt,
      qs.count(q => q == 127L || q == -127L),
      qs.count(_ == 0L), sq)
  }

  private val edgeVecs: Seq[Seq[Double]] = {
    val rng = new scala.util.Random(17)
    Seq.fill(100)(Seq.fill(64)(rng.nextGaussian())) ++ Seq(
      Seq.empty[Double],            // empty → scale 0, all counters 0
      Seq(0.0, 0.0, -0.0),          // all-zero → scale 0, q all zero
      Seq(5.0),                     // single element: q = 127 exactly
      Seq(1.0, -1.0, 0.5, -0.5),    // symmetric saturation both signs
      Seq(1e-300, 1.0),             // denormal-adjacent tiny → q = 0
      Seq(1e300, -1e300, 1e299))    // huge magnitudes, no overflow
  }

  test("digest equals the independent reference, bit for bit") {
    val s = spark; import s.implicits._
    val rows = edgeVecs.toDF("v")
      .select(col("v"), QuantStatsI8(col("v")).as("st"))
      .select(col("v"), col("st.scale"), col("st.q_sum"), col("st.q_min"),
        col("st.q_max"), col("st.n_sat"), col("st.n_zero"), col("st.sq_err"))
      .collect()
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val (scale, qsum, qmin, qmax, nsat, nzero, sq) = refDigest(v)
      assert(bits(r.getDouble(1)) == bits(scale), s"scale on $v")
      assert(r.getLong(2) == qsum, s"q_sum on $v")
      assert(r.getInt(3) == qmin && r.getInt(4) == qmax, s"q_min/max on $v")
      assert(r.getInt(5) == nsat && r.getInt(6) == nzero, s"counts on $v")
      assert(bits(r.getDouble(7)) == bits(sq), s"sq_err on $v")
    }
  }

  test("round-trip bound and saturation on real embeddings") {
    val rows = graft.operators.Similarity.embedQuantize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dim = r.getInt(1); val scale = r.getDouble(2)
      val qmin = r.getInt(4); val qmax = r.getInt(5)
      val nsat = r.getInt(6); val sq = r.getDouble(8)
      // |x − q·scale| ≤ scale/2 per component (rounding, never clamped
      // past it: |x| ≤ max|x| = 127·scale)
      assert(sq <= dim * scale * scale / 4.0 * (1 + 1e-9),
        s"vec ${r.getLong(0)}: sq_err $sq exceeds dim·scale²/4")
      // the max-|x| component always saturates: |q| = rnd(127·(1±ulp))
      assert(nsat >= 1, s"vec ${r.getLong(0)}: max component must hit ±127")
      assert(qmin >= -127 && qmax <= 127 && qmin <= qmax)
    }
  }

  test("interpreted (eval) and codegen paths agree") {
    val s = spark; import s.implicits._
    val df = edgeVecs.toDF("v")
    def run() = df.select(QuantStatsI8(col("v")).as("st"))
      .selectExpr("st.*").collect().map(_.toSeq)
    val byCodegen = run()
    val prevWs = s.conf.get("spark.sql.codegen.wholeStage")
    val prevFm = s.conf.get("spark.sql.codegen.factoryMode")
    try {
      s.conf.set("spark.sql.codegen.wholeStage", "false")
      s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val byEval = run()
      byCodegen.zip(byEval).foreach { case (a, b) => assert(a === b) }
    } finally {
      s.conf.set("spark.sql.codegen.wholeStage", prevWs)
      s.conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }

  test("query data plane: zero shuffles beyond the output sort") {
    val q = graft.operators.Similarity.embedQuantize(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"unexpected aggregate:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"unexpected hash shuffle:\n$plan")
  }
}
