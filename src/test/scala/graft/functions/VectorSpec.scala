package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{VectorFunctions => V}

/** Bit-equality of the fused [[HyperplaneSig]] expression with the
  * composed per-plane-dot reference it replaced. */
class VectorSpec extends SparkSuite {

  test("fused hyperplane signature equals the composed reference, bit for bit") {
    val s = spark; import s.implicits._
    val planes = V.randomPlanes(nPlanes = 64, dim = 8, seed = 3L)
    val rng = new scala.util.Random(4)
    val vecs = Seq.fill(50)(Seq.fill(8)(rng.nextGaussian()))
    val rows = vecs.toDF("v").select(
        V.hyperplaneBands(col("v"), planes, bandBits = 4).as("fused"),
        V.hyperplaneBandsRef(col("v"), planes, bandBits = 4).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("fused signature on real embeddings equals the reference") {
    val planes = V.randomPlanes(nPlanes = 64, dim = 64)
    val e = graft.Tables(spark, sfDir).embeddings
      .select(V.toDouble(col("embedding")).as("v"))
    val rows = e.select(
        V.hyperplaneBands(col("v"), planes, bandBits = 4).as("fused"),
        V.hyperplaneBandsRef(col("v"), planes, bandBits = 4).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("NaN/Inf vectors band identically in fused and composed forms") {
    // A NaN dot (NaN coordinate, or Inf + -Inf cancelling) must take
    // bit 1 in both forms: Spark SQL orders NaN above every double,
    // so the composed `when(dot >= 0, ...)` sets the bit, and the
    // fused loop's `!(acc < 0)` matches it (a primitive `acc >= 0`
    // would not).
    val s = spark; import s.implicits._
    val planes = V.randomPlanes(nPlanes = 16, dim = 4, seed = 5L)
    val inf = Double.PositiveInfinity
    val vecs: Seq[Seq[Double]] = Seq(
      Seq(Double.NaN, 1.0, 2.0, 3.0),
      Seq(inf, 1.0, 2.0, 3.0),
      Seq(-inf, 1.0, 2.0, 3.0),
      Seq(inf, -inf, 1.0, 2.0),
      Seq(-inf, inf, -inf, inf))
    val rows = vecs.toDF("v").select(
        V.hyperplaneBands(col("v"), planes, bandBits = 4).as("fused"),
        V.hyperplaneBandsRef(col("v"), planes, bandBits = 4).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // and the all-NaN signature is all bits set in every band
    val allNan = Seq(Seq(Double.NaN, Double.NaN, Double.NaN, Double.NaN))
      .toDF("v")
      .select(V.hyperplaneBands(col("v"), planes, bandBits = 4).as("k"))
      .head().getSeq[Long](0)
    assert(allNan.forall(_ == 15L), s"NaN dots must set every bit: $allNan")
  }

  test("VecStatsD equals the composed HOF reference, bit for bit") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(11)
    val vecs = Seq.fill(100)(Seq.fill(64)(rng.nextGaussian())) ++
      Seq(Seq.empty[Double],          // zero-length → (0, 0, 0)
        Seq(0.0, -0.0),               // signed-zero edge
        Seq(1e300, 1e300, -1e300),    // magnitude ordering matters
        // NaN must propagate into max_abs like greatest() does —
        // mid-array, where a bare `ax > m` would silently skip it,
        // and trailing, where m already holds a finite max
        Seq(1.0, Double.NaN, 2.0),
        Seq(3.0, -4.0, Double.NaN))
    val df = vecs.toDF("v")
    val got = df.select(graft.functions.VecStatsD(col("v")).as("st"))
      .select(col("st.norm_sq"), col("st.sum"), col("st.max_abs"))
      .collect()
    val ref = df.selectExpr(
      "aggregate(v, cast(0.0 AS double), (a, x) -> a + x * x) AS q",
      "aggregate(v, cast(0.0 AS double), (a, x) -> a + x) AS s",
      "aggregate(v, cast(0.0 AS double), (a, x) -> greatest(a, abs(x))) AS m")
      .collect()
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
    got.zip(ref).zipWithIndex.foreach { case ((g, r), i) =>
      (0 to 2).foreach { c =>
        assert(bits(g.getDouble(c)) == bits(r.getDouble(c)),
          s"row $i col $c: ${g.getDouble(c)} != ${r.getDouble(c)}")
      }
    }
  }

  test("interpreted (eval) and codegen paths agree") {
    val s = spark; import s.implicits._
    val planes = V.randomPlanes(nPlanes = 16, dim = 4, seed = 9L)
    val rng = new scala.util.Random(8) // ONE rng: distinct vectors
    val vecs = Seq.fill(20)(Seq.fill(4)(rng.nextGaussian()))
    val df = vecs.toDF("v")
    val byCodegen = df
      .select(V.hyperplaneBands(col("v"), planes, 4).as("k")).collect()
    val prevWs = s.conf.get("spark.sql.codegen.wholeStage")
    val prevFm = s.conf.get("spark.sql.codegen.factoryMode")
    try {
      s.conf.set("spark.sql.codegen.wholeStage", "false")
      s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val byEval = df
        .select(V.hyperplaneBands(col("v"), planes, 4).as("k")).collect()
      byCodegen.zip(byEval).foreach { case (a, b) =>
        assert(a.getSeq[Long](0) === b.getSeq[Long](0))
      }
    } finally {
      // restore the SAVED values — the session is shared across suites
      s.conf.set("spark.sql.codegen.wholeStage", prevWs)
      s.conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }
}
