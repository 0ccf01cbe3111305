package graft.operators

import graft.SparkSuite

/** `embed_drift` — planted-direction fixture with exact fixed-point
  * arithmetic, plus corpus range invariants. */
class DriftSpec extends SparkSuite {

  test("orthogonal planted labels land at cos 0.707107 to the global mean") {
    val s = spark; import s.implicits._
    // label 0 = all (1,0), label 1 = all (0,1); global mean = (.5,.5)
    // cos(either, global) = 1/sqrt(2); centroid norms exactly 1.0
    val e = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(1.0f, 0.0f)),
      (1, Array(0.0f, 1.0f)), (1, Array(0.0f, 1.0f))
    ).toDF("label", "embedding")
    val rows = Similarity.driftOf(e).collect()
      .map(r => r.getInt(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows.keySet === Set(0, 1))
    Seq(0, 1).foreach { l =>
      val (n, norm, cos) = rows(l)
      assert(n === 2)
      assert(norm === 1.0)
      assert(cos === 0.707107, s"label $l cos $cos")
    }
  }

  test("a label aligned with the corpus direction reads cos 1") {
    val s = spark; import s.implicits._
    val e = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(1.0f, 0.0f)),
      (1, Array(1.0f, 0.0f))
    ).toDF("label", "embedding")
    val rows = Similarity.driftOf(e).collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(rows(0) === 1.0 && rows(1) === 1.0)
  }

  test("corpus: one row per label, cosine bounded, counts conserve") {
    val rows = Similarity.embedDrift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getInt(1) > 0)
      assert(r.getDouble(2) > 0.0)
      val c = r.getDouble(3)
      assert(c >= -1.0000001 && c <= 1.0000001, s"label ${r.getInt(0)}: $c")
    }
    val total = rows.map(_.getInt(1).toLong).sum
    val n = graft.Tables(spark, sfDir).embeddings.count()
    assert(total === n, s"per-label counts $total != corpus $n")
  }
}
