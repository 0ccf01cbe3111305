package graft.functions

import graft.SparkSuite

/** `text_entropy` — bounds and a driver-side recompute at sf0.001. */
class EntropySpec extends SparkSuite {

  test("entropy is bounded by log2(alphabet) and matches a recompute") {
    val s = spark
    import org.apache.spark.sql.functions._
    val rows = TextQueries.textEntropy(s, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = graft.Tables(s, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (id, nChars, nDist, h) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))
      assert(nChars == texts(id).length, s"doc $id n_chars")
      assert(nDist >= 1 && nDist <= nChars)
      assert(h >= 0.0 && h <= math.log(nDist.toDouble) / math.log(2.0) + 1e-9,
        s"doc $id entropy $h outside [0, log2($nDist)]")
      if (id < 10) { // exact recompute on a sample
        val counts = texts(id).groupBy(identity).map(_._2.length.toDouble)
        val n = texts(id).length.toDouble
        val ref = -counts.map(c => (c / n) * (math.log(c / n) / math.log(2.0))).sum
        assert(math.abs(h - ref) < 5e-4, s"doc $id: $h vs $ref")
      }
    }
  }
}
