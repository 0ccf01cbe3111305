package graft.functions

import graft.SparkSuite

/** `text_hapax` / `text_collocations` — lexical-profile semantics
  * against independent Scala recomputes at sf0.001. */
class CorpusLexSpec extends SparkSuite {

  private def corpusTokens: Seq[Seq[String]] =
    graft.Tables(spark, sfDir).documents.collect()
      .map(_.getString(1).split("\\s+").filter(_.nonEmpty).toSeq).toSeq

  test("hapax: counts reconcile with a direct token recount") {
    val rows = TextQueries.textHapax(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables(spark, sfDir).documents.collect()
      .map(r => (r.getString(3), r.getString(1))) // (source, text)
    val bySource = docs.groupBy(_._1)
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val src = r.getString(0)
      val toks = bySource(src).flatMap(_._2.split("\\s+").filter(_.nonEmpty))
      val tf = toks.groupBy(identity).view.mapValues(_.size).toMap
      assert(r.getInt(1) == bySource(src).length, s"n_docs $r")
      assert(r.getLong(2) == toks.length.toLong, s"n_tokens $r")
      assert(r.getLong(3) == tf.size.toLong, s"vocab $r")
      assert(r.getLong(4) == tf.values.count(_ == 1).toLong, s"hapax $r")
      assert(r.getLong(4) <= r.getLong(3) && r.getLong(3) <= r.getLong(2))
      assert(math.abs(r.getDouble(5) -
        tf.size.toDouble / toks.length) < 1e-4, s"ttr $r")
    }
  }

  test("collocations: lift reconciles with direct unigram/bigram counts") {
    val rows = TextQueries.textCollocations(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= TextQueries.CollocTopK)
    val toks = corpusTokens
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bis = toks.flatMap(s => s.zip(s.drop(1)).map(p => p._1 + " " + p._2))
    val bi = bis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nUni = toks.map(_.size).sum.toDouble
    val nBi = bis.length.toDouble
    rows.foreach { r =>
      val Array(x, y) = r.getString(0).split(" ")
      assert(r.getLong(1) == bi(r.getString(0)), s"c_xy $r")
      assert(r.getLong(1) >= TextQueries.CollocMinCount)
      assert(r.getLong(2) == uni(x) && r.getLong(3) == uni(y), s"c_x/c_y $r")
      val lift = (r.getLong(1) * nUni * nUni) / (nBi * uni(x) * uni(y))
      assert(math.abs(r.getDouble(4) - lift) < 1e-3, s"lift $r")
    }
    // the kept set is the global top-K by lift: nothing outside the
    // report can have a lift strictly above the reported minimum
    val minLift = rows.map(_.getDouble(4)).min
    val better = bi.filter { case (g, c) =>
      val Array(x, y) = g.split(" ")
      c >= TextQueries.CollocMinCount &&
        (c * nUni * nUni) / (nBi * uni(x) * uni(y)) > minLift + 1e-9
    }
    assert(better.size < TextQueries.CollocTopK,
      "a bigram above the reported minimum lift was left out")
  }
}
