package graft.functions

import graft.SparkSuite

/** `quality_gopher_rules` — exact hand-fixture recompute of every
  * rule input plus corpus invariants (each rule must discriminate). */
class GopherRulesSpec extends SparkSuite {

  test("corpus: flag algebra consistent, every rule discriminates") {
    val rows = TextQueries.qualityGopherRules(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val Q = TextQueries
    rows.foreach { r =>
      val (nTok, nDis, stop) = (r.getInt(1), r.getInt(2), r.getInt(6))
      val flags = (7 to 11).map(r.getBoolean)
      val pass = r.getBoolean(12)
      assert(nDis <= nTok && nDis > 0)
      assert(stop >= 0 && stop <= TextFunctions.EnStopwords.length)
      // re-derive the two integer-threshold flags from the outputs
      assert(flags(0) === (nTok >= Q.GopherTokMin && nTok <= Q.GopherTokMax))
      assert(flags(4) === (stop >= Q.GopherStopMin))
      assert(pass === flags.forall(identity), s"doc ${r.getLong(0)}")
    }
    // every rule must split the corpus — a constant flag means the
    // threshold is degenerate for this data and gates nothing
    (7 to 12).foreach { i =>
      assert(rows.map(_.getBoolean(i)).distinct.length == 2,
        s"column $i is constant across the corpus")
    }
  }

  test("per-row form equals the aggregate form column for column") {
    import org.apache.spark.sql.functions.col
    val d = graft.Tables(spark, sfDir).documents
    val agg = TextQueries.gopherRulesOf(d).collect().toSeq
    val row = TextQueries.gopherRulesRowOf(d)
      .orderBy(col("doc_id")).collect().toSeq
    assert(row === agg,
      "native per-row rule inputs must reproduce the explode+groupBy form")
  }

  test("fixture: exact rule inputs from a hand-counted doc") {
    val s = spark; import s.implicits._
    // tokens = [the, cat, cat, of, the, big]: n_tok=6,
    // distinct {the,cat,of,big}=4, top_c=2 (the/cat tie),
    // token chars = 3+3+3+2+3+3 = 17, stopword kinds = {the, of} = 2
    val docs = Seq((7L, "the  cat cat of the\tbig")).toDF("doc_id", "text")
    val r = TextQueries.gopherRulesOf(docs).collect().head
    assert(r.getLong(0) === 7L)
    assert(r.getInt(1) === 6)                       // n_tok
    assert(r.getInt(2) === 4)                       // n_distinct
    assert(r.getDouble(3) === 2.8333)               // 17/6 rounded
    assert(r.getDouble(4) === 0.6667)               // 4/6
    assert(r.getDouble(5) === 0.3333)               // 2/6
    assert(r.getInt(6) === 2)                       // n_stop_kinds
    assert(!r.getBoolean(7))                        // r_len: 6 < 30
    assert(!r.getBoolean(8))                        // r_wlen: 2.83 < 4
    assert(r.getBoolean(9))                         // r_div: 0.667 >= .45
    assert(!r.getBoolean(10))                       // r_rep: 0.333 > .10
    assert(r.getBoolean(11))                        // r_stop: 2 >= 2
    assert(!r.getBoolean(12))                       // pass
  }

  test("quality_rule_ablation == per-row recompute from the rule flags") {
    val flags = TextQueries.qualityGopherRules(spark, sfDir).collect()
      .map(r => (r.getBoolean(9), r.getBoolean(7), r.getBoolean(10),
        r.getBoolean(11), r.getBoolean(8)))   // div, len, rep, stop, wlen
    val names = Seq("r_div", "r_len", "r_rep", "r_stop", "r_wlen")
    val nDocs = flags.length.toLong
    val nPass = flags.count(f => f._1 && f._2 && f._3 && f._4 && f._5).toLong
    val got = TextQueries.qualityRuleAblation(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSeq == names)
    got.foreach { r =>
      val i = names.indexOf(r.getString(0))
      val fails = flags.map(f =>
        Seq(f._1, f._2, f._3, f._4, f._5).map(b => if (b) 0 else 1))
      val k = fails.count(_(i) == 1).toLong
      val u = fails.count(f => f(i) == 1 && f.sum == 1).toLong
      assert(r.getLong(1) == k, s"${r.getString(0)} n_fail")
      assert(r.getLong(2) == u, s"${r.getString(0)} n_unique_fail")
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(5) == nDocs && r.getLong(6) == nPass)
    }
  }
}
