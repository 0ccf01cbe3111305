package graft.operators

import graft.SparkSuite

/** `decontaminate` — planted-contamination recall, asymmetry (the
  * whole point of containment vs Jaccard), and range invariants. */
class DecontaminateSpec extends SparkSuite {

  test("a quoted eval passage inside a larger train doc is flagged") {
    val s = spark; import s.implicits._
    val evalText = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 40).map(i => s"filler$i").mkString(" ")
    val d = Seq(
      (1L, Decontaminate.EvalSource, evalText),
      // train doc = filler + the full eval text: containment 1.0,
      // but Jaccard ≈ 4/44 — symmetric dedup would never flag it
      (2L, "src5", s"$filler $evalText"),
      // unrelated train doc
      (3L, "src6", "omega psi chi phi upsilon tau")
    ).toDF("doc_id", "source", "text")
    val out = Decontaminate.decontaminateOf(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists { case (e, t, c) => e == 1L && t == 2L && c == 1.0 },
      s"planted contamination not flagged: ${out.toSeq}")
    assert(!out.exists(_._2 == 3L), s"unrelated doc flagged: ${out.toSeq}")
    // and the symmetric Jaccard the C2 chain uses would NOT pair them
    val shared = 4.0 // "alpha beta gamma", …, "delta epsilon zeta"
    val jacVal = shared / (4 + 44 - shared)
    assert(jacVal < 0.5, "fixture should defeat symmetric Jaccard")
  }

  test("eval docs never appear as train side and scores are in range") {
    val evalIds = graft.Tables(spark, sfDir).documents
      .filter(org.apache.spark.sql.functions.col("source") ===
        Decontaminate.EvalSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val out = Decontaminate.decontaminate(spark, sfDir).collect()
    out.foreach { r =>
      assert(evalIds.contains(r.getLong(0)), "eval_doc not from eval slice")
      assert(!evalIds.contains(r.getLong(1)), "train_doc from eval slice")
      val c = r.getDouble(2)
      assert(c >= Decontaminate.Tau && c <= 1.0 + 1e-9, s"bad contain $c")
    }
  }

  test("semantic: flagged pairs == a driver-side exact cosine recompute") {
    val rows = graft.Tables(spark, sfDir).embeddings.collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val evals = rows.filter(_._1 < Decontaminate.EvalVecIds)
    val train = rows.filter(_._1 >= Decontaminate.EvalVecIds)
    def nrm(v: Array[Double]) =
      math.sqrt(v.map(x => x * x).sum)
    val want = (for {
      (tid, tv) <- train; (qid, qv) <- evals
      cos = tv.zip(qv).map { case (a, b) => a * b }.sum /
        (nrm(tv) * nrm(qv))
      if cos >= Decontaminate.SemTau
    } yield (tid, qid)).toSet
    val got = Decontaminate.decontaminateSemantic(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty,
      s"got ${got.size} pairs, want ${want.size}")
    // eval ids never on the train side
    assert(got.forall { case (t, q) =>
      t >= Decontaminate.EvalVecIds && q < Decontaminate.EvalVecIds })
  }
}
