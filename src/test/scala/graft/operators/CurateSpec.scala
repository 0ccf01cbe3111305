package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pipeline-level invariants of the composed curation query (the
  * exact output is hash-gated against the DuckDB oracle; these are
  * the structural guarantees a downstream consumer relies on). */
class CurateSpec extends SparkSuite {

  test("curated corpus: quality floor, no exact dups, no near-dup pairs") {
    val curated = Curate.curateCorpus(spark, sfDir)
    val rows = curated.collect()
    assert(rows.nonEmpty)
    // quality floor holds (rounded values, so allow the 4dp epsilon)
    rows.foreach(r => assert(r.getDouble(2) >= Curate.MinQuality - 5e-5))
    // doc ids unique
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)

    val docs = graft.Tables(spark, sfDir).documents
    val curatedDocs = docs.join(
      curated.select(col("doc_id")), "doc_id")
    // no two curated docs share content
    val nHashes = curatedDocs.select(md5(col("text"))).distinct().count()
    assert(nHashes === rows.length.toLong, "exact duplicates must be gone")
    // no near-dup pair survives: any qualifying pair would have put
    // both docs in one component, and only its representative is kept
    val survivingPairs =
      Dedup.dedupNgramJaccard(spark, sfDir).as("p")
        .join(curated.as("a"), col("p.doc_a") === col("a.doc_id"))
        .join(curated.as("b"), col("p.doc_b") === col("b.doc_id"))
        .count()
    assert(survivingPairs === 0L,
      "both ends of a near-dup pair survived curation")
  }

  test("curation only ever removes docs, never invents them") {
    val curated = Curate.curateCorpus(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = graft.Tables(spark, sfDir).documents
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curated.subsetOf(all))
    assert(curated.size < all.size, "testdata plants dups; some must drop")
  }

  test("curate_train: subset of curated, eval-free, decontaminated, sampled") {
    val train = Curate.curateTrain(spark, sfDir).collect()
    assert(train.nonEmpty, "train set must not be empty at sf0.001")
    val trainIds = train.map(_.getLong(0)).toSet
    val curatedIds = Curate.curateCorpus(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainIds.subsetOf(curatedIds),
      "stage 4/5 only remove docs from the curated survivors")

    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "lang", "source").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    // no eval-source doc in the training set
    trainIds.foreach { id =>
      assert(docs(id)._2 != Decontaminate.EvalSource,
        s"eval doc $id leaked into the train set")
    }
    // no doc flagged by the standalone decontamination pass
    val contaminated = Decontaminate.decontaminate(spark, sfDir)
      .select("train_doc").collect().map(_.getLong(0)).toSet
    assert(trainIds.intersect(contaminated).isEmpty,
      "contaminated docs must be dropped")
    // every kept doc passes the sampling predicate; every curated
    // non-eval non-contaminated doc that passes it is kept
    val thr = Sampling.LangThresholds.map(t => t._1 -> t._2).toMap
    def kept(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((Sampling.Seed + id.toString).getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 4)
      hex < thr.getOrElse(docs(id)._1, "0000")
    }
    val expected = curatedIds
      .filter(id => docs(id)._2 != Decontaminate.EvalSource)
      .filterNot(contaminated)
      .filter(kept)
    assert(trainIds === expected,
      "train set must be exactly the sampled decontaminated survivors")
  }

  test("curate_pack packs exactly the train set, contiguously per source") {
    val packed = Curate.curatePack(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getInt(4)))
    val trainIds = Curate.curateTrain(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(packed.map(_._1).toSet == trainIds,
      "packed docs must be exactly the curated training set")
    // the packed stream is contiguous per source shard: each doc
    // starts where the previous one's tokens ended (same
    // reconstruction property as pack_sequences, over the kept set)
    val b = Sampling.PackBudget
    packed.groupBy(_._2).foreach { case (src, rowsU) =>
      val rows = rowsU.sortBy(_._1)
      var off = 0L
      rows.foreach { case (id, _, n, seqId, seqOff) =>
        assert(seqId == (off / b).toInt, s"doc $id in $src: seq_id")
        assert(seqOff == (off % b).toInt, s"doc $id in $src: seq_offset")
        off += n
      }
    }
    // token counts single-sourced with text_tokens
    val fromTokens = graft.functions.TextQueries.textTokens(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    packed.foreach { case (id, _, n, _, _) =>
      assert(fromTokens(id) == n, s"doc $id token count")
    }
  }

  test("curate_provenance reconciles with the curate_report funnel " +
    "stage by stage") {
    val prov = Curate.curateProvenance(spark, sfDir).collect()
      .map(r => r.getString(4))
    val byStage = prov.groupBy(identity).view.mapValues(_.length).toMap
    val report = Curate.curateReport(spark, sfDir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val n = prov.length
    assert(n == report("input"))
    // each funnel count = input minus every drop reason at or before
    // that stage (provenance is first-dropping-stage, so the sums
    // telescope exactly)
    def drops(ks: String*) = ks.map(byStage.getOrElse(_, 0)).sum
    assert(report("quality") == n - drops("quality"))
    assert(report("exact") == n - drops("quality", "exact_dup"))
    assert(report("neardup") ==
      n - drops("quality", "exact_dup", "near_dup"))
    assert(report("decontam") == n - drops("quality", "exact_dup",
      "near_dup", "eval_slice", "contaminated"))
    assert(report("sampled") == n - drops("quality", "exact_dup",
      "near_dup", "eval_slice", "contaminated", "rebalance"))
    assert(byStage.getOrElse("kept", 0).toLong == report("sampled"))
    // the fixture must exercise more than the trivial verdicts
    assert(byStage.keySet.size >= 4, s"degenerate fixture: $byStage")
  }
}
