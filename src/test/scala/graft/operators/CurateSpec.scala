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
}
