package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** `text_pii` — detection/redaction semantics on hand fixtures with
  * real PII strings, plus scan-shape and completeness invariants on
  * the augmented corpus. */
class PiiSpec extends SparkSuite {

  test("hand fixture: counts, placeholder rewrite, and boundary cases") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "Mail bob.smith_99@corp-site.net or +1-555-0100 at 10.0.0.1 now"),
      (1L, "no pii here at all"),
      // trailing sentence dot must not be swallowed into the email
      (2L, "write a@b.co. thanks"),
      // two dots is not an IPv4; a bare 7-digit run is not a phone
      (3L, "version 12.34.56 build 5550100"),
      // semver-style quad IS matched — the naive-regex contract
      (4L, "release 1.2.3.4")
    ).toDF("doc_id", "pii_text")
    val out = TextQueries.piiScanOf(docs).orderBy("doc_id").collect()
    val counts = out.map(r =>
      (r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4))).toSeq
    assert(counts === Seq(
      (1, 1, 1, true),
      (0, 0, 0, false),
      (1, 0, 0, true),
      (0, 0, 0, false),
      (0, 0, 1, true)))
    // placeholder rewrite is exact: re-derive the redacted string
    val red = docs.select(col("doc_id"),
      TextQueries.piiRedacted(col("pii_text")).as("r"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(red(0) === "Mail <EMAIL> or <PHONE> at <IP> now")
    assert(red(1) === "no pii here at all")
    assert(red(2) === "write <EMAIL>. thanks")
    assert(red(4) === "release <IP>")
    // md5/length in the operator output describe exactly that string
    assert(out(0).getString(5) ===
      java.security.MessageDigest.getInstance("MD5")
        .digest(red(0).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(out(0).getInt(6) === red(0).length)
  }

  test("corpus: redaction is complete (zero residual matches) and " +
      "augmentation exercises both the rewrite and no-op paths") {
    val out = TextQueries.textPii(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getBoolean(4)), "no doc got PII injected")
    assert(rows.exists(!_.getBoolean(4)), "every doc got PII injected")
    // each kind occurs somewhere, and each kind is absent somewhere
    Seq(1, 2, 3).foreach { i =>
      assert(rows.exists(_.getInt(i) > 0), s"col $i never matches")
      assert(rows.exists(_.getInt(i) == 0), s"col $i always matches")
    }
    // completeness: the redacted text itself admits no further match
    // of any pattern (checked on the real augmented corpus, not the
    // fixture)
    val d = graft.Tables(spark, sfDir).documents
    val residual = d.select(TextQueries.piiRedacted(
        TextQueries.piiAugmented(col("doc_id"), col("text"))).as("r"))
      .filter(
        regexp_count(col("r"), lit(TextQueries.EmailRe)) > 0 ||
        regexp_count(col("r"), lit(TextQueries.PhoneRe)) > 0 ||
        regexp_count(col("r"), lit(TextQueries.IpRe)) > 0)
      .count()
    assert(residual === 0L, s"$residual docs kept matchable PII")
  }

  test("plan: zero-shuffle scan — no hash exchange, one parquet scan") {
    // pre-execution plan: AQE's executed toString would print the
    // Final AND Initial plans, double-counting every node
    val plan = TextQueries.textPii(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"per-row scan must not hash-shuffle:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"expected 1 documents scan, saw $scans:\n$plan")
  }
}
