package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** `dedup_url` — the canonicalizer's normalization cases plus the
  * registry query's group invariants. */
class UrlDedupSpec extends SparkSuite {

  private def canon(urls: String*): Seq[String] = {
    val s = spark; import s.implicits._
    urls.toDF("url")
      .select(Dedup.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("scheme, case, www, trailing slash, fragment all normalize away") {
    val got = canon(
      "https://example.com/a/b",
      "HTTP://EXAMPLE.COM/a/b",
      "https://www.example.com/a/b/",
      "example.com/a/b#section-2",
      "https://Example.Com/a/b///")
    assert(got.distinct === Seq("example.com/a/b"), got.toString)
  }

  test("tracking params drop; real params survive, sorted") {
    assert(canon("https://e.com/p?utm_source=x&utm_campaign=y") ===
      Seq("e.com/p"))
    assert(canon("https://e.com/p?fbclid=abc123") === Seq("e.com/p"))
    assert(canon("https://e.com/p?page=2&utm_source=x&q=spark") ===
      Seq("e.com/p?page=2&q=spark"))
    // param order never splits a group
    assert(canon("https://e.com/p?q=spark&page=2").head ===
      canon("https://e.com/p?page=2&q=spark").head)
  }

  test("host root and query-only URLs keep a stable canonical form") {
    assert(canon("https://www.e.com/") === Seq("e.com"))
    assert(canon("https://e.com?utm_source=x") === Seq("e.com"))
    assert(canon("https://e.com?page=2") === Seq("e.com?page=2"))
  }

  test("registry query: groups cover the corpus, reps are members") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = d.count()
    val rows = Dedup.dedupUrl(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum === nDocs, "groups partition docs")
    // the messy variants (case, www, slash, params, fragments) must
    // actually collapse: strictly fewer groups than docs
    assert(rows.length < nDocs)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L)
      assert(r.getString(0).nonEmpty &&
        r.getString(0) === r.getString(0).toLowerCase.replaceFirst("^www\\.", ""))
    }
  }
}
