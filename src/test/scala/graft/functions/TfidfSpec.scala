package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** E5 `text_tfidf` — hand-computed scores on a tiny corpus, the
  * rank-limit plan shape, and per-doc invariants at sf0.001. */
class TfidfSpec extends SparkSuite {

  test("tfidf matches hand computation on a 3-doc corpus") {
    val s = spark; import s.implicits._
    // df: the→3, cat→2, dog→1, bird→1 ; N=3
    val docs = Seq(
      (1L, "the cat"),
      (2L, "the cat the dog"),
      (3L, "the bird")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("tfidf_fixture")

    val toks = docs.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val nTok = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val out = tf.join(nTok, "doc_id").join(dfreq, "term")
      .withColumn("tfidf",
        (col("tf") / col("n_tok")) * ((lit(3L) + 1) / (col("df") + 1)))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        r.getAs[Double]("tfidf")).toMap

    // doc 2: tf(the)=2/4, idf=(3+1)/(3+1)=1 → 0.5
    assert(math.abs(out((2L, "the")) - 0.5) < 1e-12)
    // doc 2: tf(dog)=1/4, idf=4/2=2 → 0.5
    assert(math.abs(out((2L, "dog")) - 0.5) < 1e-12)
    // doc 1: tf(cat)=1/2, idf=4/3 → 0.666...
    assert(math.abs(out((1L, "cat")) - 2.0 / 3.0) < 1e-12)
    // doc 3: tf(bird)=1/2, idf=4/2=2 → 1.0
    assert(math.abs(out((3L, "bird")) - 1.0) < 1e-12)
  }

  test("top-3 per doc plans a partial WindowGroupLimit") {
    val plan = TextQueries.textTfidf(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit rewrite did not fire:\n$plan")
  }

  test("per-doc invariants at sf0.001") {
    val rows = TextQueries.textTfidf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRank.length <= 3, s"doc $doc has ${byRank.length} keywords")
      assert(byRank.map(_.getAs[Int]("rk")).toSeq ==
        (1 to byRank.length), s"doc $doc ranks not 1..k")
      val scores = byRank.map(_.getAs[Double]("tfidf")).toSeq
      assert(scores == scores.sorted.reverse,
        s"doc $doc tfidf not descending: $scores")
    }
  }
}
