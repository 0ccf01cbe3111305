package graft.operators

import graft.SparkSuite

/** `er_blocking` — blocking completeness (no pair inside τ is lost),
  * exact fixture distances, and the hash-join plan contract. */
class EntityResSpec extends SparkSuite {

  test("fixture: exact distances, counts, and the tau cut") {
    val s = spark; import s.implicits._
    val rows = Seq("cold anvil", "cold anvil", "old anvil",
      "hot gear", "got gear", "completely different thing")
      .toDF("name")
    val out = EntityRes.erPairsOf(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(4), r.getLong(5), r.getInt(6)))).toMap
    // "cold anvil"(2 rows) ~ "old anvil": one deletion; duplicate rows
    // count into n_a, never into extra pairs
    assert(out(("cold anvil", "old anvil")) === ((2L, 1L, 1)))
    assert(out(("got gear", "hot gear")) === ((1L, 1L, 1)))
    assert(out.size === 2, s"unexpected pairs: ${out.keys}")
  }

  test("length-band blocking is COMPLETE: equals the unblocked scan") {
    import org.apache.spark.sql.functions._
    val names = graft.Tables(spark, sfDir).part
      .select(col("p_name")).distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      a <- names; b <- names if a < b
      d = lev(a, b) if d <= EntityRes.ErTau
    } yield (a, b)).toSet
    val got = EntityRes.partEr(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === expect,
      s"missing ${expect -- got}; extra ${got -- expect}")
  }

  test("the blocked self-join plans as a hash join, not Cartesian/BNLJ") {
    val df = EntityRes.partEr(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "length-band blocking must not plan a Cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "length-band blocking must not plan a BNLJ")
  }

  test("resolve: transitive chain merges into one entity, isolates " +
    "stand alone (fixture)") {
    val s = spark; import s.implicits._
    // aaaaaa ~ aaaaab ~ aaabbb chain: ends are 3 edits apart via the
    // middle (aaaaaa→aaabbb directly IS 3 ≤ τ too, but
    // zaaaaa ~ aaaaaa only reaches aaabbb transitively: dist 4 > τ).
    val rows = Seq("aaaaaa", "aaaaab", "aaabbb", "zaaaaa",
      "completely-different", "aaaaaa").toDF("name")
    val got = EntityRes.erResolveOf(rows).collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.size == 5)
    // one entity holds the whole chain incl. zaaaaa (via aaaaaa)
    Seq("aaaaaa", "aaaaab", "aaabbb", "zaaaaa").foreach { n =>
      assert(got(n)._1 == "aaaaaa", s"$n -> ${got(n)._1}") }
    assert(got("aaaaaa")._2 == 2L)                 // duplicate row count
    assert(got("aaaaaa")._3 == 4L && got("aaaaaa")._4 == 5L)
    assert(got("completely-different")._1 == "completely-different")
    assert(got("completely-different")._3 == 1L)
  }

  test("resolve corpus: groups partition names; every matched pair " +
    "shares a rep; rep is the group min") {
    val ent = EntityRes.partErResolve(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ent.nonEmpty)
    val pairs = EntityRes.partEr(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    pairs.foreach { case (a, b) =>
      assert(ent(a) == ent(b), s"pair ($a, $b) split across entities") }
    ent.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.keys.min == rep, s"rep $rep is not the group min") }
  }
}
