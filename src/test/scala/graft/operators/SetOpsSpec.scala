package graft.operators

import graft.SparkSuite

/** `q24_set_ops` — INTERSECT/EXCEPT distinct semantics (duplicates
  * collapse; EXCEPT removes regardless of multiplicity). */
class SetOpsSpec extends SparkSuite {

  test("intersect/except are set-distinct, not bag, semantics") {
    val s = spark; import s.implicits._
    val a = Seq(1, 1, 2, 3, 3, 4).toDF("k")
    val b = Seq(1, 3, 3, 5).toDF("k")
    val c = Seq(3, 3).toDF("k")
    val out = a.intersect(b).except(c).collect().map(_.getInt(0)).sorted
    assert(out.toSeq == Seq(1)) // {1,3} minus {3}; dups collapsed
  }

  test("q24 returns distinct customers at sf0.001") {
    val rows = Relational.q24SetOps(spark, sfDir)
      .collect().map(_.getLong(0))
    assert(rows.nonEmpty)
    assert(rows.distinct.length == rows.length, "duplicate custkeys")
  }

  test("q24 scans orders exactly 3x (each with its own pushed filter)") {
    // Catalyst does not dedup repeated subtrees (CLAUDE.md): the three
    // orders references are three scans BY DESIGN — each gets a
    // different predicate pushed to parquet, which one shared
    // unfiltered scan would lose. Lock the count (3 orders + 1
    // customer) so a refactor can't silently multiply it.
    val plan = Relational.q24SetOps(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 4, s"expected 4 parquet scans (3 orders + 1 customer), got $scans:\n$plan")
  }
}
