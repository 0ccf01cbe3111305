package graft.operators

import graft.SparkSuite

/** `scd2_history` / `cdc_merge` — dimension-maintenance semantics on
  * hand fixtures plus structural invariants at sf0.001. */
class ScdSpec extends SparkSuite {

  test("scd2: runs split on change, bounds chain, reverted value gets " +
    "a NEW version (hand fixture)") {
    val s = spark; import s.implicits._
    // cust 1: A(d1), A(d3), B(d5), A(d9) → versions 1..3 (the return
    // to A is a new version, not a merge — type-2 semantics);
    // cust 2: single order → one current row.
    val src = Seq(
      (1L, "A", 1L, 10L), (1L, "A", 3L, 11L), (1L, "B", 5L, 12L),
      (1L, "A", 9L, 13L),
      (2L, "Z", 4L, 20L)
    ).toDF("k", "attr", "day", "seq")
    val got = Scd.scd2Of(src).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5),
        r.getBoolean(6)))
    assert(got.toSeq == Seq(
      (1L, 1L, "A", 1L, 5L, 2L, false),
      (1L, 2L, "B", 5L, 9L, 1L, false),
      (1L, 3L, "A", 9L, -1L, 1L, true),
      (2L, 1L, "Z", 4L, -1L, 1L, true)))
  }

  test("scd2 at sf0.001: bounds chain per customer, exactly one " +
    "current version, n_orders conserves the order count") {
    val rows = Scd.scd2History(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val orders = graft.Tables(spark, sfDir).orders.count()
    assert(rows.map(_.getLong(5)).sum == orders)
    rows.groupBy(_.getLong(0)).foreach { case (k, vs) =>
      val sorted = vs.sortBy(_.getLong(1))
      assert(sorted.count(_.getBoolean(6)) == 1, s"cust $k current != 1")
      assert(sorted.last.getBoolean(6))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) == b.getLong(3), // valid_to == next from
            s"cust $k bounds break")
          assert(a.getString(2) != b.getString(2), // runs maximal
            s"cust $k adjacent versions share attr")
        case _ =>
      }
    }
  }

  test("cdc merge applies insert/update/unchanged and the error " +
    "tombstone (hand fixture)") {
    val s = spark; import s.implicits._
    // midpoint of [0, 100] = 50.
    // u1: pre(10 view) + post(60 click)        → update
    // u2: pre only (20 purchase)               → unchanged
    // u3: post only (70 signup)                → insert
    // u4: pre(30 view) + post(80 error)        → DELETE (absent)
    // u5: pre(0 error) only                    → unchanged (old error stays)
    val ev = Seq(
      (1L, 1L, "view", 10L), (1L, 2L, "click", 60L),
      (2L, 3L, "purchase", 20L),
      (3L, 4L, "signup", 70L),
      (4L, 5L, "view", 30L), (4L, 6L, "error", 80L),
      (5L, 7L, "error", 0L), (5L, 8L, "view", 100L)
    ).toDF("user_id", "event_id", "event_type", "ep")
    // (u5 actually has a post event: view@100 → update with status
    // view — adjust expectation: u5 is an update, not unchanged)
    val got = Scd.cdcMergeOf(ev).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getString(3))).toMap
    assert(got.size == 4 && !got.contains(4L))
    assert(got(1L) == (("click", 60L, "update")))
    assert(got(2L) == (("purchase", 20L, "unchanged")))
    assert(got(3L) == (("signup", 70L, "insert")))
    assert(got(5L) == (("view", 100L, "update")))
  }

  test("cdc merge at sf0.001: ops partition users, no surviving " +
    "update carries status=error") {
    val rows = Scd.cdcMerge(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ops = rows.map(_.getString(3)).toSet
    assert(ops.subsetOf(Set("insert", "update", "unchanged")))
    assert(!rows.exists(r =>
      r.getString(3) == "update" && r.getString(1) == "error"))
    // user_ids unique in the merged dimension
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }
}
