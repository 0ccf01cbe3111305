package graft.operators

import graft.SparkSuite

/** `asof_join_nearest` — direction/tie fixtures and the one-Window-
  * node plan contract (both frames share one sort). */
class AsOfJoinSpec extends SparkSuite {

  private def ev(rows: Seq[(Long, Long, Long, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("event_id", "user_id", "ts", "event_type")
  }

  test("nearest picks the closer side; ties and same-instant go prior") {
    // user 1 purchases at t=100s,200s (ids 1000,2000); nanos below
    def ns(sec: Long) = sec * 1000000000L
    val rows = ev(Seq(
      (1000L, 1L, ns(100), "purchase"), (2000L, 1L, ns(200), "purchase"),
      (1L, 1L, ns(140), "view"),  // 40 back vs 60 fwd → prev
      (2L, 1L, ns(150), "view"),  // equidistant → prev
      (3L, 1L, ns(160), "view"),  // 60 back vs 40 fwd → next
      (4L, 1L, ns(50), "view"),   // before all → next
      (5L, 1L, ns(250), "view"),  // after all → prev
      (6L, 1L, ns(100), "view"),  // same instant → prev, gap 0
      (7L, 2L, ns(10), "view")    // user with no purchases → nulls
    ))
    val out = AsOfJoin.nearestOf(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    def check(id: Long, pid: Long, gap: Long, dir: String) = {
      val r = out(id)
      assert(r.getLong(3) === pid, s"view $id id")
      assert(r.getLong(5) === gap, s"view $id gap")
      assert(r.getString(6) === dir, s"view $id dir")
    }
    check(1L, 1000L, 40L, "prev")
    check(2L, 1000L, 50L, "prev")
    check(3L, 2000L, 40L, "next")
    check(4L, 1000L, 50L, "next")
    check(5L, 2000L, 50L, "prev")
    check(6L, 1000L, 0L, "prev")
    val r7 = out(7L)
    assert(r7.isNullAt(3) && r7.isNullAt(6), "no-purchase user keeps nulls")
  }

  test("both frames ride ONE Window node (one exchange, one sort)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val df = AsOfJoin.viewsAsOfNearestPurchase(spark, sfDir)
    df.count()
    def windows(p: SparkPlan): Seq[WindowExec] = p match {
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case q: QueryStageExec => windows(q.plan)
      case w: WindowExec => w +: w.children.flatMap(windows)
      case other => other.children.flatMap(windows)
    }
    val n = windows(df.queryExecution.executedPlan).length
    assert(n === 1, s"expected the two frames to fold into one Window, got $n")
  }

  test("corpus: nearest gap never exceeds either directed as-of gap") {
    val near = AsOfJoin.viewsAsOfNearestPurchase(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(2))))
      .toMap
    val fwd = AsOfJoin.viewsAsOfNextPurchase(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(near.nonEmpty)
    fwd.foreach { case (id, nextSec) =>
      val (nearSec, viewSec) = near(id)
      (nearSec, nextSec) match {
        case (Some(ns2), Some(fs)) =>
          assert(math.abs(ns2 - viewSec) <= math.abs(fs - viewSec),
            s"view $id: nearest farther than the forward match")
        case (None, Some(_)) =>
          fail(s"view $id: forward found a purchase but nearest did not")
        case _ =>
      }
    }
  }
}
