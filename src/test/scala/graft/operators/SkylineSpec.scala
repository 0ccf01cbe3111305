package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Relational.skylineOf]] — strict-dominance semantics on a hand
  * fixture (incl. ties on each axis and a bucket-boundary pair) and
  * the bucketed plan vs a naive O(n²) dominance recompute on the
  * corpus. */
class SkylineSpec extends SparkSuite {

  test("skyline: strict dominance, ties survive, bucket boundaries") {
    val s = spark; import s.implicits._
    // (key, cents, size). 1000 is the bucket width:
    //  k1 (999, 10)  — frontier (cheapest)
    //  k2 (1001, 10) — dominated ACROSS the bucket boundary by k1
    //                  (same size, strictly pricier)
    //  k3 (1001, 20) — frontier (bigger than anything cheaper)
    //  k4 (1001, 20) — exact duplicate of k3: both survive
    //  k5 (1500, 20) — dominated in-bucket by k3 (same size, pricier)
    //  k6 (1500, 30) — frontier
    //  k7 (2000, 25) — dominated by k6 from the lower bucket
    val p = Seq(
      (1L, 999L, 10L), (2L, 1001L, 10L), (3L, 1001L, 20L),
      (4L, 1001L, 20L), (5L, 1500L, 20L), (6L, 1500L, 30L),
      (7L, 2000L, 25L)
    ).toDF("p_partkey", "cents", "size")
    val got = Relational.skylineOf(p).collect()
      .map(r => r.getLong(0)).toSeq
    assert(got == Seq(1L, 3L, 4L, 6L))
  }

  test("corpus skyline == naive all-pairs strict-dominance recompute") {
    val pts = graft.Tables(spark, sfDir).part
      .select(col("p_partkey"),
        floor(col("p_retailprice") * 100 + 0.5).cast("long").as("cents"),
        col("p_size").cast("long").as("size"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = pts.filter { case (_, pc, ps) =>
      !pts.exists { case (_, qc, qs) =>
        qc <= pc && qs >= ps && (qc < pc || qs > ps) }
    }.map(_._1).toSet
    val got = Relational.partSkyline(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(got == naive && got.nonEmpty)
  }
}
