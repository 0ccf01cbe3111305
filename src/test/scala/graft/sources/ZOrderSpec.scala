package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[ZOrder]] — one z-ordered layout serves BOTH dimensions' range
  * predicates (each 1-d sorted layout serves only its own), and the
  * layout never changes the data. File counts use
  * `input_file_name()` over the filtered read: a file appears only
  * if it surfaced a matching row, so "files touched" is the
  * clustering measure (at scale, parquet row-group min/max stats
  * turn that clustering into skipped IO). */
class ZOrderSpec extends SparkSuite {

  private lazy val ev = graft.Tables(spark, sfDir).events
    .select(col("event_id"), col("user_id"),
      graft.Tables.tsNsToSec("ts").as("sec"))

  private lazy val dirs = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    ZOrder.writeZOrdered(ev, "user_id", "sec", s"$tmp/z",
      bits = 16, nFiles = 16)
    // 1-d controls: same data, same file count, sorted on ONE column
    ev.repartitionByRange(16, col("sec")).sortWithinPartitions("sec")
      .write.mode("overwrite").parquet(s"$tmp/by_sec")
    ev.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(s"$tmp/by_user")
    tmp
  }

  private def filesTouched(path: String, pred: org.apache.spark.sql.Column)
      : Long =
    spark.read.parquet(path).filter(pred)
      .select(input_file_name()).distinct().count()

  test("a user-range predicate prunes the z layout, not the sec-sorted one") {
    val Array(uMid) = ev.agg(
      expr("(min(user_id) + max(user_id)) div 2")).collect().map(_.getLong(0))
    val pred = col("user_id") <= uMid
    val z = filesTouched(s"$dirs/z", pred)
    val bySec = filesTouched(s"$dirs/by_sec", pred)
    // half the user domain → ~half the z-range files (quantile file
    // boundaries smear ±); the sec-sorted layout has every user in
    // every file and cannot prune at all
    assert(z <= 12, s"z layout: expected ≤12 files for a user halfspace, got $z")
    assert(bySec >= 14, s"sec-sorted control should scatter users: $bySec")
    assert(z < bySec)
  }

  test("a sec-range predicate prunes the SAME z layout, not the user-sorted one") {
    val r = ev.agg(min("sec"), max("sec")).head()
    val (s0, s1) = (r.getLong(0), r.getLong(1))
    val pred = col("sec") <= s0 + (s1 - s0) / 2
    val z = filesTouched(s"$dirs/z", pred)
    val byUser = filesTouched(s"$dirs/by_user", pred)
    assert(z <= 12, s"z layout: expected ≤12 files for a sec halfspace, got $z")
    assert(byUser >= 14, s"user-sorted control should scatter time: $byUser")
    assert(z < byUser)
  }

  test("a 2-d box touches fewer z files than either halfspace") {
    val r = ev.agg(min("user_id"), max("user_id"), min("sec"), max("sec"))
      .head()
    val (u0, u1, s0, s1) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val pred = col("user_id") <= u0 + (u1 - u0) / 4 &&
      col("sec") <= s0 + (s1 - s0) / 4
    val z = filesTouched(s"$dirs/z", pred)
    assert(z <= 6, s"quarter×quarter box should land in few z files, got $z")
  }

  test("layout changes where rows land, never what they are") {
    val back = spark.read.parquet(s"$dirs/z")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val orig = ev.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(back.toSeq == orig.toSeq)
  }

  test("zorder_key query: z equals a driver-side reference interleave " +
      "and is monotone-consistent with the bucket grid") {
    val rows = ZOrder.zorderKey(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    def ref(a: Long, b: Long): Long =
      (0 until ZOrder.KeyBits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    rows.foreach { case (id, ba, bb, z) =>
      assert(ba >= 0 && ba < (1L << ZOrder.KeyBits), s"event $id bucket_user $ba")
      assert(bb >= 0 && bb < (1L << ZOrder.KeyBits), s"event $id bucket_sec $bb")
      assert(z === ref(ba, bb), s"event $id: z $z != reference ${ref(ba, bb)}")
    }
    // the interleave is a bijection on the grid: distinct (ba, bb)
    // pairs get distinct z values
    assert(rows.map(r => (r._2, r._3)).distinct.length ===
      rows.map(_._4).distinct.length)
  }
}
