package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** SURVEY §2H — sources and sinks. The reference streams job results
  * through pluggable result writers (reference:
  * mr/result_writers/file.py, http.py, email.py); Spark-side the
  * equivalent surface is the DataFrameWriter/Reader format registry,
  * so this module is a thin, typed veneer that fixes the round-trip
  * conventions (headers, explicit schemas — never inference on read)
  * plus the two layouts that matter at 100 TB:
  *
  *  - `writePartitioned`: hive-style `partitionBy` directory layout —
  *    partition pruning turns a full scan into a directory lookup
  *    when queries filter on the partition column.
  *  - `writeBucketed`: `bucketBy` table layout — two tables bucketed
  *    on the same key join with ZERO exchanges (verified in
  *    SinksSpec by plan inspection); at 100 TB this is the difference
  *    between an all-to-all shuffle of the fact table and a local
  *    zip of co-located buckets.
  */
object Sinks {

  sealed abstract class Format(val name: String)
  case object Csv extends Format("csv")
  case object Json extends Format("json")
  case object Orc extends Format("orc")
  case object Parquet extends Format("parquet")

  /** Write `df` to `path`. CSV gets a header so files are
    * self-describing; readers still supply the schema explicitly. */
  def write(df: DataFrame, path: String, format: Format): Unit = {
    val w = df.write.mode("overwrite")
    (format match {
      case Csv => w.option("header", "true")
      case _ => w
    }).format(format.name).save(path)
  }

  /** Read with an explicit schema — type inference on read is banned:
    * it costs an extra pass and silently drifts (int vs long, dates). */
  def read(spark: SparkSession, path: String, format: Format,
      schema: StructType): DataFrame = {
    val r = spark.read.schema(schema)
    (format match {
      case Csv => r.option("header", "true")
      case _ => r
    }).format(format.name).load(path)
  }

  /** Hive-style partitioned layout: one directory per value of
    * `partCols`. Keep partition columns low-cardinality (status,
    * date) — a high-cardinality partitionBy creates millions of tiny
    * files. */
  def writePartitioned(df: DataFrame, path: String, format: Format,
      partCols: Seq[String]): Unit = {
    val w = df.write.mode("overwrite").partitionBy(partCols: _*)
    (format match {
      case Csv => w.option("header", "true")
      case _ => w
    }).format(format.name).save(path)
  }

  /** Bucketed managed table: `nBuckets` hash buckets on `bucketCol`,
    * sorted within buckets. Joins/aggregations on the bucket column
    * reuse the layout instead of shuffling. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      bucketCol: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Idempotent per-batch parquet sink — the sink half of end-to-end
    * exactly-once (the source half is the offset-tracked
    * [[ReplayLog]]; reference analog: the reference's result writers
    * deliver a job's output once per job id, mr/result_writers/
    * file.py). Structured Streaming's foreachBatch re-delivers a
    * batch when a crash lands between the batch's execution and its
    * checkpoint commit; a blind append would duplicate those rows.
    * Each batch publishes to `path/batch_id=<id>/` via
    * write-to-hidden-tmp + rename: a re-delivered batch finds the
    * directory already published and skips, a torn write leaves
    * only a dot-prefixed tmp dir that partition discovery ignores.
    * A rename RACE needs one more check than `rename`'s boolean:
    * on several Hadoop filesystems (incl. the local and HDFS
    * contracts) rename moves src INTO an existing destination
    * directory instead of failing, so a losing concurrent attempt
    * can get `true` back while its tmp dir lands dot-prefix-nested
    * under the winner's `batch_id=<id>/`. We detect that exact
    * outcome after the rename (our tmp dir's name nested under the
    * target), delete the nested loser, and report the race as lost
    * (ADVICE r11). Readers take `spark.read.parquet(path)` and get
    * `batch_id` back as a partition column for free.
    *
    * Returns true iff this call published the batch. */
  def idempotentBatchWrite(df: DataFrame, batchId: Long,
      path: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val target = new Path(root, s"batch_id=$batchId")
    if (fs.exists(target)) return false
    val tmp = new Path(root,
      s".tmp-$batchId-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, true); return false // lost the publish race
    }
    val nested = new Path(target, tmp.getName)
    if (fs.exists(nested)) {
      // rename-into-existing: the batch was already published by a
      // concurrent winner and our dir nested under it — lost race.
      fs.delete(nested, true); false
    } else true
  }

  /** Small-file compaction: rewrite a parquet dataset into
    * ~`targetBytes` output files. The housekeeping pass every
    * long-lived 100 TB table needs — streaming sinks and
    * fine-grained partitionBy layouts accrete kilobyte files whose
    * per-file open/footer cost eventually dominates scans (and whose
    * count strains the namenode/listing path).
    *
    * Shape: the output file count is planned DRIVER-SIDE from a
    * RECURSIVE file listing (bytes only — no data read; recursion
    * because a partitionBy layout keeps its data files in key=value
    * subdirectories, where a top-level listing sees nothing, plans
    * n=1 and silently coalesces the dataset into one task — ADVICE
    * r12), then the rewrite is `coalesce(n)` — a NARROW repartition
    * that concatenates input splits into n output tasks with ZERO
    * shuffle (a `repartition(n)` would pay a full exchange of every
    * byte for marginally better balance; compaction jobs at scale
    * take the free version). Row contents and schema pass through
    * untouched; a partitioned input compacts into a FLAT layout with
    * its partition columns materialized as ordinary data columns
    * (re-partition the output with [[writePartitioned]] if the
    * pruning layout must survive).
    *
    * `n` is clamped to the reader's split-packed partition count:
    * coalesce cannot RAISE parallelism, so an unclamped plan would
    * report more files than the write produces (ADVICE r12).
    *
    * Returns (input file count, output file count). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    import org.apache.hadoop.fs.Path
    val in = new Path(inPath)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = {
      val it = fs.listFiles(in, true)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val s = it.next()
        val name = s.getPath.getName
        // hidden/marker files (_SUCCESS, .tmp-*, .crc) are skipped the
        // same way Spark's own FileIndex skips them
        if (s.isFile && name.endsWith(".parquet") &&
            !name.startsWith("_") && !name.startsWith("."))
          buf += s
      }
      buf.toArray
    }
    require(files.nonEmpty, s"no parquet data files found under $inPath")
    val totalBytes = files.map(_.getLen).sum
    val df = spark.read.parquet(inPath)
    val n = math.min(
      math.max(1L, (totalBytes + targetBytes - 1) / targetBytes),
      df.rdd.getNumPartitions.toLong).toInt
    df.coalesce(n)
      .write.mode("overwrite").parquet(outPath)
    (files.length, n)
  }
}
