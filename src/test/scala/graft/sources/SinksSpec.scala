package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SinksSpec extends SparkSuite {

  private lazy val tmp = Files.createTempDirectory("graft-sinks").toString

  private def orders = graft.Tables(spark, sfDir).orders
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate")

  test("csv / json / orc / parquet round-trip losslessly") {
    val src = orders
    val expected = src.orderBy("o_orderkey").collect().toSeq
    for (fmt <- Seq(Sinks.Csv, Sinks.Json, Sinks.Orc, Sinks.Parquet)) {
      val path = s"$tmp/rt-${fmt.name}"
      Sinks.write(src, path, fmt)
      val back = Sinks.read(spark, path, fmt, src.schema)
      assert(back.schema === src.schema, s"${fmt.name}: schema drift")
      assert(back.orderBy("o_orderkey").collect().toSeq === expected,
        s"${fmt.name}: data drift")
    }
  }

  test("partitioned write produces hive layout and prunes on read") {
    val path = s"$tmp/part"
    Sinks.writePartitioned(orders, path, Sinks.Parquet, Seq("o_orderstatus"))
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("o_orderstatus=")).sorted
    assert(dirs.nonEmpty, s"expected partition dirs, got ${dirs.mkString(",")}")

    val back = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    val scan = back.queryExecution.executedPlan.toString
    // partition pruning: the scan must carry a partition filter, and
    // the result must match an unpartitioned filter exactly
    assert(scan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"no partition pruning in:\n$scan")
    val expected = orders.filter(col("o_orderstatus") === "F")
      .drop("o_orderstatus").orderBy("o_orderkey").collect().toSeq
    assert(back.drop("o_orderstatus").orderBy("o_orderkey").collect().toSeq
      === expected)
  }

  test("avro round-trips losslessly (primitives, date, nulls)") {
    val src = orders // long, long, string, double, date
    val path = s"$tmp/rt-avro"
    AvroIo.write(src, path)
    assert(new java.io.File(path).listFiles().map(_.getName)
      .exists(_.endsWith(".avro")), "expected avro container files")
    val back = AvroIo.read(spark, path, src.schema)
    assert(back.schema === src.schema, "avro: schema drift")
    assert(back.orderBy("o_orderkey").collect().toSeq
      === src.orderBy("o_orderkey").collect().toSeq, "avro: data drift")
  }

  test("avro round-trips arrays, timestamps, binary and null fields") {
    import java.sql.Timestamp
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType, nullable = true),
      org.apache.spark.sql.types.StructField("blob",
        org.apache.spark.sql.types.BinaryType, nullable = true),
      org.apache.spark.sql.types.StructField("vec",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false),
        nullable = true),
      org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, Timestamp.valueOf("2024-03-01 12:34:56.789123"),
        Array[Byte](1, 2, 3), Seq(1.5f, -2.25f), "a"),
      org.apache.spark.sql.Row(2L, null, null, null, null),
      org.apache.spark.sql.Row(3L, Timestamp.valueOf("1969-12-31 23:59:59.000001"),
        Array.empty[Byte], Seq.empty[Float], ""))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = s"$tmp/rt-avro-typed"
    AvroIo.write(src, path)
    val back = AvroIo.read(spark, path, schema)
    assert(back.schema === schema)
    val exp = src.collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))
        .map(_.asInstanceOf[Array[Byte]].toSeq), Option(r.get(3)), Option(r.get(4))))
    val got = back.collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))
        .map(_.asInstanceOf[Array[Byte]].toSeq), Option(r.get(3)), Option(r.get(4))))
    assert(got.toSeq === exp.toSeq)
  }

  test("IVFPQ coded store partitioned by list_id prunes to nProbe directories") {
    // the claim that makes ann_ivfpq's "scan fraction" dial real at
    // 100 TB: lay the coded store out by list_id and a query's probe
    // set reads nProbe of nLists directories — partition pruning, not
    // a full scan + filter
    val nLists = 16
    val nProbe = 4
    val path = s"$tmp/ivfpq-store"
    val coded = graft.operators.Similarity.ivfPqCodedStore(spark, sfDir, nLists)
    Sinks.writePartitioned(coded, path, Sinks.Parquet, Seq("list_id"))
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("list_id=")).sorted
    assert(dirs.length > nProbe,
      s"store should span more lists than one probe set: ${dirs.mkString(",")}")

    val probeLists = Seq(2L, 5L, 9L, 14L).filter(l =>
      dirs.contains(s"list_id=$l")) // a deterministic probe set that exists
    assert(probeLists.length == nProbe, s"probe set incomplete: $probeLists")
    val back = spark.read.parquet(path)
      .filter(col("list_id").isin(probeLists: _*))
    back.collect() // finalize AQE so the scan node is the executed one

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(back.queryExecution.executedPlan)
    assert(scan.length == 1, s"expected one scan, got ${scan.length}")
    assert(scan.head.partitionFilters.nonEmpty,
      s"list_id filter must reach PartitionFilters:\n${scan.head}")
    val selected = scan.head.selectedPartitions.partitionCount
    assert(selected == nProbe,
      s"pruning must select exactly $nProbe of ${dirs.length} list dirs, read $selected")

    // and the pruned read returns exactly the probed lists' rows
    val expected = coded.filter(col("list_id").isin(probeLists: _*))
      .orderBy("vec_id").collect().toSeq
    assert(back.select(coded.columns.map(col).toIndexedSeq: _*)
      .orderBy("vec_id").collect().toSeq === expected)
  }

  test("co-bucketed tables join with zero exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Sinks.writeBucketed(orders, "orders_b", nBuckets = 4, "o_custkey")
      Sinks.writeBucketed(
        graft.Tables(spark, sfDir).customer.select("c_custkey", "c_name"),
        "customer_b", nBuckets = 4, "c_custkey")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      joined.collect() // materialize through AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")

      // same rows as the plain (shuffling) join
      val expected = orders.join(
          graft.Tables(spark, sfDir).customer.select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .orderBy("o_orderkey").collect().toSeq
      assert(joined.orderBy("o_orderkey").collect().toSeq === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("schema evolution: mergeSchema unifies widened snapshots, " +
    "absent columns read NULL, pruning still reaches the scan") {
    val s = spark; import s.implicits._
    val dir = s"$tmp/evolve"
    // v1 snapshot: (k, a); v2 adds column b — the additive evolution
    // a long-lived ingest dataset accretes (new features land as new
    // columns; old files stay untouched)
    Seq((1L, "x"), (2L, "y")).toDF("k", "a")
      .write.parquet(s"$dir/snap=1")
    Seq((3L, "z", 30L), (4L, "w", 40L)).toDF("k", "a", "b")
      .write.parquet(s"$dir/snap=2")
    val df = s.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.sorted.toSeq == Seq("a", "b", "k", "snap"))
    val rows = df.collect().map(r =>
      r.getLong(r.fieldIndex("k")) ->
        (if (r.isNullAt(r.fieldIndex("b"))) None
         else Some(r.getLong(r.fieldIndex("b"))))).toMap
    assert(rows == Map(1L -> None, 2L -> None,
      3L -> Some(30L), 4L -> Some(40L)),
      "pre-evolution files must surface the new column as NULL")
    // column pruning survives the merged schema: a projection on the
    // ORIGINAL columns reads only those from both file generations
    val plan = df.select("k", "a").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<k:bigint,a:string>"), plan)
    // partition pruning on the snapshot axis still reaches the scan
    val pruned = df.filter(col("snap") === 2)
    assert(pruned.count() == 2)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("snap#"), "snapshot partition column must be usable")
  }

  test("compact merges small files losslessly and plans no shuffle") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-compact").toString
    val frag = s"$base/frag"; val out = s"$base/out"
    val docs = graft.Tables(spark, sfDir).documents
    docs.repartition(16).write.parquet(frag)     // fragment: 16 files
    val fragFiles = new java.io.File(frag).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fragFiles == 16)
    val totalBytes = new java.io.File(frag).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val (nIn, nOut) = Sinks.compact(spark, frag, out, totalBytes / 4 + 1)
    assert(nIn == 16 && nOut <= 4 && nOut >= 1)
    val outFiles = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles == nOut)
    // lossless: same rows, same schema
    val got = spark.read.parquet(out)
    assert(got.schema == spark.read.parquet(frag).schema)
    assert(got.orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
    // the rewrite must be narrow: no Exchange in the coalesce plan
    val plan = spark.read.parquet(frag).coalesce(4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"compaction rewrite must not shuffle:\n$plan")
  }

  test("compact sees a partitionBy layout's files (recursive listing) " +
      "and keeps every row") {
    // the ADVICE-r12 case: data files live in key=value SUBDIRECTORIES,
    // where the old top-level listing found zero files, planned n=1
    // from totalBytes=0 and reported a wrong (0, 1)
    val base = java.nio.file.Files
      .createTempDirectory("graft-compact-part").toString
    val frag = s"$base/frag"; val out = s"$base/out"
    val docs = graft.Tables(spark, sfDir).documents
      .withColumn("lang_p", org.apache.spark.sql.functions.col("lang"))
    docs.repartition(4).write.partitionBy("lang_p").parquet(frag)
    assert(new java.io.File(frag).listFiles()
      .count(_.getName.endsWith(".parquet")) == 0,
      "fixture must keep all data files below partition dirs")
    val nested = new java.io.File(frag).listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .count(_.getName.endsWith(".parquet"))
    assert(nested > 1, "fixture needs multiple nested data files")
    val (nIn, nOut) = Sinks.compact(spark, frag, out, Long.MaxValue)
    assert(nIn == nested, s"recursive listing must count the $nested " +
      s"nested data files, got $nIn")
    assert(nOut == 1, "everything fits one target file")
    val got = spark.read.parquet(out)
    // partition column survives as an ordinary data column
    assert(got.columns.contains("lang_p"))
    assert(got.select("doc_id", "lang_p").orderBy("doc_id").collect().toSeq ===
      docs.select("doc_id", "lang_p").orderBy("doc_id").collect().toSeq)
  }

  test("compact clamps the plan to the reader's split packing " +
      "(reported count == written count)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-compact-clamp").toString
    val frag = s"$base/frag"; val out = s"$base/out"
    graft.Tables(spark, sfDir).documents.coalesce(1).write.parquet(frag)
    // targetBytes=1 asks for one file per byte; the reader packs the
    // single input file into far fewer splits — the clamp keeps the
    // returned n equal to what coalesce can actually produce
    val (nIn, nOut) = Sinks.compact(spark, frag, out, 1L)
    assert(nIn == 1)
    val outFiles = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles == nOut,
      s"planned $nOut files but wrote $outFiles")
  }
}
