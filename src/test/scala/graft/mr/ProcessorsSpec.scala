package graft.mr

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Out-of-process (piped) handler execution: the non-JVM handler
  * seam. Commands used (`cat`, `awk`, `sed`, `sh`) are POSIX-standard
  * and deterministic. */
class ProcessorsSpec extends SparkSuite {

  private def docs = graft.Tables(spark, sfDir).documents
    .select(col("doc_id"), col("lang"), col("source"))

  test("identity pipe (cat) round-trips every row as its JSON line") {
    val expected = docs.toJSON.collect().toSeq
    val got = Processors.pipe(Seq("cat"))(docs)
      .collect().map(_.getString(0)).toSeq
    assert(got === expected,
      "per-partition order and content must survive the pipe")
  }

  test("transforming pipe (awk) streams rows through the child process") {
    val expected = docs.toJSON.collect().map(_.length.toString).toSeq
    val got = Processors.pipe(Seq("awk", "{print length($0)}"))(docs)
      .collect().map(_.getString(0)).toSeq
    assert(got === expected)
  }

  test("piped handlers register and run through the versioned registry") {
    assert(Processors.registerPiped("sed_upcase_lang", 1L,
      "external sed handler", Seq("sed", "s/\"lang\":\"en\"/\"lang\":\"EN\"/")))
    try {
      val out = Handlers.run("sed_upcase_lang", docs)
        .collect().map(_.getString(0))
      assert(out.nonEmpty)
      assert(out.forall(!_.contains("\"lang\":\"en\"")))
      assert(out.exists(_.contains("\"lang\":\"EN\"")),
        "the corpus has English docs; sed must have rewritten them")
      // downstream parse against a DECLARED schema (the documented
      // contract: no schema inference on subprocess output)
      val s = spark
      val parsed = Handlers.run("sed_upcase_lang", docs)
        .select(from_json(col("line"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, lang STRING, source STRING")).as("r"))
        .select(col("r.doc_id"), col("r.lang"))
      assert(parsed.where(col("lang") === "EN").count() ===
        docs.where(col("lang") === "en").count())
    } finally { Handlers.delete("sed_upcase_lang"); () }
  }

  test("a non-zero child exit fails the task loudly") {
    val ex = intercept[Exception] {
      Processors.pipe(Seq("sh", "-c", "exit 3"))(docs).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => Option(c.getMessage).exists(_.contains("exited 3"))),
      s"exit code must surface in the failure: $ex")
  }

  test("empty partitions spawn no process; tiny frames still pipe") {
    val s = spark; import s.implicits._
    // 3 rows over local[32] leaves ~29 empty partitions
    val tiny = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val got = Processors.pipe(Seq("cat"))(tiny).count()
    assert(got === 3L)
  }
}
