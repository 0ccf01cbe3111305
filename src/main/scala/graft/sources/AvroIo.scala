package graft.sources

import java.io.{InputStream, OutputStream}
import java.sql.{Date, Timestamp}
import java.time.LocalDate

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SURVEY §2H — Avro container round-trip beside csv/json/orc
  * ([[Sinks]]). The runtime ships avro-core but NOT the spark-avro
  * datasource module (offline build, no dependency additions), so
  * this is a real source/sink on the Avro Java API — which is also
  * the honest demonstration of the custom-connector shape: schema
  * mapped both ways (nullable → union(null, T); date/timestamp as
  * Avro logical types), ONE container file per partition written
  * through the Hadoop FileSystem API (works on any FS the cluster
  * mounts, not just local disk), and a read path that parallelizes
  * one task per file. No driver-side record data in either
  * direction — the driver only lists filenames; all encode/decode
  * runs in executor tasks (the multimodal-codec mapPartitions shape,
  * the sanctioned per-partition-imperative exception to the no-RDD
  * rule).
  *
  * Supported Spark types: the Sinks round-trip surface — long, int,
  * double, float, boolean, string, binary, date, timestamp (micros),
  * and arrays of those element types. Explicit-schema read only, the
  * [[Sinks.read]] convention (inference is banned repo-wide). */
object AvroIo {

  /** Spark → Avro schema. Field order is preserved; nullable fields
    * become union(null, T) with null first (the Avro default-able
    * branch order). */
  def avroSchema(schema: StructType, name: String = "row"): Schema = {
    val fields = schema.fields.map { f =>
      val base = avroType(f.dataType)
      val t = if (f.nullable)
        Schema.createUnion(java.util.List.of(
          Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord(name, null, "graft.sources", false,
      java.util.List.of(fields: _*))
  }

  private def avroType(dt: DataType): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(et, containsNull) =>
      val e = avroType(et)
      Schema.createArray(if (containsNull)
        Schema.createUnion(java.util.List.of(
          Schema.create(Schema.Type.NULL), e))
      else e)
    case other =>
      throw new IllegalArgumentException(
        s"AvroIo does not map Spark type $other")
  }

  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (d: Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (t: Timestamp, TimestampType) =>
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case (t: java.time.LocalDateTime, TimestampNTZType) =>
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        t.getNano / 1000
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
      s.map(toAvro(_, et)).asJava
    case (x, _) => x
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (i: Integer, DateType) =>
      Date.valueOf(LocalDate.ofEpochDay(i.longValue()))
    case (l: java.lang.Long, TimestampType) =>
      val t = new Timestamp(Math.floorDiv(l, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(l, 1000000L) * 1000L).toInt)
      t
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l, 1000000L),
        (Math.floorMod(l, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      l.asScala.map(fromAvro(_, et)).toSeq
    case (x, _) => x
  }

  /** Write one Avro container file per partition under `path`
    * (`part-NNNNN.avro` + `_SUCCESS`, the Hadoop layout convention).
    * Existing contents are removed first (overwrite semantics, like
    * [[Sinks.write]]). */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val schemaJson = avroSchema(schema).toString
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val avro = new Schema.Parser().parse(schemaJson)
      val out: OutputStream = new Path(path, f"part-$idx%05d.avro")
        .getFileSystem(new Configuration())
        .create(new Path(path, f"part-$idx%05d.avro"), true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avro))
      writer.create(avro, out)
      var n = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(avro)
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(row.get(i), f.dataType))
        }
        writer.append(rec)
        n += 1
      }
      writer.close()
      Iterator.single(n)
    }.count() // materialize the write
    fs.create(new Path(root, "_SUCCESS"), true).close()
  }

  /** Read the container files under `path` with an explicit schema —
    * one task per file; decode happens entirely executor-side. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
    val rdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(1, files.length))
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val in: InputStream = new Path(p)
            .getFileSystem(new Configuration()).open(new Path(p))
          val stream = new DataFileStream[GenericRecord](in,
            new GenericDatumReader[GenericRecord]())
          val rows = new Iterator[Row] {
            def hasNext: Boolean = {
              val h = stream.hasNext
              if (!h) stream.close()
              h
            }
            def next(): Row = {
              val rec = stream.next()
              Row.fromSeq(schema.fields.toIndexedSeq.map(f =>
                fromAvro(rec.get(f.name), f.dataType)))
            }
          }
          rows
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
