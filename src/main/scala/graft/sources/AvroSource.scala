package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.{AvroInputFormat, AvroWrapper}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * Avro object-container source (S6): the reference ingests Avro via the
 * `readAvroContainer` morphline command (used at morphlines-core/src/
 * test/resources/test-morphlines/tutorialReadAvroContainer.conf:55-71).
 * This distribution carries avro-mapred but not the spark-avro
 * connector, so the source is built on `sc.hadoopFile` +
 * `AvroInputFormat` (splittable container blocks → one Spark partition
 * per block span, same parallelism story as any file source) with an
 * Avro→Catalyst schema/value converter.
 *
 * Supported Avro shapes: primitives, bytes/fixed, enum (→ string),
 * union-with-null (→ nullable), record (→ struct), array (→ array),
 * map (→ map<string,_>) — covering the flat-with-nesting documents the
 * reference's `extractAvroPaths` then projects (SURVEY.md §2.2 P1/P2).
 */
object AvroSource {

  def read(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = readSchema(spark, path)
    val structType = toSqlType(avroSchema) match {
      case st: StructType => st
      case other => StructType(Seq(StructField("value", other)))
    }
    val schemaJson = avroSchema.toString
    val rdd = spark.sparkContext.hadoopFile(
        path,
        classOf[AvroInputFormat[GenericRecord]],
        classOf[AvroWrapper[GenericRecord]],
        classOf[NullWritable])
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        it.map { case (w, _) => toRow(w.datum(), schema) }
      }
    spark.createDataFrame(rdd, structType)
  }

  /** Driver-side: open the first container file to get the writer schema. */
  private def readSchema(spark: SparkSession, path: String): Schema = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val status = fs.globStatus(new org.apache.hadoop.fs.Path(path)) match {
      case null | Array() =>
        val listed = fs.listStatus(new org.apache.hadoop.fs.Path(path))
        listed.filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      case arr => arr.flatMap { s =>
        if (s.isDirectory)
          fs.listStatus(s.getPath).filter(f => f.isFile && f.getPath.getName.endsWith(".avro"))
        else Array(s)
      }
    }
    require(status.nonEmpty, s"no avro files under $path")
    val local = java.io.File.createTempFile("graft_avro_schema", ".avro")
    try {
      fs.copyToLocalFile(status.head.getPath, new org.apache.hadoop.fs.Path(local.getAbsolutePath))
      val reader = new DataFileReader[GenericRecord](local, new GenericDatumReader[GenericRecord]())
      try reader.getSchema finally reader.close()
    } finally local.delete()
  }

  /** Avro schema → Catalyst type. */
  def toSqlType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.NULL => NullType
    case Schema.Type.ARRAY => ArrayType(toSqlType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, toSqlType(s.getValueType))
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name(), toSqlType(f.schema()), nullable = true)))
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only unions with null are supported, got: $s")
      toSqlType(nonNull.head)
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  private def toRow(rec: GenericRecord, schema: Schema): Row =
    Row.fromSeq(schema.getFields.asScala.toSeq.map(f =>
      convert(rec.get(f.pos()), f.schema())))

  private def convert(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        convert(v, nonNull.head)
      case Schema.Type.STRING | Schema.Type.ENUM => v.toString
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
      case Schema.Type.FIXED =>
        v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes().clone()
      case Schema.Type.RECORD => toRow(v.asInstanceOf[GenericRecord], s)
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(convert(_, s.getElementType))
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, vv) => k.toString -> convert(vv, s.getValueType)
        }.toMap
      case _ => v // primitives pass through
    }
  }

  // ---- write side (S6 round trip) ----

  /** Catalyst type → Avro schema JSON (nullable fields become
    * null-unions — the shape `read` maps straight back). Flat records
    * of primitives/binary/arrays-of-primitives: the subset the
    * reference's morphline ingest actually carries. */
  def toAvroSchemaJson(st: StructType, name: String = "row"): String = {
    def prim(dt: DataType): String = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case ArrayType(e, _) => s"""{"type":"array","items":${prim(e)}}"""
      case other =>
        throw new IllegalArgumentException(s"unsupported avro write type: $other")
    }
    val fields = st.fields.map { f =>
      // a null default is only legal when "null" leads the union —
      // non-nullable fields carry no default at all
      if (f.nullable)
        s"""{"name":"${f.name}","type":["null",${prim(f.dataType)}],"default":null}"""
      else
        s"""{"name":"${f.name}","type":${prim(f.dataType)}}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  /**
   * Write a DataFrame as Avro object-container files, one
   * `part-NNNNN.avro` per partition, through the Hadoop FileSystem
   * (cluster-safe: local dir, HDFS or an object store alike). Data
   * never moves — each task streams its own partition through a
   * `DataFileWriter`; the container's block structure keeps the
   * output splittable, so a downstream `read` gets its parallelism
   * back. Null-union encoding mirrors the read side exactly: the
   * round trip is lossless for the supported type subset.
   */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = toAvroSchemaJson(df.schema)
    val sparkSchema = df.schema
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new org.apache.hadoop.fs.Path(path)
    val fs0 = out.getFileSystem(confSer.value)
    fs0.mkdirs(out)
    df.foreachPartition { (rows: Iterator[Row]) =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val schema = new Schema.Parser().parse(schemaJson)
      // write to an attempt-unique temp file, rename into place on
      // success: a speculative duplicate or a retry racing a
      // still-running first attempt can never tear the container —
      // each attempt streams to its own file and the commit is a
      // single rename (atomic on HDFS/posix; last-rename-wins on
      // object stores, which is safe because every attempt's bytes
      // are complete and identical)
      val finalP = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
      val tmpP = new org.apache.hadoop.fs.Path(path,
        f".part-$pid%05d-attempt-${tc.taskAttemptId()}.avro.tmp")
      val fs = finalP.getFileSystem(confSer.value)
      val os = fs.create(tmpP, true)
      val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema))
      w.create(schema, os)
      var ok = false
      try {
        rows.foreach { row =>
          val rec = new org.apache.avro.generic.GenericData.Record(schema)
          var i = 0
          while (i < sparkSchema.length) {
            rec.put(i, toAvro(row.get(i), sparkSchema(i).dataType))
            i += 1
          }
          w.append(rec)
        }
        ok = true
      } finally {
        w.close() // closes the stream
        if (ok) {
          // Commit via a single rename-with-overwrite (FileContext
          // Options.Rename.OVERWRITE) so a retry never opens a window
          // where the committed file is absent. Fall back to
          // delete+rename only where FileContext is unsupported for the
          // scheme — there a reader listing between a retry's delete and
          // rename can briefly miss the part file (non-atomic stores).
          try {
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(
              finalP.toUri, confSer.value)
            fc.rename(tmpP, finalP,
              org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          } catch {
            case _: UnsupportedOperationException |
                 _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
              fs.delete(finalP, false)
              if (!fs.rename(tmpP, finalP))
                throw new java.io.IOException(
                  s"commit rename failed: $tmpP -> $finalP")
          }
        } else fs.delete(tmpP, false)
      }
    }
  }

  private def toAvro(v: Any, dt: DataType): AnyRef = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case seq: scala.collection.Seq[_] =>
      val el = dt.asInstanceOf[ArrayType].elementType
      val out = new java.util.ArrayList[AnyRef](seq.length)
      seq.foreach(x => out.add(toAvro(x, el)))
      out
    case other => other.asInstanceOf[AnyRef]
  }
}
