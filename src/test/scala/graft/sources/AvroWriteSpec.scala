package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AvroWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("write + read round trip: primitives, nulls, arrays") {
    val df = Seq(
      (1L, "alpha", Some(1.5), Seq(1.0f, 2.0f)),
      (2L, "beta", None, Seq.empty[Float]),
      (3L, "gamma", Some(-0.25), Seq(3.5f))
    ).toDF("id", "name", "score", "vec")
    val out = java.nio.file.Files.createTempDirectory("graft_avro_w_").toString
    AvroSource.write(df, out)
    val back = AvroSource.read(spark, s"$out/*.avro")
      .select("id", "name", "score", "vec")
      .as[(Long, String, Option[Double], Seq[Float])]
      .collect().sortBy(_._1).toSeq
    assert(back === Seq(
      (1L, "alpha", Some(1.5), Seq(1.0f, 2.0f)),
      (2L, "beta", None, Seq.empty[Float]),
      (3L, "gamma", Some(-0.25), Seq(3.5f))))
  }

  test("container files are splittable avro the plain reader accepts") {
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val out = java.nio.file.Files.createTempDirectory("graft_avro_w2_").toString
    AvroSource.write(df.repartition(3), out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length === 3)
    assert(AvroSource.read(spark, s"$out/*.avro").count() === 100)
  }

  test("unsupported types are rejected up front, not at task time") {
    val df = Seq((1L, Map("a" -> 1))).toDF("id", "m")
    intercept[IllegalArgumentException](AvroSource.toAvroSchemaJson(df.schema))
  }
}
