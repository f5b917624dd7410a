package graft.etl

import graft.TestSpark
import graft.sources.DocumentParser
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Coverage for the remaining small operators. */
class EtlCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("P1 extractPaths projects nested paths to flat output fields") {
    val df = spark.sql(
      "SELECT named_struct('user', named_struct('name', 'jo', 'id', 7L), 'n', 3) AS rec")
    val got = Etl.extractPaths(df,
        Map("username" -> "rec.user.name", "userid" -> "rec.user.id"))
      .select("username", "userid").as[(String, Long)].collect().head
    assert(got === (("jo", 7L)))
  }

  test("F6 separateAttachments explodes one row per attachment") {
    val df = Seq((1, Seq("a", "b", "c"))).toDF("id", "atts")
    val got = Etl.separateAttachments(df, col("atts"))
      .select("id", "attachment").as[(Int, String)].collect().toSet
    assert(got === Set((1, "a"), (1, "b"), (1, "c")))
  }

  test("P3 setValue literal and @{field}-style reference") {
    val df = Seq(("x", 1)).toDF("a", "b")
    val got = Etl.setValue(Etl.setValue(df, "lit_f", lit("v")), "ref_f", col("a"))
      .select("lit_f", "ref_f").as[(String, String)].collect().head
    assert(got === (("v", "x")))
  }

  test("mimeFromName extension fallback chain") {
    val df = Seq("a.xml", "b.json", "c.csv", "d.txt", "e.avro", "f.bin").toDF("n")
    val got = df.select(DocumentParser.mimeFromName(col("n"))).as[String].collect().toSeq
    assert(got === Seq("application/xml", "application/json", "text/csv",
      "text/plain", "avro/binary", "application/octet-stream"))
  }

  test("frame sampling bounds fan-out before explode") {
    val df = Seq((1, 300), (2, 10), (3, 0)).toDF("id", "frames")
    val got = graft.ops.Multimodal.sampleFrameIndexes(df, "frames", everyNth = 30, maxFrames = 5)
      .groupBy("id").agg(count(lit(1)).as("n"), max("frame_index").as("mx"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got(1) === ((5L, 120)))  // capped at maxFrames
    assert(got(2) === ((1L, 0)))    // 10 frames, every 30th -> frame 0
    assert(got(3) === ((1L, 0)))    // empty video still yields index 0
  }

  test("byte-frame sampling: real bytes at strided offsets, tail truncation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_frames_")
    val bytes = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    java.nio.file.Files.write(dir.resolve("a.bin"), bytes)
    val bin = graft.ops.Multimodal.readBinary(spark, dir.toString, "*.bin")
    val got = graft.ops.Multimodal.sampleByteFrames(bin, every = 400, frameLen = 300, maxFrames = 8)
      .orderBy("frame_idx")
      .select("frame_idx", "byte_off", "frame_len", "frame")
      .collect()
    // offsets 0, 400, 800 (<= 999)
    assert(got.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0, 0L, 300L), (1, 400L, 300L), (2, 800L, 200L)))
    // frame bytes are the actual file slices; the tail frame truncates
    assert(got(1).getAs[Array[Byte]]("frame").toSeq === bytes.slice(400, 700).toSeq)
    assert(got(2).getAs[Array[Byte]]("frame").toSeq === bytes.slice(800, 1000).toSeq)
    // maxFrames caps fan-out
    val capped = graft.ops.Multimodal.sampleByteFrames(bin, every = 100, frameLen = 10, maxFrames = 4)
      .count()
    assert(capped === 4L)
  }
}
