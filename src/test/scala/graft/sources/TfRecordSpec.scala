package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TFRecord framing: published masked-CRC32C vectors, write→read
  * round trip through Spark, corruption detection, truncation stop. */
class TfRecordSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("frame layout matches the TensorFlow spec (hand-checked vector)") {
    val rec = TfRecord.frame("abc".getBytes("UTF-8"))
    // length 3 LE
    assert(rec.take(8).toSeq === Seq[Byte](3, 0, 0, 0, 0, 0, 0, 0))
    assert(rec.length === 8 + 4 + 3 + 4)
    // masked CRC is self-consistent: reader accepts it
    val parsed = TfRecord.parseFile("t", rec).toList
    assert(parsed.size === 1)
    assert(new String(parsed.head.payload, "UTF-8") === "abc")
    assert(!parsed.head.corrupt)
  }

  test("masked crc32c of empty input matches the published constant") {
    // crc32c("") = 0; mask(0) = 0xa282ead8
    assert(TfRecord.maskedCrc(Array.emptyByteArray, 0, 0) === 0xa282ead8)
  }

  test("write -> read round trip preserves every payload") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tfrec_").toString
    val df = (1 to 100).map(i => s"payload-$i-${"x" * (i % 17)}").toDF("s")
      .repartition(4)
    TfRecord.write(df, col("s").cast("binary"), dir)
    val back = TfRecord.read(spark, dir)
      .select(col("payload").cast("string"), col("corrupt"))
      .as[(String, Boolean)].collect()
    assert(back.length === 100)
    assert(back.forall(!_._2))
    assert(back.map(_._1).toSet === (1 to 100).map(i => s"payload-$i-${"x" * (i % 17)}").toSet)
  }

  test("adversarial near-Long.MaxValue length stops the walk instead of crashing") {
    // Craft a frame whose 8-byte length wraps `pos + 12 + len + 4`
    // negative: an addition-form bounds check would pass and
    // copyOfRange would throw. The masked length-CRC is computed over
    // the adversarial bytes so the CRC gate can't save us.
    val len = java.lang.Long.MAX_VALUE - 7
    val rec = new Array[Byte](12 + 8)
    var i = 0
    while (i < 8) { rec(i) = ((len >>> (8 * i)) & 0xff).toByte; i += 1 }
    val crc = TfRecord.maskedCrc(rec, 0, 8)
    i = 0
    while (i < 4) { rec(8 + i) = ((crc >>> (8 * i)) & 0xff).toByte; i += 1 }
    assert(TfRecord.parseFile("t", rec).isEmpty) // stop, no exception
  }

  test("a flipped payload byte flags corrupt; a flipped length byte stops the walk") {
    val good = TfRecord.frame("hello".getBytes("UTF-8")) ++
      TfRecord.frame("world".getBytes("UTF-8"))
    // flip a payload byte of record 1 (offset 12 = first payload byte)
    val c1 = good.clone(); c1(12) = (c1(12) ^ 0x01).toByte
    val r1 = TfRecord.parseFile("t", c1).toList
    assert(r1.size === 2)
    assert(r1.head.corrupt)
    assert(!r1(1).corrupt)
    // flip a length byte: frame boundary untrustworthy -> walk stops
    val c2 = good.clone(); c2(0) = (c2(0) ^ 0x40).toByte
    assert(TfRecord.parseFile("t", c2).isEmpty)
    // truncation mid-record: first record survives, tail dropped
    val c3 = good.take(good.length - 3)
    val r3 = TfRecord.parseFile("t", c3).toList
    assert(r3.size === 1)
    assert(new String(r3.head.payload, "UTF-8") === "hello")
  }
}
