package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming dedup: the A1/A3 resolver semantics under continuous
  * ingest — Spark's watermarked dropDuplicates keeps first-seen per
  * key with bounded state, the streaming analog of the reference's
  * reducer-side conflict resolution. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("watermarked streaming dropDuplicates bounds to one row per key") {
    val staged = java.nio.file.Files.createTempDirectory("graft_sdedup_").toString
    Tables.events(spark, TestSpark.sf).write.mode("overwrite").parquet(staged)
    val stream = StreamingIngest.readEvents(spark, staged)
      .withWatermark("ts", "24 hours")
      .dropDuplicates("user_id")
    val q = stream.writeStream.format("memory").queryName("graft_sdedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("graft_sdedup")
    val users = Tables.events(spark, TestSpark.sf)
      .select("user_id").distinct().count()
    assert(got.count() === users)
    assert(got.select("user_id").distinct().count() === users)
  }
}
