package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming windowed counts over events == batch equivalent") {
    // stage events as a micro-batch-readable parquet dir (ts already
    // converted from nanos — readStream can't apply the nanos shim)
    val staged = java.nio.file.Files.createTempDirectory("graft_stream_in_").toString
    Tables.events(spark, TestSpark.sf).write.mode("overwrite").parquet(staged)

    val stream = StreamingIngest.readEvents(spark, staged)
    assert(stream.isStreaming)
    val q = StreamingIngest.windowedCounts(stream)
      .writeStream.format("memory").queryName("graft_stream_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("graft_stream_test")
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = Tables.events(spark, TestSpark.sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("foreachBatch index sink appends routed batches to a shard store") {
    val staged = java.nio.file.Files.createTempDirectory("graft_stream_in2_").toString
    Tables.events(spark, TestSpark.sf).write.mode("overwrite").parquet(staged)
    val outDir = java.nio.file.Files.createTempDirectory("graft_stream_out_").toString + "/data"

    val router = graft.route.HashRangeRouter(2)
    val stream = StreamingIngest.readEvents(spark, staged)
    val q = StreamingIngest.indexSink(outDir) { batch =>
      batch.withColumn("shard",
        format_string("%05d", router.shardCol(col("event_id").cast("string"))))
    }(stream)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ckpt_").toString)
      .start()
    try q.awaitTermination(60000) finally if (q.isActive) q.stop()

    val written = spark.read.parquet(outDir)
    assert(written.count() === 1000)
    assert(written.select("shard").distinct().count() === 2)
  }
}
