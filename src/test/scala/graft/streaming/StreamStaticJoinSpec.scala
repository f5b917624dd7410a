package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static enrichment join: the streaming ingest path joining
  * each micro-batch against a broadcastable dimension — how a
  * continuous index build attaches catalog metadata per doc. */
class StreamStaticJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming events enriched against a static dimension") {
    val staged = java.nio.file.Files.createTempDirectory("graft_ssj_").toString
    Tables.events(spark, TestSpark.sf).write.mode("overwrite").parquet(staged)
    // static dim: user_id -> segment (derived from customer table)
    val dim = Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val stream = StreamingIngest.enrichStream(
      StreamingIngest.readEvents(spark, staged), dim, "user_id")
    val q = stream.writeStream.format("memory").queryName("graft_ssj")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("graft_ssj")
    assert(got.count() === 1000) // left join preserves every event
    // events whose user exists in the dim got a segment
    val enriched = got.filter(col("segment").isNotNull).count()
    assert(enriched > 0)
    // parity with the batch join
    val batch = Tables.events(spark, TestSpark.sf)
      .join(dim, Seq("user_id"), "left_outer")
      .filter(col("segment").isNotNull).count()
    assert(enriched === batch)
  }
}
