package graft.streaming

import graft.TestSpark
import graft.text.{Redaction, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The corpus-scrubbing operators under continuous ingest: because
 * redaction / quality scoring / fingerprinting are pure projections,
 * the SAME Columns compose with readStream unchanged — the streaming
 * corpus pipeline is the batch one minus the shuffling stages (near-
 * dup needs bounded state there: watermarked dropDuplicates on the
 * content fingerprint).
 */
class StreamingScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming scrub: redact + quality gate + fingerprint dedup in one stream") {
    val staged = java.nio.file.Files.createTempDirectory("graft_scrub_").toString
    val docs = Seq(
      (1L, "write to someone@example.com about the quick brown fox today"),
      (2L, "write to someone@example.com about the quick brown fox today"), // exact dup
      (3L, "a completely different document with enough words to pass"),
      (4L, "tiny")                                                          // quality junk
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(staged)

    val quality = TextAnalysis.qualityColumns(col("text")).toMap
    val stream = spark.readStream
      .schema(docs.schema)
      .parquet(staged)
      .filter(quality("keep"))
      .withColumn("text", Redaction.redactPii(col("text")))
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .dropDuplicates("fp")

    val q = stream.writeStream.format("memory").queryName("graft_scrub")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("graft_scrub").select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got.size === 2)                       // dup and junk gone
    assert(!got.keySet.contains(4L))
    assert(got.values.forall(!_.contains("example.com")))
    assert(got.values.exists(_.contains("<EMAIL>")))
  }
}
