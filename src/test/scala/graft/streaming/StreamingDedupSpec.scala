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

  test("dedupWithinWatermark: in-horizon duplicates collapse, state stays bounded") {
    import spark.implicits._
    val staged = java.nio.file.Files.createTempDirectory("graft_wmd_").toString
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    // key 1 duplicated within minutes (inside the watermark horizon),
    // key 2 once — expect exactly one row per key
    Seq((1L, ts(0), "a"), (1L, ts(1), "a2"), (1L, ts(2), "a3"), (2L, ts(1), "b"))
      .toDF("id", "ts", "v").write.mode("overwrite").parquet(staged)
    val stream = StreamingIngest.dedupWithinWatermark(
      StreamingIngest.readEvents(spark, staged),
      keyCols = Seq("id"), watermark = "1 hour")
    val q = stream.writeStream.format("memory").queryName("graft_wmd")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("graft_wmd").select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L))
  }

  test("restart-resume E2E: file source → dropDuplicatesWithinWatermark → " +
    "index sink stays exactly-once across a stop/restart") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_sd_src_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sd_out_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sd_ck_").toString
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    def wave(rows: Seq[(Long, java.sql.Timestamp, String)], file: String): Unit =
      rows.toDF("id", "ts", "v").coalesce(1).write.mode("overwrite")
        .parquet(s"$src/$file")
    // wave 1: ids 1..100, with in-wave duplicates of 1..10
    wave((1L to 100L).map(i => (i, ts(i.toInt), s"w1-$i")) ++
      (1L to 10L).map(i => (i, ts(i.toInt), s"w1dup-$i")), "wave1")

    val schema = spark.read.parquet(s"$src/wave1").schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(s"$src/*")
        .withWatermark("ts", "24 hours")
        .dropDuplicatesWithinWatermark("id")
      val q = StreamingIngest.idempotentIndexSink(out)(identity)(stream)
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
    }
    runOnce() // processes wave 1, then terminates (AvailableNow)

    // wave 2 arrives while the query is DOWN: ids 51..150 — 51..100
    // duplicate wave-1 docs (same event times), 101..150 are new
    wave((51L to 150L).map(i => (i, ts(i.toInt), s"w2-$i")), "wave2")
    runOnce() // restart from the same checkpoint: state + file log resume

    val got = spark.read.parquet(out)
    // exactly-once: every id 1..150 exactly once, despite in-wave dups,
    // cross-wave dups, and the restart
    assert(got.count() === 150L)
    assert(got.select("id").distinct().count() === 150L)
    assert(got.select("id").as[Long].collect().toSet === (1L to 150L).toSet)
    // matches the BATCH dedup semantics over the union of all input
    val batchDedup = spark.read.schema(schema).parquet(s"$src/*")
      .dropDuplicates("id").count()
    assert(batchDedup === 150L)
  }

  test("streaming segment-store upsert: continuous index maintenance, " +
    "updates replace and restarts stay exactly-once") {
    import graft.index.{SegmentSearch, SegmentShardSink}
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_su_src_").toString
    val store = java.nio.file.Files.createTempDirectory("graft_su_store_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_su_ck_").toString
    // seed store: ids 1..50 v1
    SegmentShardSink.write((1 to 50).map(i => (i.toString, s"v1-$i"))
      .toDF("id", "value"), "id", store, shards = 2)

    def wave(rows: Seq[(String, String)], file: String): Unit =
      rows.toDF("id", "value").coalesce(1).write.mode("overwrite")
        .parquet(s"$src/$file")
    wave((26 to 75).map(i => (i.toString, s"v2-$i")), "wave1")
    val schema = spark.read.parquet(s"$src/wave1").schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(s"$src/*")
      val q = StreamingIngest.segmentUpsertSink(store)(identity)(stream)
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
    }
    runOnce()
    // wave 2 lands while the query is down; restart resumes
    wave((71 to 90).map(i => (i.toString, s"v3-$i")), "wave2")
    runOnce()

    val got = SegmentSearch.matchAll(spark, store, Seq("id", "value"))
      .collect().map(r => r.getString(0).toInt -> r.getString(1)).toMap
    assert(got.size === 90) // ids 1..90, each exactly once
    assert(got(10) === "v1-10")  // untouched seed
    assert(got(30) === "v2-30")  // updated by wave 1
    assert(got(60) === "v2-60")  // added by wave 1
    assert(got(72) === "v3-72")  // wave-1 doc updated again by wave 2
    assert(got(85) === "v3-85")  // added by wave 2
  }
}
