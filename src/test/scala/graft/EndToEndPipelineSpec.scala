package graft

import graft.dedup.Dedup
import graft.etl.{Etl, Metrics, Pipeline}
import graft.index.{GoLive, RecordingGoLive, ShardIndex}
import graft.schema.{IndexField, IndexSchema}
import graft.sources.AvroSource
import graft.text.TextAnalysis
import org.apache.avro.SchemaBuilder
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The full reference dataflow end-to-end, mirroring the tutorial
 * morphline + MiniMR E2E (tutorialReadAvroContainer.conf:46-131 and
 * MorphlineGoLiveMiniMRTest.java:388-489): Avro container → path
 * extraction → timestamp normalization → uuid/key handling → schema
 * sanitize → tokenize → dedup → Solr-compatible routing → shard store
 * → query read-back with per-doc field assertions → go-live.
 */
class EndToEndPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeTweetFixture(n: Int, dupEvery: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e_avro_").toString
    val schema = SchemaBuilder.record("status").fields()
      .requiredString("id")
      .requiredString("user_screen_name")
      .requiredString("text")
      .requiredString("created_at")
      .requiredLong("retweet_count")
      .requiredString("junk_field") // not in the index schema -> sanitized away
      .endRecord()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(s"$dir/statuses.avro"))
    (0 until n).foreach { i =>
      val r = new GenericData.Record(schema)
      // every dupEvery-th doc collides with its predecessor's id but a
      // LATER created_at -> retain-most-recent must keep it
      val id = if (dupEvery > 0 && i % dupEvery == 0 && i > 0) s"doc${i - 1}" else s"doc$i"
      r.put("id", id)
      r.put("user_screen_name", s"Nadja$i")
      r.put("text", s"Hello World tweet number $i from user Nadja$i!")
      r.put("created_at", f"2024-02-0${1 + i % 9}%s 10:0${i % 6}%s:00")
      r.put("retweet_count", i.toLong)
      r.put("junk_field", "should not survive sanitize")
      w.append(r)
    }
    w.close()
    dir
  }

  test("avro -> ETL -> dedup -> route -> store -> query back -> go-live") {
    val avroDir = writeTweetFixture(100, dupEvery = 10)
    val indexSchema = IndexSchema("id", Seq(
      IndexField("id", StringType, required = true),
      IndexField("user_screen_name", StringType),
      IndexField("toks", StringType, multiValued = true),
      IndexField("created_at", StringType),
      IndexField("retweet_count", LongType)))

    // 1. source + ETL chain (one fused plan)
    val raw = AvroSource.read(spark, s"$avroDir/*.avro")
    val etl = Pipeline.of(
      Pipeline.convertTimestamp(col("created_at"), "created_at",
        Seq("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd")),
      Pipeline.tokenizeText(col("text"), "toks"),
      Pipeline.sanitizeToSchema(indexSchema))
    val docs = indexSchema.validate(etl(raw))
    val observed = Metrics.observeDocs(docs, "etl", "id")

    // 2. dedup (10 planted id collisions, newest wins)
    val deduped = Dedup.retainMostRecent(observed, Seq(col("id")),
      col("created_at"), col("retweet_count"))

    // 3. route + store
    val store = java.nio.file.Files.createTempDirectory("graft_e2e_store_").toString
    ShardIndex.write(deduped, "id", store, shards = 3)

    // 4. query read-back: match-all count == distinct ids
    val built = ShardIndex.read(spark, store)
    assert(built.count() === 91) // 100 docs, 9 collided into predecessors (i=10,20,...,90)
    assert(ShardIndex.matchAllCounts(built).collect().length === 3)

    // per-doc field equality, the reference's own assertion
    // (user_screen_name == "Nadja"+i); doc9 collided with doc10's row
    // which has created_at later -> Nadja10 must have won
    val doc9 = ShardIndex.byId(built, "id", "doc9", 3).collect()
    assert(doc9.length === 1)
    assert(doc9.head.getAs[String]("user_screen_name") === "Nadja10")
    val doc7 = ShardIndex.byId(built, "id", "doc7", 3).collect().head
    assert(doc7.getAs[String]("user_screen_name") === "Nadja7")
    // analyzed text made it through the chain
    assert(doc7.getAs[Seq[String]]("toks").take(2) === Seq("hello", "world"))
    // sanitize dropped the unknown field (reference drops first_name)
    assert(!built.columns.contains("junk_field"))
    // ISO timestamp normalization applied
    assert(doc7.getAs[String]("created_at").matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}.*"""))

    // 5. metric counters rode the job
    val m = Metrics.run(observed, "etl")
    assert(m("docs") === 100L)
    assert(m("missing_key") === 0L)

    // 6. go-live: positional shard -> target mapping over the store
    val golive = new RecordingGoLive
    golive.goLive(GoLive.shardDirs(store), Seq("http://solr-1/c", "http://solr-2/c", "http://solr-3/c"))
    assert(golive.merged.size === 3 && golive.committed)

    // 7. merge story: rebuild at 6 micro shards, merge down to 2
    val micro = java.nio.file.Files.createTempDirectory("graft_e2e_micro_").toString
    ShardIndex.write(deduped, "id", micro, shards = 6)
    val merged = java.nio.file.Files.createTempDirectory("graft_e2e_merged_").toString
    ShardIndex.mergeShards(spark, micro, merged, "id", shards = 2)
    val m2 = ShardIndex.read(spark, merged)
    assert(m2.count() === 91)
    assert(m2.select("shard").distinct().count() === 2)

    // 8. the one-call fused facade (dedup riding the route shuffle)
    // produces the same survivors and placement as the 2-step chain
    val fused = java.nio.file.Files.createTempDirectory("graft_e2e_fused_").toString
    Graft.buildIndex(etl(raw), indexSchema, fused, shards = 3,
      orderBy = Some(col("created_at")))
    val fb = ShardIndex.read(spark, fused)
    assert(fb.count() === 91)
    val fdoc9 = ShardIndex.byId(fb, "id", "doc9", 3).collect()
    assert(fdoc9.length === 1)
    assert(fdoc9.head.getAs[String]("user_screen_name") === "Nadja10")
    // (shard reads back as the partition-inferred int type)
    assert(fb.select("id", "shard").collect().map(r => r.getString(0) -> r.get(1).toString).toMap
      === built.select("id", "shard").collect().map(r => r.getString(0) -> r.get(1).toString).toMap)
  }
}
