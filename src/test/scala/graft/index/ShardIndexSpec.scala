package graft.index

import graft.{Tables, TestSpark}
import graft.route.HashRangeRouter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SolrIndexDriverTest shape (reference
  * map-reduce/src/test/java/com/riskiq/solr/hadoop/SolrIndexDriverTest
  * .java:23-62): build a shard store, then open it and verify by
  * querying back — match-all counts, per-id lookup, layout invariants. */
class ShardIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_test_shards_").toString
    val docs = Tables.lineitem(spark, TestSpark.sf)
      .withColumn("id", concat(col("l_orderkey"), lit("#"), col("l_linenumber")))
    ShardIndex.write(docs, "id", dir, shards = 4)
    dir
  }

  test("match-all count over all shards == input rows; 4 shard dirs exist") {
    val store = ShardIndex.read(spark, out)
    assert(store.count() === 6000)
    val shardDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length === 4)
    val counts = ShardIndex.matchAllCounts(store).collect()
    assert(counts.length === 4)
    assert(counts.map(_.getAs[Long]("cnt")).sum === 6000)
  }

  test("every doc landed in the shard the router assigns (SolrCloud parity)") {
    val router = HashRangeRouter(4)
    val store = ShardIndex.read(spark, out)
    val mismatch = store
      .withColumn("expected", format_string("%05d", router.shardCol(col("id"))))
      .filter(col("shard") =!= col("expected"))
    assert(mismatch.count() === 0)
  }

  test("byId prunes to one shard and finds the row") {
    val store = ShardIndex.read(spark, out)
    val someId = store.select("id").limit(1).collect().head.getString(0)
    val one = ShardIndex.byId(store, "id", someId, 4).collect()
    assert(one.nonEmpty)
    assert(one.forall(_.getAs[String]("id") === someId))
    // partition pruning: the plan should read 1 of 4 shard partitions
    val planned = ShardIndex.byId(store, "id", someId, 4)
      .queryExecution.executedPlan.toString
    assert(planned.contains("shard"), "shard filter must reach the scan")
  }

  test("term query returns the same rows as a direct filter on the source") {
    val store = ShardIndex.read(spark, out)
    val viaStore = ShardIndex.termQuery(store, "l_returnflag", "R").count()
    val direct = Tables.lineitem(spark, TestSpark.sf)
      .filter(col("l_returnflag") === "R").count()
    assert(viaStore === direct)
  }

  test("multivalued (array) columns round-trip through the shard store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_test_mv_").toString
    val docs = Tables.documents(spark, TestSpark.sf).limit(200)
      .withColumn("id", col("doc_id").cast("string"))
      .withColumn("toks", org.apache.spark.sql.functions.split(col("text"), " "))
    ShardIndex.write(docs, "id", dir, shards = 2)
    val back = ShardIndex.read(spark, dir)
    assert(back.count() === 200)
    val row = back.filter(col("id") === "5").collect().head
    assert(row.getAs[scala.collection.Seq[String]]("toks").nonEmpty)
  }

  test("micro-shard layout: microShards spread within root shards") {
    val dir = java.nio.file.Files.createTempDirectory("graft_test_micro_").toString
    val docs = Tables.lineitem(spark, TestSpark.sf)
      .withColumn("id", concat(col("l_orderkey"), lit("#"), col("l_linenumber")))
      .limit(1000)
    ShardIndex.write(docs, "id", dir, shards = 2, microShards = 4)
    val store = ShardIndex.read(spark, dir)
    assert(store.count() === 1000)
    assert(store.select("shard").distinct().count() === 2)
  }
}
