package graft.etl

import graft.TestSpark
import graft.schema.{IndexField, IndexSchema}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("command chain composes into one plan (morphline-equivalent)") {
    val schema = IndexSchema("id", Seq(
      IndexField("id", StringType, required = true),
      IndexField("title", StringType),
      IndexField("toks", StringType, multiValued = true)))
    val pipeline = Pipeline.of(
      Pipeline.setValues("title", lower(col("raw_title"))),
      Pipeline.generateUuid("id", col("raw_title")),
      Pipeline.tokenizeText(col("title"), "toks"),
      Pipeline.sanitizeToSchema(schema))
    val in = Seq("Hello World", "Foo Bar").toDF("raw_title")
    val out = pipeline(in)
    assert(out.columns.toSeq.sorted === Seq("id", "title", "toks"))
    assert(out.count() === 2)
    val toks = out.filter(col("title") === "hello world")
      .select("toks").as[Seq[String]].collect().head
    assert(toks === Seq("hello", "world"))
    // single stage: no Exchange in the plan — the chain fused
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("goLive trait: positional shard->target mapping, commit once") {
    val golive = new graft.index.RecordingGoLive
    golive.goLive(Seq((0, "/s/shard=00000"), (1, "/s/shard=00001")),
      Seq("http://solr-a/core1", "http://solr-b/core1"))
    assert(golive.merged.toSeq === Seq(
      (0, "/s/shard=00000", "http://solr-a/core1"),
      (1, "/s/shard=00001", "http://solr-b/core1")))
    assert(golive.committed)
  }

  test("mtree iteration invariant helper (SolrMergeDriver planning)") {
    import graft.index.ShardIndex
    assert(ShardIndex.mtreeIterations(10, 10, 2) === 0)
    assert(ShardIndex.mtreeIterations(40, 10, 2) === 2)
    assert(ShardIndex.mtreeIterations(250, 2, 5) === 3)
    intercept[IllegalArgumentException](ShardIndex.mtreeIterations(30, 10, 2))
  }
}
