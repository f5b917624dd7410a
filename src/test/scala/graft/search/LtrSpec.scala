package graft.search

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LtrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("linear model folds weight*feature in declared order; rerank is top-k with tie-break") {
    val cand = Seq(
      (1L, 2L, 100L), // score 2*2 + 0.01*100 = 5.0
      (2L, 1L, 300L), // 2 + 3 = 5.0 (tie with 1 -> id asc)
      (3L, 3L, 0L),   // 6.0
      (4L, 0L, 10L)   // 0.1
    ).toDF("id", "hits", "len")
    val got = Ltr.rerank(cand,
        Seq(Ltr.Feature("f_hits", col("hits")), Ltr.Feature("f_len", col("len"))),
        Ltr.LinearModel(Seq("f_hits" -> 2.0, "f_len" -> 0.01)),
        topK = 3, tieBreak = col("id"))
      .select("id", "ltr_score_r").as[(Long, Double)].collect().toSeq
    assert(got === Seq((3L, 6.0), (1L, 5.0), (2L, 5.0)))
  }

  test("boost= multiplies a function query into the relevance score") {
    val out = java.nio.file.Files.createTempDirectory("graft_boost_").toString
    graft.index.SegmentShardSink.write(
      Seq(("1", "spark spark spark", 1L), ("2", "spark alpha", 100L))
        .toDF("id", "text", "freshness"),
      "id", out, shards = 2, analyzedFields = Set("text"))
    val plain = graft.Graft.search(spark, out, "text:spark", topK = 2)
      .select("id").as[String].collect().toSeq
    assert(plain === Seq("1", "2")) // higher tf wins unboosted
    val boosted = graft.Graft.search(spark, out, "text:spark", topK = 2,
        boost = Some("linear(freshness, 1, 0)"))
      .select("id").as[String].collect().toSeq
    assert(boosted === Seq("2", "1")) // 100x freshness boost flips it
    // pure-filter query: boost alone orders the hits
    val filterOnly = graft.Graft.search(spark, out, "id:[* TO *]", topK = 2,
        boost = Some("linear(freshness, 1, 0)"))
      .select("id").as[String].collect().toSeq
    assert(filterOnly === Seq("2", "1"))
  }

  test("originalScore composes: reranking Graft.search output demotes short docs") {
    val out = java.nio.file.Files.createTempDirectory("graft_ltr_").toString
    graft.index.SegmentShardSink.write(
      Seq(("1", "spark spark spark"), ("2", "spark alpha beta gamma delta epsilon"),
          ("3", "alpha beta")).toDF("id", "text"),
      "id", out, shards = 2, analyzedFields = Set("text"))
    val first = graft.Graft.search(spark, out, "text:spark", topK = 10)
    val got = Ltr.rerank(first,
        Seq(Ltr.Feature("originalScore", col("score_r")),
          Ltr.Feature("len", length(col("text")).cast("double"))),
        Ltr.LinearModel(Seq("originalScore" -> 0.1, "len" -> 1.0)),
        topK = 2, tieBreak = col("id"))
      .select("id").as[String].collect().toSeq
    // doc 2 is longer -> model outranks doc 1's higher BM25
    assert(got === Seq("2", "1"))
  }
}
