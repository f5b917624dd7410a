package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("feature count = unigrams + bigrams") {
    val df = Seq((1L, "alpha beta gamma")).toDF("id", "text")
    val got = Dsir.importanceScores(df, df, "id", "text", buckets = 64)
      .select("n_grams").as[Long].head()
    assert(got === 5L) // 3 unigrams + 2 bigrams
  }

  test("target-like docs outscore off-target docs") {
    val raw = Seq(
      (1L, "quality prose about careful writing and careful editing"),
      (2L, "spam spam buy now spam buy now buy"),
      (3L, "careful writing improves quality prose")
    ).toDF("id", "text")
    val target = Seq(
      (10L, "careful writing and quality prose"),
      (11L, "quality prose needs careful editing")
    ).toDF("id", "text")
    val scores = Dsir.importanceScores(raw, target, "id", "text", buckets = 128)
      .select(col("id"), col("dsir_avg")).as[(Long, Double)].collect().toMap
    assert(scores(1L) > scores(2L))
    assert(scores(3L) > scores(2L))
  }

  test("selection is deterministic and ordered by (avg desc, id)") {
    val raw = Seq.tabulate(20)(i => (i.toLong, s"token$i filler words here")).toDF("id", "text")
    val target = Seq((99L, "token3 filler words here")).toDF("id", "text")
    val a = Dsir.select(raw, target, "id", "text", k = 5, buckets = 64)
      .select("id").as[Long].collect().toSeq
    val b = Dsir.select(raw, target, "id", "text", k = 5, buckets = 64)
      .select("id").as[Long].collect().toSeq
    assert(a === b)
    assert(a.head === 3L) // the doc sharing ALL target grams wins
  }

  test("empty docs drop out (no grams)") {
    val raw = Seq((1L, "some text"), (2L, "")).toDF("id", "text")
    val got = Dsir.importanceScores(raw, raw, "id", "text", buckets = 32)
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }
}
