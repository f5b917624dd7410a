package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a planted vocabulary split: "good" docs talk about science,
  // "bad" docs are spam — a classifier trained on the labels must
  // separate held-out docs of the same style
  private lazy val docs = Seq(
    (1L, "the experiment measured the reaction rate carefully", true),
    (2L, "results of the experiment were published after review", true),
    (3L, "the reaction was measured and the rate was stable", true),
    (4L, "buy cheap pills now click here buy now", false),
    (5L, "click here now cheap offer buy pills cheap", false),
    (6L, "now now cheap click pills buy here offer", false)
  ).toDF("id", "text", "good")

  private lazy val weights =
    QualityClassifier.tokenWeights(docs, "id", "text", col("good"))

  test("discriminative tokens get signed weights") {
    val w = weights.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w("experiment") > 0, "seed-side token must score positive")
    assert(w("pills") < 0, "spam-side token must score negative")
  }

  test("scores separate the classes, held-out style included") {
    val held = Seq(
      (10L, "the experiment rate was measured"),
      (11L, "cheap pills click now")
    ).toDF("id", "text")
    val s = QualityClassifier.score(held, "id", "text", weights)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(10L) > 0)
    assert(s(11L) < 0)
  }

  test("OOV tokens contribute zero but count into n_tokens") {
    val held = Seq((20L, "zzzq wwwk experiment")).toDF("id", "text")
    val row = QualityClassifier.score(held, "id", "text", weights)
      .collect().head
    assert(row.getLong(1) === 3L) // n_tokens counts OOV
    val expOnly = QualityClassifier.score(
      Seq((21L, "experiment")).toDF("id", "text"), "id", "text", weights)
      .collect().head
    assert(row.getLong(2) === expOnly.getLong(2)) // score ignores OOV
  }

  test("minDf drops rare tokens from the table") {
    val w = QualityClassifier.tokenWeights(docs, "id", "text", col("good"), minDf = 3)
    val terms = w.select("__wt").as[String].collect().toSet
    assert(!terms.contains("carefully")) // occurs once
    assert(terms.contains("the"))
  }

  test("thresholdSweep: exact confusion counts, milli precision/recall") {
    val scored = Seq(
      (1L, 500L, true), (2L, 100L, true), (3L, -200L, true),
      (4L, 300L, false), (5L, -50L, false), (6L, -400L, false)
    ).toDF("id", "s", "lab")
    val rows = QualityClassifier.thresholdSweep(scored, col("s"), col("lab"),
        Seq(0L, 200L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // t=0: tp=2 fp=1 fn=1 tn=2 -> p=666, r=666
    assert(rows(0L) === ((2L, 1L, 1L, 2L, 666L, 666L)))
    // t=200: tp=1 fp=1 fn=2 tn=2 -> p=500, r=333
    assert(rows(200L) === ((1L, 1L, 2L, 2L, 500L, 333L)))
  }
}
