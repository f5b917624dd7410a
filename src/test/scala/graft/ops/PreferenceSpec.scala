package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PreferenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val cands = Seq(
    ("p1", 1L, 0.9), ("p1", 2L, 0.1), ("p1", 3L, 0.5),
    ("p2", 4L, 0.3), ("p2", 5L, 0.3), // tie
    ("p3", 6L, 0.7) // singleton — dropped
  ).toDF("prompt", "id", "score")

  private def byPrompt = Preference.pairs(cands, col("prompt"), col("id"), col("score"))
    .collect().map(r => r.getString(0) -> r).toMap

  test("chosen is argmax, rejected argmin, margin their difference") {
    val p1 = byPrompt("p1")
    assert(p1.getLong(1) === 1L) // chosen_id
    assert(p1.getLong(3) === 2L) // rejected_id
    assert(p1.getDouble(6) === 0.8)
  }

  test("ties break deterministically and never self-pair") {
    val p2 = byPrompt("p2")
    assert(p2.getLong(1) === 4L) // lowest id wins the tie
    assert(p2.getLong(3) === 5L) // highest id loses it
    assert(p2.getDouble(6) === 0.0)
  }

  test("singleton prompts are dropped") {
    assert(!byPrompt.contains("p3"))
  }
}
