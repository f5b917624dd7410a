package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SkipGramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("window ±1 pairs of a 3-token doc, hand-counted") {
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val got = SkipGrams.pairs(df, "text", window = 1)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // positions: a(0) b(1) c(2); pairs: (a,b),(b,a),(b,c),(c,b)
    assert(got === Map(("a","b") -> 1L, ("b","a") -> 1L,
      ("b","c") -> 1L, ("c","b") -> 1L))
  }

  test("window clamps at edges and repeated tokens co-occur with themselves") {
    val df = Seq((1L, "x x")).toDF("id", "text")
    val got = SkipGrams.pairs(df, "text", window = 2)
      .as[(String, String, Long)].collect()
    assert(got.toSeq === Seq(("x", "x", 2L))) // both directions aggregate
  }

  test("single-token and empty docs emit nothing") {
    val df = Seq((1L, "solo"), (2L, "")).toDF("id", "text")
    assert(SkipGrams.pairs(df, "text").count() === 0L)
  }
}
