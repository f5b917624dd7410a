package graft.search

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EdismaxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark spark engine", "web"),   // tf(text,spark)=2
    (2L, "the spark engine", "spark"),   // spark in BOTH fields
    (3L, "plain engine", "web"),         // matches only 'engine'
    (4L, "nothing here", "web")
  ).toDF("id", "text", "cat")

  test("per-term disjunction max, summed across terms") {
    val got = Edismax.score(docs, "spark engine",
        Seq("text" -> 2000L, "cat" -> 1000L))
      .select("id", "matched_terms", "score_milli")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((2L, 2000L * 2 + 2000L)))  // tf 2 in best field + engine
    // doc 2: spark max(2000*1 text, 1000*1 cat) = 2000 — no double count
    assert(got(2L) === ((2L, 2000L + 2000L)))
    assert(got(3L) === ((1L, 2000L)))
    assert(got(4L) === ((0L, 0L)))
  }

  test("mm gates and rows cuts deterministically") {
    val got = Edismax.query(docs, "spark engine",
        Seq("text" -> 2000L, "cat" -> 1000L), mm = 2, rows = 1, col("id"))
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(1L)) // highest score among full matches
  }

  test("pf phrase boost counts consecutive occurrences; bf adds through") {
    val df = Seq(
      (1L, "fast spark and fast spark", "x"),  // phrase tf 2
      (2L, "spark fast", "x"),                 // terms match, no phrase
      (3L, "fast only", "x")
    ).toDF("id", "text", "cat")
    val got = Edismax.score(df, "fast spark", Seq("text" -> 1000L),
        pf = Seq("text" -> 5000L), bf = Some(lit(7L)))
      .select("id", "score_milli").as[(Long, Long)].collect().toMap
    assert(got(1L) === 1000L * 2 + 1000L * 2 + 5000L * 2 + 7L)
    assert(got(2L) === 1000L + 1000L + 7L)
    assert(got(3L) === 1000L + 7L)
  }

  test("pf2 boosts each consecutive term pair independently") {
    val df = Seq(
      (1L, "fast spark table", "x"),    // both pairs
      (2L, "fast spark and table", "x") // only pair 1
    ).toDF("id", "text", "cat")
    val got = Edismax.score(df, "fast spark table", Seq("text" -> 1000L),
        pf2 = Seq("text" -> 2000L))
      .select("id", "score_milli").as[(Long, Long)].collect().toMap
    assert(got(1L) === 3000L + 2000L * 2)
    assert(got(2L) === 3000L + 2000L)
  }
}
