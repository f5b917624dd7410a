package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("grams shared by >= minDocs docs count as boilerplate; fraction per doc") {
    // "cookie banner" appears in 3 docs -> boilerplate at minDocs=3;
    // everything else is unique
    val docs = Seq(
      (1L, "cookie banner alpha beta"),
      (2L, "cookie banner gamma delta"),
      (3L, "cookie banner epsilon zeta"),
      (4L, "entirely fresh prose here")
    ).toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("toks"))
    val got = Boilerplate.boilerplateStats(docs, col("id"), col("toks"), n = 2, minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // each doc has 3 distinct 2-grams; docs 1-3 share exactly "cookie banner"
    assert(got(1L) === ((3L, 1L, 1.0 / 3)))
    assert(got(2L) === ((3L, 1L, 1.0 / 3)))
    assert(got(3L) === ((3L, 1L, 1.0 / 3)))
    assert(got(4L) === ((3L, 0L, 0.0)))
  }

  test("repeated gram inside ONE doc does not fake corpus frequency") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"), // "spam spam" distinct once per doc
      (2L, "other words entirely now")
    ).toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("toks"))
    val got = Boilerplate.boilerplateStats(docs, col("id"), col("toks"), n = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) === 0L) // appears in only 1 doc, however often
  }
}
