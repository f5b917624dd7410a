package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tok = (c: String) => split(col(c), " ")

  test("flags docs sharing an n-gram with the benchmark, counts distinct grams") {
    val corpus = Seq(
      (1L, "a b c d e x y z"),   // shares "a b c d" with bench
      (2L, "p q r s t u v w"),   // clean
      (3L, "a b c d e f g h")    // shares "a b c d e" -> 2 distinct 4-grams
    ).toDF("id", "text")
    val bench = Seq("a b c d e").toDF("btext")
    val got = Decontamination.sharedNgrams(
      corpus, col("id"), tok("text"), bench, tok("btext"), n = 4)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // bench 4-grams: "a b c d", "b c d e"
    // doc1 grams include "a b c d" and "b c d e" (tokens a b c d e ...) -> both
    assert(got === Seq((1L, 2L), (3L, 2L)))
  }

  test("short benchmark docs fall back to a whole-doc gram") {
    val corpus = Seq((1L, "tiny doc"), (2L, "other thing")).toDF("id", "text")
    val bench = Seq("tiny doc").toDF("btext")
    val got = Decontamination.sharedNgrams(
      corpus, col("id"), tok("text"), bench, tok("btext"), n = 8)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L)))
  }

  test("repeated grams inside one doc count once (distinct semantics)") {
    val corpus = Seq((1L, "a b a b a b")).toDF("id", "text")
    val bench = Seq("a b").toDF("btext")
    val got = Decontamination.sharedNgrams(
      corpus, col("id"), tok("text"), bench, tok("btext"), n = 2)
      .as[(Long, Long)].collect().toSeq
    // corpus 2-grams distinct: {a b, b a}; bench: {a b}
    assert(got === Seq((1L, 1L)))
  }

  test("overlapFraction: every doc returned, graded, thresholded") {
    val corpus = Seq(
      (1L, "a b c d e f"),   // grams {a b, b c, c d, d e, e f}: 2/5 shared
      (2L, "p q r s"),       // zero overlap
      (3L, "a b c")          // grams {a b, b c}: 2/2 shared
    ).toDF("id", "text")
    val bench = Seq("a b c").toDF("btext")
    val got = Decontamination.overlapFraction(
      corpus, col("id"), tok("text"), bench, tok("btext"), n = 2, tau = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 5L, 2L, 0.4, false),
      (2L, 3L, 0L, 0.0, false),
      (3L, 2L, 2L, 1.0, true)))
  }
}
