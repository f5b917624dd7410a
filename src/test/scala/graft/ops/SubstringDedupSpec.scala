package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int = 3, minOcc: Int = 2) =
    SubstringDedup.dropDuplicatedSpans(
      docs.toDF("doc_id", "text"), "doc_id", "text", k = k, minOccurrences = minOcc)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("a shared k-gram is cut from every occurrence; unique text survives") {
    val boiler = "all rights reserved here"
    val got = run(Seq(
      1L -> s"alpha beta gamma $boiler",
      2L -> s"$boiler delta epsilon zeta"), k = 4)
    assert(got === Seq(
      (1L, 7L, 4L, "alpha beta gamma"),
      (2L, 7L, 4L, "delta epsilon zeta")))
  }

  test("overlapping duplicated windows merge into one span (no double count)") {
    // "a b c d" duplicated with k=3 -> starts 0 and 1 in each doc,
    // overlapping coverage [0..3]: 4 dup tokens per doc, not 6
    val got = run(Seq(1L -> "a b c d x", 2L -> "y a b c d"), k = 3)
    assert(got === Seq((1L, 5L, 4L, "x"), (2L, 5L, 4L, "y")))
  }

  test("within-document repetition counts toward minOccurrences") {
    val got = run(Seq(1L -> "p q r s p q r t"), k = 3)
    // "p q r" occurs twice inside the one doc -> starts 0 and 4,
    // spans [0,2] and [4,6]
    assert(got === Seq((1L, 8L, 6L, "s t")))
  }

  test("documents shorter than k are untouched (no whole-array shingle leak)") {
    val got = run(Seq(1L -> "a b", 2L -> "a b", 3L -> "a b c d"), k = 3)
    assert(got === Seq(
      (1L, 2L, 0L, "a b"), (2L, 2L, 0L, "a b"), (3L, 4L, 0L, "a b c d")))
  }

  test("fully-duplicated documents collapse to empty text") {
    val got = run(Seq(1L -> "x y z", 2L -> "x y z"), k = 3)
    assert(got === Seq((1L, 3L, 3L, ""), (2L, 3L, 3L, "")))
  }

  test("minOccurrences above the repeat count leaves text alone") {
    val got = run(Seq(1L -> "x y z", 2L -> "x y z"), k = 3, minOcc = 3)
    assert(got === Seq((1L, 3L, 0L, "x y z"), (2L, 3L, 0L, "x y z")))
  }

  test("hashed window keys produce the identical result (production swap)") {
    val docs = Seq(
      1L -> "alpha beta gamma all rights reserved here tail",
      2L -> "all rights reserved here delta epsilon zeta",
      3L -> "p q r s p q r t",
      4L -> "short doc")
    val exact = run(docs, k = 4)
    val hashed = SubstringDedup.dropDuplicatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = 4, hashedKeys = true)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(hashed === exact)
  }

  test("span_cut kernel matches the composable formulation on adversarial inputs") {
    import org.apache.spark.sql.functions._
    val cases: Seq[(Seq[String], Seq[Int], Int)] = Seq(
      (Seq("a", "b", "c", "d", "e"), Seq(0, 1), 3),        // overlap
      (Seq("a", "b", "c", "d", "e", "f"), Seq(0, 3), 3),   // adjacent spans
      (Seq("a", "b", "c", "d"), Seq.empty, 3),             // no starts
      (Seq("a", "b", "c"), Seq(0), 3),                     // whole doc covered
      (Seq("", "x", "", "y"), Seq(1), 2),                  // empty-string tokens
      (Seq("a"), Seq(0), 5),                               // k past the end
      (Seq.empty, Seq.empty, 3),                           // empty doc
      ((1 to 40).map(i => s"t$i"), Seq(0, 2, 4, 6, 20, 35), 4))
    val df = cases.zipWithIndex
      .map { case ((t, s, kk), i) => (i, t, s, kk) }
      .toDF("case_id", "toks", "starts", "k")
    cases.zipWithIndex.foreach { case ((_, _, kk), i) =>
      val row = df.filter(col("case_id") === i)
        .select(
          graft.functions.SpanCut.span_cut(col("toks"), col("starts"), kk).as("fused"),
          SubstringDedup.composableCut(col("toks"), col("starts"), kk).as("comp"))
        .head()
      assert(row.getStruct(0).getInt(0) === row.getStruct(1).getInt(0), s"case $i n_dup")
      assert(row.getStruct(0).getString(1) === row.getStruct(1).getString(1), s"case $i text")
    }
  }
}
