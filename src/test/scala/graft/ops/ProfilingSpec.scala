package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pow2Bucket: next power of two, exact at the boundaries") {
    val got = Seq(1L, 2L, 3L, 4L, 5L, 63L, 64L, 65L, 1000L)
      .toDF("n").select(Profiling.pow2Bucket(col("n"))).as[Long].collect().toSeq
    assert(got === Seq(1L, 2L, 4L, 4L, 8L, 64L, 64L, 128L, 1024L))
  }

  test("lengthBuckets: counts, capacity and padding fraction") {
    val df = Seq(3L, 4L, 5L, 9L).toDF("t") // buckets: 4,4,8,16
    val got = Profiling.lengthBuckets(df, col("t"))
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (4L, 2L, 7L, 8L, 0.125),
      (8L, 1L, 5L, 8L, 0.375),
      (16L, 1L, 9L, 16L, 0.4375)))
  }

  test("sourceOverlap: asymmetric containment, distinct grams, short docs skipped") {
    val df = Seq(
      ("A", "one two three four"),       // grams: {one two three, two three four}
      ("B", "one two three"),            // grams: {one two three} — fully inside A
      ("C", "five six"),                 // < 3 tokens: no grams
      ("A", "one two three")             // dup gram within A — distinct-ed
    ).toDF("src", "text")
    val got = Profiling.sourceOverlap(df, col("src"), col("text"), n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // B ⊂ A: 1 shared gram / |B|=1 -> 1000 milli; A in B: 1 / |A|=2 -> 500
    assert(got(("A", "B")) === ((1L, 1000L)))
    assert(got(("B", "A")) === ((1L, 500L)))
    assert(!got.keySet.exists { case (a, b) => a == "C" || b == "C" })
  }

  test("noveltyCurve: first-occurrence attribution and running total") {
    val df = Seq(
      ("b1", "one two three four"),   // grams: one-two-three, two-three-four
      ("b2", "one two three five"),   // one-two-three old; two-three-five NEW
      ("b3", "one two three")         // nothing new
    ).toDF("b", "text")
    val got = Profiling.noveltyCurve(df, col("b"), col("text"), n = 3)
      .orderBy("batch").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("b1", 2L, 2L), ("b2", 1L, 3L)))
  }

  test("corpusDiff classifies added/removed/changed/unchanged") {
    val oldC = Seq((1L, "same"), (2L, "was"), (3L, "gone")).toDF("id", "t")
    val newC = Seq((1L, "same"), (2L, "now"), (4L, "fresh")).toDF("id", "t")
    val got = Profiling.corpusDiff(oldC, newC, col("id"), col("t"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("nucleusVocabulary: crossing token kept, nothing after") {
    // counts: a=5, b=3, c=2 (T=10); p=0.6 -> a (cum 5, before 0) kept,
    // b (before 5 < 6) kept and crosses, c (before 8 >= 6) dropped
    val df = Seq("a a a a a b b b c c").toDF("text")
    val got = Profiling.nucleusVocabulary(df, col("text"), permille = 600)
      .orderBy(col("cum")).as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 5L, 5L), ("b", 3L, 8L)))
  }

  test("winsorize: values clip into per-group percentile bounds") {
    val df = ((1 to 99).map(i => ("g", i.toLong)) :+ (("g", 100000L)))
      .toDF("grp", "v")
    val got = Profiling.winsorize(df, col("grp"), col("v"), 0.05, 0.95)
    val clipped = got.filter(col("v") === 100000L)
      .select("wins_value").as[Double].collect().head
    val hi = got.select("wins_hi").as[Double].collect().head
    assert(clipped === hi)       // outlier clamps to p95
    assert(hi < 100000.0 && hi > 90.0)
    val lo = got.select("wins_lo").as[Double].collect().head
    assert(got.filter(col("wins_value") < lo).count() === 0)
  }
}
