package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankingEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed MRR and nDCG on a tiny ranking") {
    // q1: rel at ranks 2 and 3 of 3; q2: nothing relevant
    val ranked = Seq(
      ("q1", 1, false), ("q1", 2, true), ("q1", 3, true),
      ("q2", 1, false), ("q2", 2, false)
    ).toDF("q", "r", "rel")
    val got = RankingEval.evalRanked(ranked, col("q"), col("r"), col("rel"), 3)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4), x.getLong(5))))
      .toMap
    // dcg = 630929 + 500000 = 1130929; idcg = 1000000 + 630929 = 1630929
    val ndcg = BigDecimal(1130929.0 / 1630929.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("q1") === ((2L, 1130929L, 1630929L, ndcg, 500L)))
    assert(got("q2") === ((0L, 0L, 0L, 0.0, 0L)))
  }

  test("perfect ranking scores nDCG 1.0 and MRR 1000") {
    val ranked = Seq(("q", 1, true), ("q", 2, true), ("q", 3, false))
      .toDF("q", "r", "rel")
    val row = RankingEval.evalRanked(ranked, col("q"), col("r"), col("rel"), 3)
      .collect().head
    assert(row.getDouble(4) === 1.0)
    assert(row.getLong(5) === 1000L)
  }

  test("annRecallAtK: exact milli overlap, zero-overlap queries kept") {
    // truth: q1 -> {a,b}, q2 -> {c,d}; approx: q1 -> {a,x} (1/2),
    // q2 -> {y,z} (0/2) — the zero-overlap query must still emit a row
    val exact = Seq(("q1", "a"), ("q1", "b"), ("q2", "c"), ("q2", "d"))
      .toDF("query_id", "corpus_id")
    val approx = Seq(("q1", "a"), ("q1", "x"), ("q2", "y"), ("q2", "z"))
      .toDF("query_id", "corpus_id")
    val got = RankingEval.annRecallAtK(exact, approx, k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("q1" -> 500L, "q2" -> 0L))
    // non-divisor k floors (1/3 -> 333 milli) — still pure integer math
    val k3 = RankingEval.annRecallAtK(exact, approx, k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(k3 === Map("q1" -> 333L, "q2" -> 0L))
  }

  test("tierReport: one row per tier with query-averaged recall " +
      "(integer milli, truncating) and the leg's candidate budget") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "corpus_id")
    // legA: q1 hits both (1000), q2 hits one of two (500) -> avg 750
    val legA = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 99L))
      .toDF("query_id", "corpus_id")
    // legB: nothing -> 0
    val legB = Seq((1L, 98L), (2L, 99L)).toDF("query_id", "corpus_id")
    val got = RankingEval.tierReport(exact,
        Seq(("a", legA, 7L), ("b", legB, 3L)), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("a", 750L, 7L), ("b", 0L, 3L)))
  }
}
