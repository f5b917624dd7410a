package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** RRF: integer reciprocal-rank sums, absent-list docs contribute 0. */
class HybridSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two-list fusion: shared docs outrank single-list docs; integer math") {
    val lex = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("id", "rnk")
    val vec = Seq(("b", 1L), ("d", 2L), ("a", 3L)).toDF("id", "rnk")
    val got = HybridSearch.rrf(Seq(lex, vec), "id", "rnk")
      .as[(String, Long, Long)].collect().toSeq
    // scale=1e6, k0=60: r1=16393, r2=16129, r3=15873
    assert(got === Seq(
      ("b", 16129L + 16393L, 2L),  // 32522
      ("a", 16393L + 15873L, 2L),  // 32266
      ("d", 16129L, 1L),
      ("c", 15873L, 1L)))
  }

  test("single list degenerates to rank order") {
    val lex = Seq(("x", 1L), ("y", 2L)).toDF("id", "rnk")
    assert(HybridSearch.rrf(Seq(lex), "id", "rnk")
      .as[(String, Long, Long)].collect().toSeq
      === Seq(("x", 16393L, 1L), ("y", 16129L, 1L)))
  }
}
