package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ColBERT MaxSim: hand-computed scores, candidate-bounded fetch, and
  * the re-rank surfacing a token-level match single-vector cosine
  * buries. */
class LateInteractionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-computed MaxSim: per query token the max doc-token " +
      "cosine (integer milli), summed; ranks by (score desc, id)") {
    import spark.implicits._
    // doc 1: tokens along x and y; doc 2: tokens along y and z
    val docTokens = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0)), (2L, Seq(0.0, 0.0, 1.0))
    ).toDF("doc_id", "tvec")
    // query 9: one token along x, one along z
    val queryTokens = Seq(
      (9L, 0, Seq(1.0, 0.0, 0.0)), (9L, 1, Seq(0.0, 0.0, 1.0))
    ).toDF("query_id", "qpos", "qvec")
    val cand = Seq((9L, 1L), (9L, 2L)).toDF("query_id", "corpus_id")
    val got = LateInteraction.maxSimRerank(cand, docTokens, queryTokens, 2)
      .orderBy("rank")
      .select("rank", "corpus_id", "maxsim_milli")
      .as[(Int, Long, Long)].collect().toSeq
    // doc 1: qtoken x -> max(1, 0) = 1000; qtoken z -> max(0, 0) = 0 -> 1000
    // doc 2: qtoken x -> 0; qtoken z -> max(0, 1) = 1000 -> 1000
    // tie at 1000 -> corpus_id ascending
    assert(got === Seq((1, 1L, 1000L), (2, 2L, 1000L)))
  }

  test("a token-level match outranks a diffuse candidate, and only " +
      "candidate ids are scored (absent ids never surface)") {
    import spark.implicits._
    val docTokens = Seq(
      // doc 1 has an exact token hit for BOTH query tokens
      (1L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0)),
      // doc 2 is diffuse: equal small cosine to both
      (2L, Seq(0.5, 0.5, 0.5, 0.5)),
      // doc 3 would win but is NOT a candidate
      (3L, Seq(1.0, 0.0, 0.0, 0.0)), (3L, Seq(0.0, 1.0, 0.0, 0.0))
    ).toDF("doc_id", "tvec")
    val queryTokens = Seq(
      (7L, 0, Seq(1.0, 0.0, 0.0, 0.0)), (7L, 1, Seq(0.0, 1.0, 0.0, 0.0))
    ).toDF("query_id", "qpos", "qvec")
    val cand = Seq((7L, 1L), (7L, 2L)).toDF("query_id", "corpus_id")
    val got = LateInteraction.maxSimRerank(cand, docTokens, queryTokens, 3)
      .select("rank", "corpus_id").as[(Int, Long)].collect().toSeq.sorted
    assert(got === Seq((1, 1L), (2, 2L)))
  }
}
