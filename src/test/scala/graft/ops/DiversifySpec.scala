package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MMR diversification: hand-computed greedy trajectory, the planted
  * near-duplicate skipped, pure-relevance degeneration at λ=1000,
  * determinism, k rows per query. */
class DiversifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    .sortBy(t => (t._1, t._2)).toSeq

  test("hand-computed: the second pick skips a planted near-duplicate " +
      "of the first even though it is the second-most relevant; λ=1000 " +
      "degenerates to pure relevance order") {
    import spark.implicits._
    // query along x; d1 near x (best), d2 ≈ d1 (near-dup: mutual
    // cosine 1000 milli, above either's relevance), d3 off-axis but
    // novel (its sim to d1 ≈ its rel, so novelty costs it ~nothing)
    val corpus = Seq(
      (1L, Seq(0.9, 0.1, 0.0, 0.0)),
      (2L, Seq(0.89, 0.12, 0.0, 0.0)),
      (3L, Seq(0.7, 0.0, 0.7, 0.0))
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(1.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val cand = Seq((100L, 1L), (100L, 2L), (100L, 3L))
      .toDF("query_id", "corpus_id")
    val got = rows(Diversify.mmrTopK(cand, corpus, queries, k = 3,
      lambdaMilli = 500L))
    // rel: d1=994, d2=991, d3=707; sim(d1,d2)=1000, sim(d1,d3)=703 →
    // step 2: d2 scores 500·991−500·1000 = −4500, d3 scores
    // 500·707−500·703 = +2000 → d3 outranks the near-dup
    assert(got.map(_._3) === Seq(1L, 3L, 2L),
      s"MMR did not skip the planted near-duplicate: $got")
    val rel = rows(Diversify.mmrTopK(cand, corpus, queries, k = 3,
      lambdaMilli = 1000L))
    assert(rel.map(_._3) === Seq(1L, 2L, 3L),
      s"λ=1000 must degenerate to pure relevance: $rel")
  }

  test("k rows per query, rank 1 is the pure-relevance top pick, the " +
      "selection is deterministic across partitionings, and picks " +
      "never repeat") {
    val emb = graft.Tables.embeddings(spark, graft.TestSpark.sf)
      .filter(col("vec_id") < 150)
    val queries = emb.filter(col("vec_id") < 5)
    val cand = Similarity.bruteForceTopK(emb, queries, 16)
      .select("query_id", "corpus_id")
    val a = rows(Diversify.mmrTopK(cand, emb, queries, k = 5))
    val b = rows(Diversify.mmrTopK(cand.repartition(7), emb, queries,
      k = 5))
    assert(a === b, "partitioning changed the greedy trajectory")
    val byQ = a.groupBy(_._1)
    assert(byQ.size === 5)
    byQ.foreach { case (q, picks) =>
      assert(picks.length === 5, s"query $q did not fill k")
      assert(picks.map(_._3).distinct.length === 5,
        s"query $q repeated a pick")
    }
    // rank 1 == the relevance argmax (ties by id)
    val top1 = Similarity.bruteForceTopK(emb, queries, 1)
      .select("query_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    byQ.foreach { case (q, picks) =>
      assert(picks.find(_._2 == 1).get._3 === top1(q),
        s"query $q rank-1 is not the pure-relevance top")
    }
  }
}
