package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Hybrid-retrieval rank fusion: combine ranked candidate lists from
 * heterogeneous retrievers (BM25 lexical, embedding ANN, ...) without
 * comparing their incommensurable scores — Reciprocal Rank Fusion
 * (Cormack, Clarke & Buettcher, SIGIR 2009), the default hybrid
 * combiner in modern search stacks (and Solr 9.8's "combiner").
 *
 *   rrf(d) = Σ_lists 1 / (k0 + rank_list(d))
 *
 * evaluated in INTEGER space (`scale div (k0 + rank)`, default scale
 * 10⁶) per the engine's bit-parity discipline — float reciprocals
 * would hash-differ across engines in ties near the rounding edge.
 *
 * Scale shape: input lists are top-k candidate sets (bounded by
 * construction), so the fuse is a union + one groupBy on the id of
 * strictly bounded frames — never corpus-sized. The retrievers
 * themselves carry the corpus-scale cost and their own 100 TB design
 * (postings pushdown for lexical, LSH/IVF for vectors).
 */
object HybridSearch {

  /**
   * Fuse ranked lists, each holding `idCol` and a 1-based `rankCol`.
   * Output: (idCol, rrf_score, n_lists), rrf_score descending then id
   * — a document absent from a list contributes nothing for it.
   */
  def rrf(lists: Seq[DataFrame], idCol: String, rankCol: String,
          k0: Int = 60, scale: Long = 1000000L): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    val parts = lists.map(_.select(
      col(idCol),
      expr(s"${scale}L div (${k0}L + CAST($rankCol AS BIGINT))").as("__part")))
    parts.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__part")).as("rrf_score"),
        count(lit(1)).cast("long").as("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
  }

  /**
   * The BATCHED fuse (round 17): each list additionally carries
   * `keyCol` (the request id), and fusion groups by (key, id) — N
   * requests' lists fuse in ONE union + ONE groupBy over frames
   * bounded by |requests|·topN. Per-key results are identical to
   * [[rrf]] run per request (HybridSearchSpec locks the equivalence).
   * Output: (keyCol, idCol, rrf_score, n_lists), ordered (key,
   * rrf_score desc, id).
   */
  def rrfKeyed(lists: Seq[DataFrame], keyCol: String, idCol: String,
               rankCol: String, k0: Int = 60,
               scale: Long = 1000000L): DataFrame = {
    require(lists.nonEmpty, "rrfKeyed needs at least one ranked list")
    val parts = lists.map(_.select(
      col(keyCol), col(idCol),
      expr(s"${scale}L div (${k0}L + CAST($rankCol AS BIGINT))").as("__part")))
    parts.reduce(_ unionByName _)
      .groupBy(col(keyCol), col(idCol))
      .agg(sum(col("__part")).as("rrf_score"),
        count(lit(1)).cast("long").as("n_lists"))
      .orderBy(col(keyCol).asc, col("rrf_score").desc, col(idCol).asc)
  }
}
