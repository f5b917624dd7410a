package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * LATE-INTERACTION re-rank — ColBERT's MaxSim (Khattab & Zaharia,
 * SIGIR 2020): queries and documents carry MULTI-VECTOR
 * representations (one embedding per token), and a candidate's score
 * is Σ over query tokens of the MAX cosine against any of the
 * document's token vectors — the standard quality step ABOVE
 * single-vector retrieval: a cheap first-stage tier (IVF / HNSW /
 * binary — any of the engine's stores) nominates top-N candidates,
 * and MaxSim re-ranks only those.
 *
 * Determinism (the L105 integer-milli discipline): each (query-token,
 * doc-token) cosine converts to `floor(cos·1000 + 0.5)` BEFORE the
 * max/sum — max and sum over integers are order-independent, so the
 * result hash-matches a DuckDB replay where float max-then-sum could
 * ulp-flip a tie.
 *
 * Scale shape: cost ∝ |candidates| · docTokens/doc · queryTokens/query
 * — the doc-token fetch is semi-join-restricted to candidate ids
 * (never a corpus scan; the corpus-scale work already happened in the
 * first stage), query tokens broadcast (|Q|-bounded), and the two
 * aggregations run on candidate-bounded frames.
 */
object LateInteraction {

  /**
   * MaxSim re-rank. `candidates`: (query_id, corpus_id) from any
   * first-stage tier. `docTokens`: one row per document token —
   * (docIdCol, vector col `tvec`). `queryTokens`: one row per query
   * token — (queryIdCol, token key `qpos`, vector col `qvec`).
   * Output (query_id, rank, corpus_id, maxsim_milli), rank 1..k by
   * (maxsim desc, corpus_id).
   */
  def maxSimRerank(candidates: DataFrame, docTokens: DataFrame,
                   queryTokens: DataFrame, k: Int,
                   docIdCol: String = "doc_id",
                   docVecCol: String = "tvec",
                   queryIdCol: String = "query_id",
                   queryPosCol: String = "qpos",
                   queryVecCol: String = "qvec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = candidates.select(col("query_id").cast("long"),
      col("corpus_id").cast("long"))
    val dt = docTokens.select(col(docIdCol).cast("long").as("corpus_id"),
      col(docVecCol).cast("array<double>").as("tvec"))
    val qt = queryTokens.select(col(queryIdCol).cast("long").as("query_id"),
      col(queryPosCol).cast("int").as("qpos"),
      col(queryVecCol).cast("array<double>").as("qvec"))
    // doc tokens for CANDIDATE ids only — the corpus never re-scans
    val fetched = dt.join(broadcast(cand.select("corpus_id").distinct()),
      Seq("corpus_id"), "left_semi")
    val pairs = cand.join(fetched, Seq("corpus_id"))
      .join(broadcast(qt), Seq("query_id"))
      .withColumn("cm", floor(
        Similarity.dot(col("qvec"), col("tvec")) /
          (Similarity.norm(col("qvec")) * Similarity.norm(col("tvec")))
          * lit(1000d) + lit(0.5d)).cast("long"))
    val perQtoken = pairs.groupBy(col("query_id"), col("corpus_id"),
        col("qpos"))
      .agg(max(col("cm")).as("m"))
    val scored = perQtoken.groupBy(col("query_id"), col("corpus_id"))
      .agg(sum(col("m")).as("maxsim_milli"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("maxsim_milli").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        col("maxsim_milli"))
  }
}
