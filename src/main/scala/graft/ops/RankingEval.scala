package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ranked-retrieval evaluation — the metrics a retriever/ranker is
 * tuned against (MRR, DCG/nDCG@k), computed at corpus scale from a
 * ranked result table. The retrieval eval loop of an embedding or
 * BM25 stack belongs next to the index that serves it: score a query
 * batch, join the judgments, aggregate the metrics — three shuffles,
 * all on the query key.
 *
 * Determinism: log2 discounts come from a PRECOMPUTED integer
 * micro-space table (1e6/log2(rank+1), a literal baked at compile
 * time — no runtime libm, so any engine reproduces the values
 * exactly); reciprocal rank is the integer milli 1000 div rank; nDCG
 * is one double division of two exact integers at the end
 * (correctly rounded everywhere).
 */
object RankingEval {

  /** 1e6 / log2(rank+1) for ranks 1..20, precomputed (floor). */
  val DiscountMicro: Seq[Long] = Seq(
    1000000L, 630929L, 500000L, 430676L, 386852L, 356207L, 333333L,
    315464L, 301029L, 289064L, 278942L, 270238L, 262649L, 255958L,
    250000L, 244650L, 239812L, 235408L, 231378L, 227670L)

  /**
   * ANN serving-quality metric (ann-benchmarks' recall@k): per query,
   * floor(|approx top-k ∩ exact top-k| · 1000 / k) in exact integer
   * milli space (exact when k divides 1000, floored otherwise — still
   * a pure integer function of the overlap, so bit-stable across
   * engines). `exact` and `approx` both carry (query_id, corpus_id)
   * rows for their top-k; queries with zero overlap still emit a row
   * (left join from the exact side, which by construction has every
   * query). One equi-join + one aggregation, both on the query key —
   * the truth set is |Q|·k rows, so corpus scale never enters. This
   * is the acceptance gate a quantized index (IVF/PQ/LSH) is tuned
   * against before it serves.
   */
  def annRecallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val overlap = exact.select(col("query_id"), col("corpus_id"))
      .join(approx.select(col("query_id"), col("corpus_id")),
        Seq("query_id", "corpus_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
    exact.select(col("query_id")).distinct()
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"),
        expr(s"(coalesce(n, 0L) * 1000) div $k").as("recall_milli"))
  }

  /**
   * TIER ARBITRATION at equal candidate budget — the executable form
   * of "RankingEval arbitrates" across the engine's ANN serving
   * tiers: every leg is one tier's answer frame (query_id, corpus_id)
   * produced under the SAME per-query candidate budget, and the
   * report emits one row per tier with the query-averaged recall@k
   * against the exact leg (integer milli, truncating division —
   * deterministic) and the candidates each tier scored. Feed it
   * exact / IVF-PQ / HNSW / binary answers over one corpus and the
   * table reads as the serving-tier decision: at this budget, which
   * tier buys how much recall. Output: (tier, avg_recall_milli,
   * candidates_scored), ordered by tier.
   */
  def tierReport(exact: DataFrame, legs: Seq[(String, DataFrame, Long)],
                 k: Int): DataFrame =
    legs.map { case (tier, approx, candidates) =>
      annRecallAtK(exact, approx, k)
        .agg(expr("sum(recall_milli) div count(1)").as("avg_recall_milli"))
        .select(lit(tier).as("tier"), col("avg_recall_milli"),
          lit(candidates).as("candidates_scored"))
    }.reduce(_ unionByName _).orderBy("tier")

  /**
   * Per-query metrics from a ranked frame carrying (queryCol,
   * rankCol 1-based, relCol boolean): n_rel in top-k, dcg_micro,
   * idcg_micro (ideal = all relevant first), ndcg_r (rounded 6),
   * rr_milli (1000 div first-relevant rank; 0 when nothing
   * relevant). One aggregation on the query key.
   */
  def evalRanked(ranked: DataFrame, query: Column, rank: Column,
                 rel: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= DiscountMicro.length,
      s"k in 1..${DiscountMicro.length}")
    val disc = array(DiscountMicro.take(k).map(lit): _*)
    val inK = ranked.filter(rank <= k)
      .select(query.as("query_id"), rank.as("__r"), rel.as("__rel"))
      .withColumn("__d", element_at(disc, col("__r").cast("int")))
    val perQ = inK.groupBy(col("query_id")).agg(
      sum(when(col("__rel"), 1L).otherwise(0L)).as("n_rel"),
      sum(when(col("__rel"), col("__d")).otherwise(0L)).as("dcg_micro"),
      min(when(col("__rel"), col("__r"))).as("__first"))
    // ideal DCG: the first n_rel discounts — a prefix sum over the
    // same literal table, selected by n_rel
    val prefix = DiscountMicro.take(k)
      .scanLeft(0L)(_ + _) // prefix(0)=0, prefix(i)=sum of first i
    val prefixArr = array(prefix.map(lit): _*)
    perQ
      .withColumn("idcg_micro",
        element_at(prefixArr, (col("n_rel") + 1).cast("int")))
      .withColumn("ndcg_r",
        when(col("idcg_micro") > 0,
          round(col("dcg_micro").cast("double") / col("idcg_micro"), 6))
          .otherwise(lit(0.0)))
      .withColumn("rr_milli",
        when(col("__first").isNotNull, expr("1000L div __first"))
          .otherwise(lit(0L)))
      .drop("__first")
  }
}
