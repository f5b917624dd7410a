package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-based linear bag-of-words quality classifier — the
 * fastText-style "seed classifier" step of a pretraining pipeline
 * (label a small trusted seed, score the whole corpus, keep the
 * high-scoring tail; cf. GPT-3/LLaMA WebText-vs-CommonCrawl
 * filtering), with weights derived from Naive-Bayes class counts
 * instead of SGD so training is TWO aggregations and scoring is one
 * broadcast join — no iterative optimizer, no nondeterministic
 * float accumulation.
 *
 * Math, all in BIT-STABLE integer space (the q142/L109 discipline —
 * no libm, engine-replayable, DuckDB-oracle-able):
 *
 *  - per-class add-one-smoothed relative frequency in nano space:
 *    rf_c(t) = ((count_c(t) + 1) * 1e9) div (T_c + V)
 *    (T_c = class token total, V = vocabulary size; the 1e9 scale
 *    keeps three digits of precision even at trillion-token corpora,
 *    and because rf is a RATIO the weights are corpus-scale-free —
 *    no Long overflow at any corpus size, unlike the naive
 *    cross-multiplied likelihood ratio)
 *  - token weight = centered milli likelihood ratio:
 *    w(t) = (rf_pos(t) * 1000) div max(rf_neg(t), 1) - 1000
 *    — the first-order surrogate of the NB log-likelihood-ratio term
 *    (log x ≈ x - 1 around 1); monotone in the same evidence, exact
 *    integers end to end
 *  - doc score = Σ w(t) over token OCCURRENCES; score > 0 reads
 *    "looks like the positive seed".
 *
 * Shape at scale: the weight table is one token-key aggregation
 * (map-side partial); class totals ride an unpartitioned window over
 * the VOCABULARY frame (bounded by |vocab|, not the corpus — the
 * unigramRarity discipline); scoring joins occurrences to the weight
 * table on the token key (AQE broadcasts the weight side when it
 * fits; cap the vocabulary with minDf for pathological corpora) and
 * partial-aggregates per doc. The corpus never shuffles whole — only
 * (id, token) pairs move.
 */
object QualityClassifier {

  private def toks(docs: DataFrame, idCol: String, textCol: String,
                   extra: Column*): DataFrame =
    docs.select(col(idCol) +: extra :+ explode(expr(
      s"filter(split(lower(`$textCol`), '[^a-z0-9]+'), x -> x <> '')")).as("__t"): _*)

  /**
   * Train: (token, weight_milli) from a labeled frame. `label` must
   * be boolean (true = positive seed). Tokens seen fewer than
   * `minDf` times total are dropped — both a noise floor and the
   * weight-table size cap that keeps the scoring join broadcastable.
   */
  def tokenWeights(docs: DataFrame, idCol: String, textCol: String,
                   label: Column, minDf: Int = 1): DataFrame = {
    val t = toks(docs, idCol, textCol, label.as("__lab"))
    val counts = t.groupBy(col("__t")).agg(
      sum(when(col("__lab"), 1L).otherwise(0L)).as("__cp"),
      sum(when(col("__lab"), 0L).otherwise(1L)).as("__cn"))
      .filter(col("__cp") + col("__cn") >= minDf)
    // class totals + vocab size over the vocabulary frame (not a
    // corpus re-scan); single-partition window is bounded by |vocab|
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val withTotals = counts
      .select(col("__t"), col("__cp"), col("__cn"),
        sum(col("__cp")).over(w).as("__tp"),
        sum(col("__cn")).over(w).as("__tn"),
        count(lit(1)).over(w).as("__v"))
      .toDF("__wt", "__kcp", "__kcn", "__ktp", "__ktn", "__kv")
    val weights0 = withTotals.selectExpr(
      "__wt",
      """(((__kcp + 1L) * 1000000000L) div (__ktp + __kv)) * 1000L
        | div greatest(((__kcn + 1L) * 1000000000L) div (__ktn + __kv), 1L)
        | - 1000L AS weight_milli""".stripMargin.replace("\n", " "))
    // weights descend from the same scan as the scoring tokens — the
    // RDD round-trip mints fresh attribute ids for the self-join
    // (the unigramRarity barrier trick)
    docs.sparkSession.createDataFrame(weights0.rdd, weights0.schema)
  }

  /**
   * Score every doc against a trained weight table:
   * (id, n_tokens, score_milli). Out-of-vocabulary tokens contribute
   * 0 (they carry no evidence either way) but still count into
   * n_tokens, so scores stay comparable across docs.
   */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: DataFrame): DataFrame =
    toks(docs, idCol, textCol)
      .join(weights, col("__t") === col("__wt"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("weight_milli"), lit(0L))).as("score_milli"))

  /**
   * Classifier calibration: exact confusion counts and milli-space
   * precision/recall at each decision threshold — the table that
   * picks the corpus-filter operating point ("keep everything the
   * classifier scores above t" trades recall for precision). ONE
   * conditional aggregation over the scored frame, thresholds
   * exploded to rows AFTER the aggregate — no per-threshold re-scan,
   * so the sweep costs the same as a single count at any corpus
   * size.
   */
  def thresholdSweep(scored: DataFrame, score: Column, label: Column,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty)
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
      sum(when(score >= t && label, 1L).otherwise(0L)).as(s"__tp$i"),
      sum(when(score >= t && !label, 1L).otherwise(0L)).as(s"__fp$i"),
      sum(when(score < t && label, 1L).otherwise(0L)).as(s"__fn$i"),
      sum(when(score < t && !label, 1L).otherwise(0L)).as(s"__tn$i"))
    }
    scored.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(thresholds.zipWithIndex.map { case (t, i) =>
        struct(lit(t).as("threshold"),
          col(s"__tp$i").as("tp"), col(s"__fp$i").as("fp"),
          col(s"__fn$i").as("fn"), col(s"__tn$i").as("tn")) }: _*)).as("kv"))
      .select(col("kv.*"))
      .withColumn("precision_milli",
        when(col("tp") + col("fp") > 0, expr("(tp * 1000) div (tp + fp)"))
          .otherwise(lit(0L)))
      .withColumn("recall_milli",
        when(col("tp") + col("fn") > 0, expr("(tp * 1000) div (tp + fn)"))
          .otherwise(lit(0L)))
  }
}
