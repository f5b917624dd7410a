package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: find training documents that share any
 * n-gram with an evaluation/benchmark set (the GPT-3-appendix /
 * "Deduplicating Training Data" style 8-to-13-gram overlap test).
 * Leaked eval data inflates benchmark scores; this operator is the
 * standard pre-training hygiene pass that finds the leaks.
 *
 * Shape at 100 TB: the benchmark side is SMALL (eval suites are
 * thousands of docs) — its distinct grams are broadcast, so the
 * corpus side is a map-only explode + broadcast-hash semi-join with
 * NO shuffle of corpus grams; the only shuffle is the final per-doc
 * count aggregation (partial map-side, tiny result). The corpus is
 * never self-joined and never collected.
 */
object Decontamination {

  /**
   * (doc_id, n_shared_grams) for every corpus document sharing at
   * least one n-gram with `bench`. Grams are `ApproxDedup.shingles`
   * word n-grams (documents shorter than n contribute one whole-doc
   * gram), distinct per document, so n_shared_grams counts DISTINCT
   * overlapping grams.
   */
  def sharedNgrams(corpus: DataFrame, corpusId: Column, corpusTokens: Column,
                   bench: DataFrame, benchTokens: Column, n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(array_distinct(ApproxDedup.shingles(benchTokens, n))).as("gram"))
      .distinct()
    val corpusGrams = corpus
      .select(corpusId.as("doc_id"),
        explode(array_distinct(ApproxDedup.shingles(corpusTokens, n))).as("gram"))
    corpusGrams.join(broadcast(benchGrams), "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /**
   * GRADED decontamination — [[sharedNgrams]] reports the leak
   * count, this reports the per-doc contamination DEGREE: the
   * fraction of a document's distinct n-grams that appear in the
   * benchmark set, plus the `contaminated` verdict at `tau`. The
   * binary any-overlap rule (PaLM/GPT-3 style) over-drops long
   * documents that share one boilerplate gram; the fraction is what
   * the Llama-style filters threshold on.
   *
   * Every corpus doc is returned (zero-overlap docs score 0.0).
   * Same scale shape as [[sharedNgrams]]: benchmark grams broadcast
   * with a hit marker, corpus grams LEFT-join them map-side, one
   * per-doc aggregation — the corpus never shuffles its text.
   */
  def overlapFraction(corpus: DataFrame, corpusId: Column, corpusTokens: Column,
                      bench: DataFrame, benchTokens: Column, n: Int = 8,
                      tau: Double = 0.05): DataFrame = {
    val benchGrams = bench
      .select(explode(array_distinct(ApproxDedup.shingles(benchTokens, n))).as("gram"))
      .distinct()
      .withColumn("__hit", lit(1L))
    corpus
      .select(corpusId.as("doc_id"),
        explode(array_distinct(ApproxDedup.shingles(corpusTokens, n))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_shared"))
      .withColumn("overlap_frac",
        col("n_shared").cast("double") / col("n_grams"))
      .withColumn("contaminated", col("overlap_frac") >= tau)
  }
}
