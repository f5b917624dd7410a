package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Preference-pair assembly — the RLHF/DPO data-prep step: from many
 * scored candidates per prompt, emit one (chosen, rejected) pair per
 * prompt with its score margin. A DPO/reward-model loader consumes
 * exactly this shape (Rafailov et al. 2023); upstream the "score" is
 * a reward-model output or human rating, here it is any numeric
 * column.
 *
 * chosen = argmax(score) (ties → lowest id: deterministic,
 * engine-replayable), rejected = argmin(score) (ties → highest id,
 * so a 2-candidate tie never pairs a row with itself). Prompts with
 * fewer than two candidates are dropped — there is nothing to
 * prefer.
 *
 * Shape at scale: both extremes ride ONE hash exchange on the prompt
 * key (two window sorts over the same partitioning — Catalyst plans
 * one Exchange, two Sort/Window nodes), then a per-prompt aggregate
 * collapses the marked rows. No self-join of the candidate table, no
 * all-pairs: a prompt with k candidates costs k log k sort work, not
 * k².
 */
object Preference {

  def pairs(df: DataFrame, prompt: Column, id: Column, score: Column): DataFrame = {
    df.select(prompt.as("prompt"), id.as("__id"), score.as("__s"))
      .withColumn("__rb", row_number().over(
        Window.partitionBy(col("prompt")).orderBy(col("__s").desc, col("__id").asc)))
      .withColumn("__rw", row_number().over(
        Window.partitionBy(col("prompt")).orderBy(col("__s").asc, col("__id").desc)))
      .groupBy(col("prompt"))
      .agg(
        max(when(col("__rb") === 1, col("__id"))).as("chosen_id"),
        max(when(col("__rb") === 1, col("__s"))).as("chosen_score"),
        max(when(col("__rw") === 1, col("__id"))).as("rejected_id"),
        max(when(col("__rw") === 1, col("__s"))).as("rejected_score"),
        count(lit(1)).as("n_candidates"))
      .filter(col("n_candidates") >= 2)
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
  }
}
