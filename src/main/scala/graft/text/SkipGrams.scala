package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skip-gram training-pair extraction (Mikolov et al. 2013 — the
 * word2vec/fastText data-prep step): every (center, context) token
 * pair within a ±window span, aggregated to (center, context, cnt).
 * An embedding trainer consumes exactly this co-occurrence table; at
 * corpus scale the extraction is the expensive half of word2vec and
 * the half that belongs on the cluster.
 *
 * Shape: pair generation is ONE nested-transform array expression per
 * row (flatten of per-position context slices) — map-side, no join,
 * no per-position shuffle; the only exchange is the final
 * (center, context) count aggregation, which partial-aggregates
 * map-side. A 10k-token doc emits ≤ 2·w·10k pairs from its own task.
 *
 * Pairs are direction-sensitive ((a,b) at offset +1 and (b,a) at
 * offset -1 both emit, matching word2vec's symmetric-window
 * training); self-pairs from repeated tokens at different positions
 * are real co-occurrences and stay.
 */
object SkipGrams {

  def pairs(docs: DataFrame, textCol: String, window: Int = 2): DataFrame = {
    require(window >= 1)
    val pairsE =
      s"""flatten(transform(sequence(0, size(__tk) - 1), i ->
         |  transform(
         |    filter(sequence(greatest(i - $window, 0),
         |                    least(i + $window, size(__tk) - 1)),
         |           j -> j != i),
         |    j -> struct(__tk[i] AS c, __tk[j] AS x))))""".stripMargin
    docs
      .select(expr(s"filter(split(lower(`$textCol`), '[^a-z0-9]+'), x -> x <> '')").as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(explode(expr(pairsE)).as("__p"))
      .groupBy(col("__p.c").as("center"), col("__p.x").as("context"))
      .agg(count(lit(1)).as("cnt"))
  }
}
