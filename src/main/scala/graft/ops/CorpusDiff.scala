package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot diff — the release-notes table a dataset version
 * bump ships with: between snapshot A and snapshot B, which documents
 * were ADDED, REMOVED, MODIFIED (same key, different content
 * fingerprint), or UNCHANGED, rolled up per source. One full-outer
 * join on the document key over (key, fingerprint) projections — the
 * frames never carry text into the shuffle, so the join moves
 * O(|corpus|) fingerprint rows, not bytes; at 100 TB both sides
 * bucket/sort on the same key and AQE handles the skewed sources.
 */
object CorpusDiff {

  /**
   * Per-source change rollup. `fp` is the content fingerprint column
   * expression (e.g. `md5(col("text"))`), evaluated against each
   * snapshot; `source` must exist in both (the REMOVED row's source
   * comes from the old snapshot, ADDED from the new).
   */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
           source: String, fp: Column): DataFrame = {
    val o = oldSnap.select(col(key).as("__k"), col(source).as("__so"),
      fp.as("__fo"))
    val n = newSnap.select(col(key).as("__k"), col(source).as("__sn"),
      fp.as("__fn"))
    o.join(n, Seq("__k"), "full_outer")
      .select(coalesce(col("__sn"), col("__so")).as("source"),
        when(col("__fo").isNull, lit("added"))
          .when(col("__fn").isNull, lit("removed"))
          .when(col("__fo") === col("__fn"), lit("unchanged"))
          .otherwise(lit("modified")).as("change"))
      .groupBy(col("source"))
      .pivot("change", Seq("added", "removed", "modified", "unchanged"))
      .agg(count(lit(1)))
      .na.fill(0L)
  }
}
