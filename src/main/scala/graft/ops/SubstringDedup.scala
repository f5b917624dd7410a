package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * EXACT cross-document substring deduplication — the "dedup the
 * repeated spans, not the whole document" operator of large-corpus
 * training pipelines (Lee et al. 2022, "Deduplicating Training Data
 * Makes Language Models Better": any substring appearing more than
 * once in the corpus is removed from all-but-one... here, from every
 * occurrence's covered tokens, the streaming-friendly variant).
 *
 * The reference engine has no counterpart (its dedup family is
 * whole-document, SURVEY §2.5); this is L106 of the LLM-pipeline
 * extension set.
 *
 * Algorithm (suffix arrays are a single-machine luxury; the
 * Spark-shaped equivalent is window fingerprinting):
 *
 *  1. tokenize each document (single-space split — the corpus
 *     tokenizer of the `documents` table) and form all `k`-token
 *     windows map-side with the fused shingle kernel (no per-window
 *     string slicing, graft.functions.StringShingles);
 *  2. count every window's corpus-wide occurrences with ONE hash
 *     shuffle on the window string (`count over partitionBy(gram)` —
 *     no self-join, the partitioning IS the group);
 *  3. a window occurring >= minOccurrences marks its k start..start+k-1
 *     token positions as duplicated; per document the sorted start
 *     list collapses into disjoint covered spans (map-side fold);
 *  4. rebuild the cleaned text by dropping covered tokens (map-side
 *     indexed filter over the token array).
 *
 * Scale shape: the only corpus-sized movement is the window-key
 * shuffle (payload ≈ k× the text, the price of exactness —
 * `hashedKeys = true` swaps the gram string for a 128-bit fingerprint
 * to cut it k× when probabilistic equality is acceptable; at 64 bits
 * the corpus-wide collision odds at 1e12 windows are ~3%, at 128 bits
 * negligible). The span fold and
 * text rebuild never shuffle; the per-doc start lists are bounded by
 * tokens/1 and collapse to <= tokens/k disjoint spans before the
 * per-token exists() probe, keeping the rebuild O(tokens·spans/k)
 * instead of O(tokens²).
 *
 * Windows are EXACT strings, so the operator is fully
 * DuckDB-oracle-checkable (q144) — no hash family to replicate.
 */
object SubstringDedup {

  /** Disjoint inclusive [s,e] coverage spans from a SORTED array of
    * window starts, each covering [s, s+k-1]; overlapping/adjacent
    * spans merge (same covered set, smaller array). */
  private def mergeSpans(starts: Column, k: Int): Column = {
    val empty = array().cast("array<struct<s:int,e:int>>")
    aggregate(starts, empty, (acc, s) => {
      val last = element_at(acc, -1)
      val grown = struct(last("s").as("s"),
        greatest(last("e"), s + (k - 1)).as("e"))
      val fresh = struct(s.as("s"), (s + (k - 1)).as("e"))
      when(size(acc) === 0, array(fresh))
        .when(s <= last("e") + 1,
          concat(slice(acc, lit(1), size(acc) - 1), array(grown)))
        .otherwise(concat(acc, array(fresh)))
    })
  }

  /**
   * Per-document duplicated-span removal over `textCol` (single-space
   * tokens): returns one row per input row with
   * (idCol, n_tokens, n_dup_tokens, text_deduped) where a token is
   * duplicated iff some k-token window containing it occurs >=
   * `minOccurrences` times corpus-wide (within-document repeats
   * count). Documents shorter than k tokens have no windows and are
   * never touched.
   */
  def dropDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                          k: Int = 5, minOccurrences: Int = 2,
                          hashedKeys: Boolean = false): DataFrame = {
    require(k >= 1 && minOccurrences >= 2)
    val base = docs
      .select(col(idCol).as("sd_id"), split(col(textCol), " ").as("sd_toks"))
    // guard the kernel's n<k degradation (whole-array shingle): short
    // docs must contribute NO windows, mirroring the k-gram definition
    val grams = base.withColumn("sd_grams",
      when(size(col("sd_toks")) >= k,
        ApproxDedup.shingles(col("sd_toks"), k))
        .otherwise(array().cast("array<string>")))

    // `hashedKeys` is the documented PRODUCTION swap: the shuffle
    // carries a 128-bit window fingerprint (two independent 64-bit
    // hashes — the gram string never leaves its partition) instead of
    // the k-token string, cutting the shuffle payload ~k×. Collision
    // odds at 1e12 windows are ~2^-49 — probabilistic equality the
    // oracle path (exact strings, q144) doesn't need.
    val key: Column => Column =
      if (hashedKeys) g => struct(xxhash64(g), xxhash64(lit("sd2"), g))
      else identity
    val windows = grams
      .select(col("sd_id"), posexplode(col("sd_grams")).as(Seq("sd_pos", "sd_gram")))
      .select(col("sd_id"), col("sd_pos"), key(col("sd_gram")).as("sd_key"))
    val dupStarts = windows
      .withColumn("sd_n", count(lit(1)).over(Window.partitionBy("sd_key")))
      .filter(col("sd_n") >= minOccurrences)
      .groupBy("sd_id")
      .agg(sort_array(collect_list(col("sd_pos"))).as("sd_starts"))

    grams.join(dupStarts, Seq("sd_id"), "left")
      .withColumn("sd_cut", graft.functions.SpanCut.span_cut(
        col("sd_toks"),
        coalesce(col("sd_starts"), array().cast("array<int>")), k))
      .select(
        col("sd_id").as(idCol),
        size(col("sd_toks")).cast("long").as("n_tokens"),
        col("sd_cut")("n_dup").cast("long").as("n_dup_tokens"),
        col("sd_cut")("text_deduped").as("text_deduped"))
  }

  /** The composable formulation of the span-cut tail (fold-merged
    * disjoint spans + per-token exists probe) — retained as the
    * parity reference for the fused kernel (SpanCutSpec checks the
    * two agree on adversarial inputs). */
  private[ops] def composableCut(toks: Column, starts: Column, k: Int): Column = {
    val spans = mergeSpans(starts, k)
    val kept = filter(toks, (t, i) =>
      !exists(spans, sp => sp("s") <= i && i <= sp("e")))
    struct(
      (size(toks) - size(kept)).as("n_dup"),
      array_join(kept, " ").as("text_deduped"))
  }
}
