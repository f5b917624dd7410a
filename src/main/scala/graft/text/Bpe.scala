package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed BPE (byte-pair-encoding) merge learning — the tokenizer-
 * training operator of an LLM data pipeline (Sennrich et al. 2016).
 * L108 of the extension set; the reference engine has no counterpart.
 *
 * Classical BPE trains on the WORD-FREQUENCY table, not the corpus:
 * the corpus-scale work is exactly one tokenize+count shuffle
 * ([[wordFrequencies]]); every merge round after that runs over the
 * distinct-word table (orders of magnitude smaller — ~10-100M rows at
 * 100 TB of text), so the sequential merge loop is cheap where it
 * must be sequential.
 *
 * Per round: adjacent-symbol pair counts (map-side explode of the
 * symbol arrays + one aggregation on the pair key), the argmax pair
 * (count desc, then lexicographic (a,b) — a total order, so the
 * learned merge table is deterministic), then a map-side left-to-right
 * non-overlapping merge fold over each word's symbols.
 * `localCheckpoint` after each round cuts the per-round lineage
 * growth (the Clustering.connectedComponents discipline).
 *
 * No end-of-word marker is appended (a production tokenizer adds one
 * symbol per word boundary; the merge math is unchanged).
 *
 * Round-1 pair counts are plain SQL — q146 oracles the top-20 against
 * DuckDB; the multi-round loop is unit-tested against an independent
 * single-machine reference implementation.
 */
object Bpe {

  /** (word, freq) from lowercased alnum tokenization — the only
    * corpus-scale pass (one shuffle on the word key). */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(expr(
        s"filter(split(lower(`$textCol`), '[^a-z0-9]+'), x -> x <> '')")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Character symbols of a word (regex-split keeps a trailing empty
    * string under limit -1 — filtered). */
  def charSymbols(word: Column): Column =
    filter(split(word, ""), x => x =!= lit(""))

  /** Adjacent-pair counts over a (syms: array<string>, freq) word
    * table: (a, b, cnt) summed with the word frequency as weight. */
  def pairCounts(words: DataFrame): DataFrame =
    words.select(col("freq"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Left-to-right non-overlapping merge of adjacent (a, b) into the
    * concatenated symbol — "aaa" under (a,a) becomes ["aa","a"], the
    * BPE apply rule. Pure map-side fold. */
  def mergeAdjacent(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) => {
      val last = element_at(acc, -1)
      when(size(acc) > 0 && last === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s)))
    })

  /** One learned merge: rank (1-based), the pair, its count when
    * chosen. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /**
   * Learn `numMerges` BPE merges from the corpus. Stops early when no
   * adjacent pair remains. The driver pulls ONE row per round (the
   * argmax pair) — the sequential dependency of the algorithm, not a
   * collect of data.
   */
  def learn(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1)
    var words = wordFrequencies(docs, textCol)
      .select(charSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var round = 1
    var exhausted = false
    while (round <= numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(round, a, b, c)
        val next = words
          .select(mergeAdjacent(col("syms"), a, b).as("syms"), col("freq"))
          .localCheckpoint()
        words.unpersist()
        words = next
        round += 1
      }
    }
    words.unpersist()
    out.toSeq
  }

  /** Apply an ordered merge list to one word's symbols (chained
    * folds — test/demo scale; [[encode]] is the production path and
    * this form is its parity reference). */
  def applyMerges(syms: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(syms)((c, m) => mergeAdjacent(c, m.left, m.right))

  /** PRODUCTION encoding: one fused kernel pass per word with the
    * merge table as a shared reference object
    * (graft.functions.BpeEncode) — the chained-fold form compiles one
    * interpreted aggregate() per merge and stops being viable around
    * tens of merges, let alone a 50k-merge vocabulary. Output is
    * identical for tables produced by [[learn]] (a learned pair's
    * symbols always pre-date pairs built from them, so min-rank
    * iteration and rank-order application agree — BpeSpec pins the
    * parity). */
  def encode(syms: Column, merges: Seq[Merge]): Column =
    graft.functions.BpeEncode.bpe_encode(syms,
      merges.sortBy(_.rank).map(m => (m.left, m.right)))
}
