package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * C4-style web-text cleaning (Raffel et al. 2020, §2.2 — the rules
 * behind the public C4 corpus). Two layers:
 *
 *  - LINE filter: keep only lines that end in terminal punctuation
 *    and have at least `minWords` words (drops nav bars, buttons,
 *    cookie banners — the fragments that dominate raw web text).
 *  - DOCUMENT filter: after line cleaning, drop docs containing
 *    "lorem ipsum" placeholder text, a curly brace (code), any term
 *    from a blocklist, or fewer than `minLines` surviving lines.
 *
 * Everything is a codegen'd per-row projection — shuffle-free; at
 * 100 TB this runs at scan speed and is the cheapest hygiene pass in
 * the pipeline, which is why C4 runs it FIRST, before any dedup
 * shuffle pays for text that was never going to survive.
 */
object C4Filters {

  /** Lines of `text` that end in terminal punctuation (. ! ? or a
    * closing quote after one) and carry at least `minWords`
    * whitespace-separated words. */
  def keptLines(text: Column, minWords: Int = 3): Column =
    filter(split(text, "\n"), l =>
      l.rlike("[.!?\"]\\s*$") &&
        size(filter(split(l, "\\s+"), w => w =!= lit(""))) >= lit(minWords))

  /**
   * Full C4 cleaning verdict per document. Output columns:
   * `clean_text` (newline-joined surviving lines), `n_lines_kept`,
   * and `drop_reason` (null = kept; else the FIRST failing rule in
   * C4's order: lorem_ipsum, brace, bad_word, too_few_lines).
   * The blocklist compiles to per-row scalar predicates — fine for
   * the word-list sizes C4 uses; a 10k+ list would move to a
   * broadcast join on exploded tokens.
   */
  /**
   * C4's CORPUS-GLOBAL line dedup (the "three-sentence span" rule
   * generalized to lines): every distinct line survives only at its
   * FIRST occurrence in (id, line-index) order; later copies — the
   * boilerplate/cookie-banner/footer lines that repeat across a crawl
   * — are cut from their documents. Documents keep their remaining
   * lines in order (possibly none).
   *
   * Output: (id, clean_text, n_lines_kept, n_lines).
   *
   * Scale shape: lines move ONCE to the md5(line)-key window (the
   * first-occurrence decision), then once more to the per-doc rebuild
   * aggregation — two line-volume shuffles, no self-join, no
   * collect. The rebuild keeps all-lines-dropped docs (empty
   * clean_text) because the aggregation groups every line row, kept
   * or not.
   */
  def dedupLinesAcross(docs: DataFrame, id: Column, textCol: Column): DataFrame = {
    val lines = docs.select(id.as("id"),
      posexplode(split(textCol, "\n")).as(Seq("idx", "line")))
    val w = Window.partitionBy(md5(col("line")))
      .orderBy(col("id"), col("idx"))
    lines
      .withColumn("__kept", row_number().over(w) === 1)
      .groupBy(col("id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__kept"),
            struct(col("idx").as("i"), col("line").as("l"))))),
          x => x.getField("l")), "\n").as("clean_text"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_lines_kept"),
        count(lit(1)).as("n_lines"))
  }

  def c4Clean(docs: DataFrame, textCol: Column, minWords: Int = 3,
              minLines: Int = 3, badWords: Seq[String] = Nil): DataFrame = {
    val kept = keptLines(textCol, minWords)
    val lower = org.apache.spark.sql.functions.lower(textCol)
    val badHit = badWords.foldLeft(lit(false)) {
      (acc, w) => acc || lower.contains(w.toLowerCase)
    }
    docs
      .withColumn("clean_text", array_join(kept, "\n"))
      .withColumn("n_lines_kept", size(kept).cast("long"))
      .withColumn("drop_reason",
        when(lower.contains("lorem ipsum"), "lorem_ipsum")
          .when(textCol.contains("{"), "brace")
          .when(badHit, "bad_word")
          .when(col("n_lines_kept") < minLines, "too_few_lines"))
  }
}
