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

  /**
   * Per-domain boilerplate chrome strip (the RefinedWeb/Dolma
   * template-removal practice): the single most common FIRST line of
   * a domain, when it opens at least tauMilli/1000 of the domain's
   * docs, is template chrome (nav bar, site title, cookie banner) —
   * strip it from every doc it opens; the same rule applies to the
   * most common LAST line (footer). Unlike the C4 line filter, which
   * judges each line in isolation, this uses CROSS-DOC evidence: a
   * perfectly fluent sentence repeated atop 90% of a domain is
   * template, not content.
   *
   * chosen header/footer tie-breaks are deterministic ((count desc,
   * line asc) — engine-replayable); headers are stripped before
   * footers, each exactly once, as pure string arithmetic (prefix/
   * suffix length cuts — no regex, no escaping surprises).
   *
   * Shape at scale: one (domain, first_line) + one (domain,
   * last_line) aggregation with a per-domain argmax window (domain-
   * bounded partitions); the qualifying header/footer table is
   * |domains|-sized and BROADCAST back onto the corpus — documents
   * never shuffle. Returns the input plus `text_stripped`.
   */
  def stripDomainChrome(docs: DataFrame, srcCol: Column, textCol: Column,
                        tauMilli: Int = 500): DataFrame = {
    val spark = docs.sparkSession
    def pick(lineExpr: Column, outName: String): DataFrame = {
      val counts = docs.select(srcCol.as("__s"), lineExpr.as("__l"))
        .groupBy(col("__s"), col("__l")).agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(col("__s"))
        .orderBy(col("__c").desc, col("__l").asc)
      val wAll = Window.partitionBy(col("__s"))
      val top = counts
        .withColumn("__rn", row_number().over(w))
        .withColumn("__tot", sum(col("__c")).over(wAll))
        .filter(col("__rn") === 1 && col("__c") * 1000 >= col("__tot") * tauMilli)
        .select(col("__s"), col("__l").as(outName))
      // same lineage as the corpus it joins back onto — mint fresh ids
      spark.createDataFrame(top.rdd, top.schema)
    }
    val hdr = pick(element_at(split(textCol, "\\n"), 1), "__hdr")
      .toDF("__hs", "__hdr")
    val ftr = pick(element_at(split(textCol, "\\n"), -1), "__ftr")
      .toDF("__fs", "__ftr")
    val withHdr = docs
      .withColumn("__t0", textCol)
      .join(broadcast(hdr), srcCol === col("__hs"), "left")
      .withColumn("__t1",
        when(col("__hdr").isNotNull &&
            (col("__t0") === col("__hdr") ||
              col("__t0").startsWith(concat(col("__hdr"), lit("\n")))),
          expr("substring(__t0, length(__hdr) + 2)"))
          .otherwise(col("__t0")))
    withHdr
      .join(broadcast(ftr), srcCol === col("__fs"), "left")
      .withColumn("text_stripped",
        when(col("__ftr").isNotNull &&
            (col("__t1") === col("__ftr") ||
              col("__t1").endsWith(concat(lit("\n"), col("__ftr")))),
          // greatest(...,0): a doc that IS the footer strips to empty
          // in every engine (negative substring lengths differ)
          expr("substring(__t1, 1, greatest(length(__t1) - length(__ftr) - 1, 0))"))
          .otherwise(col("__t1")))
      .drop("__hs", "__hdr", "__fs", "__ftr", "__t0", "__t1")
  }
}
