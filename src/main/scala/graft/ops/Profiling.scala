package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus profiling (L122): the distribution summaries a pipeline
 * operator reads before choosing chunk sizes, packing budgets and
 * quality thresholds. All are single-aggregation shapes — profile
 * cost never exceeds one corpus scan.
 */
object Profiling {

  /**
   * Equi-width histogram of a numeric column over [lo, hi):
   * (bucket, bucket_lo, bucket_hi, n). Out-of-range values clamp into
   * the edge buckets (the profile never silently drops rows). Bucket
   * arithmetic is plain double math from exact inputs — engine-
   * reproducible (q168 hash-matches).
   */
  def histogram(df: DataFrame, c: Column, lo: Double, hi: Double,
                buckets: Int): DataFrame = {
    require(buckets >= 1 && hi > lo)
    val width = (hi - lo) / buckets
    val b = least(lit(buckets - 1), greatest(lit(0),
      floor((c.cast("double") - lit(lo)) / lit(width)).cast("int")))
    df.groupBy(b.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_lo", lit(lo) + col("bucket") * lit(width))
      .withColumn("bucket_hi", lit(lo) + (col("bucket") + 1) * lit(width))
      .select(col("bucket").cast("long").as("bucket"),
        col("bucket_lo"), col("bucket_hi"), col("n"))
  }

  /** Per-group numeric five-figure summary (count/min/max/sum/mean) —
    * the stats line of a corpus profile report, one aggregation. */
  def groupSummary(df: DataFrame, grp: Column, c: Column): DataFrame =
    df.groupBy(grp.as("grp")).agg(
      count(lit(1)).as("n"),
      min(c).as("min_v"),
      max(c).as("max_v"),
      sum(c).as("sum_v"),
      (sum(c).cast("double") / count(lit(1))).as("mean_v"))

  /** Next power of two ≥ n (n ≥ 1), in exact integer space: 2 to the
    * bit length of n-1 (no log2 of the VALUE — the bit count comes
    * from the binary-string length both engines expose, and
    * pow(2, k) is IEEE-exact for every k that fits a long). */
  def pow2Bucket(n: Column): Column =
    when(n <= 1L, lit(1L))
      .otherwise(pow(lit(2.0), length(bin(n - 1L)).cast("int")).cast("long"))

  /**
   * Sequence-length bucketing — the batching-efficiency profile of a
   * tokenized corpus. Training loaders pad every sequence in a batch
   * to a common length; bucketing by power-of-two length bounds the
   * padding waste. Per bucket: document count, real token total, the
   * padded capacity (bucket · count), and the padding fraction the
   * loader would waste there. One aggregation; the padding math is
   * exact integers until the final division.
   */
  def lengthBuckets(df: DataFrame, tokens: Column): DataFrame =
    df.groupBy(pow2Bucket(tokens.cast("long")).as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens.cast("long")).as("total_tokens"))
      .withColumn("capacity", col("bucket") * col("n_docs"))
      .withColumn("padding_frac",
        (col("capacity") - col("total_tokens")).cast("double") / col("capacity"))

  /**
   * Cross-source duplication audit — the corpus-governance matrix
   * ("how much of source B already lives in source A"): for every
   * ordered source pair, the count and milli-fraction of B's
   * DISTINCT token n-grams that also occur in A. High containment of
   * B in A means B adds little novel text (a mirror, a scrape of the
   * same upstream, a repackaged dump) — the audit that decides
   * whether ingesting a new source is worth its tokens.
   *
   * Shape at scale: one explode → distinct on the (source, gram) key
   * (map-side partial dedup first); per-source gram totals ride the
   * same frame; then ONE aggregation to gram → source-set and a
   * MAP-SIDE pair expansion over each set (a gram in k sources emits
   * its k·(k-1) ordered pairs in place, k bounded by the source
   * count) — no gram-key self-join, the gram table crosses the wire
   * once instead of being joined against itself. Output contains
   * only ordered pairs that share at least one gram — a pair with
   * ZERO containment emits no row (consumers wanting a dense
   * |sources|² matrix left-join this against the source cross
   * product and coalesce missing cells to 0).
   */
  def sourceOverlap(df: DataFrame, src: Column, text: Column,
                    n: Int = 3): DataFrame = {
    require(n >= 1)
    // docs shorter than n tokens have no n-grams (sequence() with
    // start > stop counts DOWN in Spark — the empty-array case must
    // be explicit, not left to the bounds)
    val gramE =
      s"""CASE WHEN size(__tk) < $n THEN array()
         | ELSE transform(sequence(1, size(__tk) - ${n - 1}),
         |   i -> array_join(slice(__tk, i, $n), ' ')) END""".stripMargin
    val grams = df.select(src.as("__src"), text.as("__txt"))
      .select(col("__src"),
        expr("filter(split(lower(__txt), '[^a-z0-9]+'), x -> x <> '')").as("__tk"))
      .select(col("__src"), explode(expr(gramE)).as("__g"))
      .distinct()
    val totals = grams.groupBy(col("__src")).agg(count(lit(1)).as("__tot"))
    val shared = grams
      .groupBy(col("__g")).agg(collect_set(col("__src")).as("__ss"))
      .filter(size(col("__ss")) > 1)
      .select(explode(expr(
        """flatten(transform(__ss,
          | a -> transform(filter(__ss, b -> b != a),
          |   b -> struct(a AS a, b AS b))))""".stripMargin)).as("__p"))
      .groupBy(col("__p.a").as("src_a"), col("__p.b").as("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
    shared
      .join(broadcast(totals.toDF("__tsrc", "__tot")),
        col("src_b") === col("__tsrc"))
      .select(col("src_a"), col("src_b"), col("shared_grams"),
        expr("(shared_grams * 1000) div __tot").as("containment_b_milli"))
  }

  /**
   * N-gram novelty curve — the "is more of this source still adding
   * anything" accumulation diagnostic: per ordered ingest batch, how
   * many distinct token n-grams appear for the FIRST time in that
   * batch, plus the running vocabulary total. A flattening curve says
   * the source is exhausted (each new batch re-treads old text); the
   * per-batch novelty rate is what data-acquisition budgets are
   * steered by.
   *
   * Shape: one (gram → min(batch)) aggregation over the exploded
   * corpus (map-side partial min), then a count per first-batch and a
   * cumulative window over the BATCH frame — |batches| rows, the only
   * unpartitioned window in the plan, bounded by the batch count.
   */
  def noveltyCurve(df: DataFrame, batch: Column, text: Column,
                   n: Int = 3): DataFrame = {
    val gramE =
      s"""CASE WHEN size(__tk) < $n THEN array()
         | ELSE transform(sequence(1, size(__tk) - ${n - 1}),
         |   i -> array_join(slice(__tk, i, $n), ' ')) END""".stripMargin
    val firstSeen = df.select(batch.as("__b"), text.as("__txt"))
      .select(col("__b"),
        expr("filter(split(lower(__txt), '[^a-z0-9]+'), x -> x <> '')").as("__tk"))
      .select(col("__b"), explode(expr(gramE)).as("__g"))
      .groupBy(col("__g")).agg(min(col("__b")).as("__first"))
    val perBatch = firstSeen.groupBy(col("__first").as("batch"))
      .agg(count(lit(1)).as("novel_grams"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("batch"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perBatch.withColumn("cumulative_grams", sum(col("novel_grams")).over(w))
  }

  /**
   * Corpus snapshot diff — dataset versioning's `git status`: align
   * two corpus snapshots on the document key and classify every id
   * as added / removed / changed / unchanged by content fingerprint
   * (md5 — the L16 discipline, so the classification replays in any
   * engine). The release-note table between two training-data cuts,
   * and the input to incremental re-processing (only `added`+
   * `changed` need re-tokenization).
   *
   * Shape: ONE full-outer hash join on the id key with md5 computed
   * map-side on each branch — content never crosses the wire, only
   * (id, 128-bit fingerprint).
   */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
                 id: Column, content: Column): DataFrame = {
    val o = oldDf.select(id.as("__oid"), md5(content.cast("string")).as("__oh"))
    val n = newDf.select(id.as("__nid"), md5(content.cast("string")).as("__nh"))
    o.join(n, col("__oid") === col("__nid"), "full_outer")
      .select(
        coalesce(col("__oid"), col("__nid")).as("id"),
        when(col("__oid").isNull, "added")
          .when(col("__nid").isNull, "removed")
          .when(col("__oh") =!= col("__nh"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /**
   * [[corpusDiff]]'s per-SOURCE rollup — the release-notes table a
   * dataset version bump ships: added/removed/modified/unchanged
   * counts pivoted per source (REMOVED rows take the old snapshot's
   * source, ADDED the new). Same one-join fingerprint shape; the
   * pivot's four columns are a fixed value list, so the plan is a
   * plain conditional aggregation, not a second pass.
   */
  def corpusDiffBySource(oldSnap: DataFrame, newSnap: DataFrame,
                         key: String, source: String, fp: Column): DataFrame = {
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

  /**
   * Nucleus (top-p) vocabulary truncation — the tokenizer/LM vocab
   * cut: the smallest head of the frequency-sorted vocabulary whose
   * cumulative occurrence share reaches `permille`/1000 of corpus
   * tokens. Deterministic total order (count desc, token asc), exact
   * integer cumulative math: a token is kept iff the mass BEFORE it
   * is still short of the target (so the token that crosses the
   * threshold is included, nothing after it).
   *
   * The vocabulary-frame window is unpartitioned but |vocab|-bounded
   * (the unigramRarity discipline) — the corpus-sized work is the one
   * token-count aggregation.
   */
  def nucleusVocabulary(df: DataFrame, text: Column,
                        permille: Int): DataFrame = {
    require(permille >= 1 && permille <= 1000)
    val counts = df.select(text.as("__txt"))
      .select(explode(expr(
        "filter(split(lower(__txt), '[^a-z0-9]+'), x -> x <> '')")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    counts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("__tot", sum(col("cnt")).over(wAll))
      .filter((col("cum") - col("cnt")) * 1000 < col("__tot") * permille)
      .select(col("token"), col("cnt"), col("cum"))
  }

  /**
   * Winsorization — outlier clipping at per-group quantiles (the
   * score-normalization step before mixture weighting: one viral
   * 10M-char doc would otherwise dominate any mean-based budget).
   * Bounds are continuous-interpolation percentiles per group
   * (Spark `percentile` == DuckDB `quantile_cont`, the q229 parity);
   * the bounds frame is group-cardinality-sized and BROADCAST back —
   * the corpus never shuffles. Adds `wins_lo`, `wins_hi`, and the
   * clipped `wins_value`.
   */
  def winsorize(df: DataFrame, grp: Column, c: Column,
                lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi)
    // percentile on the Column itself (not a re-parsed name string),
    // so computed Columns and names needing backticks both work; the
    // null-safe join key keeps null-group rows — they clip against
    // their own (null-group) bounds instead of being dropped
    val bounds = df.groupBy(grp.as("__wg")).agg(
      percentile(c, lit(lo)).as("wins_lo"),
      percentile(c, lit(hi)).as("wins_hi"))
    df.join(broadcast(bounds), grp <=> col("__wg"))
      .withColumn("wins_value",
        greatest(least(c.cast("double"), col("wins_hi")), col("wins_lo")))
      .drop("__wg")
  }
}
