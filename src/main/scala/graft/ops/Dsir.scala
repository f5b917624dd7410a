package graft.ops

import graft.util.Checkpoints.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
 * "Data Selection for Language Models via Importance Resampling").
 * Given a small TARGET corpus (the distribution you want — e.g.
 * curated wiki/books text) and the RAW crawl, score every raw
 * document by how target-like its hashed n-gram features are, then
 * keep the highest-scoring slice. This is the standard public recipe
 * for steering a 100 TB crawl toward a quality distribution without
 * training a classifier.
 *
 * Feature space: unigrams + bigrams hashed into `buckets` buckets
 * (the paper's hashed n-gram features). The hash must be replayable
 * cross-engine, so bucket(g) = first-8-md5-hex(g) mod buckets — md5
 * is md5 everywhere (the [[Sampling.hashFraction]] discipline).
 *
 * Scoring: the paper computes per-doc log p_target(x)/p_raw(x) under
 * bag-of-features bigram models. `ln` is libm-dependent (the
 * L105/L109 rule: last-ulp varies across engines), so the score is
 * the documented bit-stable surrogate — per bucket the add-one-
 * smoothed count RATIO in integer milli space,
 * `w(b) = ((c_target(b)+1) * 1000000) div (c_raw(b)+1)`, summed
 * exactly (BIGINT) over a doc's feature occurrences. The corpus-size
 * normalization constants of the true likelihood ratio multiply
 * EVERY bucket equally, so dropping them rescales all per-doc sums
 * by the same factor per feature count — the per-token average
 * (`dsir_avg`, one exact division at the end) ranks documents
 * identically to the normalized form and is what selection sorts on.
 *
 * Scale shape: both model fits are one map-side gram explode +
 * groupBy(bucket) collapsing to ≤ `buckets` rows; the weight table
 * (buckets rows, two ints) BROADCASTS onto the raw corpus's exploded
 * grams, so the only corpus-sized movement is the per-doc aggregate,
 * which partial-aggregates map-side on the doc key. The raw corpus
 * is never shuffled whole; it is tokenized+hashed ONCE into the
 * per-doc bucket-array form, which is materialized (lazy local
 * checkpoint) for the query's duration and feeds both the model fit
 * and the scoring pass (the
 * long arrays are more compact than the text they came from, so the
 * cache is cheaper than the second scan it replaces — the EXPLODED
 * gram stream would not be, which is why the cache sits before the
 * explode). The target corpus is scanned once.
 */
object Dsir {

  /** Hashed unigram+bigram feature buckets of a text column, as an
    * array column (one entry per gram occurrence, map-side only). */
  def featureBuckets(textCol: Column, buckets: Int): Column = {
    val toks = filter(split(lower(textCol), "[^a-z0-9]+"), t => t =!= lit(""))
    // staged token array -> unigrams ++ bigrams ("a b"), then the
    // md5-prefix bucket per gram; everything inside one projection
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    transform(concat(toks, bigrams), g =>
      pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"), lit(buckets)))
  }

  /** Per-bucket gram-occurrence counts of a corpus: (bucket, cnt),
    * ≤ `buckets` rows. One explode + one aggregation. */
  def bucketCounts(docs: DataFrame, textCol: String, buckets: Int): DataFrame =
    docs.select(explode(featureBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /**
   * Per-raw-doc DSIR score against a target corpus:
   * (id, n_grams, dsir_sum, dsir_avg). Higher = more target-like.
   */
  def importanceScores(raw: DataFrame, target: DataFrame, idCol: String,
                       textCol: String, buckets: Int = 512): DataFrame = {
    require(buckets > 0)
    // weight table: full outer over the two ≤buckets-row count frames
    // (a bucket seen only in one corpus still smooths to +1 on the
    // other side), positional toDF so the raw-side self-join below
    // gets fresh attributes
    // the RAW corpus feeds both the model fit and the scoring pass;
    // tokenize+hash ONCE into the per-doc bucket-array form and
    // materialize that for the query's duration (r17 optimization):
    // the md5-per-gram feature hash is the dominant per-pass cost,
    // and the array-of-longs frame is the COMPACT form (~8
    // bytes/gram, smaller than the text it came from — unlike the
    // exploded gram stream the scaladoc's earlier note rejected).
    // LAZY localCheckpoint, not persist, so no CacheManager
    // registration can rewrite unrelated queries' plans. At corpus
    // scale this trades one spill-to-disk write of the long arrays
    // for a full re-read + re-tokenize + re-md5 of the raw corpus.
    val bucketed = raw.select(col(idCol),
      featureBuckets(col(textCol), buckets).as("__fb")).cutLineage(false)
    val rawCounts = bucketed
      .select(explode(col("__fb")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val wtab = bucketCounts(target, textCol, buckets)
      .withColumnRenamed("cnt", "ct")
      .join(rawCounts.withColumnRenamed("cnt", "cr"),
        Seq("bucket"), "full_outer")
      .selectExpr("bucket",
        "((coalesce(ct, 0L) + 1L) * 1000000L) div (coalesce(cr, 0L) + 1L) AS w")
      .toDF("__wb", "__w")
    val grams = bucketed.select(col(idCol), explode(col("__fb")).as("__b"))
    grams.join(broadcast(wtab), col("__b") === col("__wb"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("__w")).as("dsir_sum"))
      .withColumn("dsir_avg",
        col("dsir_sum").cast("double") / col("n_grams"))
  }

  /**
   * DSIR selection: the `k` most target-like raw docs by
   * (dsir_avg desc, id) — deterministic total order, TakeOrdered
   * plan (no global sort materialization).
   */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
             textCol: String, k: Int, buckets: Int = 512): DataFrame =
    importanceScores(raw, target, idCol, textCol, buckets)
      .orderBy(col("dsir_avg").desc, col(idCol))
      .limit(k)
}
