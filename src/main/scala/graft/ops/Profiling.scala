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
}
