package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fill-in-the-middle (FIM) pretraining transform (Bavarian et al.
 * 2022, "Efficient Training of Language Models to Fill in the
 * Middle"): with probability `rate` a document is split at two
 * uniform cut points into (prefix, middle, suffix) and re-emitted
 * with sentinels in PSM order — `<PRE>prefix<SUF>suffix<MID>middle` —
 * so the model learns infilling; the rest pass through unchanged.
 *
 * Determinism (the whole point of doing this in the engine): the
 * keep/transform coin is the md5-lexicographic fraction used by every
 * sampler here ([[Sampling.hashFraction]]), and the two cut points
 * derive from salted md5 prefixes mod (len+1) — a pure function of
 * (salt, id, text length), reproducible across engines, runs and
 * retries (a wall-clock RNG would re-split every retry and poison
 * cache/exactly-once sinks). Shuffle-free: one codegen'd projection.
 */
object FimTransform {

  private def hashInt(salt: String, id: Column): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /**
   * Adds `mode` ("psm" | "plain") and `fim_text`. Cut points cover
   * the full [0, len] range; empty segments are legal (Solr-style
   * degenerate splits keep the sentinel structure — the paper keeps
   * them too, they teach edge infilling).
   */
  def fimSplit(df: DataFrame, id: Column, text: Column,
               rate: Double = 0.5, salt: String = "fim"): DataFrame = {
    val coin = Sampling.hashFraction(id, salt) < rate
    val len = length(text)
    val a = hashInt(salt + "#a", id) % (len + 1)
    val b = hashInt(salt + "#b", id) % (len + 1)
    val lo = least(a, b)
    val hi = greatest(a, b)
    val prefix = text.substr(lit(1), lo)
    val middle = text.substr(lo + 1, hi - lo)
    val suffix = text.substr(hi + 1, len - hi)
    df.withColumn("mode", when(coin, "psm").otherwise("plain"))
      .withColumn("fim_text",
        when(coin, concat(lit("<PRE>"), prefix, lit("<SUF>"), suffix,
          lit("<MID>"), middle)).otherwise(text))
  }
}
