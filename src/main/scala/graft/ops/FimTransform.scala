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

  /**
   * T5-style span corruption (Raffel et al. 2020 §3.1.4 — the
   * denoising pretraining objective next to [[fimSplit]]'s
   * infilling): ONE contiguous span per document (the distributed
   * engine's unit of corruption; the loader stacks more per
   * sequence) is cut out and replaced by a sentinel, and the target
   * sequence `<extra_id_0>span<extra_id_1>` is emitted alongside.
   * Span position derives from a salted md5 start point and
   * `spanFrac` of the document length — deterministic like
   * [[fimSplit]] (pure function of salt/id/len), shuffle-free.
   *
   * Adds `corrupted` and `target`.
   */
  def spanCorrupt(df: DataFrame, id: Column, text: Column,
                  spanFrac: Double = 0.15, salt: String = "t5"): DataFrame = {
    require(spanFrac > 0 && spanFrac < 1, s"spanFrac in (0,1): $spanFrac")
    val len = length(text)
    // exact integer span length: floor(len·frac) in per-mille space
    // (the products stay far below 2^53, so the floor of the double
    // division IS integer division), at least 1 char on non-empty docs
    val span = greatest(lit(1L),
      floor(len.cast("long") * lit((spanFrac * 1000).round) / lit(1000.0)).cast("long"))
    val start = hashInt(salt + "#s", id) % greatest(len.cast("long") - span + 1, lit(1L))
    val prefix = text.substr(lit(1), start.cast("int"))
    val middle = text.substr((start + 1).cast("int"), span.cast("int"))
    val suffix = text.substr((start + span + 1).cast("int"),
      (len.cast("long") - start - span).cast("int"))
    df.withColumn("corrupted",
        when(len === 0, text)
          .otherwise(concat(prefix, lit("<extra_id_0>"), suffix)))
      .withColumn("target",
        when(len === 0, lit(""))
          .otherwise(concat(lit("<extra_id_0>"), middle, lit("<extra_id_1>"))))
  }
}
