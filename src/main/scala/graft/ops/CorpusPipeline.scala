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
 * column in a books corpus). With `observe = true`, each stage's
 * output frame carries a named `observe` (row count) — the metrics
 * ride whatever action the caller runs, no second pass; read them
 * from `QueryExecutionListener` / `observedMetrics` under
 * `<observePrefix><stage>` for stages `quality`, `url_dedup`,
 * `exact_dedup`, `near_dedup`. Opt-in because Spark requires
 * observation names to be unique within a query: two `prepare` calls
 * unioned into one plan need distinct prefixes.
 *
 * NOTE `exactDedup = false` + near-dup enabled: the LSH stage's
 * degenerate-bucket cap drops over-cap buckets entirely (see
 * [[ApproxDedup.dropNearDuplicates]]) — without the exact pass, a
 * >10k swarm of near-identical docs is kept in full. Keep exact
 * dedup on (the default) when near-dedup recall matters.
 */
object CorpusPipeline {

  final case class Config(
      minQualityTokens: Int = 5,
      canonicalize: Boolean = false, // Unicode NFC + control strip + ws collapse (stage 0)
      redactPii: Boolean = true,
      urlCol: Option[String] = None,
      exactDedup: Boolean = true,
      nearDedupThreshold: Option[Double] = Some(0.8),
      chunkSize: Int = 0, // 0 = no chunking, keep whole docs
      chunkStride: Int = 0,
      observe: Boolean = false,
      observePrefix: String = "graft_corpus_")

  /** The pipeline's intermediate frames — [[prepare]] returns the last
    * one; [[auditDrops]] anti-joins consecutive pairs. A disabled
    * stage reuses the previous frame reference (eq-skippable). */
  private[ops] final case class StageFrames(
      input: DataFrame, afterQuality: DataFrame, afterUrl: DataFrame,
      afterExact: DataFrame, afterNear: DataFrame)

  /**
   * Run the pipeline over `docs` (must carry `idCol` and `textCol`).
   * Returns the cleaned corpus — or, when `chunkSize > 0`, the
   * chunked training windows (doc_id, chunk_start, n_chunk_tokens,
   * chunk_text).
   */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
              cfg: Config = Config()): DataFrame = {
    val frames = stageFrames(docs, idCol, textCol, cfg)
    val id = col(idCol)
    val text = col(textCol)
    val tokens = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    if (cfg.chunkSize > 0) {
      val stride = if (cfg.chunkStride > 0) cfg.chunkStride else cfg.chunkSize
      Chunking.chunkTokens(
        frames.afterNear.select(id, tokens.as("__toks")), id, col("__toks"),
        cfg.chunkSize, stride)
    } else frames.afterNear
  }

  /**
   * Provenance audit (L113): one (id, stage) row per document the
   * pipeline DROPPED, tagged with the stage that dropped it —
   * `quality` / `url_dedup` / `exact_dedup` / `near_dedup`. The data-
   * lineage answer to "where did my corpus go": stage retention
   * curves, per-source attrition joins, dropped-doc exports all read
   * straight off this frame. Each stage's drops are one left-anti
   * join between consecutive stage frames — ids only, never document
   * bodies; disabled stages contribute nothing.
   */
  def auditDrops(docs: DataFrame, idCol: String, textCol: String,
                 cfg: Config = Config()): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)
    // The deterministic stages (quality, url, exact) audit in ONE
    // lineage: per-doc flags + a row_number window per enabled dedup
    // stage, each computed over the previous stage's survivors — the
    // frame-pair anti-join form re-evaluated the quality regex chain
    // once per pair side (3× the corpus scan; the q154 10×-data
    // constant). Windows mirror stageFrames' keepMinId exactly
    // (same key, same id-asc order), so the drop sets are identical.
    val canon =
      if (cfg.canonicalize) docs.withColumn(textCol, TextAnalysis.canonicalText(text))
      else docs
    val quality = TextAnalysis.qualityColumns(text).toMap
    val flagged = canon.withColumn("__q",
      quality("n_tokens") >= cfg.minQualityTokens &&
        quality("mean_word_len") >= 2.0 && quality("mean_word_len") <= 12.0 &&
        quality("punct_ratio") <= 0.3)
    val qualityDrops = flagged.filter(!col("__q"))
      .select(id, lit("quality").as("stage"))
    val kept = flagged.filter(col("__q"))
    val redacted =
      if (cfg.redactPii) kept.withColumn(textCol, Redaction.redactPii(text))
      else kept
    def rn(df: DataFrame, key: Column): Column =
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(key).orderBy(id.asc))
    val (urlDrops, urlWinners) = cfg.urlCol match {
      case Some(u) =>
        val ranked = redacted.withColumn("__rn",
          rn(redacted, UrlNormalize.canonicalizeUrl(col(u))))
        (Some(ranked.filter(col("__rn") > 1)
          .select(id, lit("url_dedup").as("stage"))),
          ranked.filter(col("__rn") === 1).drop("__rn"))
      case None => (None, redacted)
    }
    val (exactDrops, exactWinners) =
      if (cfg.exactDedup) {
        val ranked = urlWinners.withColumn("__rn",
          rn(urlWinners, TextAnalysis.fingerprint(text)))
        (Some(ranked.filter(col("__rn") > 1)
          .select(id, lit("exact_dedup").as("stage"))),
          ranked.filter(col("__rn") === 1).drop("__rn"))
      } else (None, urlWinners)
    // the LSH stage's losers are not expressible as a flag — one
    // ids-only anti-join against the near-dedup output
    val nearDrops = cfg.nearDedupThreshold.map { t =>
      val tokens = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
      exactWinners.select(id)
        .join(ApproxDedup.dropNearDuplicates(exactWinners, id, tokens, threshold = t)
          .select(id), Seq(idCol), "left_anti")
        .withColumn("stage", lit("near_dedup"))
    }
    (Seq(Some(qualityDrops), urlDrops, exactDrops, nearDrops).flatten)
      .reduce(_ unionByName _)
  }

  private def stageFrames(docs: DataFrame, idCol: String, textCol: String,
                          cfg: Config): StageFrames = {
    val id = col(idCol)
    val text = col(textCol)
    // per-stage row-count metric riding the caller's action (no extra
    // job); no-op unless cfg.observe — see the object scaladoc
    def staged(df: DataFrame, stage: String): DataFrame =
      if (cfg.observe) df.observe(cfg.observePrefix + stage, count(lit(1)).as("rows"))
      else df

    // 1. quality gate — the standard cheap signals with the token
    // floor configurable in BOTH directions: the composite
    // quality("keep") flag hard-codes its own n_tokens >= 5, so it is
    // rebuilt here from the component columns with cfg's floor
    // (otherwise minQualityTokens < 5 would be silently ineffective)
    // 0. optional Unicode canonicalization (NFC + control strip + ws
    // collapse) so byte-level variants of identical text collapse in
    // the dedup stages below
    val canon =
      if (cfg.canonicalize) docs.withColumn(textCol, TextAnalysis.canonicalText(text))
      else docs
    val quality = TextAnalysis.qualityColumns(text).toMap
    val kept = staged(canon.filter(
      quality("n_tokens") >= cfg.minQualityTokens &&
        quality("mean_word_len") >= 2.0 && quality("mean_word_len") <= 12.0 &&
        quality("punct_ratio") <= 0.3), "quality")

    // 2. PII redaction (pure projection)
    val redacted =
      if (cfg.redactPii) kept.withColumn(textCol, Redaction.redactPii(text))
      else kept

    // "first doc per key" with a TYPE-AGNOSTIC min-id pick: ordering
    // by -id would cast string/UUID ids to double (ANSI runtime error,
    // or an all-null tie with ANSI off — an arbitrary winner)
    def keepMinId(df: DataFrame, key: Column): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(key).orderBy(id.asc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }

    // 3. canonical-URL dedup: first doc (min id) per canonical URL wins
    val urlDeduped = cfg.urlCol match {
      case Some(u) =>
        val canon = redacted.withColumn("__curl", UrlNormalize.canonicalizeUrl(col(u)))
        staged(keepMinId(canon, col("__curl")).drop("__curl"), "url_dedup")
      case None => redacted
    }

    // 4. exact content dedup on the normalized fingerprint
    val exactDeduped =
      if (cfg.exactDedup)
        staged(
          keepMinId(urlDeduped.withColumn("__fp", TextAnalysis.fingerprint(text)), col("__fp"))
            .drop("__fp"), "exact_dedup")
      else urlDeduped

    // 5. near-dup drop (MinHash+LSH banded candidates, lower id wins)
    val tokens = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    val nearDeduped = cfg.nearDedupThreshold match {
      case Some(t) =>
        staged(ApproxDedup.dropNearDuplicates(exactDeduped, id, tokens, threshold = t),
          "near_dedup")
      case None => exactDeduped
    }

    StageFrames(docs, kept, urlDeduped, exactDeduped, nearDeduped)
  }
}
