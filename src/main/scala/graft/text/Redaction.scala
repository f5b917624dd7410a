package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII redaction for training-data pipelines: replace well-known
 * identifier shapes (emails, IPv4s, SSNs, US phone numbers) with
 * typed placeholder tags, plus per-type match counts for corpus
 * audits. This is the standard pre-training scrub step (C4 and most
 * web-corpus pipelines ship an equivalent pass).
 *
 * All patterns are written in the RE2 ∩ java.util.regex common subset
 * (no lookarounds, no backreferences) so the DuckDB oracle can run
 * the byte-identical chain. Pure `regexp_replace` column expressions:
 * whole-stage codegen'd, no UDFs, trivially partition-parallel — the
 * right 100 TB shape (a per-row map with no shuffle).
 *
 * Order matters and is part of the contract: emails are redacted
 * before IPs so a dotted-quad inside an email host is consumed by the
 * email rule; SSN (3-2-4) and phone (3-3-4) shapes are disjoint.
 */
object Redaction {

  /** (name, pattern, replacement) applied in order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"))

  /** The redacted text: every pattern replaced (all occurrences). */
  def redactPii(text: Column): Column =
    Patterns.foldLeft(text) { case (c, (_, p, r)) => regexp_replace(c, p, r) }

  /**
   * Per-type match counts over the ORIGINAL text (for audit reports
   * and drop-if-too-many-hits policies). Counted with the same
   * patterns and order-independence caveat as `redactPii`: counts are
   * per-pattern on the raw input, so an email containing an IP-shaped
   * host counts under both — redaction order only affects the text.
   */
  def piiCounts(text: Column): Seq[(String, Column)] =
    Patterns.map { case (n, p, _) =>
      s"n_$n" -> size(regexp_extract_all(text, lit(p), lit(0))).cast("long")
    }
}
