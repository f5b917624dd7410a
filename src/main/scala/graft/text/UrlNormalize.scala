package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization for web-corpus dedup: collapse the equivalent
 * spellings of a URL (case of scheme/host, `www.` prefix, default
 * ports, tracking query params, fragments, trailing slash) to one
 * canonical form so exact dedup / groupBy on the canonical key merges
 * what a crawler would see as one resource.
 *
 * Pure `regexp_replace`/`regexp_extract` column expressions in the
 * RE2 ∩ Java common regex subset (no lookarounds) so the DuckDB
 * oracle runs the identical chain; codegen'd, shuffle-free — the
 * 100 TB shape is a per-row map, with the dedup itself a plain
 * hash-groupBy on the output (one shuffle on the canonical key).
 *
 * The step ORDER is part of the contract (each step assumes the
 * previous ones ran — e.g. port-strip assumes a lowercased scheme):
 *  1. trim, 2. strip fragment, 3. lowercase scheme+authority,
 *  4. strip tracking params (utm_*, fbclid, gclid), 5. strip dangling
 *  `?`/`&`, 6. strip `www.`, 7. strip default port :80/:443,
 *  8. strip trailing slash.
 */
object UrlNormalize {

  /** Params considered tracking noise (removed with their values). */
  val TrackingParams = "utm_[a-z]+|fbclid|gclid"

  def canonicalizeUrl(url: Column): Column = {
    val t = trim(url)
    // 2. fragment
    val noFrag = regexp_replace(t, "#.*", "")
    // 3. lowercase scheme://authority only (path/query stay cased);
    //    if the input has no scheme the extract is "" and the replace
    //    leaves the string whole, so the concat is the identity
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)),
      regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", ""))
    // 4. tracking params (and the separator that follows, if any)
    val noTrack = regexp_replace(lowered, s"($TrackingParams)=[^&]*&?", "")
    // 5. dangling separators left by step 4 at end-of-string
    val noDangle = regexp_replace(noTrack, "[?&]+$", "")
    // 6. www.
    val noWww = regexp_replace(noDangle, "^(https?://)www\\.", "$1")
    // 7. default port — group 3 has an empty alternative so it always
    //    participates (RE2 has no lookahead; an unmatched group in the
    //    replacement is engine-dependent)
    val noPort = regexp_replace(noWww, "^(https?://[^/:?]+):(80|443)([/?].*|)$", "$1$3")
    // 8. trailing slash
    regexp_replace(noPort, "/$", "")
  }
}
