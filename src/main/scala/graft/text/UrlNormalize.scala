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
    // 4. tracking params: anchored on a real separator ([?&]) so a
    //    param/path merely CONTAINING a tracking name (myfbclid=1,
    //    /utm_campaign=x/) is never touched, and the (...)+ run form
    //    removes ADJACENT tracking params in one match (regex scanning
    //    resumes after a match, so a per-param pattern would skip every
    //    second one in ?utm_a=1&utm_b=2&id=3)
    val noTrack = regexp_replace(lowered,
      s"([?&])(?:(?:$TrackingParams)=[^&]*(?:&|$$))+", "$1")
    // 5. dangling separators left by step 4 at end-of-string
    val noDangle = regexp_replace(noTrack, "[?&]+$", "")
    // 6. www.
    val noWww = regexp_replace(noDangle, "^(https?://)www\\.", "$1")
    // 7. default port — PER SCHEME (:80 on https or :443 on http are
    //    real, distinct resources and must survive). The trailing
    //    group has an empty alternative so it always participates
    //    (RE2 has no lookahead; an unmatched group in the replacement
    //    is engine-dependent)
    val noPort80 = regexp_replace(noWww, "^(http://[^/:?]+):80([/?].*|)$", "$1$2")
    val noPort = regexp_replace(noPort80, "^(https://[^/:?]+):443([/?].*|)$", "$1$2")
    // 8. trailing slashes — ALL of them, so the step is idempotent
    //    ('http://a.com//' and 'http://a.com/' must canonicalize to
    //    the same key, or a re-run over partially-processed data
    //    diverges)
    regexp_replace(noPort, "/+$", "")
  }

  /** The URL's host, lowercased, port stripped; '' for non-URLs. */
  def host(url: Column): Column =
    lower(regexp_extract(trim(url), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1))

  /**
   * Domain-blocklist predicate (the C4/RefinedWeb corpus-hygiene
   * stage): true when the URL's host IS a blocked domain or is a
   * SUBDOMAIN of one (`ads.example.com` blocks under `example.com`;
   * `notexample.com` does not). The blocklist is request-literal, so
   * the check compiles to per-row scalar math — host equality or a
   * dot-anchored suffix test per entry, OR-folded; codegen'd,
   * shuffle-free, trivially 100 TB-safe. A blocklist too large to
   * inline belongs in a broadcast semi-join on the exploded host
   * suffix chain instead (the documented swap at ~10⁴+ entries).
   */
  def blockedHost(url: Column, blocklist: Seq[String]): Column = {
    val h = host(url)
    blocklist.map(_.toLowerCase).map { d =>
      h === d || h.endsWith("." + d)
    }.reduceOption(_ || _).getOrElse(lit(false))
  }
}
