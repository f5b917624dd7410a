package graft.search

import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.temporal.ChronoUnit

/**
 * Solr date math (`DateMathParser.java` in Solr proper; the reference's
 * indexes hold `pdate` fields that users query with exactly this
 * syntax): an anchor instant followed by any run of add/subtract/round
 * operations, evaluated left to right in UTC —
 *
 *   NOW                       the request's anchor instant
 *   NOW/DAY                   truncate to unit
 *   NOW-7DAYS                 subtract
 *   NOW+2HOURS/HOUR           ops chain left to right
 *   2024-01-15T10:00:00Z/MONTH  explicit ISO-8601 anchor
 *
 * Units: YEAR, MONTH, DAY (DATE), HOUR, MINUTE, SECOND, MILLI
 * (MILLISECOND), with optional plural `S` — Solr's unit table minus
 * the exotic aliases.
 *
 * Determinism: `NOW` is NOT the wall clock here — the caller passes
 * the anchor explicitly (Solr itself does the same within one
 * distributed request via the `NOW=` parameter, precisely so every
 * shard evaluates the math against one instant). An engine that read
 * the real clock would be un-oracle-able and non-reproducible across
 * retried tasks.
 */
object DateMath {

  private val Ops = "+-/".toSet

  /** True if `s` is date-math-shaped: anchored at NOW, or an ISO-8601
    * instant with a trailing op chain. Plain ISO instants without ops
    * are NOT date math (they flow through the normal literal path). */
  def looksLikeDateMath(s: String): Boolean =
    s.startsWith("NOW") ||
      (s.length > 20 && s.charAt(10) == 'T' &&
        s.indexWhere(Ops.contains, 20) >= 0 && s.contains("Z"))

  /** Evaluate `expr` against the anchor `now`. Throws
    * IllegalArgumentException on malformed input. */
  def resolve(expr: String, now: Instant): Instant = {
    val (anchor, rest) =
      if (expr.startsWith("NOW")) (now, expr.drop(3))
      else {
        // explicit ISO anchor: ends at the 'Z' (ops follow it)
        val z = expr.indexOf('Z')
        require(z > 0, s"date math needs a NOW or ISO-8601Z anchor: '$expr'")
        (Instant.parse(expr.take(z + 1)), expr.drop(z + 1))
      }
    var t = ZonedDateTime.ofInstant(anchor, ZoneOffset.UTC)
    var pos = 0
    while (pos < rest.length) {
      rest.charAt(pos) match {
        case '/' =>
          val (unit, next) = readUnit(rest, pos + 1, expr)
          t = truncate(t, unit)
          pos = next
        case op @ ('+' | '-') =>
          var p = pos + 1
          val numStart = p
          while (p < rest.length && rest.charAt(p).isDigit) p += 1
          require(p > numStart, s"expected a count after '$op' in '$expr'")
          val n = rest.substring(numStart, p).toLong
          val (unit, next) = readUnit(rest, p, expr)
          t = if (op == '+') t.plus(n, unit) else t.minus(n, unit)
          pos = next
        case c =>
          throw new IllegalArgumentException(s"unexpected '$c' in date math '$expr'")
      }
    }
    t.toInstant
  }

  private def readUnit(s: String, from: Int, whole: String): (ChronoUnit, Int) = {
    var p = from
    while (p < s.length && s.charAt(p).isLetter) p += 1
    val name = s.substring(from, p)
    val base = if (name.length > 1 && name.endsWith("S")) name.dropRight(1) else name
    val unit = base match {
      case "YEAR" => ChronoUnit.YEARS
      case "MONTH" => ChronoUnit.MONTHS
      case "DAY" | "DATE" => ChronoUnit.DAYS
      case "HOUR" => ChronoUnit.HOURS
      case "MINUTE" => ChronoUnit.MINUTES
      case "SECOND" => ChronoUnit.SECONDS
      case "MILLI" | "MILLISECOND" => ChronoUnit.MILLIS
      case other =>
        throw new IllegalArgumentException(s"unknown date math unit '$other' in '$whole'")
    }
    (unit, p)
  }

  /** ChronoUnit-aware truncation: YEARS/MONTHS aren't supported by
    * ZonedDateTime.truncatedTo, so they reset the smaller fields by
    * hand (Solr's Calendar.clear loop does the same). */
  private def truncate(t: ZonedDateTime, unit: ChronoUnit): ZonedDateTime = unit match {
    case ChronoUnit.YEARS => t.truncatedTo(ChronoUnit.DAYS).withDayOfYear(1)
    case ChronoUnit.MONTHS => t.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1)
    case u => t.truncatedTo(u)
  }
}
