package graft.index

/**
 * Sortable term encodings for NUMERIC index fields — the Solr
 * `plong`/`pdouble` analog for the strings-only [[SegmentIndex]].
 *
 * A numeric value is indexed as a FIXED-WIDTH (16 hex digit) string
 * whose code-point order equals the numeric order, so every existing
 * string-keyed index structure — sorted term dictionaries, range
 * scans, zone-map segment skipping, TopN heap comparisons — serves
 * numeric semantics without change. This is the classic sortable-bits
 * design of Lucene's legacy numeric fields (NumericUtils: sign-bit
 * flip for integrals, monotonic IEEE-754 bit remap for doubles),
 * applied at the SINK boundary: the segment files still hold only
 * strings; the DataSourceV2 layer encodes pushed bounds and decodes
 * read values (see `IndexDataSource`).
 *
 * Longs: `v XOR Long.MinValue` flips the sign bit, mapping
 * `[Long.MinValue, Long.MaxValue]` monotonically onto the unsigned
 * range; unsigned fixed-width hex then sorts code-point-wise.
 *
 * Doubles: the IEEE bit pattern of a non-negative double already
 * orders like the value, while negatives order REVERSED — `~bits` for
 * negatives and `bits XOR Long.MinValue` for the rest yields one
 * monotonic unsigned key. `doubleToLongBits` canonicalizes NaN, which
 * lands ABOVE +Infinity — matching Spark's NaN-greatest sort order.
 * Declared divergence: `-0.0` encodes below `0.0` (distinct terms),
 * where Spark's comparisons normalize the two.
 */
private[graft] object NumericTerms {

  def encodeLong(v: Long): String = f"${v ^ Long.MinValue}%016x"

  def decodeLong(s: String): Long =
    java.lang.Long.parseUnsignedLong(s, 16) ^ Long.MinValue

  def encodeDouble(v: Double): String = {
    val bits = java.lang.Double.doubleToLongBits(v)
    val sortable = if (bits < 0) ~bits else bits ^ Long.MinValue
    f"$sortable%016x"
  }

  def decodeDouble(s: String): Double = {
    val sortable = java.lang.Long.parseUnsignedLong(s, 16)
    val bits = if (sortable < 0) sortable ^ Long.MinValue else ~sortable
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Timestamps index as epoch MICROSECONDS (Spark's internal
    * timestamp resolution) through [[encodeLong]]; dates as epoch
    * days. */
  def microsOf(i: java.time.Instant): Long =
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)

  def microsOf(ts: java.sql.Timestamp): Long = microsOf(ts.toInstant)

  def instantOf(micros: Long): java.time.Instant =
    java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L)

  /** TIMESTAMP_NTZ: the wall-clock reading as micros from the epoch
    * (no zone — Spark's internal NTZ representation). */
  def microsOfNtz(l: java.time.LocalDateTime): Long =
    microsOf(l.toInstant(java.time.ZoneOffset.UTC))

  def ntzOf(micros: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofInstant(instantOf(micros), java.time.ZoneOffset.UTC)
}
