package graft.route

/**
 * MurmurHash3 x86_32 re-expressed as pure ANSI-ish DuckDB SQL — the
 * independent ORACLE for the Solr routing hash. DuckDB has no
 * murmur3_x86_32, so routing queries (shard counts, micro-shard
 * spread, composite-id slices) were previously rows-only; this
 * generator rebuilds the hash from first principles in SQL so the
 * driver's DuckDB compare can hash-check shard assignments computed
 * by [[SolrHash]] without ever calling engine code.
 *
 * Independence: the SQL below is written from the published
 * MurmurHash3 algorithm (Austin Appleby, public domain) — NOT
 * transliterated from SolrHash — and the two implementations are
 * pinned to the same published test vectors (SolrHashSpec on the
 * engine side; the driver's DuckDB run on this side). The oracles
 * built from it (q12/q13/q49/q50/q88) only hash-match if every
 * per-row 32-bit hash agrees between the JVM and DuckDB.
 *
 * Mechanics: 32-bit modular arithmetic in BIGINT space (unsigned,
 * mod 2^32); `a*b mod 2^32` splits `a` into 16-bit halves so no
 * intermediate exceeds 2^48; bytes come from `hex(encode(s))` (UTF-8
 * octets, matching Solr's byte-walk); the 4-byte block loop is a
 * `list_reduce` over a block-list comprehension. Each hash is a
 * correlated scalar subquery with named intermediates, so the
 * generated SQL stays linear in size (~2 KB) instead of exploding
 * exponentially through textual substitution.
 */
object DuckDbMurmurSql {

  private def mul32(a: String, b: Long): String =
    s"((($a) % 65536 * $b) % 4294967296 + ((($a) // 65536 * $b) % 65536) * 65536) % 4294967296"

  private def rotl(x: String, r: Int): String =
    s"((($x) * ${1L << r}) % 4294967296 + ($x) // ${1L << (32 - r)}) % 4294967296"

  /** Unsigned (0 .. 2^32-1) murmur3_x86_32 of the UTF-8 bytes of
    * `sExpr`, seed 0, as a correlated scalar subquery. */
  def murmurUnsigned(sExpr: String): String = {
    val stepK1 = mul32(rotl(mul32("k", 3432918353L), 15), 461845907L)
    val step = s"(${mul32(rotl(s"xor(h, $stepK1)", 13), 5L)} + 3864292196) % 4294967296"
    val tailK1 = mul32(rotl(mul32("tk", 3432918353L), 15), 461845907L)
    s"""(SELECT xor(f4, f4 // 65536)
 FROM (SELECT ${mul32("f3", 3266489909L)} AS f4
 FROM (SELECT xor(f2, f2 // 8192) AS f3
 FROM (SELECT ${mul32("f1", 2246822507L)} AS f2
 FROM (SELECT xor(f0, f0 // 65536) AS f1
 FROM (SELECT xor(ht, nb) AS f0
 FROM (SELECT CASE WHEN nb % 4 = 0 THEN hb ELSE xor(hb, $tailK1) END AS ht, nb
 FROM (SELECT list_reduce(list_prepend(0::BIGINT,
         [bl[4*j-3] + bl[4*j-2]*256 + bl[4*j-1]*65536 + bl[4*j]*16777216
          for j in generate_series(1, nb // 4)]), (h, k) -> $step) AS hb,
       CASE WHEN nb % 4 >= 3 THEN bl[4*(nb//4)+3]*65536 ELSE 0 END
     + CASE WHEN nb % 4 >= 2 THEN bl[4*(nb//4)+2]*256 ELSE 0 END
     + CASE WHEN nb % 4 >= 1 THEN bl[4*(nb//4)+1] ELSE 0 END AS tk, nb
 FROM (SELECT [16*strpos('123456789ABCDEF', substr(hx, 2*i-1, 1))
             + strpos('123456789ABCDEF', substr(hx, 2*i, 1))
               for i in generate_series(1, nb)] AS bl, nb
 FROM (SELECT hex(encode($sExpr)) AS hx, octet_length(encode($sExpr)) AS nb))))))))))"""
  }

  /** Two's-complement signed view of an unsigned 32-bit column. */
  def signed(u: String): String =
    s"(CASE WHEN $u >= 2147483648 THEN $u - 4294967296 ELSE $u END)"

  /** Bi-level composite hash (`a!b`): top 16 bits of hash(a), bottom
    * 16 of hash(b) — CompositeIdRouter's default bit split. Operands
    * are UNSIGNED hash columns; result is unsigned. */
  def compositeUnsigned(prefixU: String, suffixU: String): String =
    s"(($prefixU // 65536) * 65536 + $suffixU % 65536)"

  /** Shard index of a SIGNED hash column against inclusive range
    * starts (ascending, starts(0) = Int.MinValue) — the equal-range
    * slices Solr synthesizes (DocRouter; pinned for 4 shards in
    * HashRangeRouterSpec against Solr's published 80000000-bfffffff /
    * c0000000-ffffffff / 0-3fffffff / 40000000-7fffffff layout). */
  def shardCase(hCol: String, starts: Seq[Int]): String = {
    val cases = (starts.length - 1 to 1 by -1)
      .map(k => s"WHEN $hCol >= ${starts(k)} THEN $k").mkString(" ")
    s"(CASE $cases ELSE 0 END)"
  }

  /** Range starts for `n` equal shards, straight from the engine's
    * router (spec-pinned against Solr's published ranges). */
  def rangeStarts(n: Int): Seq[Int] = HashRangeRouter(n).starts.toSeq
}
