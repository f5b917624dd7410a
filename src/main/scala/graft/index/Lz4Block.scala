package graft.index

/**
 * Pure-JVM LZ4 block codec — clean-room implementation of the public
 * LZ4 block format (Yann Collet's spec,
 * github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md): token byte
 * (literal-run nibble | match-run nibble), 255-continued length
 * extensions, little-endian 16-bit match offsets, minimum match 4,
 * final sequence literals-only with the standard end-of-block rules
 * (last 5 bytes are literals; no match starts within the last 12).
 *
 * Why it exists: the segment store's write path is throughput-gated on
 * stored-field compression (reference context: Lucene's default
 * `BEST_SPEED` stored-fields codec is LZ4 for exactly this reason —
 * `CompressionMode.FAST`). Deflate at BEST_SPEED still runs a full
 * zlib bit-packing pass per block; LZ4's byte-aligned format
 * compresses several times faster at a modestly lower ratio, which is
 * the right trade for a 100 TB ingest where writer docs/s is the gate
 * and the store is read back block-at-a-time on the query path.
 *
 * Compressor shape: single-probe 64K-entry hash table over 4-byte
 * prefixes, greedy forward match extension (the `LZ4_compress_default`
 * algorithm class). Decompression is format-complete: any compliant
 * LZ4 block decodes, not just this compressor's output.
 */
object Lz4Block {

  private val MinMatch = 4
  private val LastLiterals = 5 // spec: block's last 5 bytes are literals
  private val MfLimit = 12     // spec: no match starts within last 12 bytes
  // 8K entries (32 KiB table): the store compresses ~16 KiB blocks,
  // so a 64K-entry table would cost more to allocate+zero per block
  // than the match search saves — at 2 positions per slot the
  // collision rate on 16 KiB inputs is negligible
  private val HashLog = 13
  private val MaxOffset = 65535

  /** Worst case: incompressible input grows by run-length extension
    * bytes only — the spec bound len + len/255 + 16. */
  def maxCompressedLength(len: Int): Int = len + len / 255 + 16

  private def read32(a: Array[Byte], i: Int): Int =
    (a(i) & 0xFF) | ((a(i + 1) & 0xFF) << 8) |
      ((a(i + 2) & 0xFF) << 16) | ((a(i + 3) & 0xFF) << 24)

  private def hash(v: Int): Int = (v * -1640531535) >>> (32 - HashLog)

  /** Compress `src[0, len)`; returns an exact-sized block. */
  def compress(src: Array[Byte], len: Int): Array[Byte] = {
    val dst = new Array[Byte](maxCompressedLength(len))
    val n = compress(src, len, dst)
    java.util.Arrays.copyOf(dst, n)
  }

  /** Compress into `dst` (sized >= maxCompressedLength); returns the
    * compressed length. */
  def compress(src: Array[Byte], len: Int, dst: Array[Byte]): Int = {
    var d = 0
    var anchor = 0
    if (len >= MfLimit + MinMatch) {
      // table holds position+1 (0 = empty slot)
      val table = new Array[Int](1 << HashLog)
      val searchLimit = len - MfLimit
      val matchLimit = len - LastLiterals
      var s = 0
      while (s <= searchLimit) {
        val h = hash(read32(src, s))
        val ref = table(h) - 1
        table(h) = s + 1
        if (ref >= 0 && s - ref <= MaxOffset && read32(src, ref) == read32(src, s)) {
          // extend the match forward (never into the last-5 literals)
          var mLen = MinMatch
          while (s + mLen < matchLimit && src(ref + mLen) == src(s + mLen)) mLen += 1
          // sequence: token, literal extension, literals, offset, match extension
          val litLen = s - anchor
          val tokenPos = d; d += 1
          if (litLen >= 15) {
            var rest = litLen - 15
            while (rest >= 255) { dst(d) = -1; d += 1; rest -= 255 }
            dst(d) = rest.toByte; d += 1
          }
          System.arraycopy(src, anchor, dst, d, litLen); d += litLen
          val off = s - ref
          dst(d) = off.toByte; dst(d + 1) = (off >>> 8).toByte; d += 2
          val mExtra = mLen - MinMatch
          if (mExtra >= 15) {
            var rest = mExtra - 15
            while (rest >= 255) { dst(d) = -1; d += 1; rest -= 255 }
            dst(d) = rest.toByte; d += 1
          }
          dst(tokenPos) = ((math.min(litLen, 15) << 4) | math.min(mExtra, 15)).toByte
          s += mLen
          anchor = s
        } else s += 1
      }
    }
    // final literals-only sequence
    val litLen = len - anchor
    val tokenPos = d; d += 1
    if (litLen >= 15) {
      var rest = litLen - 15
      while (rest >= 255) { dst(d) = -1; d += 1; rest -= 255 }
      dst(d) = rest.toByte; d += 1
    }
    dst(tokenPos) = (math.min(litLen, 15) << 4).toByte
    System.arraycopy(src, anchor, dst, d, litLen); d += litLen
    d
  }

  /** Decompress a block of known raw length (the store records raw
    * length per block, the LZ4 framing norm). Format-complete; throws
    * on malformed input rather than reading out of bounds. */
  def decompress(src: Array[Byte], srcLen: Int, rawLen: Int): Array[Byte] = {
    val dst = new Array[Byte](rawLen)
    var s = 0
    var d = 0
    def truncated(): Nothing =
      throw new java.io.IOException("corrupt LZ4 block: truncated")
    while (s < srcLen) {
      val token = src(s) & 0xFF; s += 1
      // literal run
      var litLen = token >>> 4
      if (litLen == 15) {
        var b = 0
        do {
          if (s >= srcLen) truncated()
          b = src(s) & 0xFF; s += 1; litLen += b
        } while (b == 255)
      }
      if (litLen > 0) {
        if (s + litLen > srcLen || d + litLen > rawLen)
          throw new java.io.IOException("corrupt LZ4 block: literal overrun")
        System.arraycopy(src, s, dst, d, litLen); s += litLen; d += litLen
      }
      if (s < srcLen) { // a match follows unless this was the last sequence
        if (s + 2 > srcLen) truncated()
        val off = (src(s) & 0xFF) | ((src(s + 1) & 0xFF) << 8); s += 2
        if (off <= 0 || off > d)
          throw new java.io.IOException("corrupt LZ4 block: bad offset")
        var mLen = (token & 0x0F) + MinMatch
        if ((token & 0x0F) == 15) {
          var b = 0
          do {
            if (s >= srcLen) truncated()
            b = src(s) & 0xFF; s += 1; mLen += b
          } while (b == 255)
        }
        if (d + mLen > rawLen)
          throw new java.io.IOException("corrupt LZ4 block: match overrun")
        // byte-wise copy: offsets < mLen overlap by design (RLE runs)
        var i = 0
        val ref = d - off
        while (i < mLen) { dst(d + i) = dst(ref + i); i += 1 }
        d += mLen
      }
    }
    if (d != rawLen)
      throw new java.io.IOException(s"corrupt LZ4 block: expected $rawLen bytes, got $d")
    dst
  }
}
