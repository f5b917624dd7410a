package graft.route

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * MurmurHash3 x86 32-bit over the UTF-8 encoding of a string, seed 0 —
 * the hash SolrCloud document routing is defined in terms of.
 *
 * The reference routes each document to the shard SolrCloud itself would
 * pick, via `Hash.murmurhash3_x86_32(keyStr, 0, keyStr.length(), 0)`
 * (reference: map-reduce/src/main/java/com/riskiq/solr/hadoop/
 * SolrCloudCompositeIdRoutingPartitioner.java:94 and
 * SolrCloudPartitioner.java:133). Solr's `Hash.murmurhash3_x86_32`
 * lazily UTF-8-encodes the CharSequence while hashing; hashing the
 * UTF-8 byte array with the canonical x86_32 algorithm is
 * bit-identical. Spark's builtin `hash()` is ALSO Murmur3-32 but with
 * a different byte-walk and seed (42), so it is NOT compatible — hence
 * this hand port (verified against the published MurmurHash3 test
 * vectors in SolrHashSpec).
 */
object SolrHash {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  /** Canonical MurmurHash3 x86_32 over `data[offset, offset+len)`. */
  def murmur3(data: Array[Byte], offset: Int, len: Int, seed: Int): Int = {
    var h1 = seed
    val roundedEnd = offset + (len & 0xfffffffc)
    var i = offset
    while (i < roundedEnd) {
      var k1 = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | (data(i + 3) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    val rem = len & 3
    if (rem == 3) k1 = (data(roundedEnd + 2) & 0xff) << 16
    if (rem >= 2) k1 |= (data(roundedEnd + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 |= data(roundedEnd) & 0xff
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  def hashString(s: String): Int = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    murmur3(b, 0, b.length, 0)
  }

  /** Hash entry point used from both interpreted eval and codegen. */
  def hashUtf8(s: UTF8String): Int = {
    val b = s.getBytes // already UTF-8
    murmur3(b, 0, b.length, 0)
  }

  /**
   * Solr composite-id routing hash (CompositeIdRouter.KeyParser
   * semantics from the public Apache Solr source; the reference relies
   * on them via DocRouter.getTargetSlice,
   * SolrCloudCompositeIdRoutingPartitioner.java:74).
   *
   * Plain ids hash whole. `a!b` ids take the top 16 bits of hash(a) and
   * the bottom 16 of hash(b). Tri-level `a!b!c` ids split 8/8/16: top 8
   * bits from hash(a), next 8 from hash(b), bottom 16 from hash(c). A
   * `/n` suffix on a routing part (`a/n!b`, `a/n!b/m!c`) overrides its
   * bit allocation (clamped to [0,32]; malformed specs keep the
   * default). Trailing-separator rules follow SOLR-6257: `a!` masks to
   * the top 16 bits of hash(a) alone; `a!b!` is treated as bi-level
   * `a!b`; `a!!` as `a!`.
   */
  def compositeHash(id: String): Int = {
    val first = id.indexOf('!')
    if (first < 0) return hashString(id)
    val lastPos = id.length - 1
    // split into at most 3 parts (KeyParser; trailing '!' per SOLR-6257)
    var p0 = id.substring(0, first)
    var p1: String = null
    var p2: String = null
    if (first < lastPos) {
      val second = id.indexOf('!', first + 1)
      if (second < 0) p1 = id.substring(first + 1)
      else if (second == lastPos) {
        if (first < second - 1) p1 = id.substring(first + 1, second)
      } else {
        p1 = id.substring(first + 1, second)
        p2 = id.substring(second + 1)
      }
    }
    val tri = p2 != null
    var bits0 = if (tri) 8 else 16
    var bits1 = 8
    val slash0 = p0.indexOf('/')
    if (slash0 >= 0) {
      bits0 = parseBits(p0.substring(slash0 + 1), bits0)
      p0 = p0.substring(0, slash0)
    }
    if (tri) {
      val slash1 = p1.indexOf('/')
      if (slash1 >= 0) {
        bits1 = parseBits(p1.substring(slash1 + 1), bits1)
        p1 = p1.substring(0, slash1)
      }
    }
    val mask0 = if (bits0 == 0) 0 else -1 << (32 - bits0)
    var result = hashString(p0) & mask0
    if (tri) {
      val used = math.min(32, bits0 + bits1)
      val mask1 =
        if (bits1 == 0 || bits0 >= 32) 0
        else (-1 >>> bits0) & (-1 << (32 - used))
      val mask2 = if (used >= 32) 0 else -1 >>> used
      result |= (hashString(p1) & mask1) | (hashString(p2) & mask2)
    } else if (p1 != null) {
      val mask1 = if (bits0 >= 32) 0 else -1 >>> bits0
      result |= hashString(p1) & mask1
    }
    result
  }

  private def parseBits(s: String, dflt: Int): Int =
    try { val v = s.toInt; if (v < 0) 0 else math.min(32, v) }
    catch { case _: NumberFormatException => dflt }

  /** Fast path over UTF8String: plain (no '!') ids hash their UTF-8
    * bytes directly — no String materialization per row. */
  def compositeHashUtf8(s: UTF8String): Int = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == '!') return compositeHash(s.toString)
      i += 1
    }
    murmur3(bytes, 0, bytes.length, 0)
  }

  def solr_hash(c: Column): Column = GraftColumns.of(SolrMurmurHash(GraftColumns.expr(c)))
}

/** `solr_hash(str)`: Solr-routing-compatible murmur3_x86_32, seed 0. */
case class SolrMurmurHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    SolrHash.hashUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.route.SolrHash.hashUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "solr_hash"
}
