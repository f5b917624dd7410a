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
   * Solr composite-id routing hash. Plain ids hash whole; `a!b` ids
   * take the top `bits` (default 16) bits of hash(a) and the bottom
   * 32-bits bits of hash(b), so all docs sharing a route prefix land in
   * the same hash neighbourhood (Solr CompositeIdRouter semantics; the
   * reference relies on them via DocRouter.getTargetSlice,
   * SolrCloudCompositeIdRoutingPartitioner.java:74). A `a/n!b` prefix
   * overrides the bit split.
   */
  def compositeHash(id: String): Int = {
    val bang = id.indexOf('!')
    if (bang < 0) return hashString(id)
    var prefix = id.substring(0, bang)
    val rest = id.substring(bang + 1)
    var bits = 16
    val slash = prefix.indexOf('/')
    if (slash >= 0) {
      bits = try prefix.substring(slash + 1).toInt catch { case _: NumberFormatException => 16 }
      prefix = prefix.substring(0, slash)
    }
    if (bits <= 0) return hashString(rest)
    if (bits >= 32) return hashString(prefix)
    val upperMask = -1 << (32 - bits) // top `bits` bits set
    (hashString(prefix) & upperMask) | (hashString(rest) & ~upperMask)
  }

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
