package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.unsafe.types.UTF8String
import graft.route.{GraftColumns, SolrHash}

/**
 * Distributed Bloom-filter membership for incremental corpus ingest —
 * the 100 TB answer to "is this document already in the corpus"
 * without shuffling the corpus:
 *
 *  1. BUILD: each partition of the corpus key column ORs its keys
 *     into a local bitset; partials tree-combine (`treeAggregate`,
 *     depth 2) so a 1000-executor build sends 2×√P bitsets over the
 *     wire, not P to the driver;
 *  2. PROBE: the bitset broadcasts ONCE per executor (a
 *     `Broadcast[Array[Long]]` handle inside a codegen'd
 *     [[BloomMightContain]] expression — the task closure carries the
 *     handle, not the megabytes);
 *  3. SPLIT: bloom-miss rows are DEFINITELY new (no false negatives)
 *     and bypass the join entirely; only bloom-hit rows — true dups
 *     plus the fpp sliver — pay the exact anti-join. At a 1% fpp on a
 *     mostly-new stream the expensive shuffle sees ~1% of the input.
 *
 * The final output is EXACT (the bloom only prunes; the anti-join
 * decides), which is what makes the whole path oracle-checkable
 * against a plain NOT EXISTS. Hashing is Kirsch-Mitzenmacher double
 * hashing (two seeded murmur3_x86_32 passes combine into k probe
 * positions) — standard Bloom practice, deterministic across JVMs.
 */
object BloomDedup {

  /** Immutable sketch: `bits.length * 64` bit positions, `k` probes. */
  final case class BloomSketch(bits: Array[Long], numHashes: Int) {
    def mightContain(key: String): Boolean =
      BloomKernel.mightContain(bits, numHashes,
        key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def bitCount: Long = {
      var i = 0; var n = 0L
      while (i < bits.length) { n += java.lang.Long.bitCount(bits(i)); i += 1 }
      n
    }
  }

  /** Standard optimal sizing: m = -n·ln(p)/ln²2 bits (rounded up to a
    * whole long), k = m/n·ln2 probes. */
  def optimalParams(expectedItems: Long, fpp: Double): (Int, Int) = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val mBits = math.ceil(
      -expectedItems.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val words = math.max(1L, (mBits + 63) / 64)
    require(words <= Int.MaxValue / 8, // 256 GiB of bitset: size the fpp up
      s"bloom bitset too large ($words words) — raise fpp or shard the filter")
    val k = math.max(1, math.round(
      (words * 64).toDouble / expectedItems * math.log(2)).toInt)
    (words.toInt, k)
  }

  /** Build the sketch over one key column (tree-combined). */
  def buildSketch(keys: Dataset[String], expectedItems: Long,
                  fpp: Double = 0.01): BloomSketch = {
    val (words, k) = optimalParams(expectedItems, fpp)
    val bits = keys.rdd.treeAggregate(new Array[Long](words))(
      seqOp = (b, key) => {
        BloomKernel.add(b, k, key.getBytes(java.nio.charset.StandardCharsets.UTF_8)); b
      },
      combOp = (a, b) => { BloomKernel.or(a, b); a },
      depth = 2)
    BloomSketch(bits, k)
  }

  /** Probe column over a broadcast sketch (codegen'd, no UDF). */
  def mightContainCol(spark: SparkSession, sketch: BloomSketch,
                      key: Column): Column = {
    val bc = spark.sparkContext.broadcast(sketch.bits)
    GraftColumns.of(BloomMightContain(GraftColumns.expr(key), bc, sketch.numHashes))
  }

  /**
   * Incoming rows whose `keyCol` does NOT appear in `corpusKeys`
   * (exact — the sketch only routes): bloom misses stream through
   * join-free; bloom hits take a left_anti against the corpus keys.
   * `expectedItems` sizes the filter (pass the corpus cardinality or
   * a safe upper bound; an undersized filter stays correct, it just
   * prunes less).
   */
  def newRows(incoming: DataFrame, keyCol: String, corpusKeys: Dataset[String],
              expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val spark = incoming.sparkSession
    val sketch = buildSketch(corpusKeys, expectedItems, fpp)
    val probe = mightContainCol(spark, sketch, col(keyCol))
    // NULL-key rows: the probe is null for null input, so a bare
    // `filter(!probe)` would drop them from BOTH branches. NOT EXISTS /
    // left_anti semantics keep a null-key row (null never equals a corpus
    // key), so route nulls to the definite-new branch explicitly.
    val definiteNew = incoming.filter(col(keyCol).isNull || !probe)
    val corpusDf = corpusKeys.toDF("__corpus_key")
    val maybeNew = incoming.filter(probe)
      .join(corpusDf, col(keyCol) === col("__corpus_key"), "left_anti")
    definiteNew.unionByName(maybeNew)
  }
}

/** The shared add/probe kernel (static, codegen-callable). Probe
  * positions: (h1 + i·h2) mod m with h1/h2 two seeded murmur3 passes
  * (Kirsch-Mitzenmacher 2006 — k indices from two hashes preserves
  * the asymptotic fpp). */
object BloomKernel {
  private val Seed2 = 0x9747b28c // arbitrary fixed second seed

  def add(bits: Array[Long], k: Int, key: Array[Byte]): Unit = {
    val h1 = SolrHash.murmur3(key, 0, key.length, 0).toLong & 0xFFFFFFFFL
    val h2 = SolrHash.murmur3(key, 0, key.length, Seed2).toLong & 0xFFFFFFFFL
    val m = bits.length.toLong * 64
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      bits((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  def mightContain(bits: Array[Long], k: Int, key: Array[Byte]): Boolean = {
    val h1 = SolrHash.murmur3(key, 0, key.length, 0).toLong & 0xFFFFFFFFL
    val h2 = SolrHash.murmur3(key, 0, key.length, Seed2).toLong & 0xFFFFFFFFL
    val m = bits.length.toLong * 64
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def mightContainUtf8(bits: Array[Long], k: Int, s: UTF8String): Boolean =
    mightContain(bits, k, s.getBytes)

  def or(into: Array[Long], from: Array[Long]): Unit = {
    var i = 0
    while (i < into.length) { into(i) |= from(i); i += 1 }
  }
}

/**
 * `bloom_might_contain(key)`: broadcast-bitset probe as a native
 * codegen expression — the bitset rides a Broadcast handle (fetched
 * once per executor), the per-row work is k hash-probe bit tests.
 */
case class BloomMightContain(child: Expression, bc: Broadcast[Array[Long]], k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    BloomKernel.mightContainUtf8(bc.value, k, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      "org.apache.spark.broadcast.Broadcast<long[]>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.BloomKernel.mightContainUtf8(" +
        s"(long[]) $bcRef.value(), $k, $c);\n")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}
