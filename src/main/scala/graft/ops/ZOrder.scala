package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) clustering — the multi-column data-skipping
 * layout a 100 TB events table needs when queries slice on MORE than
 * the partition column: interleaving the bits of k dimension keys
 * gives a 1-D sort order under which a k-D box predicate touches a
 * small, near-contiguous set of files, so parquet min/max stats prune
 * row groups on EVERY clustered column, not just the leading sort key
 * (the classic Bayer/Markl UB-tree layout; Delta/Iceberg OPTIMIZE
 * ZORDER is this same construction).
 *
 * Spark-first mechanics, custom-expression-free: the interleave is an
 * OR-fold of built-in shift/mask columns (bitsPer·k simple terms —
 * all codegen'd, the whole computation stays inside one
 * WholeStageCodegen span); `repartitionByRange(zval)` carves balanced
 * files along the curve (range exchange = the one shuffle, sampled
 * bounds); `sortWithinPartitions(zval)` makes each file a curve
 * segment so its per-column min/max footprint is tight. Everything
 * downstream is stock parquet pruning — no reader cooperation needed.
 */
object ZOrder {

  /** Morton interleave of up to 8 non-negative int buckets, each
    * clamped to `bitsPer` bits; bit b of dim d lands at `b*k + d`
    * (LSB-first round-robin). Nulls and negatives clamp to the origin
    * cell — they cluster together rather than erroring the write. */
  def zorderCol(bitsPer: Int, dims: Column*): Column = {
    val k = dims.size
    require(k >= 1 && k <= 8, "1-8 zorder dimensions")
    require(bitsPer >= 1 && bitsPer * k <= 63,
      s"bitsPer($bitsPer) x dims($k) must fit a signed long")
    val mask = (1 << bitsPer) - 1
    val clamped = dims.map(d =>
      greatest(lit(0), coalesce(d.cast("int"), lit(0)))
        .bitwiseAND(lit(mask)).cast("long"))
    val terms =
      for { (v, d) <- clamped.zipWithIndex; b <- 0 until bitsPer }
        yield shiftleft(shiftright(v, b).bitwiseAND(lit(1L)), b * k + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /**
   * Cluster `df` along the Z-curve of `dims` (columns already bucketed
   * to non-negative ints — quantile-bucket or epoch-scale upstream)
   * and write `numFiles` parquet files to `path`.
   */
  def clusterWrite(df: DataFrame, path: String, numFiles: Int,
                   bitsPer: Int, dims: Column*): Unit =
    df.withColumn("__z", zorderCol(bitsPer, dims: _*))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}

/** Reference interleave for specs (must agree bit-for-bit with the
  * column form). */
object ZOrderKernel {
  def interleave(values: Array[Int], bitsPer: Int): Long = {
    val k = values.length
    val mask = (1 << bitsPer) - 1
    var out = 0L
    var d = 0
    while (d < k) {
      val v = math.max(0, values(d)) & mask
      var b = 0
      while (b < bitsPer) {
        out |= ((v >> b) & 1L) << (b * k + d)
        b += 1
      }
      d += 1
    }
    out
  }
}
