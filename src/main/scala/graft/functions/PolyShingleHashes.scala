package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Shared polynomial-shingle kernel, static-forwardable so interpreted
 * eval and generated code run the same method.
 */
object PolyShingleKernel {
  private val P = 2147483647L // 2^31 - 1: acc stays < 2^31, no overflow
  private val M = 1000003L

  /** pmod(acc * M + h, P) — the exact arithmetic of the composable
    * `pmod(acc * 1000003L + h, lit(p))` step (Spark pmod = positive
    * remainder). */
  private def step(acc: Long, h: Long): Long = {
    val r = (acc * M + h) % P
    if (r < 0) r + P else r
  }

  /** Window-of-`w` polynomial mixes; `n < w` degrades to one mix over
    * the whole array (the composable form's `when(n < w, ...)` arm).
    * A NULL element nulls exactly the windows covering it — the same
    * per-window propagation the composable pmod chain had (a null
    * token hash must not silently read as 0 and corrupt fingerprints).
    * Token arrays are null-free in every graft path, so the boxed
    * null-aware walk only runs when a null is actually present. */
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    var hasNull = false
    var k = 0
    while (k < n && !hasNull) { hasNull = arr.isNullAt(k); k += 1 }
    if (hasNull) return computeWithNulls(arr, w)
    if (n < w) {
      var acc = 1L
      var j = 0
      while (j < n) { acc = step(acc, arr.getLong(j)); j += 1 }
      new GenericArrayData(Array(acc))
    } else {
      val out = new Array[Long](n - w + 1)
      var i = 0
      while (i <= n - w) {
        var acc = 1L
        var j = i
        while (j < i + w) { acc = step(acc, arr.getLong(j)); j += 1 }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  private def computeWithNulls(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    def mix(from: Int, until: Int): Any = {
      var acc = 1L
      var j = from
      while (j < until) {
        if (arr.isNullAt(j)) return null
        acc = step(acc, arr.getLong(j))
        j += 1
      }
      acc
    }
    if (n < w) new GenericArrayData(Array[Any](mix(0, n)))
    else {
      val out = new Array[Any](n - w + 1)
      var i = 0
      while (i <= n - w) { out(i) = mix(i, i + w); i += 1 }
      new GenericArrayData(out)
    }
  }
}

/**
 * `poly_shingles(tokenHashes, w)`: the w-gram shingle hashes of a
 * pre-hashed token array via a polynomial rolling mix — one fused
 * codegen pass replacing the interpreted per-window foldLeft lambda
 * (w `element_at` reads + pmod chain per window). Values identical to
 * the composable form (same step arithmetic, same `n < w` whole-array
 * degradation).
 */
case class PolyShingleHashes(child: Expression, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(w >= 1, s"shingle width must be >= 1: $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  // null elements propagate per-window (see kernel), so the output may
  // carry nulls
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(v: Any): Any =
    PolyShingleKernel.compute(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyShingleKernel.compute($c, $w);\n")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "poly_shingles"
}

object PolyShingleHashes {
  def poly_shingles(tokenHashes: Column, w: Int): Column =
    GraftColumns.of(PolyShingleHashes(GraftColumns.expr(tokenHashes), w))
}
