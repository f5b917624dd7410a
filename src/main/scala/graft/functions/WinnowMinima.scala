package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Shared winnowing kernel: distinct sliding-window minima of a long
 * array, in one pass. Kept as a plain static-forwardable object so the
 * interpreted `eval` and the generated code run the SAME method — the
 * expression's codegen emits a single call instead of an inlined loop.
 */
object WinnowKernel {
  /** Distinct window-of-`w` minima in first-occurrence order.
    * Semantics mirror the composable
    * `array_distinct(transform(..., least(element_at...)))` form:
    * `n <= w` degrades to one whole-array window; NULL elements are
    * skipped the way `least`/`array_min` skip them (an all-null
    * window contributes a NULL minimum, kept once by distinct). */
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any]()
    val seen = new java.util.HashSet[Long]()
    var seenNull = false
    def add(min: Long, has: Boolean): Unit =
      if (!has) { if (!seenNull) { seenNull = true; out.add(null) } }
      else if (seen.add(min)) out.add(min)
    if (n <= w) {
      var min = Long.MaxValue
      var has = false
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val v = arr.getLong(j)
          if (!has || v < min) { min = v; has = true }
        }
        j += 1
      }
      add(min, has)
    } else {
      var i = 0
      while (i <= n - w) {
        var min = Long.MaxValue
        var has = false
        var j = i
        while (j < i + w) {
          if (!arr.isNullAt(j)) {
            val v = arr.getLong(j)
            if (!has || v < min) { min = v; has = true }
          }
          j += 1
        }
        add(min, has)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/**
 * `winnow_minima(hashes, w)`: the winnowing fingerprint set — distinct
 * sliding-window minima over pre-hashed shingles — as one fused pass.
 * The composable form ran an interpreted per-window lambda of `w`
 * `element_at` reads plus an `array_distinct`; this walks the array
 * once per window position inside codegen and dedups inline.
 */
case class WinnowMinima(child: Expression, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(w >= 2, s"winnow window must be >= 2: $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(v: Any): Any =
    WinnowKernel.compute(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowKernel.compute($c, $w);\n")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "winnow_minima"
}

object WinnowMinima {
  def winnow_minima(hashes: Column, w: Int): Column =
    GraftColumns.of(WinnowMinima(GraftColumns.expr(hashes), w))
}
