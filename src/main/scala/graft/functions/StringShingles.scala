package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel, static-forwardable so eval and codegen run the same
  * method. */
object StringShingleKernel {
  private val SPACE = UTF8String.fromString(" ")

  /** w-gram shingle strings; `n < w` degrades to one shingle of the
    * whole array. Separator semantics = Spark `concat_ws`: NULL tokens
    * are skipped, not stringified. */
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    def join(from: Int, until: Int): UTF8String = {
      val parts = new Array[UTF8String](until - from)
      var j = from
      while (j < until) {
        parts(j - from) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
        j += 1
      }
      UTF8String.concatWs(SPACE, parts: _*)
    }
    if (n < w) new GenericArrayData(Array[Any](join(0, n)))
    else {
      val out = new Array[Any](n - w + 1)
      var i = 0
      while (i <= n - w) { out(i) = join(i, i + w); i += 1 }
      new GenericArrayData(out)
    }
  }
}

/**
 * `string_shingles(tokens, w)`: the w-gram (word n-gram) shingle
 * strings of a token array in one fused pass — the composable form
 * (`transform(sequence(...), i => concat_ws(" ", slice(...)))`) runs
 * an interpreted lambda allocating a slice per window. Values are
 * identical: same space separator, same concat_ws null-skipping, same
 * whole-array degradation when `size < w`.
 */
case class StringShingles(child: Expression, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(w >= 1, s"shingle width must be >= 1: $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    StringShingleKernel.compute(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StringShingleKernel.compute($c, $w);\n")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "string_shingles"
}

object StringShingles {
  def string_shingles(tokens: Column, w: Int): Column =
    GraftColumns.of(StringShingles(GraftColumns.expr(tokens), w))
}
