package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel, static-forwardable so eval and codegen run the same
  * method. */
object SpanCutKernel {
  private val SPACE = UTF8String.fromString(" ")

  /** One O(tokens + starts) pointer walk: each SORTED start s covers
    * token positions [s, s+k-1]; returns (covered count, the
    * space-joined uncovered tokens). Replaces the composable
    * mergeSpans-fold + per-token exists() probe + array_join chain —
    * identical output (coverage union is order-independent; the join
    * separator and null-token handling match concat_ws semantics). */
  def compute(toks: ArrayData, starts: ArrayData, k: Int): InternalRow = {
    val n = toks.numElements()
    val s = starts.numElements()
    val kept = new Array[UTF8String](n)
    var nKept = 0
    var si = 0
    var coverEnd = -1L
    var i = 0
    while (i < n) {
      while (si < s && starts.getInt(si) <= i) {
        val e = starts.getInt(si).toLong + (k - 1)
        if (e > coverEnd) coverEnd = e
        si += 1
      }
      if (i > coverEnd) {
        kept(nKept) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        nKept += 1
      }
      i += 1
    }
    val out = new Array[UTF8String](nKept)
    System.arraycopy(kept, 0, out, 0, nKept)
    InternalRow(n - nKept, UTF8String.concatWs(SPACE, out: _*))
  }
}

/**
 * `span_cut(tokens, starts, k)`: drop every token covered by a
 * k-wide span starting at any of the SORTED `starts`, returning
 * struct(n_dup int, text_deduped string) in one codegen'd pass —
 * the hot tail of exact substring dedup (SubstringDedup), where the
 * composable form (aggregate-fold span merge + indexed filter with a
 * nested exists + array_join) runs three interpreted higher-order
 * lambdas per document.
 */
case class SpanCut(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(k >= 1)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(IntegerType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_dup", IntegerType, nullable = false),
    StructField("text_deduped", StringType, nullable = false)))

  override def nullSafeEval(a: Any, b: Any): Any =
    SpanCutKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SpanCutKernel.compute($a, $b, $k);\n")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "span_cut"
}

object SpanCut {
  def span_cut(tokens: Column, starts: Column, k: Int): Column =
    GraftColumns.of(SpanCut(GraftColumns.expr(tokens), GraftColumns.expr(starts), k))
}
