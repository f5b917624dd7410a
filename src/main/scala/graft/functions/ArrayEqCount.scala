package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/**
 * `array_eq_count(a, b)`: positions where two int arrays agree — the
 * MinHash signature-agreement count (estimated Jaccard = count /
 * numHashes). Replaces the per-pair interpreted
 * `aggregate(zip_with(a, b, (x,y) => when(x===y,1).otherwise(0)), 0, _+_)`
 * chain, which allocates a zipped array per CANDIDATE PAIR — the LSH
 * join's hottest row count.
 *
 * Parity with the composable form: positions are compared up to the
 * SHORTER length and zip_with's null padding beyond it contributes 0
 * (`when(x === y)` is never true against a padded null); a null
 * ELEMENT likewise contributes 0. Signature arrays are equal-length
 * and null-free in every graft path.
 */
case class ArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayEqCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrayEqCount.compute($a, $b);\n")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_eq_count"
}

object ArrayEqCount {
  /** Shared kernel for eval + codegen. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getInt(i) == b.getInt(i)) c += 1
      i += 1
    }
    c
  }

  def array_eq_count(a: Column, b: Column): Column =
    GraftColumns.of(ArrayEqCount(GraftColumns.expr(a), GraftColumns.expr(b)))
}
