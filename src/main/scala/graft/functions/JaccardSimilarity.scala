package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Shared kernel, static-forwardable so eval and codegen run the same
  * method. */
object JaccardKernel {
  /** |distinct(a) ∩ distinct(b)| / |distinct(a) ∪ distinct(b)| — the
    * exact arithmetic of the composable
    * `size(array_intersect(da, db)) / (size(da) + size(db) - inter)`
    * form: integer set cardinalities, one double division, so results
    * are bit-identical however the sets are computed. NULL elements
    * count as one distinct value on each side and intersect like any
    * other, matching array_distinct/array_intersect. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[Any]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      setA.add(if (a.isNullAt(i)) null else a.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[Any]()
    var inter = 0
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      val v = if (b.isNullAt(i)) null else b.getUTF8String(i)
      if (setB.add(v) && setA.contains(v)) inter += 1
      i += 1
    }
    inter.toDouble / (setA.size + setB.size - inter).toDouble
  }
}

/**
 * `jaccard_sim(a, b)`: exact n-gram Jaccard similarity over two
 * string-array columns in one fused pass — the composable
 * `array_distinct`/`array_intersect` form allocates three intermediate
 * arrays per PAIR, which dominates candidate-pair verification (q24's
 * adjacent pairs, q56's bounded all-pairs discovery). Values are
 * bit-identical (integer cardinalities, same final division), so the
 * DuckDB oracles keep hash-matching.
 */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardKernel.compute($a, $b);\n")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaccard_sim"
}

object JaccardSimilarity {
  def jaccard_sim(a: Column, b: Column): Column =
    GraftColumns.of(JaccardSimilarity(GraftColumns.expr(a), GraftColumns.expr(b)))
}
