package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * `hyperplane_sig(vec)`: the b-bit random-hyperplane LSH signature of
 * an embedding — bit i = sign(vec · plane_i).
 *
 * The composable form (b independent `array_dot` calls against
 * literal plane arrays, summed) inlines `numBits × dim` double
 * literals into the expression tree — at 16 tables × 6 bits × 64 dims
 * that is ~6k literals PER QUERY, which bloats the generated method
 * far past JIT-friendly size and dominates janino compile time. This
 * expression carries the flattened plane matrix as one reference
 * object and loops over it in generated code.
 *
 * Semantics match the composable form bit-for-bit: planes are walked
 * row-major (bit-major) and each dot accumulates left-to-right from
 * +0.0, so the IEEE result is identical; a NULL element or a
 * dim-mismatched vector yields signature 0 (every dot NULL → every
 * `when` falls through), exactly as the zip_with/aggregate chain did.
 * A wholly-NULL input yields NULL (standard null-safe expression
 * semantics; the composable form gave 0 — embeddings are non-null in
 * every graft path, and NULL is the honest answer).
 */
case class HyperplaneSignature(child: Expression, planes: Seq[Double],
                               numBits: Int, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(planes.length == numBits * dim,
    s"planes has ${planes.length} values for $numBits bits x $dim dims")
  require(numBits <= 63, s"numBits must fit a long: $numBits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType

  @transient private lazy val p: Array[Double] = planes.toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return 0L
    var j = 0
    while (j < dim) { if (arr.isNullAt(j)) return 0L; j += 1 }
    var sig = 0L
    var b = 0
    while (b < numBits) {
      var d = 0.0
      val off = b * dim
      j = 0
      while (j < dim) { d += arr.getDouble(j) * p(off + j); j += 1 }
      if (d >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("hyperplanes", p, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val ok = ctx.freshName("ok")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      s"""
         |long $sig = 0L;
         |boolean $ok = $c.numElements() == $dim;
         |for (int $j = 0; $ok && $j < $dim; $j++) {
         |  if ($c.isNullAt($j)) $ok = false;
         |}
         |if ($ok) {
         |  for (int $b = 0; $b < $numBits; $b++) {
         |    double $d = 0.0;
         |    int $off = $b * $dim;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $d += $c.getDouble($j) * $pRef[$off + $j];
         |    }
         |    if ($d >= 0) $sig |= (1L << $b);
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sig"
}

object HyperplaneSignature {
  def hyperplane_sig(vec: Column, planes: Seq[Double], numBits: Int,
                     dim: Int): Column =
    GraftColumns.of(HyperplaneSignature(GraftColumns.expr(vec), planes, numBits, dim))
}
