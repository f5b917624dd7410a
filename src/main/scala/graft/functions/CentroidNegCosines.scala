package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * `centroid_neg_cosines(vec)`: the vector's NEGATIVE cosine against
 * each of `nlist` fixed centroids, as one array<double> — the IVF
 * coarse-quantization kernel (negated so `array_min` = nearest cell,
 * matching the `-cosine(...)` convention of the composable form it
 * replaces).
 *
 * Why an expression: the composable form built `nlist` cosine trees
 * against literal centroid arrays (`nlist × dim` inlined doubles,
 * 1k+ literals at 16×64) and recomputed `norm(vec)` once per
 * centroid. Here the centroid matrix and its precomputed norms ride
 * as reference objects; the vector norm is computed once and each
 * centroid dot once per row.
 *
 * Arithmetic matches `-(dot(v,c) / (norm(v) * norm(c)))` exactly:
 * dots accumulate left-to-right from +0.0, norms are
 * sqrt-of-left-to-right-sum-of-squares, so results are bit-identical
 * to the composable form. A dim-mismatched vector or NULL element
 * yields NULL (the composable chain nulled every element too).
 */
case class CentroidNegCosines(child: Expression, centroids: Seq[Double],
                              nlist: Int, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(centroids.length == nlist * dim,
    s"centroids has ${centroids.length} values for $nlist cells x $dim dims")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // can return NULL (dim mismatch / null element) even for a
  // non-nullable child — without this, nullSafeCodeGen's non-nullable
  // branch emits `ev.isNull = true` against an undeclared variable
  override def nullable: Boolean = true

  @transient private lazy val cs: Array[Double] = centroids.toArray
  @transient private lazy val cnorms: Array[Double] = Array.tabulate(nlist) { i =>
    var s = 0.0
    var j = 0
    while (j < dim) { val x = cs(i * dim + j); s += x * x; j += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    var j = 0
    var sq = 0.0
    while (j < dim) {
      if (arr.isNullAt(j)) return null
      val x = arr.getDouble(j)
      sq += x * x
      j += 1
    }
    val nv = math.sqrt(sq)
    val out = new Array[Double](nlist)
    var i = 0
    while (i < nlist) {
      var d = 0.0
      val off = i * dim
      j = 0
      while (j < dim) { d += arr.getDouble(j) * cs(off + j); j += 1 }
      out(i) = -(d / (nv * cnorms(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val csRef = ctx.addReferenceObj("centroids", cs, "double[]")
    val cnRef = ctx.addReferenceObj("centroidNorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val sq = ctx.freshName("sq")
      val nv = ctx.freshName("nv")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      s"""
         |if ($c.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sq = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($c.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    double $x = $c.getDouble($j);
         |    $sq += $x * $x;
         |  }
         |  if (!${ev.isNull}) {
         |    double $nv = java.lang.Math.sqrt($sq);
         |    double[] $out = new double[$nlist];
         |    for (int $i = 0; $i < $nlist; $i++) {
         |      double $d = 0.0;
         |      int $off = $i * $dim;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $d += $c.getDouble($j) * $csRef[$off + $j];
         |      }
         |      $out[$i] = -($d / ($nv * $cnRef[$i]));
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "centroid_neg_cosines"
}

object CentroidNegCosines {
  def centroid_neg_cosines(vec: Column, centroids: Seq[Double], nlist: Int,
                           dim: Int): Column =
    GraftColumns.of(CentroidNegCosines(GraftColumns.expr(vec), centroids, nlist, dim))
}
