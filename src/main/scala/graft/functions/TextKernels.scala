package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Small per-row text statistics kernels — each replaces an interpreted
 * higher-order-function chain over the token array (see
 * docs/KERNELS.md for the pattern). Values are bit-identical to the
 * composable forms; the DuckDB oracles (q18/q19/q47) are the
 * end-to-end proof.
 */
object TextKernels {

  /** Shared: distinct members of `set` present in the array — the
    * `size(array_intersect(tokens, lit array))` count (null elements
    * never match a null-free set, exactly like array_intersect). */
  def inSetCount(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val max = set.size()
    val seen = new java.util.HashSet[UTF8String]()
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n && c < max) { // saturated: no token can raise the count
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (set.contains(t) && seen.add(t)) c += 1
      }
      i += 1
    }
    c
  }

  /** Shared: Σ length(token) — the `aggregate(toks, 0, acc+length)`
    * fold (a null element nulls the whole sum, as the fold did). */
  def lenSum(arr: ArrayData): Any = {
    var s = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) return null
      s += arr.getUTF8String(i).numChars()
      i += 1
    }
    s
  }

  /** Shared: Σ max(1, ceil(len/4.0)) — the BPE-ish subword estimate
    * fold (same double division as the composable `/ lit(4)`). */
  def subwordSum(arr: ArrayData): Any = {
    var s = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val len = arr.getUTF8String(i).numChars()
      s += math.max(1, math.ceil(len / 4.0).toInt)
      i += 1
    }
    s
  }
}

/** `in_set_count(tokens)`: distinct tokens from a fixed set. */
case class ArrayInSetCount(child: Expression, set: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType

  @transient private lazy val hashSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    set.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any =
    TextKernels.inSetCount(v.asInstanceOf[ArrayData], hashSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSet", hashSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.inSetCount($c, $ref);\n")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "in_set_count"
}

object ArrayInSetCount {
  def in_set_count(tokens: Column, set: Seq[String]): Column =
    GraftColumns.of(ArrayInSetCount(GraftColumns.expr(tokens), set))
}

/** `str_len_sum(tokens)`: Σ length(token). */
case class ArrayStrLenSum(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  // a null ELEMENT nulls the sum even for a non-nullable child
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextKernels.lenSum(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("lenSum")
      s"""
         |Object $r = graft.functions.TextKernels.lenSum($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Integer) $r).intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "str_len_sum"
}

object ArrayStrLenSum {
  def str_len_sum(tokens: Column): Column =
    GraftColumns.of(ArrayStrLenSum(GraftColumns.expr(tokens)))
}

/** `subword_est_sum(tokens)`: Σ max(1, ceil(len/4.0)). */
case class SubwordEstSum(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextKernels.subwordSum(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("subSum")
      s"""
         |Object $r = graft.functions.TextKernels.subwordSum($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Integer) $r).intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "subword_est_sum"
}

object SubwordEstSum {
  def subword_est_sum(tokens: Column): Column =
    GraftColumns.of(SubwordEstSum(GraftColumns.expr(tokens)))
}
