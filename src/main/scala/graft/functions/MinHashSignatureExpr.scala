package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * `minhash_sig(hashes)`: the full MinHash signature — for each of the
 * `numHashes` universal-hash functions h_i(x) = ((x mod p)·a_i + b_i)
 * mod p (p = 2^31−1), the minimum over the input hash array — as one
 * array<int>.
 *
 * Why an expression: the composable form ran `numHashes` separate
 * `aggregate` lambdas over the (staged) shingle-hash array — 32
 * interpreted traversals per row, with `x mod p` recomputed per
 * function. Here one pass walks the array once, reduces `x mod p`
 * once per element, and updates all 32 minima in a tight loop, inside
 * whole-stage codegen.
 *
 * Value parity with the composable form is exact: same `%` remainder
 * semantics (Java and Spark agree, including negative inputs), same
 * minimum math, and every non-empty input's minimum is < p so the
 * final int cast is lossless. (An EMPTY input truncates Long.MaxValue
 * to -1 here where the composable form's ANSI int cast would throw —
 * unreachable in graft, whose shingle builders never emit an empty
 * array.) NULL elements: the composable `aggregate` nulled the whole
 * signature; so does this (returns NULL).
 */
case class MinHashSignatureExpr(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(as.length == bs.length && as.nonEmpty,
    s"coefficient arrays disagree: ${as.length} vs ${bs.length}")

  private val numHashes = as.length

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // can return NULL (null element) even for a non-nullable child —
  // without this, nullSafeCodeGen's non-nullable branch emits
  // `ev.isNull = true` against an undeclared variable
  override def nullable: Boolean = true

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  private val P = 2147483647L // 2^31 - 1, prime

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return null
      val hm = arr.getLong(j) % P
      var i = 0
      while (i < numHashes) {
        val hv = (hm * aArr(i) + bArr(i)) % P
        if (hv < mins(i)) mins(i) = hv
        i += 1
      }
      j += 1
    }
    val out = new Array[Int](numHashes)
    var i = 0
    while (i < numHashes) { out(i) = mins(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val hm = ctx.freshName("hm")
      val hv = ctx.freshName("hv")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($c.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $hm = $c.getLong($j) % ${P}L;
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $hv = ($hm * $aRef[$i] + $bRef[$i]) % ${P}L;
         |    if ($hv < $mins[$i]) $mins[$i] = $hv;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  int[] $out = new int[$numHashes];
         |  for (int $i = 0; $i < $numHashes; $i++) $out[$i] = (int) $mins[$i];
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSignatureExpr {
  def minhash_sig(hashes: Column, as: Seq[Long], bs: Seq[Long]): Column =
    GraftColumns.of(MinHashSignatureExpr(GraftColumns.expr(hashes), as, bs))
}
