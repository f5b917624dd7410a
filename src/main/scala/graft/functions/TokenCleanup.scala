package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `token_cleanup(tokens)`: possessive-`'s` strip + stopword removal in
 * one fused pass — the text_en-style post-tokenization chain
 * (TextAnalysis.tokenize). The composable form ran a per-token
 * `regexp_replace(t, "'s$", "")` and an `isin` chain over the stopword
 * list inside interpreted lambdas; here the suffix test is two byte
 * compares and the stopword set one hash probe. Semantics identical:
 * `'s` stripped only as a suffix, once (`"x's's"` → `"x's"`), exactly
 * like the anchored regex; a NULL token maps to NULL then fails the
 * stopword predicate, and the composable `filter` dropped it — so
 * NULLs are dropped here too.
 */
case class TokenCleanup(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any =
    TokenCleanup.compute(v.asInstanceOf[ArrayData], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwords", stopSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCleanup.compute($c, $setRef);\n")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "token_cleanup"
}

object TokenCleanup {
  private val POSS = UTF8String.fromString("'s")

  /** Shared kernel for eval + codegen. */
  def compute(arr: ArrayData, stop: java.util.HashSet[UTF8String]): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        var t = arr.getUTF8String(i)
        if (t.endsWith(POSS)) t = t.substring(0, t.numChars() - 2)
        if (!stop.contains(t)) out.add(t)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def token_cleanup(tokens: Column, stopwords: Seq[String]): Column =
    GraftColumns.of(TokenCleanup(GraftColumns.expr(tokens), stopwords))
}
