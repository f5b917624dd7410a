package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel, static-forwardable so eval and codegen run the same
  * method. */
object UnicodeNormalizeKernel {
  /** `java.text.Normalizer` over the UTF8String — the Unicode
    * normalization algorithm is version-pinned by the standard, so
    * NFC here == nfc_normalize in DuckDB == any conforming
    * implementation (the cross-engine property q167 checks).
    * Fast path: pure-ASCII input (the common corpus case) is returned
    * untouched without materializing a java.lang.String. */
  def compute(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if ((s.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, form)) s
      else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
    }
  }
}

/**
 * `unicode_normalize(text, form)`: Unicode normalization (NFC/NFKC/
 * NFD/NFKD) as a codegen'd expression — the corpus-hygiene step that
 * makes visually-identical strings byte-identical BEFORE fingerprint
 * dedup (decomposed "é" vs composed "é" otherwise hash apart and
 * survive exact dedup as "distinct" documents). ASCII rows (the
 * overwhelming corpus case) short-circuit on a byte scan.
 */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(Set("NFC", "NFKC", "NFD", "NFKD").contains(form),
    s"unknown normalization form $form")

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UnicodeNormalizeKernel.compute(v.asInstanceOf[UTF8String], f)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", f, "java.text.Normalizer.Form")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNormalizeKernel.compute($c, $formRef);\n")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {
  def unicode_normalize(text: Column, form: String = "NFC"): Column =
    GraftColumns.of(UnicodeNormalize(GraftColumns.expr(text), form))
}
