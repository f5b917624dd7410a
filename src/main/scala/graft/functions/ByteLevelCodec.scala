package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The GPT-2 byte↔unicode alphabet (Radford et al. 2019, the public
 * `encoder.py` `bytes_to_unicode`; HF tokenizers' `ByteLevel`
 * pre-tokenizer ships the same table): production BPE runs over raw
 * BYTES, with every byte mapped to a PRINTABLE unicode char so merge
 * tables serialize as readable strings — printable latin bytes
 * ('!'..'~', '¡'..'¬', '®'..'ÿ') map to themselves, every other byte
 * b maps to U+0100+n in first-gap order (space → 'Ġ' U+0120, newline
 * → 'Ċ'). The map is a BIJECTION, so decode is exact for any byte
 * sequence — the property `decode(encode(x)) == x` leans on.
 */
object ByteLevelKernel {

  /** byte value (0..255) → alphabet char. */
  val byteToChar: Array[Char] = {
    val printable = ((('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ'))
      .map(_.toInt)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** alphabet char → byte value; -1 = not in the alphabet. Dense
    * array lookup (the alphabet tops out at U+0143). */
  val charToByte: Array[Int] = {
    val out = Array.fill(0x200)(-1)
    var b = 0
    while (b < 256) { out(byteToChar(b).toInt) = b; b += 1 }
    out
  }

  def encode(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(byteToChar(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    val bytes = new Array[Byte](str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i).toInt
      val b = if (c < charToByte.length) charToByte(c) else -1
      if (b < 0) throw new IllegalArgumentException(
        s"char U+${c.toHexString} is not in the byte-level alphabet")
      bytes(i) = b.toByte
      i += 1
    }
    UTF8String.fromBytes(bytes)
  }
}

/** `byte_level_encode(str)`: the string's UTF-8 bytes rendered into
  * the GPT-2 byte-level alphabet — one codegen'd pass. */
case class ByteLevelEncode(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    ByteLevelKernel.encode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteLevelKernel.encode($c);\n")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "byte_level_encode"
}

/** `byte_level_decode(str)`: exact inverse of [[ByteLevelEncode]] —
  * alphabet chars back to their bytes, re-read as UTF-8. Throws on a
  * char outside the alphabet (a caller bug: decode is only defined on
  * encoder output). */
case class ByteLevelDecode(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    ByteLevelKernel.decode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteLevelKernel.decode($c);\n")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "byte_level_decode"
}

object ByteLevelCodec {
  def byte_level_encode(s: Column): Column =
    GraftColumns.of(ByteLevelEncode(GraftColumns.expr(s)))
  def byte_level_decode(s: Column): Column =
    GraftColumns.of(ByteLevelDecode(GraftColumns.expr(s)))
}
