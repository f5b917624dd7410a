package graft.text

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/**
 * Byte-level pretokenization properties — the contracts production
 * decode leans on, fuzzed over arbitrary unicode (surrogate range
 * excluded: an UNPAIRED surrogate is not valid UTF-16, so no byte
 * encoding of it exists to round-trip):
 *  - the GPT-2 pretokenizer's matches PARTITION the input;
 *  - the byte alphabet is a bijection (decode ∘ encode = id);
 *  - therefore decode(encodeByteLevel(x)) == x for ANY merge table.
 */
object ByteLevelProps extends Properties("byte-level") {

  // pieces are WHOLE codepoints (an emoji is a surrogate PAIR — char
  // sampling would emit unpaired surrogates, which are not valid
  // UTF-16 and have no UTF-8 byte encoding to round-trip)
  private val pieceGen: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    3 -> Gen.oneOf(" ", "\n", "\t", ".", ",", "'", "-", "!", "?"),
    1 -> Gen.choose(0x80, 0x2fff).map(_.toChar.toString),
    1 -> Gen.oneOf("中", "文", "Ω", "é", "🎉", "😀"))

  private val textGen: Gen[String] =
    Gen.listOf(pieceGen).map(_.mkString)

  property("pretokenize partitions the input (concat == input)") =
    forAll(textGen) { s => ByteLevel.pretokenize(s).mkString == s }

  property("alphabet round trip: decode(encode(s)) == s") =
    forAll(textGen) { s => ByteLevel.decode(ByteLevel.encode(s)) == s }

  property("alphabet is a bijection over all 256 bytes") = {
    val chars = graft.functions.ByteLevelKernel.byteToChar
    chars.distinct.length == 256 &&
      (0 until 256).forall { b =>
        graft.functions.ByteLevelKernel.charToByte(chars(b).toInt) == b
      }
  }

  property("space maps to Ġ (U+0120), newline to Ċ (U+010A) — the " +
      "published GPT-2 table") = {
    val m = graft.functions.ByteLevelKernel.byteToChar
    m(' '.toInt) == 'Ġ' && m('\n'.toInt) == 'Ċ' &&
      m('a'.toInt) == 'a' && m('~'.toInt) == '~'
  }

  property("full-pipeline decode inverts encode under an arbitrary " +
      "merge table (chunk-scoped merges + partition + bijection)") =
    forAll(textGen) { s =>
      val merges = Seq(Bpe.Merge(1, "a", "b", 0L),
        Bpe.Merge(2, "Ġ", "ab", 0L), Bpe.Merge(3, "e", "r", 0L))
      val chunks = ByteLevel.pretokenize(s).map(ByteLevel.encode)
      // drive the same kernel semantics driver-side: tokens per chunk
      // via rank-order application, then concat + decode
      val tokens = chunks.flatMap { c =>
        merges.foldLeft(c.map(_.toString).toList) { (syms, m) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == m.left &&
                syms(i + 1) == m.right) { out += m.left + m.right; i += 2 }
            else { out += syms(i); i += 1 }
          }
          out.toList
        }
      }
      ByteLevel.decode(tokens.mkString) == s
    }
}
