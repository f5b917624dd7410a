package graft.index

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Front-coding's prefix split must reconstruct the term exactly and
  * never leave the suffix starting with a lone low surrogate (which
  * would UTF-8-encode as replacement bytes) — over arbitrary unicode
  * including supplementary planes and combining marks. */
object FrontCodingProps extends Properties("front-coding") {

  // strings over ASCII, BMP, combining marks, and supplementary
  // (surrogate-pair) codepoints — the split hazards
  private val genCp: Gen[Int] = Gen.oneOf(
    Gen.choose('a'.toInt, 'z'.toInt),
    Gen.choose(0x00C0, 0x024F),          // Latin extended
    Gen.choose(0x0300, 0x036F),          // combining marks
    Gen.choose(0x4E00, 0x4EFF),          // CJK
    Gen.choose(0x1F600, 0x1F64F))        // emoji (surrogate pairs)
  private val genTerm: Gen[String] =
    Gen.listOfN(6, genCp).map(_.foldLeft(new java.lang.StringBuilder) {
      (sb, cp) => sb.appendCodePoint(cp)
    }.toString)

  property("prefix split reconstructs exactly") =
    forAll(genTerm, genTerm) { (a, b) =>
      val pl = SegmentIndex.sharedPrefixLen(a, b)
      a.substring(0, pl) + b.substring(pl) == b
    }

  property("suffix never starts with a lone low surrogate") =
    forAll(genTerm, genTerm) { (a, b) =>
      val pl = SegmentIndex.sharedPrefixLen(a, b)
      pl >= b.length || pl == 0 || !Character.isLowSurrogate(b.charAt(pl))
    }

  property("suffix UTF-8 round-trips losslessly (no replacement bytes)") =
    forAll(genTerm, genTerm) { (a, b) =>
      val pl = SegmentIndex.sharedPrefixLen(a, b)
      val suffix = b.substring(pl)
      new String(suffix.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.UTF_8) == suffix
    }

  property("shared prefix of a term with itself is the whole term") =
    forAll(genTerm) { t =>
      SegmentIndex.sharedPrefixLen(t, t) == t.length
    }
}
