package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** graft_term_match's kernel must agree with the index-time analyzer
  * EXACTLY — that identity is what makes the pushed posting lookup and
  * the residual re-check interchangeable. Fuzzed over ASCII, BMP,
  * exotic case-fold characters (Kelvin sign, dotted capital I) and
  * surrogate halves. */
object TermMatchProps extends Properties("term-match") {

  private def compute(v: String, t: String): Boolean =
    TermMatch.compute(UTF8String.fromString(v), UTF8String.fromString(t))

  private def reference(value: String, term: String): Boolean =
    term.nonEmpty && graft.index.SegmentIndex.analyze(value).contains(term)

  private val exotic = Seq('K', 'İ', 'É', '\uD83D', '\uDE00')
  private val charGen = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '-', '_', '.', ',', '!', '?'),
    1 -> Gen.oneOf(exotic),
    1 -> Gen.asciiPrintableChar)
  private val textGen = Gen.listOf(charGen).map(_.mkString)
  private val termGen = Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString.toLowerCase)

  property("compute == analyze-then-contains") = forAll(textGen, termGen) {
    (text, term) => compute(text, term) == reference(text, term)
  }

  property("every token of the text matches; empty term never") =
    forAll(textGen) { text =>
      graft.index.SegmentIndex.analyze(text).forall(compute(text, _)) &&
        !compute(text, "")
    }

  // the streaming early-exit kernel (the residual hot path) must be
  // indistinguishable from materialize-then-contains for ANY term —
  // including non-token terms the termGen above never produces
  private val rawTermGen = Gen.frequency(
    4 -> termGen,
    1 -> Gen.listOfN(3, charGen).map(_.mkString),
    1 -> Gen.const(""))
  property("analyzeContains == analyze-then-contains (any term)") =
    forAll(textGen, rawTermGen) { (text, term) =>
      graft.index.SegmentIndex.analyzeContains(text, term) ==
        graft.index.SegmentIndex.analyze(text).contains(term)
    }
}

class TermMatchSpec extends AnyFunSuite {
  private def m(v: String, t: String) =
    TermMatch.compute(UTF8String.fromString(v), UTF8String.fromString(t))

  test("edge cases: phrase terms, uppercase terms, substring-not-token") {
    assert(!m("spark rocks", "spark rocks")) // a phrase is not a token
    assert(!m("spark rocks", "Spark"))       // tokens are lowercase
    assert(!m("sparkles", "spark"))          // substring != token
    assert(m("spark-adjacent", "spark"))     // hyphen splits runs
    assert(m("A1b2", "a1b2"))                // case-folded alnum run
  }
}
