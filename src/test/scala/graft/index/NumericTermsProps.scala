package graft.index

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The sortable numeric-term encodings must be exact round-trips and
  * ORDER ISOMORPHISMS: code-point comparison of encodings == numeric
  * comparison of values — that is the entire contract the range scans,
  * zone maps and TopN heaps rely on for typed fields. */
object NumericTermsProps extends Properties("numeric-terms") {

  private def cp(a: String, b: String): Int = SegmentIndex.cpCompare(a, b)

  property("long round-trip") = forAll { (v: Long) =>
    NumericTerms.decodeLong(NumericTerms.encodeLong(v)) == v
  }

  property("long order isomorphism") = forAll { (a: Long, b: Long) =>
    Integer.signum(cp(NumericTerms.encodeLong(a), NumericTerms.encodeLong(b))) ==
      java.lang.Long.compare(a, b).sign
  }

  private val genDouble: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e300, 1e300),
    Gen.choose(-1.0, 1.0),
    Gen.oneOf(0.0, 1.0, -1.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue, Double.PositiveInfinity,
      Double.NegativeInfinity))

  property("double round-trip (incl. infinities)") = forAll(genDouble) { v =>
    NumericTerms.decodeDouble(NumericTerms.encodeDouble(v)) == v
  }

  property("double order isomorphism") = forAll(genDouble, genDouble) { (a, b) =>
    Integer.signum(cp(NumericTerms.encodeDouble(a), NumericTerms.encodeDouble(b))) ==
      java.lang.Double.compare(a, b).sign
  }

  property("NaN encodes above +Infinity (Spark's NaN-greatest order)") =
    forAll(genDouble.suchThat(!_.isNaN)) { v =>
      cp(NumericTerms.encodeDouble(Double.NaN),
        NumericTerms.encodeDouble(v)) > 0
    }

  property("fixed width 16") = forAll { (v: Long) =>
    NumericTerms.encodeLong(v).length == 16
  }
}
