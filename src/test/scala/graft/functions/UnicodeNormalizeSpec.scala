package graft.functions

import graft.TestSpark
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnicodeNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(s: String, form: String = "NFC"): String =
    Seq(Tuple1(s)).toDF("t")
      .select(UnicodeNormalize.unicode_normalize(col("t"), form))
      .as[String].head()

  test("NFC composes decomposed sequences; ASCII passes untouched") {
    assert(norm("café") === "café")
    assert(norm("plain ascii 123") === "plain ascii 123")
    // already-composed stays identical
    assert(norm("café") === "café")
  }

  test("NFKC folds compatibility characters (ligature, fullwidth)") {
    assert(norm("\ufb01le", "NFKC") === "file") // fi ligature
    assert(norm("\uff21", "NFKC") === "A") // fullwidth A
    // NFC leaves compatibility chars alone
    assert(norm("\ufb01le", "NFC") === "\ufb01le")
  }

  test("canonicalText: normalize, strip controls, collapse whitespace, trim") {
    val got = Seq(Tuple1("  ab   café   end  "))
      .toDF("t").select(TextAnalysis.canonicalText(col("t")))
      .as[String].head()
    assert(got === "ab caf\u00e9 end")
    // tab/newline survive as whitespace and collapse to single spaces
    val ws = Seq(Tuple1("a\t\nb")).toDF("t")
      .select(TextAnalysis.canonicalText(col("t"))).as[String].head()
    assert(ws === "a b")
  }
}
