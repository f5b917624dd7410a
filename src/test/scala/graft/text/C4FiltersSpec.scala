package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class C4FiltersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clean(text: String, bad: Seq[String] = Nil) =
    C4Filters.c4Clean(Seq((1L, text)).toDF("id", "text"), col("text"),
        minWords = 3, minLines = 2, badWords = bad)
      .select("clean_text", "n_lines_kept", "drop_reason")
      .as[(String, Long, Option[String])].head()

  test("keeps only terminal-punctuation lines with enough words") {
    val (ct, n, reason) = clean(
      "a good sentence here.\nshort.\nno punctuation at all\nanother fine line!\n")
    assert(ct === "a good sentence here.\nanother fine line!")
    assert(n === 2L)
    assert(reason === None)
  }

  test("closing quote after punctuation counts as terminal") {
    val (_, n, _) = clean("he said \"this is fine.\"\nand that was that.")
    assert(n === 2L)
  }

  test("lorem ipsum beats other reasons (C4 rule order)") {
    val (_, _, r) = clean("Lorem Ipsum dolor { badword.\nx.", Seq("badword"))
    assert(r === Some("lorem_ipsum"))
  }

  test("brace then bad_word then too_few_lines precedence") {
    assert(clean("code { here.\nmore good text here.\nthird fine line.")._3
      === Some("brace"))
    assert(clean("spamword is right here.\nmore good text here.",
      Seq("spamword"))._3 === Some("bad_word"))
    assert(clean("only one good line here.")._3 === Some("too_few_lines"))
  }

  test("empty text drops with empty clean_text") {
    val (ct, n, r) = clean("")
    assert(ct === "" && n === 0L && r === Some("too_few_lines"))
  }

  test("dedupLinesAcross: first occurrence wins, order preserved, empty docs kept") {
    val df = Seq(
      (1L, "unique one.\nfooter text."),
      (2L, "footer text.\nunique two."),   // loses the footer, keeps its own
      (3L, "footer text.")                 // loses everything
    ).toDF("id", "text")
    val got = C4Filters.dedupLinesAcross(df, col("id"), col("text"))
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "unique one.\nfooter text.", 2L, 2L),
      (2L, "unique two.", 1L, 2L),
      (3L, "", 0L, 1L)))
  }

  test("dedupLinesAcross: duplicate lines WITHIN a doc collapse to the first") {
    val df = Seq((1L, "same line.\nsame line.\nother.")).toDF("id", "text")
    val got = C4Filters.dedupLinesAcross(df, col("id"), col("text"))
      .as[(Long, String, Long, Long)].head()
    assert(got === ((1L, "same line.\nother.", 2L, 3L)))
  }

  test("stripDomainChrome: cross-doc header/footer detection with tau gate") {
    val docs = Seq(
      (1L, "d1", "NAV\nreal content one."),
      (2L, "d1", "NAV\nreal content two."),
      (3L, "d1", "NAV\nreal content three."),
      (4L, "d2", "unique opener.\nbody a"),  // no dominant header/footer
      (5L, "d2", "another opener.\nbody b")
    ).toDF("id", "src", "text")
    val got = C4Filters.stripDomainChrome(docs, col("src"), col("text"),
        tauMilli = 900)
      .select("id", "text_stripped").as[(Long, String)].collect().toMap
    assert(got(1L) === "real content one.")
    assert(got(2L) === "real content two.")
    // d2 has no >=90% first line — untouched
    assert(got(4L) === "unique opener.\nbody a")
  }

  test("stripDomainChrome: footer strip and doc-is-chrome edge") {
    val docs = Seq(
      (1L, "d", "body one\nFOOT"),
      (2L, "d", "body two\nFOOT"),
      (3L, "d", "FOOT") // the doc IS the footer -> strips to empty
    ).toDF("id", "src", "text")
    val got = C4Filters.stripDomainChrome(docs, col("src"), col("text"),
        tauMilli = 900)
      .select("id", "text_stripped").as[(Long, String)].collect().toMap
    assert(got(1L) === "body one")
    assert(got(3L) === "")
  }
}
