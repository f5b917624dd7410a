package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F2 tokenize: the reference's own golden test (SolrMorphlineTest.java:52-68)") {
    // "Hello World!\nFoo@Bar.com #%()123" -> [hello, world, foo, bar.com, 123]
    val got = Seq("Hello World!\nFoo@Bar.com #%()123").toDF("t")
      .select(TextAnalysis.tokenize(col("t")).as("toks"))
      .as[Seq[String]].collect().head
    assert(got === Seq("hello", "world", "foo", "bar.com", "123"))
  }

  test("tokenize removes Lucene English stopwords, keeps interior dots") {
    val got = Seq("The quick fox is on the v1.2.3 release").toDF("t")
      .select(TextAnalysis.tokenize(col("t")).as("toks"))
      .as[Seq[String]].collect().head
    assert(got === Seq("quick", "fox", "v1.2.3", "release"))
  }

  test("tokenize strips possessive 's, keeps interior apostrophes (text_en)") {
    // EnglishPossessiveFilter: "John's" -> john; contractions stay whole
    val got = Seq("John's dog don't chase Mary's cats").toDF("t")
      .select(TextAnalysis.tokenize(col("t")).as("toks"))
      .as[Seq[String]].collect().head
    assert(got === Seq("john", "dog", "don't", "chase", "mary", "cats"))
  }

  test("languageId picks the language with most stopword hits") {
    val got = Seq(
      "the cat sat on the mat and it was happy",
      "der hund ist nicht auf der wiese und ich bin da",
      "le chat est dans la maison pour une nuit",
      "el perro no es una amenaza por las noches",
      "xyzzy qwerty").toDF("t")
      .select(TextAnalysis.languageId(col("t")).as("lang")).as[String].collect().toSeq
    assert(got === Seq("en", "de", "fr", "es", "und"))
  }

  test("fingerprint is whitespace/case normalized") {
    val df = Seq("Hello   World", "hello world", "different").toDF("t")
    val fps = df.select(TextAnalysis.fingerprint(col("t")).as("fp")).as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("quality columns: keep flag semantics") {
    val df = Seq(
      "a good document with several reasonable english words here",
      "!!! ??? ### $$$ %%%",
      "ok").toDF("t")
    val cols = TextAnalysis.qualityColumns(col("t"))
    val keep = cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .select("keep").as[Boolean].collect().toSeq
    assert(keep === Seq(true, false, false))
  }

  test("whitespace + subword token counts") {
    val df = Seq("one two three").toDF("t")
    assert(df.select(TextAnalysis.whitespaceTokenCount(col("t"))).as[Int].collect().head === 3)
    val sub = df.select(TextAnalysis.subwordCountEstimate(col("t"))).as[Int].collect().head
    assert(sub >= 3)
  }
}
