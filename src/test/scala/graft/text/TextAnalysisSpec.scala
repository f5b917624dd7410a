package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unigramRarity: exact integer milli-ratio costs, hand-computed corpus") {
    // corpus: "a a b" + "a c" -> T=5 tokens, V=3 vocab, T+V=8
    // costs: a: 8000 div (3+1)=2000; b: 8000 div (1+1)=4000; c: 4000
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramRarity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: 2000+2000+4000 = 8000 over 3 tokens; doc 2: 2000+4000 = 6000 over 2
    assert(got === Map(
      1L -> ((3L, 8000L, 8000.0 / 3)),
      2L -> ((2L, 6000L, 3000.0))))
    // punctuation/case fold into the same tokenizer
    val noisy = TextAnalysis.unigramRarity(
      Seq((1L, "A, a; B!"), (2L, "a C")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(noisy === Map(1L -> 8000L, 2L -> 6000L))
  }

  test("bigramRarity: exact integer conditional-surprise costs, hand-computed corpus") {
    // corpus: "a b a b" + "b c" -> unigrams a:2 b:3 c:1, V=3
    // bigrams: (a,b):2 (b,a):1 (b,c):1
    // costs: (a,b): ((2+3)*1000) div 3 = 1666; (b,a): ((3+3)*1000) div 2
    //   = 3000; (b,c): 3000
    val df = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramRarity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      1L -> ((3L, 1666L + 3000L + 1666L, 6332.0 / 3)),
      2L -> ((1L, 3000L, 3000.0))))
    // single-token docs have no bigrams and drop out
    val short = TextAnalysis.bigramRarity(
      Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(short === Set(1L))
  }

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

  test("repetitionColumns: dup fractions for words/2-grams/3-grams") {
    val df = Seq(
      Seq("a", "a", "a", "a"),      // all same: dup_word 3/4; 2-grams all "a a" -> 2/3
      Seq("a", "b", "c", "d"),      // all distinct: 0 everywhere
      Seq("a", "b", "a", "b"),      // dup words 2/4; 2-grams [ab, ba, ab] -> 1/3
      Seq.empty[String]             // empty: all 0.0
    ).toDF("toks")
    val cols = TextAnalysis.repetitionColumns(col("toks")).map { case (n, c) => c.as(n) }
    val got = df.select(cols: _*).as[(Double, Double, Double)].collect().toSeq
    assert(got(0)._1 === 3.0 / 4)
    assert(got(0)._2 === 2.0 / 3)
    assert(got(0)._3 === 1.0 / 2)
    assert(got(1) === ((0.0, 0.0, 0.0)))
    assert(got(2)._1 === 2.0 / 4)
    assert(got(2)._2 === 1.0 / 3)
    assert(got(3) === ((0.0, 0.0, 0.0)))
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

  test("token cleanup matches the composable formulation") {
    val sw = TextAnalysis.EnglishStopwords
    def composable(text: org.apache.spark.sql.Column) = {
      val toks = regexp_extract_all(
        lower(text), lit("[a-z0-9]+(?:['.][a-z0-9]+)*"), lit(0))
      val stemmed = transform(toks, t => regexp_replace(t, "'s$", ""))
      filter(stemmed, t => !t.isin(sw: _*))
    }
    val df = Seq(
      "John's dog and the cat's toy",
      "it's a file.name v1.2 test",   // interior apostrophe + dotted tokens
      "x's's nested possessive",
      "the a an of").toDF("t")        // all stopwords -> empty
    val rows = df.select(
      TextAnalysis.tokenize(col("t")).as("fused"),
      composable(col("t")).as("comp")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("winnowing minima match the composable formulation") {
    val w = 4
    // the composable form the fused kernel replaced
    def composable(hs: org.apache.spark.sql.Column) = {
      val n = size(hs)
      array_distinct(when(n <= w, array(array_min(hs)))
        .otherwise(transform(sequence(lit(0), n - w),
          i => least((1 to w).map(j => element_at(hs, i + lit(j))): _*))))
    }
    val cases = Seq(
      Seq(5L, 3L, 9L, 1L, 7L, 3L, 8L, 2L), // normal slide
      Seq(4L, 4L, 4L, 4L, 4L),             // all-equal dedup
      Seq(9L, 2L),                         // n < w whole-array window
      Seq(6L))                             // single element
    val df = cases.map(Tuple1(_)).toDF("hs")
    val rows = df.select(
      TextAnalysis.winnowingFingerprints(col("hs"), w).as("fused"),
      composable(col("hs")).as("comp")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("duplicateLineColumns: dup fraction and char mass, hand-computed") {
    // lines: [ab, cde, ab, ab, f] -> 5 lines, 3 distinct, 2 dups
    // chars: total 2+3+2+2+1=10; dup mass: ab occurs 3x -> 2 extra * 2 = 4
    val df = Seq((1L, Seq("ab", "cde", "ab", "ab", "f")),
                 (2L, Seq("xyz")),
                 (3L, Seq.empty[String])).toDF("id", "lines")
    val sigs = TextAnalysis.duplicateLineColumns(col("lines"))
    val got = df.select(col("id") +: sigs.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) === ((2.0 / 5, 4.0 / 10)))
    assert(got(2L) === ((0.0, 0.0)))
    assert(got(3L) === ((0.0, 0.0)))
  }

  test("dupNgramCoverage: span union over repeated n-grams") {
    // tokens: a b a b a  -> 2-grams: ab ba ab ba; all repeated ->
    // covered positions 0..4 = 5/5. 3-grams: aba bab aba -> aba x2
    // covers 0-2 and 2-4 -> all 5 positions.
    // tokens: a b c d -> no repeats -> 0.0
    val df = Seq((1L, Seq("a", "b", "a", "b", "a")),
                 (2L, Seq("a", "b", "c", "d"))).toDF("id", "toks")
    val got = df.select(col("id"),
        TextAnalysis.dupNgramCoverage(col("toks"), 2).as("c2"),
        TextAnalysis.dupNgramCoverage(col("toks"), 3).as("c3"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) === ((1.0, 1.0)))
    assert(got(2L) === ((0.0, 0.0)))
    // partial coverage: a b a b c c c-gram? -> 2-grams: ab ba ab bc cc
    // ab repeats -> covers 0,1,2,3; bc,cc unique -> 4/6
    val p = Seq((1L, Seq("a", "b", "a", "b", "c", "c"))).toDF("id", "toks")
      .select(TextAnalysis.dupNgramCoverage(col("toks"), 2)).collect()(0).getDouble(0)
    assert(p === 4.0 / 6)
  }

  test("topNgramCharFraction: argmax with (count desc, gram asc) tie-break") {
    val df = Seq(
      (1L, "buy now buy now buy now"),  // "buy now" x3, joined len 23
      (2L, "alpha beta gamma"),         // all 2-grams unique -> lexicographic min
      (3L, "solo")                      // < n tokens: whole-doc fallback
    ).toDF("id", "text")
    val got = TextAnalysis.topNgramCharFraction(df, "id", "text", n = 2)
      .orderBy("id")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(got(0) === ((1L, "buy now", 3L, 23L, 3 * 7 / 23.0)))
    assert(got(1) === ((2L, "alpha beta", 1L, 16L, 10 / 16.0)))
    assert(got(2) === ((3L, "solo", 1L, 4L, 1.0)))
  }

  test("lexicalDiversityColumns: TTR in exact milli space") {
    val df = Seq((1L, Seq("a", "b", "a", "b")), (2L, Seq("x", "y", "z")),
                 (3L, Seq.empty[String])).toDF("id", "toks")
    val cols = TextAnalysis.lexicalDiversityColumns(col("toks"))
    val got = df.select(col("id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((4L, 2L, 500L)))
    assert(got(2L) === ((3L, 3L, 1000L)))
    assert(got(3L) === ((0L, 0L, 0L)))
  }

  test("perplexityBuckets: per-language thirds, fluent docs head") {
    // 6 en docs: 5 made of common tokens, 1 of hapaxes -> the rare doc
    // lands in the tail; buckets are exactly 2/2/2
    val docs = (
      (1 to 5).map(i => (i.toLong, "the cat sat on the mat", "en")) :+
        ((6L, "zyzzyva quokka axolotl", "en"))
      ).toDF("id", "text", "lang")
    val got = TextAnalysis.perplexityBuckets(docs, "id", "text", "lang")
    val byBucket = got.groupBy("ppl_bucket").count()
      .as[(String, Long)].collect().toMap
    assert(byBucket === Map("head" -> 2L, "middle" -> 2L, "tail" -> 2L))
    val rare = got.filter(col("id") === 6L).select("ppl_bucket").as[String].collect()
    assert(rare.toSeq === Seq("tail"))
  }

  test("stupidBackoffScore: trigram hit, bigram backoff, unigram backoff") {
    // model "a b c a b c": trigrams (a,b,c)x2 (b,c,a) (c,a,b);
    // bigrams (a,b)x2 (b,c)x2 (c,a); unigrams a,b,c x2 each, T=6
    val model = Seq((100L, "a b c a b c")).toDF("id", "text")
    // scored docs exercise each arm: trigram hit, bigram backoff,
    // unigram backoff
    val docs = Seq((1L, "a b c"), (2L, "x b c"), (3L, "x y c")).toDF("id", "text")
    val got = TextAnalysis.stupidBackoffScore(docs, model, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // model counts: tokens a:2 b:2 c:2 T=6; bigrams ab:2 bc:2 ca:1 cb? no ->
    //   pairs: (a,b)x2 (b,c)x2 (c,a)x1; trigrams: (a,b,c)x2 (b,c,a)x1 (c,a,b)x1
    // doc1 "a b c": trigram abc seen c3=2, cab=c2(a,b)=2 -> (2*1000)//2 = 1000
    assert(got(1L) === ((1L, 1000L)))
    // doc2 "x b c": trigram xbc unseen; bigram (b,c) c2=2, c1(b)=2 ->
    //   S2=(2*1000)//2=1000 -> (400*1000)//1000 = 400
    assert(got(2L) === ((1L, 400L)))
    // doc3 "x y c": trigram+bigram (y,c) unseen -> unigram c(c)=2, T=6 ->
    //   (160*((2*1000)//6))//1000 = (160*333)//1000 = 53
    assert(got(3L) === ((1L, 53L)))
  }

  test("structureFingerprint: same shape matches, different shape does not") {
    val toks = col("toks")
    val df = Seq(
      (1L, Seq("hello", "big", "world")),
      (2L, Seq("jumbo", "cat", "sings")),  // lengths 5,3,5 — same shape
      (3L, Seq("a", "b"))
    ).toDF("id", "toks")
    val fp = df.select(col("id"), TextAnalysis.structureFingerprint(toks).as("f"))
      .as[(Long, String)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }
}
