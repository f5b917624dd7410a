package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, Seq("spark", "fast", "spark")),     // spark tf=2
    (2L, Seq("spark", "slow")),
    (3L, Seq("data", "table", "data")),
    (4L, Seq("table", "fast"))
  ).toDF("id", "toks")

  test("tfIdf: rare terms outweigh common ones; tf multiplies") {
    val got = Ranking.tfIdf(corpus, col("id"), col("toks"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val n = 4.0
    def idf(df: Double) = math.log((n + 1) / (df + 1)) + 1
    assert(got((1L, "spark"))._1 === 2L)
    assert(math.abs(got((1L, "spark"))._2 - 2 * idf(2)) < 1e-12)
    assert(math.abs(got((3L, "data"))._2 - 2 * idf(1)) < 1e-12)
    // rarer "data" (df=1) scores above equally-frequent "spark" (df=2)
    assert(got((3L, "data"))._2 > got((1L, "spark"))._2)
  }

  test("bm25: matches a hand-computed score; non-matching docs absent") {
    val got = Ranking.bm25(corpus, col("id"), col("toks"), Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Set(1L, 2L))
    val n = 4.0; val df = 2.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val avgdl = (3 + 2 + 3 + 2) / 4.0
    def s(tf: Double, dl: Double) =
      idf * (tf * 1.2 + tf) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(math.abs(got(1L) - s(2, 3)) < 1e-12)
    assert(math.abs(got(2L) - s(1, 2)) < 1e-12)
    assert(got(1L) > got(2L)) // higher tf wins at similar length
  }

  test("bm25: multi-term scores are summed in fixed query order") {
    val got = Ranking.bm25(corpus, col("id"), col("toks"), Seq("spark", "table"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val single = Seq("spark", "table").map(t =>
      Ranking.bm25(corpus, col("id"), col("toks"), Seq(t))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)
    for (id <- got.keySet)
      assert(got(id) === single.map(_.getOrElse(id, 0.0)).reduceLeft(_ + _))
  }

  test("phraseOccurrences: counts exact consecutive runs, not bags of words") {
    val docs = Seq(
      (1L, Seq("big", "table", "scan")),            // phrase present once
      (2L, Seq("table", "big")),                    // both words, wrong order
      (3L, Seq("big", "x", "table")),               // gap
      (4L, Seq("big", "table", "big", "table")),    // twice
      (5L, Seq("nothing", "here"))
    ).toDF("id", "toks")
    val got = Ranking.phraseOccurrences(docs, col("id"), col("toks"), Seq("big", "table"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 4L -> 2L))
  }

  test("phraseOccurrences: three-word phrases chain the position joins") {
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "x", "c")),
      (3L, Seq("x", "a", "b", "c"))
    ).toDF("id", "toks")
    val got = Ranking.phraseOccurrences(docs, col("id"), col("toks"), Seq("a", "b", "c"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 3L -> 1L))
  }

  test("fuzzyTerms: edit-distance vocabulary match with doc frequencies") {
    val docs = Seq(
      (1L, Seq("spark", "spork", "whale")),
      (2L, Seq("spark", "sprk")),
      (3L, Seq("sharks"))
    ).toDF("id", "toks")
    val got = Ranking.fuzzyTerms(docs, col("id"), col("toks"), "spark", maxDist = 1)
      .select("term", "doc_freq", "dist").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map(
      "spark" -> (2L, 0L),
      "spork" -> (1L, 1L),   // substitute
      "sprk" -> (1L, 1L)))   // delete
  }

  test("fuzzyTerms: n-gram prefilter is in the plan and never drops a true match") {
    // the prefilter must appear in the optimized plan...
    val docs = Seq((1L, Seq("spark", "spork", "whale"))).toDF("id", "toks")
    val plan = Ranking.fuzzyTerms(docs, col("id"), col("toks"), "distributed", maxDist = 1)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("array_intersect"), s"prefilter missing from plan:\n$plan")
    // ...and be SOUND: exhaustive compare vs the unfiltered levenshtein
    // over a vocabulary engineered with near-misses, repeated-gram
    // terms ("aaaaaa" — the set-undercount trap), and length edges
    val vocab = Seq("spark", "spork", "sprk", "sparkk", "shark", "stark",
      "aaaaaa", "aaaaab", "aabaaa", "banana", "bananas", "anana",
      "distributed", "distribted", "distrributed", "xdistributed",
      "spa", "sp", "s", "sparkling", "park", "pork", "arks")
    val vdf = Seq((1L, vocab)).toDF("id", "toks")
    for (q <- Seq("spark", "aaaaaa", "banana", "distributed"); d <- 0 to 2) {
      val got = Ranking.fuzzyTerms(vdf, col("id"), col("toks"), q, d)
        .select("term").as[String].collect().toSet
      val want = vocab.filter { t =>
        // plain Levenshtein via DP (spec-side reference)
        val m = Array.tabulate(t.length + 1, q.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to t.length; j <- 1 to q.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (t(i - 1) == q(j - 1)) 0 else 1))
        m(t.length)(q.length) <= d
      }.toSet
      assert(got === want, s"query=$q d=$d")
    }
  }

  test("moreLikeThis: ranks by shared distinctive terms, excludes the source") {
    val docs = Seq(
      (1L, Seq("whale", "ocean", "krill", "deep")),
      (2L, Seq("whale", "ocean", "krill", "blue")),   // shares 3
      (3L, Seq("whale", "desert", "cactus", "sand")), // shares 1
      (4L, Seq("stock", "market", "prices", "graph")) // shares 0
    ).toDF("id", "toks")
    val got = Ranking.moreLikeThis(docs, col("id"), col("toks"),
        sourceDocId = 1L, topTerms = 4, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq(2L -> 3L, 3L -> 1L)) // ranked, no source, no zero-overlap docs
  }

  test("highlight: snippet around first occurrence, non-matches filtered out") {
    val docs = Seq(
      (1L, "alpha beta gamma spark delta epsilon zeta eta"),
      (2L, "spark at the very start of it"),
      (3L, "nothing relevant here at all"),
      (4L, "a sparkle is not a spark match unless the token appears"),
      (5L, "the sparkle and sparky words only")
    ).toDF("id", "text")
    val got = Ranking.highlight(docs, col("id"), col("text"), "spark", contextWords = 2)
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "beta gamma spark delta epsilon",
      2L -> "spark at the", // clamped at the text boundary
      4L -> "not a spark match unless")) // token hit, not the "sparkle" substring
    assert(!got.contains(5L)) // substring-only docs are NOT matches
  }

  test("postings: exact df, capped ascending posting list") {
    val docs = (1 to 30).map(i => (i.toLong, Seq("common") ++ (if (i <= 2) Seq("rare") else Nil)))
      .toDF("id", "toks")
    val got = Ranking.postings(docs, col("id"), col("toks"), cap = 5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got("common")._1 === 30L)             // df exact past the cap
    assert(got("common")._2 === "1,2,3,4,5")     // list capped + sorted
    assert(got("rare") === ((2L, "1,2")))
  }
}
