package graft.search

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The Solr/Lucene query-string compiler: each query text filters a
  * small frame and the surviving ids are asserted exactly. */
class SolrQueryStringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, "en", "the quick brown fox jumps", 10L, "alpha"),
      (2L, "en", "spark shuffles the Quick data", 25L, "beta"),
      (3L, "de", "ein schneller brauner fuchs", 40L, "beta"),
      (4L, "fr", "un renard brun rapide", 55L, "gamma"),
      (5L, "en", "quick-start guide to spark", 70L, null)
    ).toDF("id", "lang", "text", "n", "tag")
  }

  private def ids(q: String): Seq[Long] = {
    val pred = SolrQueryString.compile(q, df.schema, defaultField = "text",
      textFields = Set("text"))
    df.filter(pred).select("id").collect().map(_.getLong(0)).sorted.toSeq
  }

  test("exact field term and *:*") {
    assert(ids("lang:en") === Seq(1L, 2L, 5L))
    assert(ids("*:*") === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("analyzed term matches whole tokens case-insensitively, not substrings") {
    assert(ids("text:quick") === Seq(1L, 2L, 5L)) // 'quick-start' tokenizes to quick
    assert(ids("text:qui") === Seq())             // no substring match
  }

  test("boolean operators, grouping, NOT and -") {
    assert(ids("lang:en AND text:spark") === Seq(2L, 5L))
    assert(ids("lang:de OR lang:fr") === Seq(3L, 4L))
    assert(ids("(lang:de OR lang:fr) AND text:brun") === Seq(4L))
    assert(ids("lang:en NOT text:spark") === Seq(1L))
    assert(ids("lang:en -text:spark") === Seq(1L))
    assert(ids("+lang:en +text:fox") === Seq(1L))
  }

  test("implicit conjunction between adjacent clauses (q.op=AND)") {
    assert(ids("lang:en text:spark") === Seq(2L, 5L))
  }

  test("numeric ranges, inclusive/exclusive/open bounds") {
    assert(ids("n:[25 TO 55]") === Seq(2L, 3L, 4L))
    assert(ids("n:{25 TO 55]") === Seq(3L, 4L))
    assert(ids("n:[25 TO 55}") === Seq(2L, 3L))
    assert(ids("n:[* TO 25]") === Seq(1L, 2L))
    assert(ids("n:[55 TO *]") === Seq(4L, 5L))
  }

  test("lexicographic range on string field") {
    assert(ids("tag:[alpha TO beta]") === Seq(1L, 2L, 3L))
  }

  test("phrase on analyzed field = consecutive token sequence") {
    assert(ids("text:\"quick brown\"") === Seq(1L))
    assert(ids("text:\"brown quick\"") === Seq())
  }

  test("wildcards: trailing, embedded ?, field presence") {
    assert(ids("text:qu*") === Seq(1L, 2L, 5L))
    assert(ids("text:f?x") === Seq(1L))
    assert(ids("tag:*") === Seq(1L, 2L, 3L, 4L)) // presence — null excluded
    assert(ids("tag:bet*") === Seq(2L, 3L))
  }

  test("default field for bare terms") {
    assert(ids("spark") === Seq(2L, 5L))
    assert(ids("spark fox") === Seq()) // implicit AND across default-field terms
  }

  test("malformed queries are refused") {
    assertThrows[IllegalArgumentException](ids("nosuchfield:x"))
    assertThrows[IllegalArgumentException](ids("(lang:en"))
    assertThrows[IllegalArgumentException](ids("n:[1 TO"))
    assertThrows[IllegalArgumentException](ids("text:\"unterminated"))
    assertThrows[IllegalArgumentException](ids("tag:")) // dangling field
  }

  test("exact-field wildcards: Lucene semantics — any char, case-sensitive") {
    // '-' is matched by * on an exact field (it is NOT a token class)
    assert(ids("tag:al*") === Seq(1L))
    assert(ids("tag:a*a") === Seq(1L))
    // case-sensitive like plain exact terms
    assert(ids("tag:AL*") === Seq())
    // analyzed fields stay case-folded, token-bounded
    assert(ids("text:QUI*") === Seq(1L, 2L, 5L))
  }

  test("proximity phrase ~N: ordered match with bounded gaps") {
    // "quick jumps"~0 = exact adjacency: no doc has them adjacent
    assert(ids("text:\"quick jumps\"~0") === Seq())
    // ~2 admits "quick brown fox jumps" (two interposed tokens)
    assert(ids("text:\"quick jumps\"~2") === Seq(1L))
    // ~1 does not (two tokens between)
    assert(ids("text:\"quick jumps\"~1") === Seq())
    // ordered only: "data quick"~3 never matches doc 2's "quick ... data"
    assert(ids("text:\"data quick\"~3") === Seq())
    assert(ids("text:\"quick data\"~1") === Seq(2L))
    // slop 0 is identical to a plain phrase
    assert(ids("text:\"quick brown fox\"~0") === ids("text:\"quick brown fox\""))
    // proximity on an exact (non-analyzed) field is refused
    intercept[IllegalArgumentException](ids("tag:\"alpha beta\"~2"))
  }

  test("fuzzy terms: token edit distance on analyzed, value distance on exact") {
    // quick ~1 quack/quicks...; 'quikc' is 2 edits from quick (transposition)
    assert(ids("text:quick~1") === Seq(1L, 2L, 5L)) // exact token present
    assert(ids("text:quik~1") === Seq(1L, 2L, 5L))  // 1 edit from 'quick'
    assert(ids("text:quikc~1") === Seq())           // 2 edits, over budget
    assert(ids("text:quikc~2") === Seq(1L, 2L, 5L))
    assert(ids("text:quikc~") === Seq(1L, 2L, 5L))  // bare ~ defaults to 2
    // case folding on analyzed fields
    assert(ids("text:QUICK~1") === Seq(1L, 2L, 5L))
    // exact field: case-sensitive value distance
    assert(ids("tag:beta~1") === Seq(2L, 3L))
    assert(ids("tag:betaXY~1") === Seq())
    assert(ids("tag:Beta~1") === Seq(2L, 3L)) // 1 edit (case flip counts)
    // short fuzzy terms: any 2-char token is within 2 edits (docs 4/5
    // via 'un'/'to') — but docs 1-3 matching would mean the EMPTY
    // token leaked through the guard (levenshtein('', 'zz') = 2)
    assert(ids("text:zz~2") === Seq(4L, 5L))
  }
}
