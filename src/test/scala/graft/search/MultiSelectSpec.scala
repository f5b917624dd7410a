package graft.search

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultiSelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    ("1", "en", "web", 100L),
    ("2", "en", "book", 400L),
    ("3", "de", "web", 500L),
    ("4", "de", "book", 50L),
    ("5", "fr", "web", 350L)
  ).toDF("id", "lang", "source", "n_chars")

  test("parseFq splits the {!tag=...} localparam") {
    assert(MultiSelect.parseFq("{!tag=lang}lang:en") ===
      MultiSelect.TaggedFq("lang:en", Some("lang")))
    assert(MultiSelect.parseFq("lang:en") === MultiSelect.TaggedFq("lang:en", None))
  }

  test("facetFieldEx lifts excluded tags but keeps the rest") {
    val filters = Seq(
      MultiSelect.TaggedFq("lang:en", Some("lang")),
      MultiSelect.TaggedFq("n_chars:[300 TO *]", None))
    val got = MultiSelect.facetFieldEx(df, "id", Set.empty, "lang", "*:*",
        filters, exclude = Set("lang"))
      .as[(String, Long)].collect().toMap
    // n_chars >= 300 applies (docs 2,3,5); lang:en is lifted
    assert(got === Map("en" -> 1L, "de" -> 1L, "fr" -> 1L))
    val kept = MultiSelect.facetFieldEx(df, "id", Set.empty, "lang", "*:*",
        filters, exclude = Set.empty)
      .as[(String, Long)].collect().toMap
    assert(kept === Map("en" -> 1L))
  }

  test("facet params: mincount filters, sort=count orders, limit cuts") {
    val big = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(3)("z") ++ Seq("w"))
      .zipWithIndex.map { case (lang, i) => (i.toString, lang, "s", 100L) }
      .toDF("id", "lang", "source", "n_chars")
    val got = MultiSelect.facetFieldEx(big, "id", Set.empty, "lang", "*:*",
        Nil, Set.empty, MultiSelect.FacetParams(limit = 2, mincount = 2))
      .as[(String, Long)].collect().toSeq
    // w fails mincount; count desc then value asc -> x(5), y(3) beats z(3)
    assert(got === Seq(("x", 5L), ("y", 3L)))
    val byIndex = MultiSelect.facetFieldEx(big, "id", Set.empty, "lang", "*:*",
        Nil, Set.empty, MultiSelect.FacetParams(limit = 2, sort = "index"))
      .as[(String, Long)].collect().toSeq
    assert(byIndex === Seq(("w", 1L), ("x", 5L)))
  }

  test("facetQueries: one count per bucket under all filters") {
    val got = MultiSelect.facetQueries(df, "id", Set.empty, "*:*",
        Seq(MultiSelect.TaggedFq("source:web", None)),
        Seq("short" -> "n_chars:[* TO 299]", "long" -> "n_chars:[300 TO *]"))
      .as[(String, Long)].collect().toMap
    // web docs: 1 (100), 3 (500), 5 (350)
    assert(got === Map("short" -> 1L, "long" -> 2L))
  }
}
