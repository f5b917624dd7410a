package graft.search

import graft.TestSpark
import graft.index.SegmentShardSink
import org.scalatest.funsuite.AnyFunSuite

/** The JSON Facet API compiler against a tiny store: Solr semantics
  * (count-desc + index tie-break, index sort, mincount, missing
  * buckets excluded), flattened nested output, and request
  * validation. Plan-shape pushdown evidence lives in PlanShapeSpec
  * (q141). */
class JsonFacetApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_jfapi_").toString

  private lazy val store: String = {
    import spark.implicits._
    val out = tmp()
    // brands: a×3 (sizes 1,2,3 / kinds k,k,m), b×2 (sizes 10,20 / k,l),
    // c×1 (size 5 / m), one null-brand doc (excluded: missing:false)
    val df = Seq(
      ("1", Some("a"), Some(1L), "k"), ("2", Some("a"), Some(2L), "k"),
      ("3", Some("a"), Some(3L), "m"), ("4", Some("b"), Some(10L), "k"),
      ("5", Some("b"), Some(20L), "l"), ("6", Some("c"), Some(5L), "m"),
      ("7", Option.empty[String], Some(99L), "z")
    ).toDF("id", "brand", "size", "kind")
    SegmentShardSink.write(df, "id", out, shards = 2)
    out
  }

  test("terms + stats + nested sub-facet, Solr tie-break and limits") {
    val got = JsonFacetApi.jsonFacet(spark, store,
      """{"brands": {"type": "terms", "field": "brand", "limit": 2,
        |  "facet": {"avg_size": "avg(size)", "max_size": "max(size)",
        |            "kinds": {"type": "terms", "field": "kind", "limit": 1}}}}"""
        .stripMargin)
    val rows = got.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getLong(3), r.getString(4), r.getLong(5))).toSet
    // top-2 brands a(3), b(2); kinds top-1: a->k(2), b->k(1, index
    // tie-break beats l); null brand never appears
    assert(rows === Set(
      ("a", 3L, 2.0, 3L, "k", 2L),
      ("b", 2L, 15.0, 20L, "k", 1L)))
  }

  test("index sort, mincount, fq, and the no-child shape") {
    val got = JsonFacetApi.jsonFacet(spark, store,
      """{"brands": {"type": "terms", "field": "brand",
        |  "sort": "index asc", "mincount": 2}}""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq === Seq("a" -> 3L, "b" -> 2L)) // c dropped by mincount
    val fq = JsonFacetApi.jsonFacet(spark, store,
      """{"brands": {"type": "terms", "field": "brand"}}""", q = "kind:k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fq === Map("a" -> 2L, "b" -> 1L))
  }

  test("request validation fails fast") {
    def bad(req: String): Unit =
      intercept[IllegalArgumentException](JsonFacetApi.jsonFacet(spark, store, req))
    bad("""{"a": {"type": "range", "field": "size"}}""")      // unsupported type
    bad("""{"a": {"type": "terms"}}""")                        // missing field
    bad("""{"a": {"type": "terms", "field": "brand", "sort": "sum desc"}}""")
    bad("""{"a": {"type": "terms", "field": "brand",
          |  "facet": {"oops": "median(size)"}}}""".stripMargin) // unsupported stat
    // two top-level facets
    bad("""{"a": {"type":"terms","field":"brand"}, "b": {"type":"terms","field":"kind"}}""")
    // 3-deep nesting
    bad("""{"a": {"type": "terms", "field": "brand", "facet": {
          |  "b": {"type": "terms", "field": "kind", "facet": {
          |    "c": {"type": "terms", "field": "id"}}}}}}""".stripMargin)
    // allBuckets under a sub-facet is ambiguous in the flat shape
    bad("""{"a": {"type": "terms", "field": "brand", "allBuckets": true,
          |  "facet": {"b": {"type": "terms", "field": "kind"}}}}""".stripMargin)
  }

  test("allBuckets and missing append tagged global rows outside the bucket list") {
    val got = JsonFacetApi.jsonFacet(spark, store,
      """{"brands": {"type": "terms", "field": "brand", "limit": 2,
        |  "allBuckets": true, "missing": true,
        |  "facet": {"max_size": "max(size)"}}}""".stripMargin)
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      ("term", Some("a"), 3L, 3L),
      ("term", Some("b"), 2L, 20L),          // limit cuts c, not the extras
      ("allBuckets", None, 7L, 99L),         // EVERY doc incl. null brand
      ("missing", None, 1L, 99L)))           // the null-brand bucket
  }
}
