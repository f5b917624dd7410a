package graft.search

import graft.TestSpark
import graft.search.{StreamingExpressions => SE}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val store: String = {
    val out = java.nio.file.Files.createTempDirectory("graft_se_").toString
    graft.index.SegmentShardSink.write(
      Seq(
        ("1", "en", 100L), ("2", "en", 400L), ("3", "de", 500L),
        ("4", "de", 50L), ("5", "fr", 350L), ("6", "en", 400L)
      ).toDF("id", "lang", "n_chars"),
      "id", out, shards = 2)
    out
  }
  private def colls = Map("c" -> store)

  test("parser: nested calls, named args, quoted strings, aggregates") {
    val c = SE.parse(
      """top(n=3, search(c, q="lang:en", fl="id,lang", sort="id asc"), sort="id desc")""")
    assert(c.name === "top")
    assert(c.args.collectFirst { case SE.Named("n", v) => v } === Some("3"))
    val sub = c.args.collectFirst { case SE.Sub(s) => s }.get
    assert(sub.name === "search")
    assert(sub.args.head === SE.Pos("c"))
    assert(sub.args.collectFirst { case SE.Named("q", v) => v } === Some("lang:en"))
    val r = SE.parse("""rollup(search(c), over="lang", sum(n_chars), count(*))""")
    // aggregates parse as nested calls, split from the stream structurally
    assert(r.args.collect { case SE.Sub(s) => s.name } === Seq("search", "sum", "count"))
    assert(r.args.collect { case SE.Sub(SE.Call("sum", as)) => as } ===
      Seq(Seq(SE.Pos("n_chars"))))
  }

  test("search + top: filter, projection, TakeOrdered") {
    val got = SE.compile(spark,
      """top(n=2, search(c, q="lang:en", fl="id,n_chars", sort="id asc"),
        |  sort="n_chars desc, id asc")""".stripMargin, colls)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("2", 400L), ("6", 400L)))
  }

  test("rollup compiles to a hash aggregate with Solr-shaped outputs") {
    val got = SE.compile(spark,
      """rollup(search(c, q="*:*", fl="lang,n_chars", sort="lang asc"),
        |  over="lang", sum(n_chars), min(n_chars), count(*))""".stripMargin, colls)
      .orderBy("lang")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("de", 550L, 50L, 2L), ("en", 900L, 100L, 3L), ("fr", 350L, 350L, 1L)))
  }

  test("unique takes the first tuple per key in stream order") {
    val got = SE.compile(spark,
      """unique(search(c, q="*:*", fl="id,lang,n_chars", sort="n_chars desc, id asc"),
        |  over="lang")""".stripMargin, colls)
      .orderBy("lang").as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("3", "de", 500L), ("2", "en", 400L), ("5", "fr", 350L)))
  }

  test("unique without an upstream sort contract is rejected") {
    val e = intercept[IllegalArgumentException] {
      SE.compile(spark, """unique(search(c, q="*:*", fl="id,lang"), over="lang")""", colls)
    }
    assert(e.getMessage.contains("sorted upstream"))
  }

  test("having filters rollup output with boolean-op trees") {
    val got = SE.compile(spark,
      """having(rollup(search(c, q="*:*", fl="lang,n_chars", sort="lang asc"),
        |  over="lang", sum(n_chars), count(*)),
        |  and(gt(sum_n_chars, 400), not(eq(lang, "de"))))""".stripMargin, colls)
      .as[(String, Long, Long)].collect().toSeq
    // sums: de 550, en 900, fr 350 -> gt(400) keeps de,en; not(de) -> en
    assert(got === Seq(("en", 900L, 3L)))
  }

  test("stats is a one-row global aggregate") {
    val got = SE.compile(spark,
      """stats(c, q="lang:en", sum(n_chars), count(*))""", colls)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((900L, 3L)))
  }

  test("intersect keeps keyed matches, complement drops them") {
    val inter = SE.compile(spark,
      """intersect(search(c, q="*:*", fl="id,lang", sort="id asc"),
        |  search(c, q="lang:de", fl="id", sort="id asc"), on="id")""".stripMargin, colls)
      .select("id").as[String].collect().toSet
    assert(inter === Set("3", "4"))
    val comp = SE.compile(spark,
      """complement(search(c, q="*:*", fl="id,lang", sort="id asc"),
        |  search(c, q="lang:de", fl="id", sort="id asc"), on="id")""".stripMargin, colls)
      .select("id").as[String].collect().toSet
    assert(comp === Set("1", "2", "5", "6"))
  }

  test("fetch enriches stream tuples from another collection") {
    val got = SE.compile(spark,
      """fetch(c, search(c, q="lang:fr", fl="id", sort="id asc"),
        |  on="id", fl="n_chars")""".stripMargin, colls)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("5", 350L)))
  }

  test("merge unions streams under a shared sort contract that unique consumes") {
    val got = SE.compile(spark,
      """unique(merge(search(c, q="lang:en", fl="id,lang,n_chars", sort="n_chars desc, id asc"),
        |  search(c, q="lang:de", fl="id,lang,n_chars", sort="n_chars desc, id asc"),
        |  on="n_chars desc, id asc"), over="lang")""".stripMargin, colls)
      .orderBy("lang").as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("3", "de", 500L), ("2", "en", 400L)))
  }

  test("innerJoin on a shared key + select renames") {
    val got = SE.compile(spark,
      """select(innerJoin(search(c, q="lang:en", fl="id,n_chars", sort="id asc"),
        |                 search(c, q="*:*", fl="id,lang", sort="id asc"), on="id"),
        |  "id", "lang", "n_chars as chars")""".stripMargin, colls)
      .orderBy("id").as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("1", "en", 100L), ("2", "en", 400L), ("6", "en", 400L)))
  }

  test("leftOuterJoin keeps unmatched left tuples with nulls") {
    val got = SE.compile(spark,
      """leftOuterJoin(search(c, q="lang:en", fl="id,lang", sort="id asc"),
        |  search(c, q="n_chars:[300 TO *]", fl="id,n_chars", sort="id asc"),
        |  on="id")""".stripMargin, colls)
      .orderBy("id").collect()
      .map(r => (r.getString(0), Option(r.get(2)))).toSeq
    assert(got === Seq(("1", None), ("2", Some(400L)), ("6", Some(400L))))
  }

  test("hashJoin broadcasts the hashed stream (Solr's stream-in-memory contract)") {
    val df = SE.compile(spark,
      """hashJoin(search(c, q="*:*", fl="id,lang", sort="id asc"),
        |  search(c, q="lang:de", fl="id,n_chars", sort="id asc"),
        |  on="id")""".stripMargin, colls)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"hashed side must broadcast, plan was:\n$plan")
    assert(df.orderBy("id").as[(String, String, Long)].collect().toSeq
      === Seq(("3", "de", 500L), ("4", "de", 50L)))
  }

  test("facet compiles to a bounded sorted grouped aggregate") {
    val got = SE.compile(spark,
      """facet(c, q="n_chars:[100 TO *]", buckets="lang",
        |  bucketSorts="cnt desc, lang asc", bucketSizeLimit=2, count(*))""".stripMargin,
      colls).as[(String, Long)].collect().toSeq
    assert(got === Seq(("en", 3L), ("de", 1L)))
  }

  test("significantTerms ranks foreground lift in milli-ratio space") {
    // fg = n_chars >= 350 docs: ids 2,3,5,6 → langs en,de,fr,en
    // bg: en 3, de 2, fr 1 → lift: fr 1000, de 500, en 666
    val got = SE.compile(spark,
      """significantTerms(c, q="n_chars:400", field="lang", limit=10)""", colls)
    // q must be a TERM query: n_chars:400 matches ids 2,6 (both en)
    val rows = got.as[(String, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(("en", 2L, 3L, 666L)))
    val lifted = SE.compile(spark,
      """significantTerms(c, q="lang:fr", field="lang", minDocFreq=1, limit=3)""",
      colls).as[(String, Long, Long, Long)].collect().toSeq
    assert(lifted === Seq(("fr", 1L, 1L, 1000L)))
  }

  test("nodes gathers one-hop neighbours with ancestor counts and level") {
    // seeds: docs with n_chars 400 (ids 2,6 — lang en); walk
    // lang->lang: all en docs; gather id
    val got = SE.compile(spark,
      """nodes(c, search(c, q="n_chars:400", fl="lang", sort="id asc"),
        |  walk="lang->lang", gather="id")""".stripMargin, colls)
      .orderBy("node").as[(String, Long, Long)].collect().toSeq
    // each en doc matched by 1 distinct seed lang value
    assert(got === Seq(("1", 1L, 1L), ("2", 1L, 1L), ("6", 1L, 1L)))
    val plan = SE.compile(spark,
      """nodes(c, search(c, q="n_chars:400", fl="lang", sort="id asc"),
        |  walk="lang->lang", gather="id")""".stripMargin, colls)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("timeseries: zero-filled fixed-gap buckets, [start,end) range") {
    val out = java.nio.file.Files.createTempDirectory("graft_ts_").toString
    graft.index.SegmentShardSink.write(
      Seq(
        ("1", "2024-03-01 01:00:00", "a"),
        ("2", "2024-03-01 05:00:00", "b"),
        ("3", "2024-03-03 12:00:00", "a"),
        ("4", "2024-03-05 00:00:00", "a") // at end -> excluded
      ).toDF("id", "ts0", "k")
        .withColumn("ts", col("ts0").cast("timestamp")).drop("ts0"),
      "id", out, shards = 1)
    val got = SE.compile(spark,
      """timeseries(t, q="*:*", field="ts", start="2024-03-01T00:00:00Z",
        |  end="2024-03-05T00:00:00Z", gap="+1DAY", count(*))""".stripMargin,
      Map("t" -> out))
      .select(date_format(col("bucket_start"), "yyyy-MM-dd").as("b"), col("cnt"))
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(
      ("2024-03-01", 2L), ("2024-03-02", 0L),
      ("2024-03-03", 1L), ("2024-03-04", 0L)))
    // q= composes with the range
    val filtered = SE.compile(spark,
      """timeseries(t, q="k:a", field="ts", start="2024-03-01T00:00:00Z",
        |  end="2024-03-03T00:00:00Z", gap="+1DAY", count(*))""".stripMargin,
      Map("t" -> out))
      .select("cnt").as[Long].collect().toSeq
    assert(filtered === Seq(1L, 0L))
    // malformed gaps are refused
    intercept[RuntimeException] {
      SE.compile(spark,
        """timeseries(t, q="*:*", field="ts", start="2024-03-01T00:00:00Z",
          |  end="2024-03-02T00:00:00Z", gap="+1MONTH", count(*))""".stripMargin,
        Map("t" -> out))
    }
  }

  test("update()/commit(): stream tuples upsert into the dest store") {
    val dest = java.nio.file.Files.createTempDirectory("graft_upd_").toString
    graft.index.SegmentShardSink.write(
      Seq(("1", "en", 10L), ("2", "de", 20L)).toDF("id", "lang", "n_chars"),
      "id", dest, shards = 1)
    val srcColls = colls + ("dest" -> dest)
    // update dest with en docs from c (ids 1,2,6) — id 1/2 override,
    // 6 inserts; summary tuple reports the batch size
    val summary = SE.compile(spark,
      """commit(dest, update(dest,
        |  search(c, q="lang:en", fl="id,lang,n_chars", sort="id asc")))""".stripMargin,
      srcColls).as[Long].collect().toSeq
    assert(summary === Seq(3L))
    val after = spark.read.format("graft-index").load(dest)
      .orderBy("id").as[(String, String, Long)].collect().toSeq
    assert(after === Seq(("1", "en", 100L), ("2", "en", 400L), ("6", "en", 400L)))
  }

  test("random(): deterministic seeded hash sample") {
    val a = SE.compile(spark,
      """random(c, q="*:*", fl="id,lang", rows=3, seed="s1")""", colls)
      .select("id").as[String].collect().toSeq
    val b = SE.compile(spark,
      """random(c, q="*:*", fl="id,lang", rows=3, seed="s1")""", colls)
      .select("id").as[String].collect().toSeq
    assert(a === b)
    assert(a.length === 3)
    // a different seed reorders (6 ids, 3-row cut — md5 orders differ)
    val c2 = SE.compile(spark,
      """random(c, q="*:*", fl="id,lang", rows=6, seed="s2")""", colls)
      .select("id").as[String].collect().toSeq
    assert(c2.sorted === Seq("1", "2", "3", "4", "5", "6"))
  }

  private lazy val textStore: String = {
    val out = java.nio.file.Files.createTempDirectory("graft_se_text_").toString
    graft.index.SegmentShardSink.write(
      Seq(
        ("1", "en", "spark shuffles data fast"),
        ("2", "en", "spark joins data"),
        ("3", "de", "daten und mehr daten")
      ).toDF("id", "lang", "text"),
      "id", out, shards = 2, analyzedFields = Set("text"))
    out
  }

  test("cartesianProduct + analyze(): one row per indexed token") {
    val got = SE.compile(spark,
      """cartesianProduct(search(t, q="lang:en", fl="id,text", sort="id asc"),
        |  analyze(text) as term)""".stripMargin,
      Map("t" -> textStore))
      .select("id", "term").as[(String, String)].collect().toSeq
    assert(got.count(_._1 == "1") === 4) // 4 tokens of doc 1
    assert(got.count(_._1 == "2") === 3)
    assert(got.count(_._2 == "spark") === 2)
    assert(!got.exists(_._1 == "3")) // q= filtered before the explode
  }

  test("cartesianProduct over rollup counts terms like a postings walk") {
    val got = SE.compile(spark,
      """having(rollup(cartesianProduct(
        |    search(t, q="*:*", fl="id,text", sort="id asc"),
        |    analyze(text) as term), over="term", count(*)), gt(cnt, 1))""".stripMargin,
      Map("t" -> textStore))
      .as[(String, Long)].collect().toMap
    assert(got === Map("spark" -> 2L, "data" -> 2L, "daten" -> 2L))
  }

  test("select() arithmetic evaluators: add/div over field and literal") {
    val got = SE.compile(spark,
      """select(search(c, q="lang:en", fl="id,n_chars", sort="id asc"),
        |  id, div(n_chars, 100) as centi, add(n_chars, 5) as plus5)""".stripMargin,
      colls)
      .as[(String, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(("1", 1.0, 105.0), ("2", 4.0, 405.0), ("6", 4.0, 405.0)))
  }
}
