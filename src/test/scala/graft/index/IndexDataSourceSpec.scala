package graft.index

import graft.TestSpark
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graft-index DataSourceV2 reader: schema from store metadata,
  * term-filter pushdown to posting lookups, column pruning, and
  * agreement with both the source DataFrame and the explicit
  * SegmentSearch scatter-gather path. */
class IndexDataSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private lazy val store: String = {
    import spark.implicits._
    val df = Seq(
      ("1", "alpha", "x"), ("2", "beta", "y"), ("3", "alpha", "y"),
      ("4", "gamma", "x"), ("5", "alpha", "z")
    ).toDF("id", "value", "tag")
    val out = tmp("graft_dsv2_")
    SegmentShardSink.write(df, "id", out, shards = 2)
    out
  }

  test("segment-split scan: one input partition per SEGMENT of a " +
      "multi-segment shard; counts and rows unchanged") {
    import spark.implicits._
    val out = tmp("graft_dsv2_split_")
    SegmentShardSink.write(
      Seq(("1", "a"), ("2", "b"), ("3", "c")).toDF("id", "v"), "id", out,
      shards = 2)
    // grow one shard to three segments through two more writer commits
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$out/part-00000/data/index")
    (0 until 2).foreach { i =>
      val w = new SegmentIndex.Writer(fs, dir)
      w.addDocument(Seq("id" -> s"extra$i", "v" -> "z"))
      w.commit()
    }
    val totalSegments = Seq("part-00000", "part-00001").map { p =>
      SegmentIndex.latestCommit(fs,
        new org.apache.hadoop.fs.Path(s"$out/$p/data/index")).get.segments.length
    }.sum
    assert(totalSegments >= 4) // 3 in part-0, >=1 in part-1
    val df = spark.read.format("graft-index").load(out)
    // the split contract: partition count == live segment count
    assert(df.rdd.getNumPartitions === totalSegments)
    assert(df.count() === 5)
    assert(df.select("id").as[String].collect().sorted.toSeq ===
      Seq("1", "2", "3", "extra0", "extra1"))
    // pushdown partials still combine exactly across segment splits
    assert(df.filter(col("v") === "z").count() === 2)
  }

  test("schema inferred from store marker, all-strings") {
    val df = spark.read.format("graft-index").load(store)
    assert(df.schema.fieldNames.toSeq === Seq("id", "value", "tag"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("match-all read returns every live doc") {
    val df = spark.read.format("graft-index").load(store)
    assert(df.count() === 5)
    assert(df.select("id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted.toSeq === Seq("1", "2", "3", "4", "5"))
  }

  test("EqualTo pushdown: plan carries the term, result is exact") {
    val df = spark.read.format("graft-index").load(store)
      .filter(col("value") === "alpha").select("id")
    // the pushed term must appear in the scan description (posting
    // lookup, not a full scan) and the residual filter list must not
    // re-evaluate it
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(_.contains("pushedTerm=value:alpha")), s"scan was: $scan")
    assert(df.as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted.toSeq === Seq("1", "3", "5"))
  }

  test("column pruning reaches the scan") {
    val df = spark.read.format("graft-index").load(store).select("tag")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(_.contains("columns=tag")), s"scan was: $scan")
    assert(df.collect().map(_.getString(0)).sorted.toSeq === Seq("x", "x", "y", "y", "z"))
  }

  test("term AND <> push together: posting lookup ∩ presence-minus-term") {
    val df = spark.read.format("graft-index").load(store)
      .filter(col("value") === "alpha" && col("tag") =!= "z")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(_.contains(
      "pushedAnd=(value:alpha AND (tag:[* TO *] NOT tag:z))")), s"scan was: $scan")
    assert(df.select("id").collect().map(_.getString(0)).sorted.toSeq === Seq("1", "3"))
  }

  test("MUST_NOT pushdown: <>, NOT IN, NOT LIKE — presence base honors SQL null semantics") {
    import spark.implicits._
    val out = tmp("graft_dsv2_not_")
    // v is ABSENT on doc 4 — `v <> 'a'` must NOT return it (SQL: NULL)
    SegmentShardSink.write(
      Seq(("1", Some("a")), ("2", Some("b")), ("3", Some("c")), ("4", None))
        .toDF("id", "v"),
      "id", out, shards = 2)
    val idx = spark.read.format("graft-index").load(out)

    val ne = idx.filter(col("v") =!= "a")
    val scanNe = ne.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scanNe.exists(_.contains("pushedNot=(v:[* TO *] NOT v:a)")), s"scan was: $scanNe")
    assert(ne.select("id").collect().map(_.getString(0)).sorted.toSeq === Seq("2", "3"))

    val notIn = idx.filter(!col("v").isin("a", "b"))
    assert(notIn.select("id").collect().map(_.getString(0)).toSeq === Seq("3"))
    val scanIn = notIn.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scanIn.exists(_.contains("pushedNot=")), s"scan was: $scanIn")

    val notPrefix = idx.filter(!col("v").startsWith("a"))
    assert(notPrefix.select("id").collect().map(_.getString(0)).sorted.toSeq === Seq("2", "3"))

    // MUST_NOT composes with the pushed count (numFound, stored docs unread)
    val cnt = idx.filter(col("v") =!= "a").agg(count(lit(1)))
    assert(cnt.queryExecution.executedPlan.toString.contains("pushedAgg=count(*)"),
      cnt.queryExecution.executedPlan.toString.take(2000))
    assert(cnt.collect().head.getLong(0) === 2L)
  }

  test("IS NULL / IS NOT NULL push: whole-segment complement / presence walk") {
    import spark.implicits._
    val out = tmp("graft_dsv2_null_")
    SegmentShardSink.write(
      Seq(("1", Some("a")), ("2", None), ("3", Some("b")), ("4", None))
        .toDF("id", "v"),
      "id", out, shards = 2)
    val idx = spark.read.format("graft-index").load(out)

    val isNull = idx.filter(col("v").isNull)
    val scanN = isNull.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scanN.exists(_.contains("pushedNot=(*:* NOT v:[* TO *])")), s"scan was: $scanN")
    assert(isNull.select("id").collect().map(_.getString(0)).sorted.toSeq === Seq("2", "4"))

    val isNotNull = idx.filter(col("v").isNotNull)
    val scanNN = isNotNull.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scanNN.exists(_.contains("pushedRange=v:[* TO *]")), s"scan was: $scanNN")
    assert(isNotNull.select("id").collect().map(_.getString(0)).sorted.toSeq === Seq("1", "3"))

    // deletes stay honored through the complement path
    SegmentShardSink.deleteByTerm(spark, out, "id", "2")
    assert(spark.read.format("graft-index").load(out).filter(col("v").isNull)
      .select("id").collect().map(_.getString(0)).toSeq === Seq("4"))
  }

  test("NOT nests inside a pushed OR") {
    val idx = spark.read.format("graft-index").load(store)
    val orNot = idx.filter(col("value") === "gamma" || col("tag") =!= "y")
    val scan = orNot.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(s => s.contains("pushedOr=") && s.contains("NOT tag:y")),
      s"scan was: $scan")
    // docs: 1(alpha,x) 2(beta,y) 3(alpha,y) 4(gamma,x) 5(alpha,z)
    assert(orNot.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("1", "4", "5"))
  }

  test("deletes are honored (reads only live docs)") {
    val out = {
      import spark.implicits._
      val o = tmp("graft_dsv2_del_")
      SegmentShardSink.write(Seq(("1", "a"), ("2", "b"), ("3", "a")).toDF("id", "v"),
        "id", o, shards = 2)
      o
    }
    SegmentShardSink.deleteByTerm(spark, out, "v", "a")
    assert(spark.read.format("graft-index").load(out).count() === 1)
  }

  test("In filter pushes as a multi-term posting lookup") {
    val df = spark.read.format("graft-index").load(store)
      .filter(col("id").isin("1", "4", "9"))
      .select("id", "value")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(_.contains("pushedTerm=id:")), s"scan was: $scan")
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ===
      Seq(("1", "alpha"), ("4", "gamma")))
  }

  test("multivalued fields are NOT pushed down — relational first-value semantics hold") {
    import spark.implicits._
    val out = tmp("graft_dsv2_mv_")
    val df = Seq(
      ("1", Seq("y", "x")), // x is the SECOND value — termDocs would match it
      ("2", Seq("x")),
      ("3", Seq("z"))
    ).toDF("id", "tags")
    SegmentShardSink.write(df, "id", out, shards = 1)
    val idx = spark.read.format("graft-index").load(out)
    val hits = idx.filter(col("tags") === "x")
    // pushdown must NOT claim the filter (it would surface doc 1 whose
    // visible first value is "y")
    val scan = hits.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(_.contains("pushedTerm=*:*")), s"scan was: $scan")
    assert(hits.select("id").collect().map(_.getString(0)).toSeq === Seq("2"))
    // the ANY-value search path stays available via the explicit API
    assert(SegmentSearch.termQuery(spark, out, "tags", "x", Seq("id"))
      .collect().map(_.getString(0)).sorted.toSeq === Seq("1", "2"))
  }

  test("multivalued=array option surfaces ALL stored values in order; " +
      "default keeps the first-value scalar; filters stay residual") {
    import spark.implicits._
    val out = tmp("graft_dsv2_mvarr_")
    val df = Seq(
      ("1", Seq("y", "x"), "a"),
      ("2", Seq("x"), "b"),
      ("3", Seq.empty[String], "c") // no tags values at all -> null column
    ).toDF("id", "tags", "v")
    SegmentShardSink.write(df, "id", out, shards = 1)
    // default: scalar first value (unchanged contract)
    val scalar = spark.read.format("graft-index").load(out)
    assert(scalar.schema("tags").dataType === org.apache.spark.sql.types.StringType)
    assert(scalar.orderBy("id").select("tags").collect().map(_.getString(0)).toSeq ===
      Seq("y", "x", null))
    // array option: every value, stored order, missing field -> null
    val arr = spark.read.format("graft-index").option("multivalued", "array").load(out)
    assert(arr.schema("tags").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false))
    val got = arr.orderBy("id").select("id", "tags").collect()
      .map(r => r.getString(0) -> Option(r.getSeq[String](1)).map(_.toList))
    assert(got.toSeq === Seq("1" -> Some(List("y", "x")), "2" -> Some(List("x")),
      "3" -> None))
    // array-typed field: array_contains pushes as a posting lookup
    // (TermFilterPushdown) ANDed with the scalar term; results exact
    val hits = arr.filter(array_contains(col("tags"), "x") && col("v") === "b")
    val scan = hits.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(s => s.contains("v:b") && s.contains("tags:x")),
      s"scan was: $scan")
    assert(hits.select("id").collect().map(_.getString(0)).toSeq === Seq("2"))
    // explode parity with the source frame
    val exploded = arr.select(col("id"), explode(col("tags")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(exploded === Seq(("1", "x"), ("1", "y"), ("2", "x")))
  }

  test("array_contains on a multivalued field pushes as a posting " +
      "lookup (TermFilterPushdown): plan lock + exact rows, with and " +
      "without the pushdown") {
    import spark.implicits._
    val out = tmp("graft_dsv2_mvpush_")
    val df = Seq(
      ("1", Seq("red", "blue"), "a"),
      ("2", Seq("blue"), "b"),
      ("3", Seq("green", "red"), "c"),
      ("4", Seq.empty[String], "d"),
      ("5", Seq("blue", "blue"), "e") // duplicate occurrences: one row out
    ).toDF("id", "tags", "v")
    SegmentShardSink.write(df, "id", out, shards = 2)
    val arr = spark.read.format("graft-index")
      .option("multivalued", "array").load(out)
    val hits = arr.filter(array_contains(col("tags"), "blue"))
      .select("id", "v")
    // PLAN LOCK: the scan itself carries the term (posting lookup on
    // the multivalued field — not a full stored-row scan)
    val scan = hits.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(_.contains("pushedTerm=tags:blue")), s"scan was: $scan")
    assert(hits.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ===
      Seq(("1", "a"), ("2", "b"), ("5", "e")))
    // conjunction of two array terms: both push, intersection served
    val both = arr.filter(
      array_contains(col("tags"), "blue") && array_contains(col("tags"), "red"))
    val scan2 = both.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan2.exists(s => s.contains("tags:blue") && s.contains("tags:red")),
      s"scan was: $scan2")
    assert(both.select("id").collect().map(_.getString(0)).toSeq === Seq("1"))
    // OR of two array terms pushes WHOLE as a posting union (same
    // field → one multi-term lookup)
    val either = arr.filter(
      array_contains(col("tags"), "red") || array_contains(col("tags"), "green"))
    val scan3 = either.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan3.exists(_.contains("pushedTerm=tags:red|green")), s"scan was: $scan3")
    assert(either.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("1", "3"))
    // NOT array_contains pushes as MUST_NOT over field presence
    // (Solr fq=-tags:blue); a doc with NO values for the field is
    // excluded by BOTH paths (pushed: absent from presence; residual:
    // NOT null = null)
    val non = arr.filter(!array_contains(col("tags"), "blue"))
    val scanN = non.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scanN.exists(_.contains("NOT tags:blue")), s"scan was: $scanN")
    assert(non.select("id").collect().map(_.getString(0)).toSeq === Seq("3"))
    // an OR with a non-pushable branch must NOT push at all (dropping
    // a branch would narrow the scan below the predicate's match set)
    val mixed = arr.filter(
      array_contains(col("tags"), "red") || col("v") === "d")
    val scan4 = mixed.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan4.exists(s => !s.contains("tags:red")), s"scan was: $scan4")
    assert(mixed.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("1", "3", "4"))
    // default scalar surfacing: no array fields, so the rule must NOT
    // fire (array_contains can't even type-check there) — guard that
    // first-value mode is untouched
    val scalar = spark.read.format("graft-index").load(out)
      .filter(col("tags") === "blue") // first-value semantics
    assert(scalar.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("2", "5"))
  }

  test("graft_term_match on an analyzed field pushes as a posting " +
      "lookup; residual re-analysis agrees; non-token terms match nothing") {
    import spark.implicits._
    import graft.functions.TermMatch.graft_term_match
    val out = tmp("graft_dsv2_anapush_")
    val df = Seq(
      ("1", "Spark rocks, spark SCALES", "a"),
      ("2", "flink streams", "b"),
      ("3", "sparkles are not spark-adjacent? sparkles!", "c"),
      ("4", "spark", "d")
    ).toDF("id", "body", "v")
    SegmentShardSink.write(df, "id", out, shards = 2,
      analyzedFields = Set("body"))
    val idx = spark.read.format("graft-index").load(out)
    val hits = idx.filter(graft_term_match(col("body"), lit("spark")))
      .select("id")
    val scan = hits.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(_.contains("pushedTerm=body:spark")), s"scan was: $scan")
    // doc 3 has tokens [sparkles, are, not, spark, adjacent, sparkles]
    // — 'spark' IS a token there (hyphen splits); 'sparkles' != 'spark'
    assert(hits.collect().map(_.getString(0)).sorted.toSeq === Seq("1", "3", "4"))
    // the SQL registration (GraftExtensions.injectFunction) compiles too
    idx.createOrReplaceTempView("anapush")
    val viaSql = spark.sql(
      "SELECT id FROM anapush WHERE graft_term_match(body, 'sparkles')")
    assert(viaSql.collect().map(_.getString(0)).toSeq === Seq("3"))
    // a non-token term (uppercase) matches nothing on BOTH paths
    assert(idx.filter(graft_term_match(col("body"), lit("Spark"))).count() === 0)
    // verbatim equality on the analyzed field still refuses to push
    // (stored value vs token mismatch) — the original exclusion holds
    val eq = idx.filter(col("body") === "spark")
    val scanEq = eq.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scanEq.exists(_.contains("pushedTerm=*:*")), s"scan was: $scanEq")
    assert(eq.select("id").collect().map(_.getString(0)).toSeq === Seq("4"))
  }

  test("negated graft_term_match stays residual-only: a non-null doc " +
      "that tokenizes to ZERO tokens must survive the NOT") {
    import spark.implicits._
    import graft.functions.TermMatch.graft_term_match
    val out = tmp("graft_dsv2_ananot_")
    // doc 3's body is punctuation-only: non-null stored value, zero
    // tokens → NO postings. A pushed MUST_NOT over postings-derived
    // presence would exclude it; the predicate keeps it (NOT false).
    val df = Seq(
      ("1", "Spark rocks", "a"),
      ("2", "flink streams", "b"),
      ("3", "!!! ---", "c"),
      ("4", "spark", "d")
    ).toDF("id", "body", "v")
    SegmentShardSink.write(df, "id", out, shards = 2,
      analyzedFields = Set("body"))
    val idx = spark.read.format("graft-index").load(out)
    val non = idx.filter(!graft_term_match(col("body"), lit("spark")))
    val scanN = non.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scanN.exists(s => !s.contains("NOT body:spark")),
      s"negated analyzed term must not push, scan was: $scanN")
    assert(non.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("2", "3"))
    // the positive leaf inside an AND still pushes; the negated leaf
    // contributes nothing to the pushed query
    val mixed = idx.filter(graft_term_match(col("body"), lit("spark")) &&
      !graft_term_match(col("body"), lit("rocks")))
    val scanM = mixed.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scanM.exists(s => s.contains("body:spark") && !s.contains("NOT body:rocks")),
      s"scan was: $scanM")
    assert(mixed.select("id").collect().map(_.getString(0)).toSeq === Seq("4"))
  }

  test("exists(f, t -> graft_term_match(t, term)) on an analyzed " +
      "MULTIVALUED field pushes as a token posting lookup") {
    import spark.implicits._
    import graft.functions.TermMatch.graft_term_match
    val out = tmp("graft_dsv2_anamv_")
    // analyzed multivalued: postings index the TOKENS of every value
    val df = Seq(
      ("1", Seq("Machine Learning", "nlp-tools"), "a"),
      ("2", Seq("databases"), "b"),
      ("3", Seq("nlp", "search & ranking"), "c"),
      ("4", Seq.empty[String], "d"),
      ("5", Seq("!!!"), "e") // one value, zero tokens
    ).toDF("id", "tags", "v")
    SegmentShardSink.write(df, "id", out, shards = 2,
      analyzedFields = Set("tags"))
    val arr = spark.read.format("graft-index")
      .option("multivalued", "array").load(out)
    val hits = arr.filter(exists(col("tags"),
        t => graft_term_match(t, lit("nlp"))))
      .select("id", "v")
    val scan = hits.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(_.contains("pushedTerm=tags:nlp")), s"scan was: $scan")
    // doc 1 matches via the second VALUE's token stream (nlp-tools →
    // [nlp, tools]); doc 3 via its first value
    assert(hits.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ===
      Seq(("1", "a"), ("3", "c")))
    // OR of two exists-branches pushes whole (posting union)
    val either = arr.filter(exists(col("tags"), t => graft_term_match(t, lit("learning"))) ||
      exists(col("tags"), t => graft_term_match(t, lit("ranking"))))
    val scan2 = either.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan2.exists(s => s.contains("learning") && s.contains("ranking")),
      s"scan was: $scan2")
    assert(either.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("1", "3"))
    // NEGATED exists must NOT push (zero-token values break the
    // postings-presence base exactly as on the scalar analyzed path):
    // doc 5 is non-null with zero tokens and must survive
    val non = arr.filter(!exists(col("tags"), t => graft_term_match(t, lit("nlp"))))
    val scanN = non.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scanN.exists(s => !s.contains("NOT tags:nlp")), s"scan was: $scanN")
    assert(non.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("2", "5"))
    // array_contains on the analyzed multivalued field still refuses
    // to push (verbatim values vs token postings) — original exclusion
    val verb = arr.filter(array_contains(col("tags"), "nlp"))
    val scanV = verb.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scanV.exists(_.contains("pushedTerm=*:*")), s"scan was: $scanV")
    assert(verb.select("id").collect().map(_.getString(0)).toSeq === Seq("3"))
  }

  test("COUNT(*) pushes to metadata/postings; deletes respected; grouped counts push too") {
    val idx = spark.read.format("graft-index").load(store)
    val cnt = idx.agg(org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)))
    // count() plans through AQE — match on the rendered plan instead of
    // collecting the (wrapped) scan node
    val scan = cnt.queryExecution.executedPlan.toString
    assert(scan.contains("pushedAgg=count(*)"), scan.take(2000))
    assert(cnt.head.getLong(0) === 5L)
    // term-filtered count goes through posting cardinality
    val termCnt = idx.filter(col("value") === "alpha")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    val scan2 = termCnt.queryExecution.executedPlan.toString
    assert(scan2.contains("pushedAgg") && scan2.contains("value:alpha"), scan2.take(2000))
    assert(termCnt.head.getLong(0) === 3L)
    // deletes must be excluded from pushed counts
    val out = {
      import spark.implicits._
      val o = tmp("graft_dsv2_cnt_")
      SegmentShardSink.write(Seq(("1", "a"), ("2", "b"), ("3", "a")).toDF("id", "v"),
        "id", o, shards = 2)
      o
    }
    SegmentShardSink.deleteByTerm(spark, out, "v", "a")
    assert(spark.read.format("graft-index").load(out)
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
      .head.getLong(0) === 1L)
    // GROUPED count on a pushable field answers from postings
    // (facet.field — see the dedicated facet tests)
    val grouped = idx.groupBy("value")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    val scan3 = grouped.queryExecution.executedPlan.toString
    assert(scan3.contains("pushedGroupBy=value"), scan3.take(2000))
    assert(grouped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("alpha" -> 3L, "beta" -> 1L, "gamma" -> 1L))
  }

  test("facet pushdown: GROUP BY field COUNT(*) answers from termStats postings") {
    val idx = spark.read.format("graft-index").load(store)
    val facet = idx.groupBy("tag")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    val plan = facet.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=count(*)") && plan.contains("pushedGroupBy=tag"),
      plan.take(2000))
    assert(facet.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("x" -> 2L, "y" -> 2L, "z" -> 1L))
    // deletes excluded from facet counts
    val out = {
      import spark.implicits._
      val o = tmp("graft_dsv2_facetdel_")
      SegmentShardSink.write(Seq(("1", "a"), ("2", "b"), ("3", "a")).toDF("id", "v"),
        "id", o, shards = 2)
      o
    }
    SegmentShardSink.deleteByTerm(spark, out, "id", "1")
    assert(spark.read.format("graft-index").load(out).groupBy("v")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("a" -> 1L, "b" -> 1L))
  }

  test("facet pushdown: null bucket for docs missing the field; filter/mv/analyzed block it") {
    import spark.implicits._
    val out = tmp("graft_dsv2_facetnull_")
    val df = Seq(("1", Some("a")), ("2", None), ("3", Some("a")), ("4", None))
      .toDF("id", "v")
    SegmentShardSink.write(df, "id", out, shards = 1)
    val idx = spark.read.format("graft-index").load(out)
    val facet = idx.groupBy("v")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    assert(facet.queryExecution.executedPlan.toString.contains("pushedGroupBy=v"))
    assert(facet.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap ===
      Map(Option("a") -> 2L, Option.empty[String] -> 2L))
    // a pushed MUST_NOT filter composes with the facet (fq=-id:4)
    val filtered = idx.filter(col("id") =!= "4").groupBy("v")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    assert(filtered.queryExecution.executedPlan.toString.contains("pushedGroupBy=v"))
    assert(filtered.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap ===
      Map(Option("a") -> 2L, Option.empty[String] -> 1L))
    // a NON-pushable filter (contains) stays residual, which blocks
    // aggregate pushdown entirely — results still exact
    val residualF = idx.filter(!col("id").contains("4")).groupBy("v")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    assert(!residualF.queryExecution.executedPlan.toString.contains("pushedGroupBy"))
    assert(residualF.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap ===
      Map(Option("a") -> 2L, Option.empty[String] -> 1L))
    // multivalued group field: first-value semantics ≠ per-value postings
    val mvOut = tmp("graft_dsv2_facetmv_")
    SegmentShardSink.write(Seq(("1", Seq("y", "x")), ("2", Seq("x"))).toDF("id", "tags"),
      "id", mvOut, shards = 1)
    val mvIdx = spark.read.format("graft-index").load(mvOut)
    val mvFacet = mvIdx.groupBy("tags")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    assert(!mvFacet.queryExecution.executedPlan.toString.contains("pushedGroupBy"))
    assert(mvFacet.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("y" -> 1L, "x" -> 1L)) // first values
  }

  test("PIVOT facet pushdown: two-field GROUP BY from forward views, null buckets both axes") {
    import spark.implicits._
    val out = tmp("graft_dsv2_pivot_")
    // v missing on 4, tag missing on 5 — both axes need a null bucket
    val df = Seq(
      ("1", Some("a"), Some("x")), ("2", Some("b"), Some("x")),
      ("3", Some("a"), Some("y")), ("4", None, Some("x")),
      ("5", Some("a"), Option.empty[String])
    ).toDF("id", "v", "tag")
    SegmentShardSink.write(df, "id", out, shards = 2)
    val idx = spark.read.format("graft-index").load(out)
    def cnt = org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))

    val pivot = idx.groupBy("v", "tag").agg(cnt.as("n"))
    val plan = pivot.queryExecution.executedPlan.toString
    assert(plan.contains("pushedGroupBy=v,tag"), plan.take(2000))
    assert(pivot.collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) -> r.getLong(2)).toMap ===
      Map((Some("a"), Some("x")) -> 1L, (Some("b"), Some("x")) -> 1L,
        (Some("a"), Some("y")) -> 1L, (None, Some("x")) -> 1L,
        (Some("a"), None) -> 1L))

    // fq + pivot: the pushed filter restricts the match set
    val fq = idx.filter(col("tag") === "x").groupBy("v", "tag").agg(cnt.as("n"))
    val fqPlan = fq.queryExecution.executedPlan.toString
    assert(fqPlan.contains("pushedTerm=tag:x") && fqPlan.contains("pushedGroupBy=v,tag"),
      fqPlan.take(2000))
    assert(fq.collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) -> r.getLong(2)).toMap ===
      Map((Some("a"), Some("x")) -> 1L, (Some("b"), Some("x")) -> 1L,
        (None, Some("x")) -> 1L))

    // deletes honored through the forward views
    SegmentShardSink.deleteByTerm(spark, out, "id", "2")
    assert(spark.read.format("graft-index").load(out).groupBy("v", "tag").agg(cnt.as("n"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) -> r.getLong(2)).toMap ===
      Map((Some("a"), Some("x")) -> 1L, (Some("a"), Some("y")) -> 1L,
        (None, Some("x")) -> 1L, (Some("a"), None) -> 1L))

    // a multivalued axis blocks the pivot (first-value ≠ postings)
    val mvOut = tmp("graft_dsv2_pivotmv_")
    SegmentShardSink.write(
      Seq(("1", "a", Seq("y", "x")), ("2", "b", Seq("x"))).toDF("id", "v", "tags"),
      "id", mvOut, shards = 1)
    val mvPivot = spark.read.format("graft-index").load(mvOut)
      .groupBy("v", "tags").agg(cnt.as("n"))
    assert(!mvPivot.queryExecution.executedPlan.toString.contains("pushedGroupBy"))
    assert(mvPivot.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap ===
      Map(("a", "y") -> 1L, ("b", "x") -> 1L)) // first values
  }

  test("FILTERED facet pushes: fq + facet.field as posting intersections") {
    import spark.implicits._
    val out = tmp("graft_dsv2_facetfq_")
    val df = Seq(
      ("1", Some("a"), "x"), ("2", Some("b"), "x"), ("3", Some("a"), "y"),
      ("4", None, "x"), ("5", Some("a"), "x")
    ).toDF("id", "v", "tag")
    SegmentShardSink.write(df, "id", out, shards = 2)
    val idx = spark.read.format("graft-index").load(out)
    def cnt = org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))
    // term filter + facet: counts restricted to tag=x, null bucket kept
    val fq = idx.filter(col("tag") === "x").groupBy("v").agg(cnt.as("n"))
    val plan = fq.queryExecution.executedPlan.toString
    assert(plan.contains("pushedTerm=tag:x") && plan.contains("pushedGroupBy=v"),
      plan.take(2000))
    assert(fq.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap ===
      Map(Option("a") -> 2L, Option("b") -> 1L, Option.empty[String] -> 1L))
    // range filter + facet
    val rq = idx.filter(col("id") >= "2" && col("id") <= "4").groupBy("v").agg(cnt.as("n"))
    val plan2 = rq.queryExecution.executedPlan.toString
    assert(plan2.contains("pushedRange=id:[2 TO 4]") && plan2.contains("pushedGroupBy=v"),
      plan2.take(2000))
    assert(rq.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap ===
      Map(Option("a") -> 1L, Option("b") -> 1L, Option.empty[String] -> 1L))
    // deletes respected under the filter
    SegmentShardSink.deleteByTerm(spark, out, "id", "5")
    assert(idx.filter(col("tag") === "x").groupBy("v").agg(cnt.as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap ===
      Map(Option("a") -> 1L, Option("b") -> 1L, Option.empty[String] -> 1L))
  }

  test("MIN/MAX pushdown: stats-component extremes from zone-map metadata") {
    import org.apache.spark.sql.functions.{count => cnt, lit, max, min}
    val idx = spark.read.format("graft-index").load(store)
    val m = idx.agg(min("value").as("lo"), max("value").as("hi"), cnt(lit(1)).as("n"))
    val plan = m.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=min(value),max(value),count(*)"), plan.take(2000))
    val row = m.head
    assert((row.getString(0), row.getString(1), row.getLong(2)) === (("alpha", "gamma", 5L)))
    // deletes invalidate metadata stats — the live postings answer:
    // delete "gamma" (the max) and the pushed max must drop to "beta"
    val out = {
      import spark.implicits._
      val o = tmp("graft_dsv2_mm_")
      SegmentShardSink.write(Seq(("1", "alpha"), ("2", "beta"), ("3", "gamma"))
        .toDF("id", "v"), "id", o, shards = 1)
      o
    }
    SegmentShardSink.deleteByTerm(spark, out, "v", "gamma")
    val m2 = spark.read.format("graft-index").load(out)
      .agg(min("v").as("lo"), max("v").as("hi")).head
    assert((m2.getString(0), m2.getString(1)) === (("alpha", "beta")))
    // stats.field under fq: filtered min/max pushes too, served from
    // the stat field's postings ∩ the match set (not zone maps)
    val f = idx.filter(col("tag") === "y").agg(max("value").as("hi"))
    val fPlan = f.queryExecution.executedPlan.toString
    assert(fPlan.contains("pushedTerm=tag:y") && fPlan.contains("pushedAgg=max(value)"),
      fPlan.take(2000))
    assert(f.head.getString(0) === "beta")
  }

  test("NUMERIC fields: typed schema, pushdown in numeric order, facets/stats decode") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count => cnt, lit, max, min}
    val out = tmp("graft_dsv2_num_")
    // string order would put 100 < 15 < 5 — numeric order must win
    val df = Seq(
      ("1", 5L, 2.5), ("2", 15L, -1.25), ("3", 100L, 10.0), ("4", -3L, 0.5)
    ).toDF("id", "n", "x")
    SegmentShardSink.write(df, "id", out, shards = 2)
    val idx = spark.read.format("graft-index").load(out)
    assert(idx.schema("n").dataType.typeName === "long")
    assert(idx.schema("x").dataType.typeName === "double")

    // range pushdown runs in NUMERIC order (code-point order on the
    // sortable encoding); plan displays decoded bounds
    val r = idx.filter(col("n") > 10L)
    val rPlan = r.queryExecution.executedPlan.toString
    assert(rPlan.contains("pushedRange=n:{10 TO *]"), rPlan.take(2000))
    assert(r.collect().map(_.getLong(1)).sorted.toSeq === Seq(15L, 100L))
    // negative bound: -3 must sort below 5 (sign-flip encoding)
    assert(idx.filter(col("n") < 5L).collect().map(_.getLong(1)).sorted.toSeq ===
      Seq(-3L))
    // double equality + range
    assert(idx.filter(col("x") === -1.25).collect().map(_.getString(0)).toSeq ===
      Seq("2"))
    assert(idx.filter(col("x") >= 0.5 && col("x") < 10.0)
      .collect().map(_.getString(0)).sorted.toSeq === Seq("1", "4"))
    // In pushes as multi-term lookup
    val in = idx.filter(col("n").isin(5L, 100L))
    assert(in.queryExecution.executedPlan.toString.contains("pushedTerm=n:"),
      in.queryExecution.executedPlan.toString.take(2000))
    assert(in.collect().map(_.getString(0)).sorted.toSeq === Seq("1", "3"))

    // TopN pushes and merges in numeric order
    val top = idx.orderBy(col("n").desc).limit(2)
    assert(top.queryExecution.executedPlan.toString.contains("pushedTopN=[n DESC]"),
      top.queryExecution.executedPlan.toString.take(2000))
    assert(top.collect().map(_.getLong(1)).toSeq === Seq(100L, 15L))

    // facet + stats decode: grouped count over n, min/max over x
    val fc = idx.groupBy("n").agg(cnt(lit(1)).as("c"))
    assert(fc.queryExecution.executedPlan.toString.contains("pushedGroupBy=n"))
    assert(fc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(5L -> 1L, 15L -> 1L, 100L -> 1L, -3L -> 1L))
    val mm = idx.agg(min("x").as("lo"), max("x").as("hi")).head
    assert((mm.getDouble(0), mm.getDouble(1)) === ((-1.25, 10.0)))

    // deleteByTerm takes the PLAIN value (encodes internally)
    SegmentShardSink.deleteByTerm(spark, out, "n", "100")
    assert(spark.read.format("graft-index").load(out)
      .filter(col("n") > 10L).collect().map(_.getLong(1)).toSeq === Seq(15L))

    // upsert re-encodes numerics from the marker's kind record
    SegmentShardSink.upsert(spark, out,
      Seq(("5", 42L, 3.5)).toDF("id", "n", "x"))
    assert(spark.read.format("graft-index").load(out)
      .filter(col("n") === 42L).collect().map(_.getString(0)).toSeq === Seq("5"))
  }

  test("TEMPORAL fields: timestamp/date typed schema, range pushdown, decode round-trip") {
    import spark.implicits._
    val out = tmp("graft_dsv2_time_")
    val df = Seq(
      ("1", "2024-01-15 10:30:00", "2024-01-15"),
      ("2", "2024-06-01 00:00:00", "2024-06-01"),
      ("3", "2023-12-31 23:59:59", "2023-12-31")
    ).toDF("id", "ts_s", "d_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .withColumn("day", col("d_s").cast("date"))
      .select("id", "ts", "day")
    SegmentShardSink.write(df, "id", out, shards = 2)
    val idx = spark.read.format("graft-index").load(out)
    assert(idx.schema("ts").dataType.typeName === "timestamp")
    assert(idx.schema("day").dataType.typeName === "date")

    // timestamp range pushes in instant order, zero residual
    val r = idx.filter(col("ts") >= lit("2024-01-01 00:00:00").cast("timestamp"))
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("pushedRange=ts:["), plan.take(2000))
    assert(r.collect().map(_.getString(0)).sorted.toSeq === Seq("1", "2"))
    // date equality + range
    assert(idx.filter(col("day") === lit("2024-06-01").cast("date"))
      .collect().map(_.getString(0)).toSeq === Seq("2"))
    assert(idx.filter(col("day") < lit("2024-01-01").cast("date"))
      .collect().map(_.getString(0)).toSeq === Seq("3"))
    // values round-trip typed through the scan
    val row = idx.filter(col("id") === "1").select("ts", "day").head
    assert(row.getTimestamp(0).toString.startsWith("2024-01-15 10:30:00"))
    assert(row.getDate(1).toString === "2024-01-15")
    // TopN in chronological order
    assert(idx.orderBy(col("ts").desc).limit(1).head.getString(0) === "2")
    // the scatter-gather surface shows ISO plain values
    val raw = SegmentSearch.matchAll(spark, out, Seq("id", "day"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(raw("3") === "2023-12-31")

    // TIMESTAMP_NTZ (what pandas-written parquet timestamps read as):
    // typed schema, chronological range pushdown, typed round-trip
    val ntzOut = tmp("graft_dsv2_ntz_")
    SegmentShardSink.write(
      Seq(("1", "2024-01-15 10:30:00"), ("2", "2024-06-01 00:00:00"))
        .toDF("id", "ts_s")
        .withColumn("ts", col("ts_s").cast("timestamp_ntz")).select("id", "ts"),
      "id", ntzOut, shards = 1)
    val ntzIdx = spark.read.format("graft-index").load(ntzOut)
    assert(ntzIdx.schema("ts").dataType.typeName === "timestamp_ntz")
    val nq = ntzIdx.filter(col("ts") >= lit("2024-02-01 00:00:00").cast("timestamp_ntz"))
    assert(nq.queryExecution.executedPlan.toString.contains("pushedRange=ts:[2024-02-01T00:00"),
      nq.queryExecution.executedPlan.toString.take(2000))
    assert(nq.collect().map(_.getString(0)).toSeq === Seq("2"))
  }

  test("SUM/COUNT(field) pushdown: postings-served stats, null/delete aware") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count => cnt, lit, sum}
    val out = tmp("graft_dsv2_sum_")
    val df = Seq(
      ("1", Some(5L), Some(1.5)), ("2", Some(15L), None),
      ("3", Option.empty[Long], Some(2.5)), ("4", Some(-3L), Some(0.25))
    ).toDF("id", "n", "x")
    SegmentShardSink.write(df, "id", out, shards = 2)
    val idx = spark.read.format("graft-index").load(out)

    val q = idx.agg(sum("n").as("s"), cnt(col("n")).as("cn"), cnt(lit(1)).as("all"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=sum(n),count(n),count(*)"), plan.take(2000))
    val r = q.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((17L, 3L, 4L)))

    // under an fq: only matching docs contribute
    val fq = idx.filter(col("x") >= 1.0).agg(sum("n").as("s"), cnt(col("n")).as("cn"))
    val fqPlan = fq.queryExecution.executedPlan.toString
    assert(fqPlan.contains("pushedAgg=sum(n),count(n)"), fqPlan.take(2000))
    val fr = fq.head
    assert((fr.getLong(0), fr.getLong(1)) === ((5L, 1L))) // doc 1 only (3 has null n)

    // count(double field) pushes; sum(double) does NOT (stays in Spark)
    val cd = idx.agg(cnt(col("x")).as("cx"))
    assert(cd.queryExecution.executedPlan.toString.contains("pushedAgg=count(x)"))
    assert(cd.head.getLong(0) === 3L)
    val sd = idx.agg(sum("x").as("sx"))
    assert(!sd.queryExecution.executedPlan.toString.contains("pushedAgg"))
    assert(sd.head.getDouble(0) === 4.25)

    // deletes drop out of the walk
    SegmentShardSink.deleteByTerm(spark, out, "id", "2")
    val r2 = spark.read.format("graft-index").load(out)
      .agg(sum("n").as("s"), cnt(col("n")).as("cn")).head
    assert((r2.getLong(0), r2.getLong(1)) === ((2L, 2L)))

    // sum over an all-null match set is NULL (SQL semantics)
    val none = spark.read.format("graft-index").load(out)
      .filter(col("id") === "3").agg(sum("n").as("s")).head
    assert(none.isNullAt(0))
  }

  test("GROUPED stats pushdown: JSON-facet nested min/max per bucket") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count => cnt, lit, max, min}
    val out = tmp("graft_dsv2_gstats_")
    // group g: nulls on 5; stat v: null on 4 (count must still see 4)
    val df = Seq(
      ("1", Some("a"), Some("m")), ("2", Some("a"), Some("q")),
      ("3", Some("b"), Some("k")), ("4", Some("b"), Option.empty[String]),
      ("5", Option.empty[String], Some("z"))
    ).toDF("id", "g", "v")
    SegmentShardSink.write(df, "id", out, shards = 2)
    val idx = spark.read.format("graft-index").load(out)

    val q = idx.groupBy("g").agg(cnt(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=count(*),min(v),max(v)") &&
      plan.contains("pushedGroupBy=g"), plan.take(2000))
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => Option(r.getString(0)) ->
        ((r.getLong(1), Option(r.getString(2)), Option(r.getString(3))))).toMap
    assert(asMap(q.collect()) === Map(
      Some("a") -> ((2L, Some("m"), Some("q"))),
      Some("b") -> ((2L, Some("k"), Some("k"))), // null v ignored by min/max, counted
      None -> ((1L, Some("z"), Some("z")))))

    // fq + nested stats: the pushed filter restricts every bucket
    val fq = idx.filter(col("v") >= "m")
      .groupBy("g").agg(cnt(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
    val fqPlan = fq.queryExecution.executedPlan.toString
    assert(fqPlan.contains("pushedRange=v:[m TO *]") &&
      fqPlan.contains("pushedGroupBy=g"), fqPlan.take(2000))
    assert(asMap(fq.collect()) === Map(
      Some("a") -> ((2L, Some("m"), Some("q"))),
      None -> ((1L, Some("z"), Some("z")))))

    // deletes flow through the forward view and the stat walk
    SegmentShardSink.deleteByTerm(spark, out, "id", "2")
    assert(asMap(spark.read.format("graft-index").load(out)
      .groupBy("g").agg(cnt(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect()) === Map(
      Some("a") -> ((1L, Some("m"), Some("m"))),
      Some("b") -> ((2L, Some("k"), Some("k"))),
      None -> ((1L, Some("z"), Some("z")))))

    // an analyzed stat field blocks the push (stored value ≠ terms)
    val anOut = tmp("graft_dsv2_gstatsan_")
    SegmentShardSink.write(
      Seq(("1", "a", "Big Cats"), ("2", "b", "small dogs")).toDF("id", "g", "txt"),
      "id", anOut, shards = 1, analyzedFields = Set("txt"))
    val an = spark.read.format("graft-index").load(anOut)
      .groupBy("g").agg(min("txt").as("lo"))
    assert(!an.queryExecution.executedPlan.toString.contains("pushedGroupBy"))
    assert(an.collect().map(r => r.getString(0) -> r.getString(1)).toMap ===
      Map("a" -> "Big Cats", "b" -> "small dogs"))
  }

  test("GROUPED sum/count(field) pushdown: typed sums per bucket, null-aware") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count => cnt, lit, sum => sm}
    val out = tmp("graft_dsv2_gsum_")
    // group g: null on 5; typed long v: null on 4 (sum/count skip it)
    val df = Seq(
      ("1", Some("a"), Some(10L)), ("2", Some("a"), Some(-3L)),
      ("3", Some("b"), Some(7L)), ("4", Some("b"), Option.empty[Long]),
      ("5", Option.empty[String], Some(100L))
    ).toDF("id", "g", "v")
    SegmentShardSink.write(df, "id", out, shards = 2)
    val idx = spark.read.format("graft-index").load(out)
    val q = idx.groupBy("g").agg(sm("v").as("s"), cnt(col("v")).as("nv"),
      cnt(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=sum(v),count(v),count(*)") &&
      plan.contains("pushedGroupBy=g"), plan.take(2000))
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => Option(r.getString(0)) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2), r.getLong(3)))).toMap
    assert(asMap(q.collect()) === Map(
      Some("a") -> ((Some(7L), 2L, 2L)),
      Some("b") -> ((Some(7L), 1L, 2L)), // null v: count(v)=1, count(*)=2
      None -> ((Some(100L), 1L, 1L))))
    // group with NO stat values at all -> SUM null, count(v) 0
    val fq = idx.filter(col("v") <= 50L)
      .groupBy("g").agg(sm("v").as("s"), cnt(col("v")).as("nv"), cnt(lit(1)).as("n"))
    assert(asMap(fq.collect()) === Map(
      Some("a") -> ((Some(7L), 2L, 2L)),
      Some("b") -> ((Some(7L), 1L, 1L))))
    // deletes flow through the sum walk
    SegmentShardSink.deleteByTerm(spark, out, "id", "1")
    assert(asMap(spark.read.format("graft-index").load(out)
      .groupBy("g").agg(sm("v").as("s"), cnt(col("v")).as("nv"), cnt(lit(1)).as("n"))
      .collect()) === Map(
      Some("a") -> ((Some(-3L), 1L, 1L)),
      Some("b") -> ((Some(7L), 1L, 2L)),
      None -> ((Some(100L), 1L, 1L))))
    // a DOUBLE stat field does NOT push grouped SUM (order-sensitive
    // float math stays in Spark) — results still correct
    val dOut = tmp("graft_dsv2_gsumd_")
    SegmentShardSink.write(
      Seq(("1", "a", Some(1.5)), ("2", "a", Some(2.25))).toDF("id", "g", "v"),
      "id", dOut, shards = 1)
    val dq = spark.read.format("graft-index").load(dOut)
      .groupBy("g").agg(sm("v").as("s"))
    assert(!dq.queryExecution.executedPlan.toString.contains("pushedAgg=sum"),
      dq.queryExecution.executedPlan.toString.take(2000))
    assert(dq.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap ===
      Map("a" -> 3.75))
  }

  test("LIMIT pushes per-shard (partial): plan shows it, results exact") {
    val idx = spark.read.format("graft-index").load(store)
    val limited = idx.select("id").limit(2)
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=2"), plan.take(2000))
    assert(limited.collect().length === 2)
    // limit composes with a pushed term: at most N per shard, then global
    val both = idx.filter(col("value") === "alpha").select("id").limit(1)
    val plan2 = both.queryExecution.executedPlan.toString
    assert(plan2.contains("pushedTerm=value:alpha") && plan2.contains("pushedLimit=1"),
      plan2.take(2000))
    assert(both.collect().length === 1)
  }

  test("range pushdown: bounds reach the scan as a term-dictionary range, results exact") {
    val idx = spark.read.format("graft-index").load(store)
    // both bounds on one field absorb into a single pushed range
    val both = idx.filter(col("value") >= "alpha" && col("value") < "beta").select("id")
    val scan = both.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(_.contains("pushedRange=value:[alpha TO beta}")), s"scan was: $scan")
    assert(both.collect().map(_.getString(0)).sorted.toSeq === Seq("1", "3", "5"))
    // single-sided bound
    val lower = idx.filter(col("value") > "alpha").select("id")
    val scan2 = lower.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan2.exists(_.contains("pushedRange=value:{alpha TO *]")), s"scan was: $scan2")
    assert(lower.collect().map(_.getString(0)).sorted.toSeq === Seq("2", "4"))
    // term + range on different fields: BOTH push, as a MUST intersection
    val mixed = idx.filter(col("tag") === "y" && col("value") >= "alpha").select("id")
    val scan3 = mixed.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan3.exists(_.contains("pushedAnd=(tag:y AND value:[alpha TO *])")),
      s"scan was: $scan3")
    assert(mixed.collect().map(_.getString(0)).sorted.toSeq === Seq("2", "3"))
  }

  test("AND pushdown: MUST intersections, nested booleans, count/facet composition") {
    val idx = spark.read.format("graft-index").load(store)
    // (value=alpha AND tag=y) — pure term intersection
    val and2 = idx.filter(col("value") === "alpha" && col("tag") === "y").select("id")
    val plan = and2.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAnd=(value:alpha AND tag:y)"), plan.take(2000))
    assert(and2.collect().map(_.getString(0)).toSeq === Seq("3"))
    // AND containing an OR — the full boolean lands in the scan
    val nested = idx.filter((col("value") === "alpha" || col("value") === "beta")
      && col("tag") === "y").select("id")
    val plan2 = nested.queryExecution.executedPlan.toString
    assert(plan2.contains("pushedAnd=((value:alpha OR value:beta) AND tag:y)"),
      plan2.take(2000))
    assert(nested.collect().map(_.getString(0)).sorted.toSeq === Seq("2", "3"))
    // AND count from postings only
    val cnt = idx.filter(col("value") === "alpha" && col("tag") === "x")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    val plan3 = cnt.queryExecution.executedPlan.toString
    assert(plan3.contains("pushedAgg=count(*)") && plan3.contains("pushedAnd="), plan3.take(2000))
    assert(cnt.head.getLong(0) === 1L) // doc 1 only
    // AND filter + facet (two fq clauses + facet.field)
    val facet = idx.filter(col("value") === "alpha" && col("tag") =!= "q")
      .groupBy("tag")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    // tag=!=q is residual → no agg pushdown; drop it for the pushed shape
    val facet2 = idx.filter(col("value") === "alpha" && col("id") >= "1")
      .groupBy("tag")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    val plan4 = facet2.queryExecution.executedPlan.toString
    assert(plan4.contains("pushedAnd=") && plan4.contains("pushedGroupBy=tag"), plan4.take(2000))
    assert(facet2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("x" -> 1L, "y" -> 1L, "z" -> 1L))
    assert(facet.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("x" -> 1L, "y" -> 1L, "z" -> 1L))
  }

  test("startsWith pushes as a half-open prefix range") {
    val idx = spark.read.format("graft-index").load(store)
    val pre = idx.filter(col("value").startsWith("al")).select("id")
    val scan = pre.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(_.contains("pushedRange=value:[al TO am}")), s"scan was: $scan")
    assert(pre.collect().map(_.getString(0)).sorted.toSeq === Seq("1", "3", "5"))
  }

  test("range count composes with COUNT(*) pushdown (numFound for a range fq)") {
    val idx = spark.read.format("graft-index").load(store)
    val cnt = idx.filter(col("value") >= "b")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    val plan = cnt.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=count(*)") && plan.contains("pushedRange=value:[b TO *]"),
      plan.take(2000))
    assert(cnt.head.getLong(0) === 2L) // beta, gamma
  }

  test("analyzed fields are NOT pushed — verbatim stored values still match") {
    import spark.implicits._
    val out = tmp("graft_dsv2_ana_")
    val df = Seq(("1", "Spark Engine"), ("2", "other words")).toDF("id", "text")
    SegmentShardSink.write(df, "id", out, shards = 1, analyzedFields = Set("text"))
    val idx = spark.read.format("graft-index").load(out)
    // equality on an analyzed field: postings hold TOKENS ("spark",
    // "engine"), the relational surface the VERBATIM value — pushing
    // would lose this row. Must stay residual and still match.
    val eq = idx.filter(col("text") === "Spark Engine")
    val scan = eq.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(_.contains("pushedTerm=*:*")), s"scan was: $scan")
    assert(eq.select("id").collect().map(_.getString(0)).toSeq === Seq("1"))
    // ranges on analyzed fields equally stay residual
    val rg = idx.filter(col("text") >= "S" && col("text") <= "T")
    val scan2 = rg.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan2.exists(_.contains("pushedTerm=*:*")), s"scan was: $scan2")
    assert(rg.select("id").collect().map(_.getString(0)).toSeq === Seq("1"))
  }

  test("TopN pushdown: per-shard bounded heap, Spark's global merge, exact results") {
    val idx = spark.read.format("graft-index").load(store)
    // multi-key sort with a unique tie-break → deterministic set
    val top = idx.orderBy(col("value").asc, col("id").asc).limit(3).select("id", "value")
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("pushedTopN=[value ASC,id ASC] rows=3"), plan.take(2000))
    // partial pushdown: Spark's own global TakeOrdered must remain
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(top.collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("1", "alpha"), ("3", "alpha"), ("5", "alpha")))
    // descending
    val bottom = idx.orderBy(col("value").desc, col("id").desc).limit(2).select("id", "value")
    val plan2 = bottom.queryExecution.executedPlan.toString
    assert(plan2.contains("pushedTopN=[value DESC,id DESC] rows=2"), plan2.take(2000))
    assert(bottom.collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("4", "gamma"), ("2", "beta")))
    // composes with a pushed term filter
    val filtered = idx.filter(col("value") === "alpha")
      .orderBy(col("id").desc).limit(2).select("id")
    val plan3 = filtered.queryExecution.executedPlan.toString
    assert(plan3.contains("pushedTerm=value:alpha") && plan3.contains("pushedTopN=[id DESC]"),
      plan3.take(2000))
    assert(filtered.collect().map(_.getString(0)).toSeq === Seq("5", "3"))
  }

  test("TopN honors null ordering for docs missing the sort field") {
    import spark.implicits._
    val out = tmp("graft_dsv2_topn_null_")
    // doc 3 has no "rank" field at all → null on the relational surface
    val df = Seq(
      ("1", Some("b")), ("2", Some("a")), ("3", None), ("4", Some("c"))
    ).toDF("id", "rank")
    SegmentShardSink.write(df, "id", out, shards = 1)
    val idx = spark.read.format("graft-index").load(out)
    // ASC default: NULLS FIRST — the null doc must win the top spot
    val first = idx.orderBy(col("rank").asc).limit(2).select("id")
    assert(first.queryExecution.executedPlan.toString.contains("pushedTopN"),
      first.queryExecution.executedPlan.toString.take(2000))
    assert(first.collect().map(_.getString(0)).toSeq === Seq("3", "2"))
    // DESC default: NULLS LAST — the null doc must NOT appear in top-2
    val last = idx.orderBy(col("rank").desc).limit(2).select("id")
    assert(last.collect().map(_.getString(0)).toSeq === Seq("4", "1"))
  }

  test("OR pushdown: BooleanQuery as posting-list unions, cross-field, deduped") {
    val idx = spark.read.format("graft-index").load(store)
    // same-field OR — the classic lang:en OR lang:de shape
    val sameField = idx.filter(col("value") === "beta" || col("value") === "gamma")
      .select("id")
    val plan = sameField.queryExecution.executedPlan.toString
    assert(plan.contains("pushedOr=(value:beta OR value:gamma)"), plan.take(2000))
    assert(sameField.collect().map(_.getString(0)).sorted.toSeq === Seq("2", "4"))
    // cross-field OR with a range branch; doc 4 (gamma, tag x) matches
    // BOTH branches and must appear once
    val crossField = idx.filter(col("value") === "gamma" || col("tag") >= "x").select("id")
    val plan2 = crossField.queryExecution.executedPlan.toString
    assert(plan2.contains("pushedOr=(value:gamma OR tag:[x TO *])"), plan2.take(2000))
    assert(crossField.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("1", "2", "3", "4", "5"))
    // OR count composes with COUNT(*) pushdown
    val cnt = idx.filter(col("value") === "alpha" || col("value") === "beta")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    val plan3 = cnt.queryExecution.executedPlan.toString
    assert(plan3.contains("pushedAgg=count(*)") && plan3.contains("pushedOr="), plan3.take(2000))
    assert(cnt.head.getLong(0) === 4L)
    // OR filter + facet (fq with a boolean + facet.field)
    val facet = idx.filter(col("value") === "alpha" || col("value") === "beta")
      .groupBy("tag")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    val plan4 = facet.queryExecution.executedPlan.toString
    assert(plan4.contains("pushedOr=") && plan4.contains("pushedGroupBy=tag"), plan4.take(2000))
    assert(facet.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("x" -> 1L, "y" -> 2L, "z" -> 1L))
    // a MUST_NOT branch pushes inside the OR (value:alpha OR -tag:z)
    val orNot = idx.filter(col("value") === "alpha" || col("tag") =!= "z").select("id")
    assert(orNot.queryExecution.executedPlan.toString.contains("NOT tag:z"),
      orNot.queryExecution.executedPlan.toString.take(2000))
    assert(orNot.collect().map(_.getString(0)).sorted.toSeq === Seq("1", "2", "3", "4", "5"))
    // an OR with a NON-pushable branch (contains) stays residual whole
    val residual = idx.filter(col("value") === "alpha" || col("tag").contains("z")).select("id")
    assert(residual.queryExecution.executedPlan.toString.contains("pushedTerm=*:*"),
      residual.queryExecution.executedPlan.toString.take(2000))
    assert(residual.collect().map(_.getString(0)).sorted.toSeq === Seq("1", "3", "5"))
  }

  test("SolrQueryString composes over the index table (the user's full loop)") {
    import graft.search.SolrQueryString
    val idx = spark.read.format("graft-index").load(store)
    val pred = SolrQueryString.compile("value:alpha AND tag:[x TO y]",
      idx.schema, defaultField = "value")
    assert(idx.filter(pred).select("id").collect().map(_.getString(0)).sorted.toSeq
      === Seq("1", "3"))
  }

  test("agrees with the SegmentSearch scatter-gather path") {
    val viaDsv2 = spark.read.format("graft-index").load(store)
      .filter(col("value") === "alpha").select("id", "tag")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val viaSearch = SegmentSearch.termQuery(spark, store, "value", "alpha", Seq("id", "tag"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(viaDsv2 === viaSearch)
  }
}
