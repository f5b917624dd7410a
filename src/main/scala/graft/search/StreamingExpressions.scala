package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Solr streaming expressions (the `/stream` handler's functional
 * query language) — the decorator subset a user of the built index
 * actually composes for analytics:
 *
 *   search(coll, q="...", fl="a,b,c", sort="a asc")
 *   top(n=5, <stream>, sort="x desc")
 *   unique(<stream>, over="f")
 *   rollup(<stream>, over="f", sum(x), min(x), max(x), avg(x), count(*))
 *   stats(coll, q="...", sum(x), count(*))
 *   innerJoin(<left>, <right>, on="a=b")
 *   leftOuterJoin(<left>, <right>, on="a=b")
 *   hashJoin(<left>, <hashed>, on="a=b")    — hashed side broadcast
 *   outerHashJoin(<left>, <hashed>, on="a=b")
 *   facet(coll, q=, buckets=, bucketSorts=, bucketSizeLimit=, count(*))
 *   timeseries(coll, q=, field=, start=, end=, gap="+1DAY", count(*))
 *   update(dest, <stream>) / commit(dest, <update>)  — index the stream
 *   random(coll, q=, fl=, rows=, seed=)  — deterministic hash sample
 *   fetch(coll, <stream>, on="id", fl="a,b")
 *   intersect(<left>, <right>, on="key")   — left tuples whose key appears right
 *   complement(<left>, <right>, on="key")  — left tuples whose key does not
 *   having(<stream>, gt(f, v))             — gt/lt/eq/noteq/gteq/lteq, and/or/not
 *   merge(<s1>, <s2>, on="a asc")          — union under a shared sort contract
 *   sort(<stream>, by="a asc")             — global re-sort (new contract)
 *   select(<stream>, "a as b", "c")
 *
 * Solr executes these as sorted tuple streams merged worker-side;
 * the Spark-first re-expression compiles each decorator to the
 * equivalent DataFrame transform and lets Catalyst pick the physical
 * plan — `search` leaves ride the DataSourceV2 index pushdowns
 * (filters/projection from postings), `rollup` is a hash aggregate
 * (NOT a sorted-stream reduce — same result, no global sort),
 * `top` is TakeOrdered, `innerJoin` a hash join. The one place
 * Solr's sort-contract carries semantics is `unique(over=f)` (first
 * tuple per key IN STREAM ORDER): the compiler threads the nearest
 * upstream `sort` spec down and evaluates it as a row_number window
 * over (partition by f, order by that spec) — order-insensitive
 * plans everywhere else.
 *
 * Grammar (recursive descent, quoted or bare values):
 *   expr  := ident '(' arg (',' arg)* ')'
 *   arg   := expr | ident '=' value | value
 *   value := '"' chars '"' | bare-token
 */
object StreamingExpressions {

  sealed trait Arg
  final case class Named(key: String, value: String) extends Arg
  final case class Pos(value: String) extends Arg
  final case class Sub(call: Call) extends Arg
  final case class Call(name: String, args: Seq[Arg])

  // ---------------- parser ----------------

  def parse(s: String): Call = {
    val p = new Parser(s)
    val c = p.parseCall()
    p.skipWs()
    require(p.eof, s"trailing input at ${p.pos}: '${s.drop(p.pos)}'")
    c
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s(pos).isWhitespace) pos += 1
    private def peek: Char = s(pos)

    private def ident(): String = {
      skipWs()
      val start = pos
      while (!eof && (s(pos).isLetterOrDigit || s(pos) == '_' || s(pos) == '*'))
        pos += 1
      require(pos > start, s"expected identifier at $start in '$s'")
      s.substring(start, pos)
    }

    private def quoted(): String = {
      val sb = new StringBuilder
      pos += 1 // opening quote
      while (!eof && peek != '"') {
        if (peek == '\\' && pos + 1 < s.length) { sb.append(s(pos + 1)); pos += 2 }
        else { sb.append(peek); pos += 1 }
      }
      require(!eof, s"unterminated string in '$s'")
      pos += 1
      sb.toString
    }

    private def bare(): String = {
      val start = pos
      var depth = 0
      while (!eof && (depth > 0 || (peek != ',' && peek != ')'))) {
        if (peek == '"') {
          // a quoted span inside a bare value (q=name:"John, Jr") is
          // opaque: commas and parens inside it must not split the
          // value or move paren depth (same escape rule as quoted())
          pos += 1
          while (!eof && peek != '"') {
            if (peek == '\\' && pos + 1 < s.length) pos += 2 else pos += 1
          }
          require(!eof, s"unterminated string in '$s'")
          pos += 1
        } else {
          if (peek == '(') depth += 1
          else if (peek == ')') depth -= 1
          pos += 1
        }
      }
      s.substring(start, pos).trim
    }

    def parseCall(): Call = {
      val name = ident()
      skipWs()
      require(!eof && peek == '(', s"expected ( after $name")
      pos += 1
      val args = scala.collection.mutable.ArrayBuffer[Arg]()
      skipWs()
      if (!eof && peek != ')') {
        args += parseArg()
        skipWs()
        while (!eof && peek == ',') { pos += 1; args += parseArg(); skipWs() }
      }
      require(!eof && peek == ')', s"expected ) at $pos in '$s'")
      pos += 1
      Call(name, args.toSeq)
    }

    private def parseArg(): Arg = {
      skipWs()
      if (peek == '"') Pos(quoted())
      else {
        val save = pos
        val id = try ident() catch { case _: IllegalArgumentException => "" }
        skipWs()
        if (id.nonEmpty && !eof && peek == '(') {
          pos = save
          val sub = Sub(parseCall())
          skipWs()
          // a call followed by more text — `analyze(f) as terms` — is
          // an evaluator-with-alias, not a sub-stream: re-read the
          // whole span as one positional string (bare() is
          // paren-balanced)
          if (!eof && peek != ',' && peek != ')') { pos = save; Pos(bare()) }
          else sub
        }
        else if (id.nonEmpty && !eof && peek == '=') {
          pos += 1; skipWs()
          if (!eof && peek == '"') Named(id, quoted()) else Named(id, bare())
        } else { pos = save; Pos(bare()) }
      }
    }
  }

  // ---------------- compiler ----------------

  /** A compiled stream: the frame plus the sort contract it would
    * carry as a Solr tuple stream (threads into unique()). */
  final case class Stream(df: DataFrame, sort: Seq[(String, Boolean)])

  private def parseSort(spec: String): Seq[(String, Boolean)] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { part =>
      val ps = part.split("\\s+")
      val asc = ps.length < 2 || ps(1).equalsIgnoreCase("asc")
      (ps(0), asc)
    }

  private def sortCols(sort: Seq[(String, Boolean)]): Seq[Column] =
    sort.map { case (f, asc) => if (asc) col(f).asc else col(f).desc }

  private def named(c: Call, key: String): Option[String] =
    c.args.collectFirst { case Named(k, v) if k == key => v }

  private def subs(c: Call): Seq[Call] = c.args.collect { case Sub(s) => s }

  private val AggRe = """^(sum|min|max|avg|count)\((.+)\)$""".r

  /** `analyze(field) as alias` — the Solr analyze() evaluator, bound
    * to the index-time analyzer (lowercase alnum runs, the
    * SegmentIndex.analyze contract) so exploded terms equal the
    * postings a search would hit. */
  private val AnalyzeRe = """^analyze\(\s*([A-Za-z0-9_]+)\s*\)\s+(?i:as)\s+([A-Za-z0-9_]+)$""".r

  private def analyzeCol(f: String): Column =
    expr(s"filter(split(lower(`$f`), '[^a-z0-9]+'), x -> x <> '')")

  /** Solr arithmetic evaluators inside select(): `add(f, 10) as x`
    * (add/sub/mult/div over a field/number pair). All arithmetic in
    * DOUBLE — the evaluator contract is numeric, and one type keeps
    * the cross-engine story simple. */
  private val ArithRe =
    """^(add|sub|mult|div)\(\s*([A-Za-z0-9_.\-]+)\s*,\s*([A-Za-z0-9_.\-]+)\s*\)\s+(?i:as)\s+([A-Za-z0-9_]+)$""".r

  private def operand(s: String): Column =
    s.toDoubleOption.map(lit(_)).getOrElse(col(s).cast("double"))

  /**
   * Compile a streaming expression against `collections` (collection
   * name → segment-store path). `textFields`/`defaultField` resolve
   * per-collection from the store marker, as in [[graft.Graft.search]].
   */
  def compile(spark: SparkSession, expr: String,
              collections: Map[String, String]): DataFrame =
    compileCall(spark, parse(expr), collections).df

  private def compileCall(spark: SparkSession, c: Call,
                          collections: Map[String, String]): Stream = c.name match {
    case "search" =>
      val coll = c.args.headOption match {
        case Some(Pos(v)) => v
        case _ => sys.error("search() needs the collection as its first argument")
      }
      val store = collections.getOrElse(coll,
        sys.error(s"unknown collection '$coll' (have ${collections.keys.mkString(",")})"))
      val marker = graft.index.SegmentShardSink.readMarker(
        spark.sessionState.newHadoopConf(), store)
      val idx = spark.read.format("graft-index").load(store)
      val default = marker.analyzed.toSeq.sorted.headOption.getOrElse(marker.idCol)
      val q = named(c, "q").getOrElse("*:*")
      val filtered = idx.filter(
        SolrQueryString.compile(q, idx.schema, default, marker.analyzed))
      val projected = named(c, "fl") match {
        case Some(fl) => filtered.select(
          fl.split(",").map(_.trim).filter(_.nonEmpty).map(col).toIndexedSeq: _*)
        case None => filtered
      }
      Stream(projected, named(c, "sort").map(parseSort).getOrElse(Nil))

    case "top" =>
      val n = named(c, "n").getOrElse(sys.error("top() needs n=")).toInt
      val in = one(spark, c, collections)
      val sort = named(c, "sort").map(parseSort)
        .orElse(Some(in.sort).filter(_.nonEmpty))
        .getOrElse(sys.error("top() needs sort= (none inherited)"))
      Stream(in.df.orderBy(sortCols(sort): _*).limit(n), sort)

    case "unique" =>
      val over = named(c, "over").getOrElse(sys.error("unique() needs over="))
      val in = one(spark, c, collections)
      require(in.sort.nonEmpty,
        "unique() needs a sorted upstream (Solr's stream-order contract)")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(over)).orderBy(sortCols(in.sort): _*)
      Stream(in.df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"), in.sort)

    case "rollup" =>
      val over = named(c, "over").getOrElse(sys.error("rollup() needs over="))
      // aggregates parse as nested calls (sum(n_chars)) — split them
      // from the stream argument structurally
      val streams = subs(c).filterNot(s => AggFns(s.name))
      require(streams.length == 1, "rollup() needs exactly one stream argument")
      val in = compileCall(spark, streams.head, collections)
      val aggs = c.args.collect {
        case Sub(Call(fn, as)) if AggFns(fn) =>
          (fn, as.collectFirst { case Pos(v) => v }.getOrElse("*"))
        case Pos(AggRe(fn, arg)) => (fn, arg) // quoted form
      }
      require(aggs.nonEmpty, "rollup() needs at least one aggregate")
      val cols = aggs.map(aggCol)
      val overCols = over.split(",").map(_.trim).map(col).toIndexedSeq
      Stream(in.df.groupBy(overCols: _*).agg(cols.head, cols.tail: _*), Nil)

    case "innerJoin" | "leftOuterJoin" | "hashJoin" | "outerHashJoin" =>
      // Solr's merge joins (innerJoin/leftOuterJoin) demand both
      // streams sorted on the key; hashJoin/outerHashJoin instead read
      // the `hashed` stream FULLY INTO WORKER MEMORY. The DataFrame
      // re-expression frees the sort requirement (Catalyst picks the
      // join strategy), and the hashed-stream-in-memory contract maps
      // EXACTLY onto a broadcast hint on the right side — same memory
      // model, cluster-wide.
      val on = named(c, "on").getOrElse(sys.error(s"${c.name}() needs on="))
      val ss = subs(c)
      require(ss.length == 2, s"${c.name}() needs exactly two stream arguments")
      val l = compileCall(spark, ss(0), collections)
      val r0 = compileCall(spark, ss(1), collections)
      val hashed = c.name.toLowerCase.contains("hash")
      val rdf = if (hashed) broadcast(r0.df) else r0.df
      val joinType =
        if (c.name == "leftOuterJoin" || c.name == "outerHashJoin") "left" else "inner"
      val pairs = on.split(",").map(_.trim).map { p =>
        p.split("=").map(_.trim) match {
          case Array(a, b) => (a, b)
          case Array(a) => (a, a)
          case _ => sys.error(s"bad on= clause '$p'")
        }
      }
      // equal-named keys join with USING semantics (one output column);
      // differently-named keys keep both sides. A MIXED clause must
      // still dedup the equal-named copies — a condition built from
      // all pairs would leave two `id` columns and break every
      // downstream reference to the name.
      val (usingKeys, exprKeys) = pairs.partition { case (a, b) => a == b }
      val joined =
        if (exprKeys.isEmpty)
          l.df.join(rdf, usingKeys.map(_._1).toIndexedSeq, joinType)
        else {
          val cond = pairs.map { case (a, b) => l.df(a) === rdf(b) }.reduce(_ && _)
          usingKeys.map(_._1).foldLeft(l.df.join(rdf, cond, joinType)) {
            (df, k) => df.drop(rdf(k))
          }
        }
      Stream(joined, l.sort)

    case "facet" =>
      // facet(coll, q=, buckets=, bucketSorts=, bucketSizeLimit=, aggs)
      // — Solr pushes this to the JSON Facet API; here the grouped
      // aggregate rides the index pushdowns under the same contract:
      // bucket tuples, sorted, bounded
      val coll = c.args.headOption match {
        case Some(Pos(v)) => v
        case _ => sys.error("facet() needs the collection as its first argument")
      }
      val buckets = named(c, "buckets").getOrElse(sys.error("facet() needs buckets="))
      val inner = Call("search", Seq(Pos(coll)) ++
        c.args.collect { case n @ Named("q", _) => n })
      val in = compileCall(spark, inner, collections)
      val aggs = c.args.collect {
        case Sub(Call(fn, as)) if AggFns(fn) =>
          (fn, as.collectFirst { case Pos(v) => v }.getOrElse("*"))
        case Pos(AggRe(fn, arg)) => (fn, arg)
      }
      require(aggs.nonEmpty, "facet() needs at least one aggregate")
      val cols = aggs.map(aggCol)
      val bucketCols = buckets.split(",").map(_.trim).map(col).toIndexedSeq
      val grouped = in.df.groupBy(bucketCols: _*).agg(cols.head, cols.tail: _*)
      val sorted = named(c, "bucketSorts").map(parseSort)
        .getOrElse(Seq((aggs.head match { case ("count", _) => "cnt"
          case (fn, f) => s"${fn}_$f" }, false)))
      val limit = named(c, "bucketSizeLimit").map(_.toInt).getOrElse(10)
      Stream(grouped.orderBy(sortCols(sorted): _*).limit(limit), sorted)


    case "update" =>
      // update(destCollection, <stream>): index the stream's tuples
      // into the destination store via the router-aligned upsert
      // (L68) and emit Solr's worker summary tuple (batchIndexed).
      // The write happens when the expression COMPILES (Solr's update
      // stream also drains eagerly per batch); idempotent for a
      // deterministic inner stream — same tuples, same final store.
      val dest = c.args.headOption match {
        case Some(Pos(v)) => v
        case _ => sys.error("update() needs the destination collection first")
      }
      val store = collections.getOrElse(dest, sys.error(s"unknown collection '$dest'"))
      val in = one(spark, c, collections)
      // ONE evaluation of the inner stream for both the count and the
      // write (upsert itself re-reads for its duplicate-id check +
      // routing): without the persist a non-replay-stable inner stream
      // could report a batchIndexed that disagrees with what landed,
      // and even a stable one pays the scan twice
      val batch = in.df.persist()
      try {
        val n = batch.count()
        graft.index.SegmentShardSink.upsert(spark, store, batch)
        import spark.implicits._
        Stream(Seq(n).toDF("batchIndexed"), Nil)
      } finally batch.unpersist(blocking = false)

    case "commit" =>
      // commit(destCollection, <update stream>): API-parity decorator
      // — the segment-store upsert already publishes atomically at its
      // commit marker, so commit() just passes the summary through
      require(c.args.collectFirst { case Pos(v) => v }.nonEmpty,
        "commit() needs the destination collection first")
      one(spark, c, collections)

    case "random" =>
      // random(coll, q=, fl=, rows=N, seed=s): Solr's random stream
      // re-expressed DETERMINISTICALLY — order by md5(seed || id),
      // take N (a seeded hash sample is replayable across engines and
      // retries; Solr's index-random sort is not). The cut is a
      // TakeOrdered over the pushed scan, never a full sort.
      val coll = c.args.headOption match {
        case Some(Pos(v)) => v
        case _ => sys.error("random() needs the collection as its first argument")
      }
      val rows = named(c, "rows").getOrElse(sys.error("random() needs rows=")).toInt
      val seed = named(c, "seed").getOrElse("0")
      val store = collections.getOrElse(coll, sys.error(s"unknown collection '$coll'"))
      val marker = graft.index.SegmentShardSink.readMarker(
        spark.sessionState.newHadoopConf(), store)
      // the rand key needs the id column even when fl= omits it: widen
      // the inner fl, then project the synthetic columns back OUT so
      // the output schema is exactly the requested field list (Solr's
      // random stream emits no extra columns)
      val requestedFl = named(c, "fl")
      val innerArgs = c.args.collect { case n @ Named("q", _) => n } ++
        requestedFl.map(fl => Named("fl",
          if (fl.split(",").map(_.trim).contains(marker.idCol)) fl
          else s"$fl,${marker.idCol}"))
      val in = compileCall(spark, Call("search", Seq(Pos(coll)) ++ innerArgs),
        collections)
      val keyed = in.df.withColumn("rand_key",
        md5(concat(lit(seed), col(marker.idCol).cast("string"))))
      val picked = keyed.orderBy(col("rand_key").asc).limit(rows)
        .drop("rand_key")
      val out = requestedFl match {
        case Some(fl) => picked.select(
          fl.split(",").map(_.trim).filter(_.nonEmpty).map(col).toIndexedSeq: _*)
        case None => picked
      }
      Stream(out, Nil)

    case "timeseries" | "timeSeries" =>
      // timeseries(coll, q=, field=, start=, end=, gap="+1DAY", aggs)
      // — Solr serves this as facet.range over a date field with
      // mincount=0 (every gap bucket present, empty ones zero). The
      // re-expression: the [start TO end} range joins the user q and
      // rides the chronological range pushdown; bucket index is
      // integer epoch-millis arithmetic; the zero-fill is a broadcast
      // bucket SPINE left-joining the aggregated buckets (q131's
      // facet.range idiom) — bucket count is request-bounded, data
      // volume stays in the pushed scan. Fixed-width gap units only
      // (DAY/HOUR/MINUTE/SECOND — month arithmetic is calendar-
      // dependent and Solr's own gap math there is zone-sensitive).
      val coll = c.args.headOption match {
        case Some(Pos(v)) => v
        case _ => sys.error("timeseries() needs the collection as its first argument")
      }
      val field = named(c, "field").getOrElse(sys.error("timeseries() needs field="))
      val startI = java.time.Instant.parse(
        named(c, "start").getOrElse(sys.error("timeseries() needs start=")))
      val endI = java.time.Instant.parse(
        named(c, "end").getOrElse(sys.error("timeseries() needs end=")))
      val gapMs = parseGapMillis(
        named(c, "gap").getOrElse(sys.error("timeseries() needs gap=")))
      require(endI.isAfter(startI), "timeseries() end must follow start")
      val startMs = startI.toEpochMilli
      val nBuckets = (endI.toEpochMilli - startMs + gapMs - 1) / gapMs
      require(nBuckets <= 100000, s"timeseries() bucket count $nBuckets is not request-shaped")
      // whitespace-free bound (the query-string lexer ends a range
      // bound at whitespace); no zone suffix — the session is pinned
      // UTC, so the wall-clock literal casts identically to TIMESTAMP
      // and TIMESTAMP_NTZ columns
      def fmtB(i: java.time.Instant): String =
        java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS"))
      val rangeQ = s"$field:[${fmtB(startI)} TO ${fmtB(endI)}}"
      val fullQ = named(c, "q").filter(_ != "*:*")
        .map(q => s"$rangeQ AND ($q)").getOrElse(rangeQ)
      val in = compileCall(spark,
        Call("search", Seq(Pos(coll), Named("q", fullQ))), collections)
      val aggs0 = c.args.collect {
        case Sub(Call(fn, as)) if AggFns(fn) =>
          (fn, as.collectFirst { case Pos(v) => v }.getOrElse("*"))
        case Pos(AggRe(fn, arg)) => (fn, arg)
      }
      val aggs = if (aggs0.nonEmpty) aggs0 else Seq(("count", "*"))
      // non-negative diff: long truncation == floor
      val bucket = ((unix_millis(col(field).cast("timestamp")) - lit(startMs))
        / lit(gapMs)).cast("long")
      val counted = in.df.withColumn("__b", bucket)
        .groupBy(col("__b")).agg(aggs.map(aggCol).head, aggs.map(aggCol).tail: _*)
      val spine = spark.range(nBuckets).select(col("id").as("__b"),
        expr(s"timestamp_millis(${startMs}L + id * ${gapMs}L)").as("bucket_start"))
      val joined = broadcast(spine).join(counted, Seq("__b"), "left")
      // only counts zero-fill (Solr's contract: empty buckets count 0,
      // value stats stay absent)
      val zeroFilled =
        if (aggs.exists(_._1 == "count"))
          joined.withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        else joined
      Stream(zeroFilled.drop("__b").orderBy(col("bucket_start").asc),
        Seq(("bucket_start", true)))

    case "select" =>
      val in = one(spark, c, collections)
      val projs = c.args.collect { case Pos(v) => v }
      require(projs.nonEmpty, "select() needs projections")
      val cols = projs.map {
        case AnalyzeRe(f, a) => analyzeCol(f).as(a)
        case ArithRe(fn, a, b, alias) =>
          val (l, r) = (operand(a), operand(b))
          (fn match {
            case "add" => l + r
            case "sub" => l - r
            case "mult" => l * r
            case "div" => l / r
          }).as(alias)
        case p =>
          p.split("(?i)\\s+as\\s+").map(_.trim) match {
            case Array(f, a) => col(f).as(a)
            case Array(f) => col(f)
            case _ => sys.error(s"bad projection '$p'")
          }
      }
      // remap the sort contract through the projection: a renamed sort
      // column follows its alias, a projected-away one drops out —
      // otherwise a downstream unique()/top() would resolve stale names
      val renames = projs.flatMap {
        case AnalyzeRe(_, _) | ArithRe(_, _, _, _) => None
        case p => p.split("(?i)\\s+as\\s+").map(_.trim) match {
          case Array(f, a) => Some(f -> a)
          case Array(f) => Some(f -> f)
          case _ => None
        }
      }.toMap
      val sortOut = in.sort.flatMap { case (f, desc) =>
        renames.get(f).map(_ -> desc)
      }
      Stream(in.df.select(cols.toIndexedSeq: _*), sortOut)

    case "cartesianProduct" =>
      // one output row per VALUE of a multivalued field (Solr's
      // CartesianProductStream); with the analyze() evaluator this is
      // the term-explosion idiom — one row per indexed token of a
      // stored text field. explode() is map-side (no shuffle), and the
      // stream keeps the upstream sort: products emit grouped under
      // their source tuple, exactly Solr's contract.
      val in = one(spark, c, collections)
      val fieldArgs = c.args.collect { case Pos(v) => v }
      require(fieldArgs.nonEmpty,
        "cartesianProduct() needs a field or analyze() evaluator argument")
      val (arr, outName) = fieldArgs.head match {
        case AnalyzeRe(f, a) => (analyzeCol(f), a)
        case f => (col(f), f)
      }
      Stream(in.df.withColumn(outName, explode(arr)), in.sort)

    case "stats" =>
      // rollup without grouping: one global aggregate row over the
      // collection under q= (partial-aggregates map-side)
      val coll = c.args.headOption match {
        case Some(Pos(v)) => v
        case _ => sys.error("stats() needs the collection as its first argument")
      }
      val inner = Call("search", Seq(Pos(coll)) ++
        c.args.collect { case n @ Named("q" | "fl", _) => n })
      val in = compileCall(spark, inner, collections)
      val aggs = c.args.collect {
        case Sub(Call(fn, as)) if AggFns(fn) =>
          (fn, as.collectFirst { case Pos(v) => v }.getOrElse("*"))
        case Pos(AggRe(fn, arg)) => (fn, arg)
      }
      require(aggs.nonEmpty, "stats() needs at least one aggregate")
      val cols = aggs.map(aggCol)
      Stream(in.df.agg(cols.head, cols.tail: _*), Nil)

    case "having" =>
      val boolFns = Set("gt", "lt", "eq", "noteq", "gteq", "lteq", "and", "or", "not")
      val streams = subs(c).filterNot(s => boolFns(s.name))
      require(streams.length == 1, "having() needs exactly one stream argument")
      val conds = subs(c).filter(s => boolFns(s.name))
      require(conds.length == 1, "having() needs exactly one boolean operator")
      val in = compileCall(spark, streams.head, collections)
      Stream(in.df.filter(compileBool(conds.head)), in.sort)

    case "sort" =>
      val by = named(c, "by").getOrElse(sys.error("sort() needs by="))
      val in = one(spark, c, collections)
      val spec = parseSort(by)
      Stream(in.df.orderBy(sortCols(spec): _*), spec)

    case "merge" =>
      val on = named(c, "on").getOrElse(sys.error("merge() needs on="))
      val ss = subs(c)
      require(ss.length >= 2, "merge() needs at least two stream arguments")
      val compiled = ss.map(compileCall(spark, _, collections))
      // the merged stream's order is a LOGICAL contract (consumed by
      // unique()'s window); rows are not physically interleaved
      Stream(compiled.map(_.df).reduce(_ unionByName _), parseSort(on))

    case "intersect" | "complement" =>
      val on = named(c, "on").getOrElse(sys.error(s"${c.name}() needs on="))
      val ss = subs(c)
      require(ss.length == 2, s"${c.name}() needs exactly two stream arguments")
      val l = compileCall(spark, ss(0), collections)
      val r = compileCall(spark, ss(1), collections)
      val keys = on.split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq
      val joinType = if (c.name == "intersect") "left_semi" else "left_anti"
      Stream(l.df.join(r.df.select(keys.map(col): _*), keys, joinType), l.sort)

    case "fetch" =>
      // enrich stream tuples with fields from another collection
      // (Solr's fetch decorator): left outer join on the id field
      val coll = c.args.headOption match {
        case Some(Pos(v)) => v
        case _ => sys.error("fetch() needs the collection as its first argument")
      }
      val on = named(c, "on").getOrElse(sys.error("fetch() needs on="))
      val fl = named(c, "fl").getOrElse(sys.error("fetch() needs fl="))
      val in = one(spark, c, collections)
      val side = compileCall(spark,
        Call("search", Seq(Pos(coll),
          Named("fl", s"$on,$fl"))), collections)
      Stream(in.df.join(side.df, Seq(on), "left"), in.sort)

    case "significantTerms" =>
      // significantTerms(coll, q="f:v", field=..., minDocFreq=, limit=)
      // — foreground-vs-background lift from two postings-only facet
      // scatter-gathers (q104's milli-ratio scoring; vocabulary-sized
      // movement, stored docs never read)
      val coll = c.args.headOption match {
        case Some(Pos(v)) => v
        case _ => sys.error("significantTerms() needs the collection first")
      }
      val store = collections.getOrElse(coll, sys.error(s"unknown collection '$coll'"))
      val field = named(c, "field").getOrElse(sys.error("significantTerms() needs field="))
      val q = named(c, "q").getOrElse(sys.error("significantTerms() needs q="))
      val fq = q.split(":", 2) match {
        case Array(f, v) => (f.trim, v.trim)
        case _ => sys.error(s"significantTerms() q= must be a field:value term, got '$q'")
      }
      Stream(graft.index.SegmentSearch.significantTerms(spark, store, field, fq,
        minDocFreq = named(c, "minDocFreq").map(_.toLong).getOrElse(1L),
        limit = named(c, "limit").map(_.toInt).getOrElse(10)), Nil)

    case "nodes" | "gatherNodes" =>
      // nodes(coll, <stream>, walk="streamField->collField",
      // gather="field") — one breadth-first expansion step: the
      // upstream node set (bounded by Solr's gather-into-memory
      // contract → broadcast) semi-drives a scan of the collection,
      // gathered values dedup into (node, level, ancestors). Deeper
      // walks nest nodes() calls, level counts the nesting.
      val coll = c.args.headOption match {
        case Some(Pos(v)) => v
        case _ => sys.error("nodes() needs the collection as its first argument")
      }
      val store = collections.getOrElse(coll, sys.error(s"unknown collection '$coll'"))
      val walk = named(c, "walk").getOrElse(sys.error("nodes() needs walk="))
      val gatherF = named(c, "gather").getOrElse(sys.error("nodes() needs gather="))
      val (from, to) = walk.split("->") match {
        case Array(a, b) => (a.trim, b.trim)
        case _ => sys.error(s"bad walk= '$walk' (want streamField->collField)")
      }
      val in = one(spark, c, collections)
      // absolute walk depth, statically from the parse tree (Solr
      // reports the hop level; nesting nodes() adds one per layer)
      def depth(call: Call): Int = 1 + subs(call)
        .filter(s => s.name == "nodes" || s.name == "gatherNodes")
        .map(depth).foldLeft(0)(math.max)
      val seeds = in.df.select(col(from).as("__seed")).distinct()
      val idx = spark.read.format("graft-index").load(store)
      Stream(idx.join(broadcast(seeds), idx(to) === col("__seed"))
        .groupBy(col(gatherF).as("node"))
        .agg(count(lit(1)).as("ancestors"))
        .withColumn("level", lit(depth(c).toLong)), Nil)

    case "shortestPath" =>
      // shortestPath(coll, from="a", to="b", edge="srcField=dstField",
      // maxDepth="4") — Solr's ShortestPathStream: every minimum-
      // length path between two nodes over the collection's edge
      // tuples, breadth-first, depth-bounded. Compiles onto
      // GraphOps.shortestPaths (meet-in-the-middle by default);
      // threads=/partitionSize= are Solr executor knobs, accepted and
      // ignored (Spark owns task parallelism).
      val coll = c.args.headOption match {
        case Some(Pos(v)) => v
        case _ => sys.error("shortestPath() needs the collection as its first argument")
      }
      val store = collections.getOrElse(coll, sys.error(s"unknown collection '$coll'"))
      val from = named(c, "from").getOrElse(sys.error("shortestPath() needs from="))
      val to = named(c, "to").getOrElse(sys.error("shortestPath() needs to="))
      val edge = named(c, "edge").getOrElse(sys.error("shortestPath() needs edge="))
      val (srcF, dstF) = edge.split("=") match {
        case Array(a, b) => (a.trim, b.trim)
        case _ => sys.error(s"bad edge= '$edge' (want srcField=dstField)")
      }
      val maxDepth = named(c, "maxDepth").map(_.toInt).getOrElse(4)
      val idx = spark.read.format("graft-index").load(store)
        .select(col(srcF), col(dstF)) // projection prunes to the edge pair
      Stream(graft.ops.GraphOps.shortestPaths(
        idx, col(srcF), col(dstF), from, to, maxDepth), Nil)

    case other => sys.error(s"unsupported streaming expression '$other'")
  }

  private val AggFns = Set("sum", "min", "max", "avg", "count")

  /** Solr gap syntax, fixed-width units: `+N(DAY|HOUR|MINUTE|SECOND)S?`. */
  private val GapRe = """\+(\d+)(DAY|HOUR|MINUTE|SECOND)S?""".r
  private def parseGapMillis(gap: String): Long = gap match {
    case GapRe(n, unit) =>
      val u = unit match {
        case "DAY" => 86400000L
        case "HOUR" => 3600000L
        case "MINUTE" => 60000L
        case "SECOND" => 1000L
      }
      val g = n.toLong * u
      require(g > 0, s"zero gap: $gap")
      g
    case _ => sys.error(s"unsupported timeseries gap '$gap' (+N DAY/HOUR/MINUTE/SECOND)")
  }

  private val aggCol: ((String, String)) => Column = {
    case ("count", _) => count(lit(1)).as("cnt")
    case ("sum", f) => sum(col(f)).as(s"sum_$f")
    case ("min", f) => min(col(f)).as(s"min_$f")
    case ("max", f) => max(col(f)).as(s"max_$f")
    case ("avg", f) => avg(col(f)).as(s"avg_$f")
    case (fn, _) => sys.error(s"unsupported aggregate $fn")
  }

  /** Solr having() boolean operators: leaf comparisons take (field,
    * literal) — numeric when the literal parses, string otherwise. */
  private def compileBool(c: Call): Column = {
    def operand(i: Int): String = c.args(i) match {
      case Pos(v) => v
      case Named(k, v) => s"$k=$v"
      case Sub(_) => sys.error(s"${c.name}() operand $i must be a value")
    }
    def litVal(s: String): Column =
      s.toLongOption.map(lit(_))
        .orElse(s.toDoubleOption.map(lit(_)))
        .getOrElse(lit(s))
    c.name match {
      case "and" => subs(c).map(compileBool).reduce(_ && _)
      case "or" => subs(c).map(compileBool).reduce(_ || _)
      case "not" => !compileBool(subs(c).head)
      case cmp =>
        require(c.args.length == 2, s"$cmp() needs (field, value)")
        val f = col(operand(0))
        val v = litVal(operand(1))
        cmp match {
          case "gt" => f > v
          case "lt" => f < v
          case "eq" => f === v
          case "noteq" => f =!= v
          case "gteq" => f >= v
          case "lteq" => f <= v
          case other => sys.error(s"unsupported having() operator $other")
        }
    }
  }

  private def one(spark: SparkSession, c: Call,
                  collections: Map[String, String]): Stream = {
    val ss = subs(c)
    require(ss.length == 1, s"${c.name}() needs exactly one stream argument")
    compileCall(spark, ss.head, collections)
  }
}
