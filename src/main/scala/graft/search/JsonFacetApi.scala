package graft.search

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Solr JSON Facet API compiler: takes the request a Solr user actually
 * writes —
 *
 * {{{
 * {"brands": {"type": "terms", "field": "p_brand", "limit": 5,
 *   "facet": {"avg_size": "avg(p_size)",
 *             "containers": {"type": "terms", "field": "p_container",
 *                            "limit": 3}}}}
 * }}}
 *
 * — and compiles it onto the graft-index DSv2 table, so every piece
 * rides the index pushdowns instead of a corpus scan (the reference's
 * Solr-side analog is `json.facet` on `/select`,
 * MapReduceIndexerTool's query end state):
 *
 *  - the parent `terms` facet + stat leaves compile to
 *    `filter(q).groupBy(field).agg(...)` — the grouped count/min/max/
 *    sum/avg PUSHDOWN (per-shard bucket partials from postings; AVG
 *    over integral typed fields rewrites to pushed sum+count);
 *  - a nested `terms` sub-facet compiles to the two-field pivot
 *    pushdown, ranked per parent bucket;
 *  - `limit`/`sort` follow Solr semantics: `count desc` default with
 *    index-order (bucket value) tie-break, `index asc` supported;
 *    `mincount` filters merged bucket counts;
 *  - `allBuckets:true` / `missing:true` (leaf facets only) append
 *    tagged one-row global aggregates outside the bucket list, per
 *    Solr — the output gains a `bucket_type` column when requested.
 *
 * The result is the FLATTENED bucket tree (Solr returns nested JSON;
 * a DataFrame wants rows): parent bucket + its stats, repeated per
 * child bucket row when a sub-facet is present. Null buckets are
 * excluded (Solr's `missing:false` default). Exactly one top-level
 * facet per request (compose calls for more).
 *
 * Scale shape: both aggregates are vocabulary-bounded postings
 * partials; the parent top-k (≤ limit rows) broadcasts onto the
 * ranked child frame. Stored docs are read only if a stat touches a
 * field the pushdown refuses (e.g. sum over a double field — Spark
 * keeps order-sensitive float sums, correctly, engine-side).
 */
object JsonFacetApi {

  private final case class TermsSpec(name: String, field: String, limit: Int,
                                     sortIndex: Boolean, mincount: Long,
                                     allBuckets: Boolean, missing: Boolean,
                                     stats: Seq[(String, String, String)], // (out, fn, field)
                                     child: Option[TermsSpec])

  private def parseStats(facet: JsonNode): Seq[(String, String, String)] = {
    val statRe = """(count|sum|avg|min|max)\((\*|[A-Za-z0-9_.]+)\)""".r
    val out = Seq.newBuilder[(String, String, String)]
    facet.properties().forEach { e =>
      if (e.getValue.isTextual) {
        e.getValue.asText.trim match {
          case statRe(fn, f) => out += ((e.getKey, fn, f))
          case other => throw new IllegalArgumentException(
            s"unsupported stat '${other}' for facet '${e.getKey}'")
        }
      }
    }
    out.result()
  }

  private def parseTerms(name: String, n: JsonNode): TermsSpec = {
    require(n.isObject, s"facet '$name' must be an object")
    val tpe = Option(n.get("type")).map(_.asText).getOrElse("terms")
    require(tpe == "terms", s"facet '$name': only type=terms supported, got '$tpe'")
    val field = Option(n.get("field")).map(_.asText).getOrElse(
      throw new IllegalArgumentException(s"facet '$name' missing field"))
    val limit = Option(n.get("limit")).map(_.asInt).getOrElse(10)
    require(limit > 0, s"facet '$name': limit must be positive")
    val sortIndex = Option(n.get("sort")).map(_.asText.trim) match {
      case None | Some("count desc") | Some("count") => false
      case Some("index asc") | Some("index") => true
      case Some(other) => throw new IllegalArgumentException(
        s"facet '$name': unsupported sort '$other' (count desc | index asc)")
    }
    val mincount = Option(n.get("mincount")).map(_.asLong).getOrElse(1L)
    val allBuckets = Option(n.get("allBuckets")).exists(_.asBoolean)
    val missing = Option(n.get("missing")).exists(_.asBoolean)
    val sub = Option(n.get("facet"))
    val stats = sub.map(parseStats).getOrElse(Nil)
    val children = sub.toSeq.flatMap { f =>
      val b = Seq.newBuilder[TermsSpec]
      f.properties().forEach { e =>
        if (e.getValue.isObject) b += parseTerms(e.getKey, e.getValue)
      }
      b.result()
    }
    require(children.length <= 1,
      s"facet '$name': at most one nested terms sub-facet supported")
    children.headOption.foreach { c =>
      require(c.child.isEmpty, s"facet '$name': nesting deeper than 2 not supported")
      require(c.stats.isEmpty, s"facet '${c.name}': stats on the nested level not supported")
    }
    require(!(allBuckets || missing) || children.isEmpty,
      s"facet '$name': allBuckets/missing not supported with a nested sub-facet " +
        "(the flattened row shape would be ambiguous)")
    TermsSpec(name, field, limit, sortIndex, mincount, allBuckets, missing,
      stats, children.headOption)
  }

  private def statCol(fn: String, f: String, out: String): Column = fn match {
    case "count" if f == "*" => count(lit(1)).cast("long").as(out)
    case "count" => count(col(f)).as(out)
    case "sum" => sum(col(f)).as(out)
    case "avg" => avg(col(f)).as(out)
    case "min" => min(col(f)).as(out)
    case "max" => max(col(f)).as(out)
  }

  /** Compile and run `request` against the store's index table under
    * query-string `q` (the JSON Facet API's enclosing query). */
  def jsonFacet(spark: SparkSession, store: String, request: String,
                q: String = "*:*"): DataFrame = {
    val root = new ObjectMapper().readTree(request)
    require(root != null && root.isObject && root.size() == 1,
      "request must be a JSON object with exactly one top-level facet")
    val entry = root.properties().iterator().next()
    val spec = parseTerms(entry.getKey, entry.getValue)

    val marker = graft.index.SegmentShardSink.readMarker(
      graft.index.ShardIndex.hadoopConf(spark), store)
    val idx = spark.read.format("graft-index").load(store)
    val default = marker.analyzed.toSeq.sorted.headOption.getOrElse(marker.idCol)
    val base = idx.filter(
      SolrQueryString.compile(q, idx.schema, default, marker.analyzed))

    val aggCols = count(lit(1)).as("cnt") +:
      spec.stats.map { case (out, fn, f) => statCol(fn, f, out) }
    val parent = base.filter(col(spec.field).isNotNull)
      .groupBy(col(spec.field))
      .agg(aggCols.head, aggCols.tail: _*)
      .filter(col("cnt") >= spec.mincount)
    val parentSort =
      if (spec.sortIndex) Seq(col(spec.field).asc)
      else Seq(col("cnt").desc, col(spec.field).asc)
    val parentTop = parent.orderBy(parentSort: _*).limit(spec.limit)

    spec.child match {
      case None if spec.allBuckets || spec.missing =>
        // Solr returns allBuckets/missing OUTSIDE the bucket list
        // (exempt from mincount/limit/sort); the flattened frame keeps
        // them as extra rows tagged by a bucket_type column — the
        // schema gains that column only when one of the flags is on.
        // Both are one-row GLOBAL aggregates over the same filtered
        // domain (allBuckets = every doc; missing = the null bucket,
        // count 0 row served even when no doc misses the field, as
        // Solr does) — driver-sized frames, no extra corpus pass
        // beyond one aggregation each.
        val dt = idx.schema(spec.field).dataType
        def tagged(tag: String, src: DataFrame) = src.select(
          lit(tag).as("bucket_type") +: lit(null).cast(dt).as(spec.field) +:
            col("cnt") +: spec.stats.map(s => col(s._1)): _*)
        val termRows = parentTop.select(
          lit("term").as("bucket_type") +: col(spec.field) +:
            col("cnt") +: spec.stats.map(s => col(s._1)): _*)
        val extras =
          (if (spec.allBuckets)
            Seq(tagged("allBuckets",
              base.agg(aggCols.head, aggCols.tail: _*))) else Nil) ++
          (if (spec.missing)
            Seq(tagged("missing",
              base.filter(col(spec.field).isNull)
                .agg(aggCols.head, aggCols.tail: _*))) else Nil)
        extras.foldLeft(termRows)(_ unionByName _)
      case None => parentTop
      case Some(c) =>
        val childCnt = s"${c.name}_cnt"
        val child = base
          .filter(col(spec.field).isNotNull && col(c.field).isNotNull)
          .groupBy(col(spec.field), col(c.field))
          .agg(count(lit(1)).as(childCnt))
          .filter(col(childCnt) >= c.mincount)
        val childSort =
          if (c.sortIndex) Window.partitionBy(col(spec.field)).orderBy(col(c.field).asc)
          else Window.partitionBy(col(spec.field))
            .orderBy(col(childCnt).desc, col(c.field).asc)
        val ranked = child
          .withColumn("__rk", row_number().over(childSort))
          .filter(col("__rk") <= c.limit).drop("__rk")
        // ≤ limit parent buckets broadcast onto the ranked child frame
        ranked.join(broadcast(parentTop), Seq(spec.field))
          .select(col(spec.field) +: col("cnt") +:
            (spec.stats.map(s => col(s._1)) ++ Seq(col(c.field), col(childCnt))): _*)
    }
  }
}
