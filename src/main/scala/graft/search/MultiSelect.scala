package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Solr multi-select faceting: `facet.query` (arbitrary query-string
 * buckets) and tagged filter exclusion — `fq={!tag=t}...` paired with
 * `facet.field={!ex=t}f`, the checkbox-facet UI contract
 * (reference scope: the Solr request surface a user of the built
 * index runs; SimpleFacets handles both in Solr proper).
 *
 * Everything compiles through [[SolrQueryString]] onto the index
 * DataFrame, so term/range predicates and the grouped-count shapes
 * ride the DataSourceV2 pushdowns (L83/L87) when the store serves the
 * frame — counts come from postings, stored docs are never read.
 * facet.query legs are independent single-row aggregates unioned
 * together: each leg pushes its own filter+count, and the union is
 * `|queries|` rows — driver-sized by construction.
 */
object MultiSelect {

  /** One `fq`: query string plus the optional `{!tag=name}` localparam. */
  final case class TaggedFq(q: String, tag: Option[String] = None)

  private val TagPrefix = """^\{!tag=([^}]+)\}(.*)$""".r

  /** Parse the Solr `{!tag=...}` localparams prefix of an fq value. */
  def parseFq(s: String): TaggedFq = s match {
    case TagPrefix(t, rest) => TaggedFq(rest, Some(t))
    case other => TaggedFq(other, None)
  }

  /** AND of the main query and every filter whose tag is not excluded
    * (Solr: `facet.field={!ex=tags}` lifts those fqs for this facet
    * only). */
  def predicate(idx: DataFrame, defaultField: String, textFields: Set[String],
                q: String, filters: Seq[TaggedFq],
                exclude: Set[String] = Set.empty): Column =
    (q +: filters.filterNot(_.tag.exists(exclude)).map(_.q))
      .map(SolrQueryString.compile(_, idx.schema, defaultField, textFields))
      .reduce(_ && _)

  /** `facet.query`: one (facet_query, cnt) row per named bucket query,
    * evaluated under the FULL filter set (facet.query is not
    * exclusion-scoped unless tagged itself — this form applies all). */
  def facetQueries(idx: DataFrame, defaultField: String, textFields: Set[String],
                   q: String, filters: Seq[TaggedFq],
                   queries: Seq[(String, String)]): DataFrame = {
    require(queries.nonEmpty, "facet.query needs at least one bucket query")
    val base = predicate(idx, defaultField, textFields, q, filters)
    queries.map { case (name, bucket) =>
      idx.filter(base &&
          SolrQueryString.compile(bucket, idx.schema, defaultField, textFields))
        .agg(count(lit(1)).as("cnt"))
        .select(lit(name).as("facet_query"), col("cnt"))
    }.reduce(_ unionByName _)
  }

  /** Solr facet parameters: `facet.limit` (-1 = unlimited),
    * `facet.mincount`, `facet.sort` ("count" = by count desc then
    * value — Solr's default — or "index" = by value), `facet.prefix`
    * (only buckets whose value starts with it). */
  final case class FacetParams(limit: Int = -1, mincount: Int = 0,
                               sort: String = "count",
                               prefix: Option[String] = None) {
    require(sort == "count" || sort == "index", s"facet.sort=$sort")
  }

  /** `facet.field={!ex=tags}field`: grouped counts with the excluded
    * tags' filters lifted. The null bucket surfaces as a null group
    * row (the engine's facet.field convention, L83). With a `limit`,
    * ordering follows `facet.sort` and the cut is a bounded TakeOrdered
    * over the group-cardinality frame — never a corpus sort. */
  def facetFieldEx(idx: DataFrame, defaultField: String, textFields: Set[String],
                   field: String, q: String, filters: Seq[TaggedFq],
                   exclude: Set[String],
                   params: FacetParams = FacetParams()): DataFrame = {
    val matched = idx
      .filter(predicate(idx, defaultField, textFields, q, filters, exclude))
    // facet.prefix prunes BEFORE grouping — a pushable StartsWith on
    // the facet field, so the index scan reads only matching postings
    val prefixed = params.prefix match {
      case Some(p) => matched.filter(col(field).startsWith(p))
      case None => matched
    }
    val counts = prefixed.groupBy(col(field)).agg(count(lit(1)).as("cnt"))
    val thresholded =
      if (params.mincount > 0) counts.filter(col("cnt") >= params.mincount)
      else counts
    if (params.limit < 0) thresholded
    else {
      val ordered =
        if (params.sort == "count")
          thresholded.orderBy(col("cnt").desc, col(field).asc_nulls_last)
        else thresholded.orderBy(col(field).asc_nulls_last)
      ordered.limit(params.limit)
    }
  }
}
