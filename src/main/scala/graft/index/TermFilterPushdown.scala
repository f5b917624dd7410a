package graft.index

import org.apache.spark.sql.catalyst.expressions.{And, ArrayContains, ArrayExists, AttributeReference, Expression, LambdaFunction, Literal, NamedLambdaVariable, Or}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * SQL-surface pushdown for multivalued term filters (the Solr
 * `fq=tags:x` shape, the single most common index query): under
 * `.option("multivalued", "array")` surfacing, `array_contains(f, 'x')`
 * on a multivalued stored field is EXACTLY a posting-list lookup —
 * postings index every stored occurrence, and `array_contains` asks
 * "any occurrence equals x". Spark's DSv2 filter translation
 * (V2ExpressionBuilder) never surfaces ArrayContains to
 * `pushFilters`, so without this rule a tag filter pays a full
 * stored-row scan.
 *
 * Mechanics: this is an injected operator-optimization rule (runs in
 * the fixed-point operator batches, BEFORE V2ScanRelationPushDown's
 * "Early Filter and Projection Push-Down"). It rewrites
 * `Filter(..array_contains(f, lit).., rel)` over a graft-index
 * relation by adding a `termFilter` read option; the scan builder ANDs
 * those terms into its pushed query ([[IndexScanBuilder]]), and the
 * Filter node itself is KEPT — residual re-evaluation over the
 * surfaced arrays is exact and cheap, so correctness never depends on
 * the rule firing (sessions without [[graft.GraftExtensions]] get the
 * same rows from the unpushed plan).
 *
 * Eligible `array_contains` fields are multivalued AND not analyzed
 * ([[IndexTable.termPushableArrays]]): analyzed postings hold TOKENS
 * while the surfaced array holds VERBATIM values, so a pushed lookup
 * there would silently drop rows. The token-side forms —
 * `graft_term_match(f, 'x')` on analyzed scalars and
 * `exists(f, t -> graft_term_match(t, 'x'))` on analyzed multivalued
 * fields — push as token posting lookups instead.
 *
 * Reference trace: Solr serves `fq=field:term` on multiValued fields
 * from the same inverted postings; the reference's own query surface
 * (README examples) leans on exactly this shape.
 */
object TermFilterPushdown extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: DataSourceV2Relation)
        if rel.table.isInstanceOf[IndexTable] &&
          rel.options.get("termfilter") == null =>
      val tbl = rel.table.asInstanceOf[IndexTable]
      // array_contains needs the array surfacing to even type-check;
      // graft_term_match works on the scalar surface in either mode
      val arrays =
        if ("array".equalsIgnoreCase(rel.options.get("multivalued")))
          tbl.termPushableArrays
        else Set.empty[String]
      val analyzed = tbl.termPushableAnalyzed
      val analyzedArrays =
        if ("array".equalsIgnoreCase(rel.options.get("multivalued")))
          tbl.termPushableAnalyzedArrays
        else Set.empty[String]
      // pushable ARRAY leaf: verbatim posting lookup on a multivalued
      // stored field — safe under negation too (every stored value has
      // a verbatim posting, so postings-derived presence == non-null).
      def arrayLeaf(e: Expression): Option[(String, String)] = e match {
        case ArrayContains(a: AttributeReference, Literal(v, StringType))
            if v != null && arrays.contains(a.name) &&
              rel.output.exists(_.exprId == a.exprId) =>
          Some(a.name -> v.toString)
        case _ => None
      }
      // pushable ANALYZED leaf: token posting lookup.
      def analyzedLeaf(e: Expression): Option[(String, String)] = e match {
        // analyzed `field:term` (Solr fq on a text field): postings
        // hold the analyzer's tokens, and graft_term_match asks token
        // membership under THE SAME analyzer — exact agreement. Scalar
        // fields only: a multivalued analyzed field's scalar surface
        // shows the first value, but its postings index every value.
        case graft.functions.TermMatch(a: AttributeReference, Literal(v, StringType))
            if v != null && analyzed.contains(a.name) &&
              rel.output.exists(_.exprId == a.exprId) =>
          Some(a.name -> v.toString)
        // analyzed MULTIVALUED `field:term` — the tokenized-tag-set
        // shape: `exists(tags, t -> graft_term_match(t, 'x'))` asks
        // "any value's token stream contains x", and a multivalued
        // analyzed field's postings index the tokens of EVERY value
        // (SegmentIndex's 100-gap position advance) — exact agreement.
        // Requires array surfacing (the predicate doesn't type-check
        // otherwise, which the option gate above already encodes).
        case ae: ArrayExists => (ae.argument, ae.function) match {
          case (a: AttributeReference,
                LambdaFunction(graft.functions.TermMatch(
                  v: NamedLambdaVariable, Literal(t, StringType)), args, _))
              if t != null && analyzedArrays.contains(a.name) &&
                args.lengthCompare(1) == 0 &&
                (args.head match {
                  case arg: NamedLambdaVariable => arg.exprId == v.exprId
                  case _ => false
                }) &&
                rel.output.exists(_.exprId == a.exprId) =>
            Some(a.name -> t.toString)
          case _ => None
        }
        case _ => None
      }
      def leaf(e: Expression): Option[(String, String)] =
        arrayLeaf(e).orElse(analyzedLeaf(e))
      // one pushable CLAUSE: a leaf, an OR tree whose leaves all push
      // (Solr's `fq=tags:(a OR b)` — posting-list unions), or a
      // NEGATED leaf (Solr's `fq=-tags:x` — field presence minus the
      // match, MUST_NOT; agrees with the residual because a doc with
      // no field value evaluates NULL there and is excluded by both).
      // A partially-pushable OR must stay whole (dropping a branch
      // would narrow the scan below the predicate's match set).
      def orTree(e: Expression): Option[Seq[(String, String)]] = e match {
        case Or(l, r) =>
          for { a <- orTree(l); b <- orTree(r) } yield a ++ b
        case other => leaf(other).map(Seq(_))
      }
      // Negation pushes for ARRAY leaves ONLY: the pushed MUST_NOT base
      // is postings-derived field presence, and for an analyzed field a
      // non-null stored value can tokenize to ZERO tokens ("!!!") — no
      // postings, so the pushed scan would exclude a row the residual
      // `NOT graft_term_match(...)` keeps (narrowing below the match
      // set, the one failure the residual cannot repair). Verbatim
      // array postings exist for every stored value, so there the
      // presence base is exact.
      def clause(e: Expression): Option[(Boolean, Seq[(String, String)])] =
        e match {
          case org.apache.spark.sql.catalyst.expressions.Not(inner) =>
            arrayLeaf(inner).map(l => (true, Seq(l)))
          case other => orTree(other).map((false, _))
        }
      val clauses = conjuncts(cond).flatMap(c => clause(c))
      if (clauses.isEmpty) f
      else {
        // grammar: conjuncts joined by ',', OR branches inside one by
        // '|', a leading '!' negates a (single-leaf) clause;
        // URL-encoding both halves protects all the delimiters
        val enc = clauses.map { case (neg, branches) =>
          (if (neg) "!" else "") + branches.map { case (k, t) =>
            java.net.URLEncoder.encode(k, "UTF-8") + ":" +
              java.net.URLEncoder.encode(t, "UTF-8")
          }.mkString("|")
        }.mkString(",")
        val opts = new java.util.HashMap[String, String](rel.options.asCaseSensitiveMap())
        opts.put("termFilter", enc)
        f.copy(child = rel.copy(options = new CaseInsensitiveStringMap(opts)))
      }
  }
}
