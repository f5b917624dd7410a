package graft.functions

import graft.route.GraftColumns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge.AbstractDataType
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graft_term_match(text, term)`: true iff the index-time analyzer's
 * token stream of `text` contains `term` — the SQL-surface form of
 * Solr's `text:spark` on an analyzed field, with EXACTLY the
 * tokenization the segment writer used
 * ([[graft.index.SegmentIndex.analyze]]: lowercase alphanumeric
 * runs), so a DataFrame filter and an index posting lookup agree
 * row-for-row. [[graft.index.TermFilterPushdown]] routes this
 * predicate over a graft-index relation into a posting lookup
 * (`termFilter` option) and keeps it residual; on any other relation
 * it is just a fast codegen'd token-containment scan.
 *
 * Semantics are literal token membership: a `term` that is not itself
 * a single lowercase alphanumeric token (an uppercase form, a phrase)
 * matches nothing — identical on the residual path (no token equals
 * it) and the pushed path (no dictionary entry equals it).
 */
case class TermMatch(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any, t: Any): Any =
    TermMatch.compute(v.asInstanceOf[UTF8String], t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, t) =>
      s"${ev.value} = graft.functions.TermMatch.compute($v, $t);\n")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_term_match"
}

object TermMatch {
  /** Shared kernel for eval + codegen: delegates to THE index-time
    * analyzer's streaming membership form
    * (`SegmentIndex.analyzeContains` — same lowercase fold and token
    * alphabet as `SegmentIndex.analyze`, early-exit, no per-token
    * allocation: the residual filter runs this per scanned row even
    * when the pushdown fired) so pushed and residual evaluation can
    * never drift — including on the exotic case-fold characters where
    * a hand-rolled char fold would diverge from String.toLowerCase.
    * `analyzeContains(v, t) == analyze(v).contains(t)` is fuzz-locked
    * in TermMatchSpec. */
  def compute(value: UTF8String, term: UTF8String): Boolean =
    graft.index.SegmentIndex.analyzeContains(value.toString, term.toString)

  def graft_term_match(text: Column, term: Column): Column =
    GraftColumns.of(TermMatch(GraftColumns.expr(text), GraftColumns.expr(term)))
}
