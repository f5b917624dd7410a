package graft

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Session extensions — registered via
 * `.config("spark.sql.extensions", "graft.GraftExtensions")` (all of
 * [[GraftSession]], [[Bench]], [[Verify]] and the test session do).
 *
 * Currently one rule: [[graft.index.TermFilterPushdown]], which routes
 * `array_contains(multivaluedField, lit)` filters over graft-index
 * relations into posting-list lookups. Every rule here is a pure
 * optimization — plans produced without the extension return the same
 * rows (the rules only re-route work into the index), so a foreign
 * session reading the same stores stays correct.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.index.TermFilterPushdown)
    // graft_term_match(text, term) — analyzed-term membership under
    // the index-time analyzer, SQL-callable (the DataFrame form is
    // graft.functions.TermMatch.graft_term_match, registry-free)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_term_match"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.TermMatch].getName, "graft_term_match"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "graft_term_match(text, term) takes exactly 2 arguments")
        graft.functions.TermMatch(children.head, children(1))
      }))
  }
}
