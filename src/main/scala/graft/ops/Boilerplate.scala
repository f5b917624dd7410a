package graft.ops

import graft.util.Checkpoints.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-global boilerplate detection (RefinedWeb/CCNet-style): an
 * n-gram that appears in many DISTINCT documents is boilerplate
 * (navigation chrome, license headers, cookie banners); a document
 * made mostly of such grams is template noise and gets dropped by
 * quality filters.
 *
 * Two corpus-sized aggregations (gram → doc count; doc → gram count)
 * plus one join of the corpus grams against the (much smaller)
 * boilerplate gram set — all map-side-partial shuffles on the gram
 * key; no all-pairs, nothing collected. At 100 TB the boilerplate set
 * is the long head of a zipfian distribution — small enough to
 * broadcast; left to AQE here since the threshold decides its size.
 */
object Boilerplate {

  /**
   * Per-document boilerplate statistics: n_grams (distinct n-grams in
   * the doc), n_bp (how many of them occur in >= minDocs documents),
   * bp_frac = n_bp / n_grams.
   */
  def boilerplateStats(df: DataFrame, id: Column, tokens: Column,
                       n: Int, minDocs: Long): DataFrame = {
    // tokenize+shingle ONCE into the array-per-doc form and
    // materialize it for the query's duration (r17 optimization):
    // `gr` feeds two subplans (the boilerplate-set aggregation and
    // the per-doc join), and their stage shapes differ (exchange-on-
    // gram vs broadcast-join side), so without this the corpus
    // re-shingled once per branch. LAZY localCheckpoint, not persist,
    // so no CacheManager registration can rewrite unrelated queries'
    // plans. The pre-explode array frame is the compact thing to
    // hold; the explode from it is cheap.
    val sh = df.select(id.as("doc_id"),
      array_distinct(ApproxDedup.shingles(tokens, n)).as("__sh"))
      .cutLineage(false)
    val gr = sh.select(col("doc_id"), explode(col("__sh")).as("gram"))
    val bp = gr.groupBy(col("gram"))
      .agg(count(lit(1)).as("gram_docs"))
      .filter(col("gram_docs") >= minDocs)
      .select(col("gram"))
    // per-doc totals and boilerplate hits in ONE pass over gr: a left
    // join against the boilerplate set with a marker column, counted
    // conditionally
    gr.join(bp.withColumn("__bp", lit(1)), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("__bp")).as("n_bp"))
      .withColumn("bp_frac", col("n_bp").cast("double") / col("n_grams").cast("double"))
  }
}
