package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The (e)dismax scoring model — Solr's default end-user query parser
 * (`defType=edismax`, `qf=field^boost ...`, `mm=` minimum-should-
 * match): free-text terms are searched across several fields, each
 * term contributes the score of its BEST field (the "disjunction
 * maximum" that keeps a term matching two fields from double-
 * counting), a document must match at least `mm` of the terms, and
 * the doc score is the sum over matching terms.
 *
 * Scoring is tf-based in integer MILLI space (boost in per-mille ×
 * term frequency — the L-series bit-stable discipline; Solr's own
 * idf/norm factors ride the index and are served by the BM25 path,
 * q84/q143): exact, engine-replayable, DuckDB-oracle-able.
 *
 * Shape: per-row codegen only — each qf field tokenizes once, each
 * term reads its tf from the token array; no shuffle until the
 * caller's own sort/cut. The whole matcher fuses into the scan.
 */
object Edismax {

  /** Add `matched_terms` and `score_milli` columns for query terms
    * over `qf` (field → per-mille boost). Terms are analyzed with
    * the engine's standard lowercase-alnum tokenizer. mm gating and
    * ranking stay with the caller (they are WHERE/ORDER BY clauses).
    *
    * `pf` (phrase fields): Solr's `pf=field^boost` — documents where
    * the WHOLE query appears as a consecutive phrase get
    * boost × phrase-tf added (the "exact phrase floats to the top"
    * behavior); counted with a positional scan over the same token
    * array, still per-row codegen.
    *
    * `bf` (boost function): an ADDITIVE function-query column in the
    * same integer milli space (compose with
    * [[graft.Graft.functionQuery]] output scaled to milli). */
  def score(df: DataFrame, q: String, qf: Seq[(String, Long)],
            pf: Seq[(String, Long)] = Nil,
            bf: Option[Column] = None,
            pf2: Seq[(String, Long)] = Nil): DataFrame = {
    val terms = q.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "edismax needs at least one query term")
    require(qf.nonEmpty, "edismax needs at least one qf field")
    val fields = (qf.map(_._1) ++ pf.map(_._1) ++ pf2.map(_._1)).distinct
    val toked = fields.foldLeft(df) { (d, f) =>
      d.withColumn(s"__tk_$f",
        expr(s"filter(split(lower(`$f`), '[^a-z0-9]+'), x -> x <> '')"))
    }
    def tf(f: String, t: String): Column =
      size(filter(col(s"__tk_$f"), x => x === lit(t))).cast("long")
    val perTerm = terms.map { t =>
      val best = qf.map { case (f, b) => lit(b) * tf(f, t) }
        .reduce((a, c) => greatest(a, c))
      (best, qf.map { case (f, _) => tf(f, t) > 0 }.reduce(_ || _))
    }
    def phraseTf(f: String, ts: Seq[String]): Column = {
      val eqs = ts.zipWithIndex
        .map { case (t, k) => s"__tk_$f[i - 1 + $k] = '$t'" }
        .mkString(" AND ")
      expr(
        s"""CASE WHEN size(__tk_$f) < ${ts.length} THEN 0L ELSE
           | size(filter(sequence(1, size(__tk_$f) - ${ts.length - 1}),
           |   i -> $eqs)) END""".stripMargin).cast("long")
    }
    // pf2: every CONSECUTIVE query-term pair as its own sub-phrase
    // (Solr's bigram phrase fields — partial phrase evidence when the
    // full pf phrase is absent)
    val pairSeqs = terms.sliding(2).filter(_.length == 2).toSeq
    val score = (perTerm.map(_._1) ++
      pf.map { case (f, b) => lit(b) * phraseTf(f, terms) } ++
      pf2.flatMap { case (f, b) =>
        pairSeqs.map(p => lit(b) * phraseTf(f, p)) } ++
      bf.toSeq).reduce(_ + _)
    val matched = perTerm.map { case (_, m) =>
      when(m, 1).otherwise(0) }.reduce(_ + _)
    toked
      .withColumn("matched_terms", matched.cast("long"))
      .withColumn("score_milli", score)
      .drop(fields.map(f => s"__tk_$f"): _*)
  }

  /** The full request: score + mm gate + (score desc, tieBreak asc)
    * top-`rows` cut — Solr's
    * `q=...&qf=...&pf=...&pf2=...&bf=...&mm=N&rows=N`. */
  def query(df: DataFrame, q: String, qf: Seq[(String, Long)], mm: Int,
            rows: Int, tieBreak: Column,
            pf: Seq[(String, Long)] = Nil,
            bf: Option[Column] = None,
            pf2: Seq[(String, Long)] = Nil): DataFrame =
    score(df, q, qf, pf, bf, pf2)
      .filter(col("matched_terms") >= mm)
      .orderBy(col("score_milli").desc, tieBreak.asc)
      .limit(rows)
}
