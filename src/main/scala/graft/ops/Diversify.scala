package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * MMR — Maximal Marginal Relevance diversified re-rank (Carbonell &
 * Goldstein, SIGIR 1998): the standard diversification step a
 * retrieval stack runs ABOVE any first-stage tier when the top-k
 * must not be k near-duplicates (RAG context assembly, search result
 * pages, dedup-aware eval sets). Greedily select k of the N
 * candidates, each step maximizing
 *
 *   mmr(d) = λ·rel(q, d) − (1−λ)·max_{d' ∈ selected} sim(d, d')
 *
 * Determinism (the engine's integer discipline): rel and sim convert
 * to `floor(cos·1000 + 0.5)` FIRST, λ rides as an integer milli
 * weight, and each step's score is the exact integer
 * `λm·rel_milli − (1000−λm)·maxsim_milli` — ties break by corpus id,
 * so the greedy trajectory is bit-stable and the whole selection
 * replays in a DuckDB recursive CTE (q343). The first pick (empty
 * selected set) takes max-relevance with the same tie-break, the
 * published convention.
 *
 * Scale shape: candidates are a first-stage top-N (bounded by
 * construction, the [[LateInteraction.maxSimRerank]] contract), so
 * per query the greedy is O(k·N) over an N-row group — the work
 * DISTRIBUTES over queries via `flatMapGroups` (per-group state is
 * one bounded candidate list; no driver-side loop, no corpus scan:
 * vector fetch is a broadcast semi-join on candidate ids).
 */
object Diversify {

  /** Sequential dot — the same left-to-right double accumulation as
    * [[Similarity.dot]]'s column fold and DuckDB's list_dot_product,
    * so cosines are bit-identical across all three. */
  private def dotSeq(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def cosMilli(a: Seq[Double], na: Double, b: Seq[Double],
                       nb: Double): Long =
    math.floor(dotSeq(a, b) / (na * nb) * 1000d + 0.5d).toLong

  /**
   * Diversify `candidates` (query_id, corpus_id — any first-stage
   * tier's output) to `k` picks per query. `corpus` holds the
   * vectors (idCol, vecCol) — fetched candidate-bounded; `queries`
   * likewise. Output (query_id, rank, corpus_id, mmr_milli): rank
   * 1..k in SELECTION order (rank 1 = pure relevance, the published
   * convention; later ranks trade relevance for novelty).
   */
  def mmrTopK(candidates: DataFrame, corpus: DataFrame,
              queries: DataFrame, k: Int, lambdaMilli: Long = 500L,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(lambdaMilli >= 0L && lambdaMilli <= 1000L,
      s"lambdaMilli in [0, 1000], got $lambdaMilli")
    val spark = candidates.sparkSession
    import spark.implicits._
    val cand = candidates.select(col("query_id").cast("long"),
      col("corpus_id").cast("long"))
    // candidate-bounded vector fetch (the corpus never re-scans)
    val cvecs = corpus.select(col(idCol).cast("long").as("corpus_id"),
        col(vecCol).cast("array<double>").as("cvec"))
      .join(broadcast(cand.select("corpus_id").distinct()),
        Seq("corpus_id"), "left_semi")
    val qvecs = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("qvec"))
    val rows = cand
      .join(cvecs, Seq("corpus_id"))
      .join(broadcast(qvecs), Seq("query_id"))
      .as[(Long, Long, Seq[Double], Seq[Double])]
    val lam = lambdaMilli
    val kk = k
    rows.groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Seq[Double], Seq[Double])]) =>
        val all = it.toArray.sortBy(_._2) // deterministic group order
        if (all.isEmpty) Iterator.empty
        else {
          val qv = all.head._4
          val qn = math.sqrt(dotSeq(qv, qv))
          val ids = all.map(_._2)
          val vecs = all.map(_._3)
          val norms = vecs.map(v => math.sqrt(dotSeq(v, v)))
          val rel = Array.tabulate(ids.length)(i =>
            cosMilli(qv, qn, vecs(i), norms(i)))
          val picked = Array.fill(ids.length)(false)
          val out = Vector.newBuilder[(Long, Int, Long, Long)]
          val maxSimToPicked = Array.fill(ids.length)(Long.MinValue)
          var step = 1
          while (step <= math.min(kk, ids.length)) {
            var best = -1
            var bestScore = Long.MinValue
            var i = 0
            while (i < ids.length) {
              if (!picked(i)) {
                // empty selected set ⇒ novelty term 0 (the published
                // convention): the first pick is pure-relevance order
                val nov = if (step == 1) 0L
                  else (1000L - lam) * maxSimToPicked(i)
                val score = lam * rel(i) - nov
                // ties break by corpus id ASC (ids sorted, first wins)
                if (score > bestScore) { bestScore = score; best = i }
              }
              i += 1
            }
            out += ((qid, step, ids(best), bestScore))
            picked(best) = true
            // fold the new pick into every survivor's max-sim
            var j = 0
            while (j < ids.length) {
              if (!picked(j)) {
                val s = cosMilli(vecs(best), norms(best), vecs(j), norms(j))
                if (s > maxSimToPicked(j)) maxSimToPicked(j) = s
              }
              j += 1
            }
            step += 1
          }
          out.result().iterator
        }
      }
      .toDF("query_id", "rank", "corpus_id", "mmr_milli")
  }
}
