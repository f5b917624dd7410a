package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Learning-to-rank reranking — the Solr LTR plugin surface
 * (`rq={!ltr model=m reRankDocs=N}`): a first-pass retrieval produces
 * candidates, feature extractors evaluate per candidate, and a model
 * re-scores the top-N. Features here are named Column expressions
 * (the FieldValueFeature / FieldLengthFeature / SolrFeature analogs —
 * anything the engine can express per row, including the first-pass
 * score itself as `originalScore`), and the model is a linear
 * weight vector — Solr's LinearModel. Tree ensembles would slot in as
 * one more [[LtrModel]] implementation scoring from the same feature
 * frame.
 *
 * Determinism: the score folds weight*feature products in DECLARED
 * weight order — one fixed-order double chain per row, no cross-row
 * accumulation — so scores are bit-stable and q153 hash-matches its
 * oracle. Reranking is TakeOrdered over reRankDocs candidates, never
 * a global sort of the corpus.
 */
object Ltr {

  /** A named per-candidate feature (Solr feature-store entry). */
  final case class Feature(name: String, column: Column)

  sealed trait LtrModel { def score(): Column }

  /** Solr LinearModel: score = Σ w_i · feature_i, folded in weight
    * order (fixed evaluation order — bit-stable doubles). */
  final case class LinearModel(weights: Seq[(String, Double)]) extends LtrModel {
    require(weights.nonEmpty, "a linear model needs at least one weight")
    def score(): Column =
      weights.map { case (n, w) => lit(w) * col(n) }.reduce(_ + _)
  }

  /** Materialize the feature columns onto the candidate frame (Solr's
    * fv=true feature vector — returned, not hidden). */
  def featureFrame(candidates: DataFrame, features: Seq[Feature]): DataFrame =
    features.foldLeft(candidates)((d, f) => d.withColumn(f.name, f.column))

  /**
   * Rerank `candidates` (the first-pass top-reRankDocs) by the model
   * over the extracted features: emits the feature vector plus
   * `ltr_score_r` (rounded per the engine's float-parity discipline),
   * top-`topK` by (score desc, tieBreak asc).
   */
  def rerank(candidates: DataFrame, features: Seq[Feature], model: LtrModel,
             topK: Int, tieBreak: Column): DataFrame = {
    require(topK > 0)
    featureFrame(candidates, features)
      .withColumn("ltr_score_r", round(model.score(), 6))
      .orderBy(col("ltr_score_r").desc, tieBreak.asc)
      .limit(topK)
  }
}
