package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Pipeline metric counters (A6): the reference folds morphline
 * codahale metrics and reducer counters into MapReduce counters
 * (MorphlineMapper.java:95-113; SolrCounters.java:19-37;
 * RetainMostRecentUpdateConflictResolver.java:52-55). The Spark-native
 * equivalent is `Dataset.observe`: named aggregates collected on the
 * driver as a side effect of the SAME job — no second pass over the
 * data, no accumulator double-count on task retry.
 */
object Metrics {

  /** Attach docs-in/docs-with-null-key/bytes-ish counters to a plan. */
  def observeDocs(df: DataFrame, name: String, keyCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("docs"),
      count(when(col(keyCol).isNull, 1)).as("missing_key"))

  /**
   * Retrieve observed metrics after an action has run on the SAME
   * Dataset (`collect`/`foreach`/`toRdd.count` — `df.write` builds a
   * fresh QueryExecution whose metrics live in the listener bus
   * instead).
   */
  def collected(df: DataFrame, name: String): Map[String, Any] =
    df.queryExecution.observedMetrics.get(name)
      .map(row => row.schema.fieldNames.zip(row.toSeq).toMap)
      .getOrElse(Map.empty)

  /** Execute the plan (no rows to the driver) and return the observed
    * metrics — the one-pass "count while loading" the reference gets
    * from MR counters. */
  def run(df: DataFrame, name: String): Map[String, Any] = {
    df.queryExecution.toRdd.count()
    collected(df, name)
  }
}
