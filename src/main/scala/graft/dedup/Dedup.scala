package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The reference's unique-key conflict resolution family
 * (UpdateConflictResolver plug-point, map-reduce/src/main/java/com/
 * riskiq/solr/hadoop/UpdateConflictResolver.java:54-69; wired in
 * SolrReducer.java:71-101). In MapReduce these run over the reducer's
 * per-key iterator; here each is a declarative transform so Catalyst
 * plans a single shuffle on the key (or none, if the input is already
 * hash-partitioned on it) with partial aggregation / spill handled by
 * Spark.
 *
 * 100 TB posture: every resolver is a window or an aggregate over the
 * key — no `collect_list` of unbounded groups on the driver, no
 * in-memory per-key buffers (the reference's SortingUpdateConflictResolver
 * admits that weakness itself: "TODO: use an external merge sort in the
 * pathological case", SortingUpdateConflictResolver.java:64).
 */
object Dedup {

  /**
   * RetainMostRecentUpdateConflictResolver (the default,
   * RetainMostRecentUpdateConflictResolver.java:40-113): per key keep
   * the single row with the max `orderBy` value; ties broken by
   * `tiebreakers` (the reference keeps the last-seen among equal
   * timestamps — pass an explicit tiebreaker to make that
   * deterministic in a parallel engine).
   */
  def retainMostRecent(df: DataFrame, key: Seq[Column], orderBy: Column,
                       tiebreakers: Column* ): DataFrame =
    retainMostRecentNulls(df, key, orderBy, nullsFirst = false, tiebreakers: _*)

  /**
   * A5 ordering control: the reference's SolrInputDocumentComparator
   * is null-FIRST (SolrInputDocumentComparator.java:39-55), i.e. a row
   * missing the order field loses to any row that has one — but when
   * ALL rows miss it, one still survives. `nullsFirst = false`
   * (default) keeps that semantic under a descending scan
   * (desc_nulls_last); `true` makes missing values win instead.
   */
  def retainMostRecentNulls(df: DataFrame, key: Seq[Column], orderBy: Column,
                            nullsFirst: Boolean, tiebreakers: Column*): DataFrame = {
    def ord(c: Column) = if (nullsFirst) c.desc_nulls_first else c.desc_nulls_last
    val w = Window.partitionBy(key: _*)
      .orderBy((ord(orderBy) +: tiebreakers.map(ord)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Dedup metrics the reference tracks as MR counters (duplicates vs
   * outdated, RetainMostRecentUpdateConflictResolver.java:52-55,103-109;
   * SolrCounters.java:19-37): rows whose key collides with an equal
   * order value are "duplicates", rows superseded by a newer one are
   * "outdated".
   */
  def retainMostRecentCounters(df: DataFrame, key: Seq[Column], orderBy: Column): DataFrame = {
    val w = Window.partitionBy(key: _*)
    // reference semantics (RetainMostRecentUpdateConflictResolver.java:
    // 76-110): scanning each key group, the FIRST max is retained;
    // every further doc comparing equal is a "duplicate", every doc
    // comparing lower is "outdated" — so an n-way tie yields n-1
    // duplicates, not n.
    // null-safe accounting so the counters reconcile with what
    // retainMostRecent actually drops: a null-orderBy row superseded
    // by a non-null max compared LOWER (the A5 null-first comparator)
    // and counts as "outdated"; an all-null key group (max itself
    // null) is an n-way tie — `<=>` keeps those rows in the
    // duplicates arithmetic where a bare `===` would lose them.
    df.withColumn("__max", max(orderBy).over(w))
      .withColumn("__nmax", count(when(orderBy <=> col("__max"), 1)).over(w))
      .agg(
        (count(when((orderBy <=> col("__max")) && col("__nmax") > 1, 1)) -
          countDistinct(when(col("__nmax") > 1, struct(key: _*)))).as("duplicates"),
        count(when(orderBy < col("__max") ||
          (orderBy.isNull && col("__max").isNotNull), 1)).as("outdated"),
        count(lit(1)).as("total"))
  }

  /**
   * SortingUpdateConflictResolver (SortingUpdateConflictResolver.java:
   * 36-75): colliding updates applied ascending by timestamp, so the
   * LAST writer wins at the sink. In a DataFrame engine the observable
   * result is "keep the row with the max timestamp" (ties: last seen →
   * tiebreaker column); the ascending ordering itself is preserved for
   * ordered sinks via sortWithinPartitions in ShardIndex.
   */
  def sortingLastWriterWins(df: DataFrame, key: Seq[Column], ts: Column,
                            tiebreakers: Column*): DataFrame =
    retainMostRecent(df, key, ts, tiebreakers: _*)

  /**
   * RejectingUpdateConflictResolver (RejectingUpdateConflictResolver
   * .java:31-46): any key with >1 row is an error. Declarative form:
   * the conflicting keys (empty result = assertion holds).
   */
  def conflicts(df: DataFrame, key: Seq[Column]): DataFrame =
    df.groupBy(key: _*).agg(count(lit(1)).as("n")).filter(col("n") > 1)

  /** Strict variant: throws like the reference resolver does. */
  def rejectOnConflict(df: DataFrame, key: Seq[Column]): DataFrame = {
    val bad = conflicts(df, key).limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"duplicate unique key: ${bad.head.toSeq.mkString(",")}")
    df
  }

  /** NoChangeUpdateConflictResolver (NoChangeUpdateConflictResolver.java:31-34). */
  def noChange(df: DataFrame): DataFrame = df

  /**
   * Skew-resistant retain-most-recent: two-phase aggregation with a
   * deterministic salt so one hot key (think: one doc id colliding a
   * million times at 100 TB) cannot pin a single reducer — phase 1
   * reduces each (key, salt) bucket to its max row map-side-ish, phase
   * 2 reduces the ≤saltBuckets survivors per key. Same result as
   * `retainMostRecent` when the ordering (orderCols, in precedence
   * order) is total per key.
   */
  def retainMostRecentSalted(df: DataFrame, keyCols: Seq[String],
                             orderCols: Seq[String],
                             saltBuckets: Int = 64): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val ord = struct(orderCols.map(col).toIndexedSeq: _*)
    val salt = pmod(hash(payload), lit(saltBuckets)).as("__salt")
    val stage1 = df
      .groupBy((keyCols.map(col) :+ salt).toIndexedSeq: _*)
      .agg(max_by(payload, ord).as("__p"), max(ord).as("__ord"))
    stage1.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(max_by(col("__p"), col("__ord")).as("__p"))
      .select(col("__p.*"))
  }

  /**
   * Exact whole-row (or chosen-column) dedup for training-data
   * pipelines: group by a content hash, keep the first by `keep`
   * ordering. One shuffle on the hash; at 100 TB the hash groupBy
   * partial-aggregates map-side so only distinct hashes shuffle.
   */
  def exactByContent(df: DataFrame, content: Column, keep: Column): DataFrame = {
    val w = Window.partitionBy(md5(content.cast("string"))).orderBy(keep.asc_nulls_last)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The distinct content-fingerprint set of a corpus (md5 of the
    * content column) — the exact half of the incremental-dedup state
    * (L117): persist it, and dedupe each new batch against it with
    * [[dropExactAgainst]] without touching corpus documents. */
  def contentFingerprints(df: DataFrame, content: Column): DataFrame =
    df.select(md5(content.cast("string")).as("fp")).distinct()

  /** Delta exact dedup: drop new docs whose content fingerprint
    * already exists in the corpus set — one anti-join on the md5 key
    * (fingerprints only move, never documents). Batch-internal
    * duplicates stay; compose with [[exactByContent]] for those. */
  def dropExactAgainst(newDocs: DataFrame, content: Column,
                       corpusFps: DataFrame): DataFrame =
    newDocs.withColumn("__fp", md5(content.cast("string")))
      .join(corpusFps.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
      .drop("__fp")

  /** One-row corpus duplication profile — the "how much dedup is left
    * to do" health metric: total docs, distinct content fingerprints,
    * docs that are exact duplicates of an earlier one, and the largest
    * clone cluster (a crawl-boilerplate smell when it is large). One
    * aggregation on the fingerprint key. */
  def duplicationProfile(df: DataFrame, content: Column): DataFrame =
    df.groupBy(md5(content.cast("string")).as("__fp"))
      .agg(count(lit(1)).as("__n"))
      .agg(
        sum(col("__n")).as("n_docs"),
        count(lit(1)).as("distinct_contents"),
        sum(col("__n") - 1).as("exact_dup_docs"),
        max(col("__n")).as("largest_clone_cluster"))

  /**
   * Dedup REMAP table — the provenance artifact the drop-side dedup
   * family ([[exactByContent]]) doesn't produce: for every document
   * that loses its exact-content cluster, `(id, kept_id,
   * cluster_size)` naming the representative that replaces it.
   * Downstream consumers use it to rewrite references (citation
   * graphs, parent/child links, eval-set provenance) instead of
   * dangling on dropped ids.
   *
   * The representative is chosen by `keepBy` ascending (put the
   * BEST doc first — e.g. `col("quality").desc` then the id for a
   * total order), so "keep the best copy" replaces [[exactByContent]]'s
   * keep-first when copies differ in quality. One window shuffle on
   * the fingerprint key; singleton clusters produce no rows.
   */
  def dedupMap(df: DataFrame, id: Column, content: Column,
               keepBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(keepBy: _*)
    df.withColumn("__fp", md5(content.cast("string")))
      .withColumn("__id", id)
      .withColumn("__rn", row_number().over(w))
      .withColumn("kept_id", first(col("__id")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("__fp"))))
      .filter(col("__rn") > 1)
      .select(col("__id").as("id"), col("kept_id"), col("cluster_size"))
  }
}
