package graft.ops

import org.apache.spark.sql.SparkSession

/**
 * Tombstone-set OBSERVABILITY for the ANN stores (HNSW / IVF / IVF-PQ
 * / binary): every tier's delete path is O(batch) tombstones with
 * deferred reclaim, and every QUERY pays for the live tombstone set —
 * the HNSW scatter collects it to a broadcast hash set, the IVF read
 * paths anti-join it under the broadcast small-side contract. Both
 * contracts silently degrade if deletes keep landing without a
 * `purgeDeletes`: the set grows past broadcast-comfortable, per-query
 * overhead climbs, and nothing says why. This is the counter-force's
 * dashboard light (the segment store's tiered-merge precedent applied
 * to deletes): when a query path sees a tombstone set over the
 * threshold it logs ONE actionable warning naming the store and the
 * reclaim call, and records it for harness inspection.
 *
 * Threshold: `spark.graft.ann.tombstoneWarnThreshold` (rows; default
 * 100000 — far below broadcast danger, early enough that the nudge
 * lands while purge is still cheap). The check itself is driver-side
 * integer comparison — the count is already in hand on every path
 * that calls it.
 */
object AnnTombstones {

  val ThresholdConf = "spark.graft.ann.tombstoneWarnThreshold"
  val DefaultThreshold = 100000L

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Last warning emitted in this JVM (None after [[reset]]) — the
    * spec/harness observation point; production reads the log line. */
  private val last =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](None)

  def lastWarning: Option[String] = last.get()

  def reset(): Unit = last.set(None)

  /** Bad-conf complaint fires once per JVM — the observability nudge
    * must never become a per-query log storm, let alone (the round-15
    * defect) a hard query failure from a bare `.toLong` throwing
    * NumberFormatException inside every serving path. */
  private val badConfWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def threshold(spark: SparkSession): Long =
    spark.conf.getOption(ThresholdConf) match {
      case None => DefaultThreshold
      case Some(v) => scala.util.Try(v.trim.toLong).getOrElse {
        if (badConfWarned.compareAndSet(false, true))
          log.warn(s"unparsable $ThresholdConf='$v' — " +
            s"falling back to the default $DefaultThreshold")
        DefaultThreshold
      }
    }

  private def countPath(store: String) = s"$store/_tombcount"

  /** MARKER-CACHED tombstone row count — maintained at DELETE/PURGE
    * commit time so the per-query [[check]] reads one small file
    * instead of running a `count()` Spark job on the serving hot path.
    * [[recordRemoval]] SETS the live count (the delete path recounts
    * its tiny coalesced `deletes/` dir after the append — one O(batch)
    * job at delete time, which also self-heals a pre-cache store's
    * first post-upgrade delete) under the crash-safe swap protocol;
    * [[clearCount]] runs wherever the tombstone dir itself clears. A
    * store whose deletes predate the cache (no count file yet) falls
    * back to the one-off `count()`. */
  def recordRemoval(spark: SparkSession, store: String, rows: Long): Unit =
    graft.util.FsIo.writeSwapped(spark.sparkContext.hadoopConfiguration,
      countPath(store), rows.toString)

  def clearCount(spark: SparkSession, store: String): Unit =
    graft.util.FsIo.deleteSwapped(
      spark.sparkContext.hadoopConfiguration, countPath(store))

  def cachedCount(spark: SparkSession, store: String): Option[Long] =
    graft.util.FsIo.readSwapped(
        spark.sparkContext.hadoopConfiguration, countPath(store))
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)

  /** The count [[check]] should run with: the marker cache when the
    * store maintains one, else the caller's fallback (a one-off
    * `count()` for stores whose deletes predate the cache). */
  def countOf(spark: SparkSession, store: String)(fallback: => Long): Long =
    cachedCount(spark, store).getOrElse(fallback)

  /** Warn-and-record when `count` live tombstones on `store` (tier =
    * "hnsw" / "ivf" / ...) exceed the configured threshold. Returns
    * the warning if one fired — the query proceeds either way; the
    * bound is a nudge, not a gate. */
  def check(spark: SparkSession, tier: String, store: String,
            count: Long): Option[String] = {
    val t = threshold(spark)
    if (count <= t) None
    else {
      val msg = s"ANN $tier store $store carries $count live tombstones " +
        s"(> $t): per-query tombstone overhead is growing unbounded — " +
        "run purgeDeletes to reclaim"
      log.warn(msg)
      last.set(Some(msg))
      Some(msg)
    }
  }
}
