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

  private def threshold(spark: SparkSession): Long =
    spark.conf.getOption(ThresholdConf).map(_.toLong)
      .getOrElse(DefaultThreshold)

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
