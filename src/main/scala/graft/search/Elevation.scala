package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Solr's QueryElevationComponent (`elevate.xml`): editorially pinned
 * results for known query texts — the configured doc ids surface
 * FIRST in their configured order regardless of organic score, and
 * `exclude` ids vanish from the result entirely. Solr marks pinned
 * hits with the `[elevated]` transformer; `forceElevation` covers the
 * case where the pinned doc doesn't even match the query (default
 * here: elevate only within the match set, Solr's default too).
 *
 * Spark-first shape: the elevation list for one query text is tiny
 * and literal, so both the pin position and the exclusion compile to
 * `array_position(lit(ids), id)` — per-row codegen'd scalar math, no
 * join, no shuffle beyond the ranking's own TakeOrdered. A corpus-
 * scale elevation TABLE (many query texts) would broadcast-join on
 * the query key instead; this entry point is the per-request form.
 */
object Elevation {

  /** One query text's elevation config. */
  final case class Config(elevated: Seq[String], excluded: Seq[String] = Nil)

  /**
   * Apply elevation to organically `scored` hits. Returns the frame
   * reordered so elevated ids lead (in config order, `elevated` flag
   * true), organic order follows; excluded ids are dropped. The
   * caller cuts top-k AFTER elevation, as Solr does.
   *
   * Sort key: (pinned first, pin position, then `organic` descending,
   * then `idCol`) — `organic` must already be deterministic
   * (integer/rounded score discipline).
   */
  def apply(scored: DataFrame, idCol: Column, organic: Column,
            config: Config): DataFrame = {
    val idStr = idCol.cast("string")
    val pinPos =
      if (config.elevated.isEmpty) lit(0L)
      else array_position(
        lit(config.elevated.toArray), idStr)
    val kept =
      if (config.excluded.isEmpty) scored
      else scored.filter(!idStr.isin(config.excluded: _*))
    kept
      .withColumn("elevated", pinPos > 0)
      .withColumn("__pin", when(pinPos > 0, pinPos).otherwise(lit(Long.MaxValue)))
      .orderBy(col("__pin").asc, organic.desc, idCol.asc)
      .drop("__pin")
  }
}
