package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Skew-handling join helpers. AQE's skew-join split (enabled in
 * GraftSession) handles moderate skew at runtime; for PATHOLOGICAL
 * keys (one key = half the table — the web-corpus reality of empty
 * strings and boilerplate ids) an explicit salt is the reliable tool:
 * the large side scatters each key over `saltBuckets` sub-keys and the
 * small side is replicated once per bucket, so no single task owns a
 * whole hot key.
 */
object Joins {

  /**
   * Equi-join `large ⋈ small` on `key` with the large side salted.
   * Result rows are identical to a plain inner join; only the shuffle
   * layout changes. Small side grows ×saltBuckets — keep it the
   * dimension side.
   */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    val saltedLarge = large.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * As-of join: for every left row, attach `payload` columns from the
   * LATEST right row with the same `key` and rightTs <= leftTs
   * (inclusive, the conventional as-of semantics); null when no prior
   * right row exists (left-outer).
   *
   * NOT implemented as a range join (which Spark can only execute as
   * a broadcast-nested-loop): both sides are UNIONED, shuffled ONCE
   * on `key`, sorted by (ts, side) within each key, and the payload
   * is carried forward with last(ignoreNulls) — right rows sort
   * before coincident left rows, giving the inclusive match. Cost is
   * one hash shuffle + per-key sort, the same shape as any windowed
   * aggregation — no quadratic term at any scale.
   *
   * Requires (key, rightTs) unique on the right (pre-aggregate
   * otherwise) — with duplicates the carried value would depend on
   * intra-key sort stability.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.mkString(",")} collide with left columns")
    // the union/window plumbing below owns these working names; an
    // input already carrying one would silently corrupt the carry
    val reserved = Seq("__t", "__side", "__pv")
    val clashes = (leftCols ++ right.columns).filter(reserved.contains)
    require(clashes.isEmpty,
      s"asofJoin reserves column names ${reserved.mkString(",")}; " +
        s"input carries ${clashes.distinct.mkString(",")} — rename it first")
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    // common layout: key, __t, __side, left payload-nulled / right left-nulled
    val lSide = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        payload.map(p => lit(null).cast(rightTypes(p)).as(p)): _*)
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val rSide = right
      .withColumn("__t", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(lTypes(c)).as(c)) ++
        payload.map(col): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the carried value is a STRUCT wrapping the payload, non-null on
    // every right row: last(payload, ignoreNulls) alone would SKIP a
    // matched right row whose payload value is legitimately NULL and
    // resurrect an older row's value — the struct makes "matched row
    // with null payload" distinguishable from "no row to match"
    val union = lSide.unionByName(rSide)
      .withColumn("__pv",
        when(col("__side") === 0, struct(payload.map(col): _*)))
      .withColumn("__pv", last(col("__pv"), ignoreNulls = true).over(w))
    val carried = payload.foldLeft(union) { (df, p) =>
      df.withColumn(p, col("__pv").getField(p))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }

  /**
   * Range join (point-in-interval) via binning: intervals are
   * replicated to every `binSize`-wide bin they overlap, points carry
   * their single bin, and the join becomes a BIN EQUI-JOIN plus the
   * exact BETWEEN residual — a hash/sort-merge join instead of the
   * broadcast-nested-loop Spark plans for a bare range predicate. A
   * point's bin intersects an interval's bin list exactly once when
   * they overlap, so no dedup is needed.
   *
   * Shuffle volume: |points| + Σ(interval span / binSize). Pick
   * binSize near the median interval span so replication stays O(1)
   * per interval. Columns `pointCol`/`startCol`/`endCol` must be
   * numeric (epoch seconds, not timestamps).
   */
  def rangeJoinBinned(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binSize: Long): DataFrame = {
    require(binSize > 0)
    val binnedIntervals = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binSize).cast("long"),
        floor(col(endCol) / binSize).cast("long"))))
    val binnedPoints = points.withColumn("__bin",
      floor(col(pointCol) / binSize).cast("long"))
    binnedPoints.join(binnedIntervals, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
