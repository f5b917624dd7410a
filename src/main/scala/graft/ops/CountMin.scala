package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.route.SolrHash

/**
 * Count-min-sketch heavy hitters — frequent-item mining when the
 * item domain (tokens, n-grams, URLs) is too large to groupBy
 * outright: at 100 TB the vocabulary of distinct n-grams runs to the
 * trillions, and the "just aggregate" plan shuffles all of it to find
 * the handful above a support threshold.
 *
 * The sketch route keeps the big data motionless:
 *
 *  1. SKETCH: each partition folds its items into a d×w counter grid
 *     (d seeded murmur3 rows, w counters each); grids tree-combine by
 *     cell-wise ADD — a few KB per partial, no shuffle of the items;
 *  2. CANDIDATES: CMS only ever OVER-estimates (min over d rows,
 *     Cormode-Muthukrishnan 2005), so `estimate(x) >= trueCount(x)`
 *     — every true heavy hitter survives the `estimate >= φN` cut
 *     (no false negatives), plus a bounded sliver of collisions;
 *  3. EXACT: one aggregation over ONLY the rows whose item is in the
 *     (small, broadcast) candidate set recounts exactly and applies
 *     the threshold — the final answer is EXACT, which is what lets a
 *     plain `HAVING count(*) >= ceil(φ·N)` oracle replay it.
 *
 * Candidate extraction enumerates distinct items once per partition
 * against the broadcast sketch (a map-side filter, not a shuffle);
 * the only full-width aggregation in the whole plan runs on the
 * candidate subset.
 */
object CountMin {

  /** d×w counter grid; estimate = min over rows (upper bound). */
  final case class CmsSketch(depth: Int, width: Int, grid: Array[Long]) {
    def estimate(item: String): Long =
      CountMinKernel.estimate(grid, depth, width,
        item.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def totalAdds: Long = {
      var s = 0L; var j = 0
      while (j < width) { s += grid(j); j += 1 } // row 0 sees every add
      s
    }
  }

  /** Standard sizing: width = ⌈e/ε⌉ (additive error ε·N), depth =
    * ⌈ln(1/δ)⌉ (failure probability δ). */
  def optimalParams(epsilon: Double, delta: Double): (Int, Int) = {
    require(epsilon > 0 && epsilon < 1 && delta > 0 && delta < 1)
    (math.ceil(math.log(1 / delta)).toInt.max(1),
      math.ceil(math.E / epsilon).toInt.max(1))
  }

  /** Build the sketch over one string column (tree-combined). */
  def buildSketch(items: Dataset[String], epsilon: Double = 0.0005,
                  delta: Double = 0.01): CmsSketch = {
    val (d, w) = optimalParams(epsilon, delta)
    val grid = items.rdd.treeAggregate(new Array[Long](d * w))(
      seqOp = (g, item) => {
        CountMinKernel.add(g, d, w,
          item.getBytes(java.nio.charset.StandardCharsets.UTF_8)); g
      },
      combOp = (a, b) => { CountMinKernel.merge(a, b); a },
      depth = 2)
    CmsSketch(d, w, grid)
  }

  /**
   * EXACT heavy hitters of `itemCol` at support `phi` (share of total
   * occurrences), sketch-pruned: returns (item, cnt) for every item
   * with `cnt >= ceil(phi * N)`, ordered by (cnt desc, item).
   * `epsilon` should be ≲ phi/2 so the collision sliver stays small.
   */
  def heavyHitters(df: DataFrame, itemCol: String, phi: Double,
                   epsilon: Double = 0.0005): DataFrame = {
    require(phi > 0 && phi <= 1, s"phi must be in (0,1], got $phi")
    // Enforce the boundedness contract, don't just document it: the
    // driver-side candidate collect below is only ≤ ~1/phi + sliver when
    // epsilon ≲ phi/2. Clamp rather than reject so small-phi callers who
    // left the default epsilon still get a (narrower) correct sketch.
    val eps = math.min(epsilon, phi / 2)
    val spark = df.sparkSession
    val items = df.select(col(itemCol).cast("string").as("__item"))
      .filter(col("__item").isNotNull)
    import org.apache.spark.sql.Encoders
    val sketch = buildSketch(items.as[String](Encoders.STRING), eps)
    val n = sketch.totalAdds
    val threshold = math.ceil(phi * n).toLong
    val bc = spark.sparkContext.broadcast(sketch)
    // distinct-per-partition probe: each partition's local set keeps
    // the enumerate-distinct work map-side; the tiny survivor stream
    // is distinct'd for real afterwards
    val candidates = items.as[String](Encoders.STRING)
      .mapPartitions { it =>
        val seen = new java.util.HashSet[String]()
        it.filter { item =>
          seen.add(item) && bc.value.estimate(item) >= threshold
        }
      }(Encoders.STRING)
      .distinct()
      .collect() // bounded: ≤ 1/phi true hitters + the ε-collision sliver
    if (candidates.isEmpty) return items.limit(0)
      .groupBy(col("__item").as("item")).agg(count(lit(1)).as("cnt"))
    // isInCollection compiles to InSet (hash probe) for larger lists
    items.filter(col("__item").isInCollection(candidates.toSeq))
      .groupBy(col("__item").as("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .orderBy(col("cnt").desc, col("item"))
  }
}

/** Static add/estimate/merge kernel: row i uses murmur3 seeded i
  * (independent-enough rows per the CM analysis). */
object CountMinKernel {
  def add(grid: Array[Long], d: Int, w: Int, key: Array[Byte]): Unit = {
    var i = 0
    while (i < d) {
      val h = SolrHash.murmur3(key, 0, key.length, i).toLong & 0xFFFFFFFFL
      grid(i * w + (h % w).toInt) += 1
      i += 1
    }
  }

  def estimate(grid: Array[Long], d: Int, w: Int, key: Array[Byte]): Long = {
    var min = Long.MaxValue
    var i = 0
    while (i < d) {
      val h = SolrHash.murmur3(key, 0, key.length, i).toLong & 0xFFFFFFFFL
      val c = grid(i * w + (h % w).toInt)
      if (c < min) min = c
      i += 1
    }
    min
  }

  def merge(into: Array[Long], from: Array[Long]): Unit = {
    var i = 0
    while (i < into.length) { into(i) += from(i); i += 1 }
  }
}
