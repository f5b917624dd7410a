package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
