package graft.index

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The microShards auto-gate (Graft.buildSegmentIndex default 0):
  * per-shard Catalyst size estimate over the threshold → the measured
  * fan-out optimum min(cores, 4×shards); under it → direct write.
  * The threshold itself is evidence-calibrated in WriterFanoutCheck /
  * docs/SCALING.md §"writer fan-out". */
class AutoFanoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fixture-size input resolves to direct write (no merge tax)") {
    val docs = Tables.lineitem(spark, TestSpark.sf)
      .withColumn("id", concat(col("l_orderkey"), lit("#"), col("l_linenumber")))
      .select(col("id"), col("l_returnflag"), col("l_shipdate"))
    assert(SegmentShardSink.autoMicroShards(docs, 4) === 4)
  }

  test("large-estimate input resolves to min(cores, 4x shards)") {
    // spark.range carries an exact Catalyst size estimate (8 bytes/row)
    // without materializing anything: 50M rows = 400 MB >> 8 MB * 4
    val big = spark.range(50000000L)
      .select(col("id").cast("string").as("id"))
    val cores = spark.sparkContext.defaultParallelism
    assert(SegmentShardSink.autoMicroShards(big, 4) ===
      math.max(4, math.min(cores, 16)))
    // many final shards: the 4x-per-shard cap binds before the core cap
    assert(SegmentShardSink.autoMicroShards(big, 1) ===
      math.max(1, math.min(cores, 4)))
  }

  test("a join-multiplied or stat-less estimate cannot spuriously fan out") {
    // self-join: Catalyst multiplies the child estimates, so the root
    // stat of a tiny joined input can read huge — the leaf cross-check
    // must keep the build direct
    val small = Tables.nation(spark, TestSpark.sf)
      .select(col("n_nationkey").cast("string").as("id"), col("n_name"))
    val joined = small.as("a").join(small.as("b"), Seq("id"))
      .join(small.as("c"), Seq("id")).join(small.as("d"), Seq("id"))
    assert(SegmentShardSink.autoMicroShards(joined, 4) === 4,
      s"tiny self-join fanned out (root est " +
        s"${joined.queryExecution.optimizedPlan.stats.sizeInBytes})")
    // a stat-less leaf (LocalRelation is sized; a streaming-ish or
    // unknown source falls to defaultSizeInBytes): simulate with an
    // RDD-backed frame, which carries the default size
    val rddBacked = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq((1L, "x"))).map {
        case (i, s) => org.apache.spark.sql.Row(i, s) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    assert(SegmentShardSink.autoMicroShards(rddBacked, 4) === 4,
      "unknown-size leaf must stay direct")
  }

  test("an explicit microShards value bypasses the auto gate " +
      "(buildSegmentIndex contract: 0 = auto, nonzero = literal)") {
    // direct-write fixture build through the flagship path stays at
    // `shards` part dirs — the auto gate must not fan a tiny store out
    val docs = Tables.lineitem(spark, TestSpark.sf)
      .filter(col("l_orderkey") < 100)
      .withColumn("id", concat(col("l_orderkey"), lit("#"), col("l_linenumber")))
      .select(col("id"), col("l_returnflag"))
    val out = java.nio.file.Files.createTempDirectory("auto_fanout_").toString
    graft.Graft.buildSegmentIndex(docs, "id", out, shards = 2)
    val parts = new java.io.File(out).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(parts === 2, s"fixture-size auto build fanned out to $parts parts")
  }
}
