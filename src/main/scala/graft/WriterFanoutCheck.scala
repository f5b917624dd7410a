package graft

import org.apache.spark.sql.functions._

/**
 * Writer-parallelism A/B (docs/SCALING.md §"writer fan-out"): at 403k
 * docs/s the single segment writer is the index build's serial floor,
 * and the named next lever is microShards fan-out — write M > shards
 * micro indexes in parallel, then mtree-merge down ([[Graft
 * .buildSegmentIndex]]'s `microShards`, the reference's own
 * MapReduceIndexerTool phase split). This main MEASURES that lever at
 * sf1-true on the q88 shape (lineitem → 4 final shards, ~6M docs) so
 * the default ships on evidence, not intuition:
 *
 *   SPARK_GRAFT_SF1_DIR=/tmp/graft_sf1_true \
 *     sbt "runMain graft.WriterFanoutCheck"
 *
 * One JSON line per fan-out (4 = `shards`, i.e. explicit DIRECT write,
 * no merge; 0 = the AUTO default, which resolves through
 * [[graft.index.SegmentShardSink.autoMicroShards]] and must land on
 * the measured optimum here): wall seconds + docs/s, end-to-end
 * including the merge-down and forceMerge(1) — fan-out only wins if
 * it buys more in parallel write time than it spends re-reading and
 * merging, which is exactly the trade a 1000-executor 100 TB build
 * faces.
 */
object WriterFanoutCheck {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1_true")
    val spark = GraftSession.local(32)
    TrueScaleCheck.generate(spark, dir)
    spark.range(1000000L).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val docs = Tables.lineitem(spark, dir)
      .withColumn("id", concat(col("l_orderkey"), lit("#"), col("l_linenumber")))
      .select(col("id"), col("l_returnflag"), col("l_shipdate"))
    val n = docs.count()
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(4, 8, 16, 32, 0).foreach { micro =>
      val out = java.nio.file.Files.createTempDirectory(s"fanout_${micro}_").toString
      val t0 = System.nanoTime()
      Graft.buildSegmentIndex(docs, "id", out, shards = 4, microShards = micro,
        orderBy = Some(col("l_shipdate")))
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"""{"fanout":$micro,"shards":4,"docs":$n,""" +
        s""""sec":${Bench.fmt(dt, 1)},"docsPerSec":${(n / dt).toLong}}""")
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      spark.catalog.clearCache()
    }
    // AUTO-gate evidence (microShards = 0 default): the resolver must
    // pick the measured optimum (min(cores, 4×shards) = 16) on the
    // sf1-true q88 shape and DIRECT write (= shards) on fixture-size
    // input — the same decision a user's untouched default gets
    val fixtureDocs = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("id", concat(col("l_orderkey"), lit("#"), col("l_linenumber")))
      .select(col("id"), col("l_returnflag"), col("l_shipdate"))
    val autoBig = graft.index.SegmentShardSink.autoMicroShards(docs, 4)
    val autoFix = graft.index.SegmentShardSink.autoMicroShards(fixtureDocs, 4)
    println(s"""{"autoMicroShards":{"sf1TrueQ88Shape":$autoBig,""" +
      s""""fixtureShape":$autoFix,"shards":4,""" +
      s""""cores":${spark.sparkContext.defaultParallelism}}}""")
    spark.stop()
  }
}
