package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pow2Bucket: next power of two, exact at the boundaries") {
    val got = Seq(1L, 2L, 3L, 4L, 5L, 63L, 64L, 65L, 1000L)
      .toDF("n").select(Profiling.pow2Bucket(col("n"))).as[Long].collect().toSeq
    assert(got === Seq(1L, 2L, 4L, 4L, 8L, 64L, 64L, 128L, 1024L))
  }

  test("lengthBuckets: counts, capacity and padding fraction") {
    val df = Seq(3L, 4L, 5L, 9L).toDF("t") // buckets: 4,4,8,16
    val got = Profiling.lengthBuckets(df, col("t"))
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (4L, 2L, 7L, 8L, 0.125),
      (8L, 1L, 5L, 8L, 0.375),
      (16L, 1L, 9L, 16L, 0.4375)))
  }
}
