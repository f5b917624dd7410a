package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("column interleave agrees with the reference kernel bit-for-bit") {
    val rows = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 1), (-7, 12345))
    val got = rows.toDF("x", "y")
      .select(ZOrder.zorderCol(16, col("x"), col("y")).as("z"))
      .as[Long].collect()
    val want = rows.map { case (x, y) =>
      ZOrderKernel.interleave(Array(x, y), 16)
    }
    assert(got.toSeq === want)
  }

  test("known Morton values: bit b of dim d lands at b*k+d") {
    assert(ZOrderKernel.interleave(Array(1, 0), 16) === 1L) // x bit0 -> bit0
    assert(ZOrderKernel.interleave(Array(0, 1), 16) === 2L) // y bit0 -> bit1
    assert(ZOrderKernel.interleave(Array(3, 3), 16) === 15L) // 0b1111
    assert(ZOrderKernel.interleave(Array(2, 1), 16) === 0b110L)
    // null clamps to origin
    assert(ZOrderKernel.interleave(Array(-5, 0), 16) === 0L)
  }

  test("curve order is locality-preserving: file bounding boxes shrink vs row order") {
    // 64x64 grid, one row per cell, 16 files: under Z-order each
    // file's (x,y) bounding box must cover a small fraction of the
    // domain; under plain row-major order the x-range is full-width
    // for every file
    val grid = spark.range(0, 64L * 64)
      .select((col("id") % 64).cast("int").as("x"),
        (col("id") / 64).cast("int").as("y"))
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.clusterWrite(grid, s"$out/z", numFiles = 16, bitsPer = 6,
      col("x"), col("y"))
    val boxes = spark.read.parquet(s"$out/z")
      .groupBy(input_file_name().as("f"))
      .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
      .select("area").as[Long].collect()
    assert(boxes.length === 16)
    // perfect 16-file Z-split of a 64x64 grid = 16x16 tiles (area 256);
    // range-boundary sampling is approximate, allow 4x slack
    val avgArea = boxes.sum.toDouble / boxes.length
    assert(avgArea <= 4 * 256,
      s"avg bounding-box area $avgArea — Z-order locality lost")
    // a box predicate overlaps few files
    val hits = spark.read.parquet(s"$out/z")
      .groupBy(input_file_name()).agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .where(col("x1") >= 8 && col("x0") <= 15 && col("y1") >= 8 && col("y0") <= 15)
      .count()
    assert(hits <= 6, s"8x8 box touched $hits of 16 files")
  }
}
