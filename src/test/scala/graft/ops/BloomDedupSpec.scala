package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kernel: no false negatives, fpp in the designed ballpark") {
    val (words, k) = BloomDedup.optimalParams(10000, 0.01)
    val bits = new Array[Long](words)
    val present = (0 until 10000).map(i => s"key-$i")
    present.foreach(s =>
      BloomKernel.add(bits, k, s.getBytes("UTF-8")))
    // every inserted key hits (the exactness guarantee rests on this)
    present.foreach(s =>
      assert(BloomKernel.mightContain(bits, k, s.getBytes("UTF-8"))))
    // absent keys: false-positive rate near the 1% design point
    val fp = (0 until 20000).count(i =>
      BloomKernel.mightContain(bits, k, s"absent-$i".getBytes("UTF-8")))
    assert(fp < 20000 * 0.03, s"fpp too high: $fp/20000")
    assert(fp > 0, "a zero-fp bloom at design load means probes are broken")
  }

  test("optimalParams: textbook sizing") {
    val (words, k) = BloomDedup.optimalParams(1000000, 0.01)
    val mBits = words.toLong * 64
    assert(mBits >= 9500000 && mBits <= 9700000) // ≈ 9.59 Mb
    assert(k === 7)
  }

  test("distributed build + codegen probe agree with the local kernel") {
    val keys = spark.range(0, 5000).select(concat(lit("doc-"), col("id")).as("k"))
      .as[String]
    val sketch = BloomDedup.buildSketch(keys, 5000, 0.01)
    (0 until 5000 by 97).foreach(i => assert(sketch.mightContain(s"doc-$i")))
    val probed = spark.range(0, 10000)
      .select(concat(lit("doc-"), col("id")).as("k"))
      .withColumn("hit", BloomDedup.mightContainCol(spark, sketch, col("k")))
      .where(col("id") < 5000 || !col("hit"))
    // all 5000 present keys hit; most absent ones don't
    assert(probed.count() >= 5000 + 4800)
  }

  test("newRows is exact and the bloom actually prunes the join") {
    val corpus = spark.range(0, 2000)
      .select(concat(lit("text-"), col("id")).as("k")).as[String]
    // incoming: 500 dups (0-499) + 1500 new (5000-6499)
    val incoming = spark.range(0, 500)
      .union(spark.range(5000, 6500))
      .select(col("id"), concat(lit("text-"), col("id")).as("k"))
    val out = BloomDedup.newRows(incoming, "k", corpus, expectedItems = 2000)
    val got = out.select("id").as[Long].collect().sorted
    assert(got.toSeq === (5000L until 6500L).toSeq)
    // pruning: the sketch marks all 500 dups and ≈1% of the 1500 new
    val sketch = BloomDedup.buildSketch(corpus, 2000)
    val maybe = incoming.withColumn("hit",
      BloomDedup.mightContainCol(spark, sketch, col("k")))
      .where(col("hit")).count()
    assert(maybe >= 500 && maybe < 600,
      s"join should see ~500 of 2000 incoming rows, saw $maybe")
  }

  test("null-key rows survive as new (NOT EXISTS semantics)") {
    val corpus = spark.range(0, 100)
      .select(concat(lit("n"), col("id")).as("k")).as[String]
    // 2 null-key rows + 1 dup + 1 new
    val incoming = Seq((1L, null: String), (2L, "n5"), (3L, null: String),
      (4L, "brand-new")).toDF("id", "k")
    val out = BloomDedup.newRows(incoming, "k", corpus, expectedItems = 100)
    // null never equals a corpus key -> NOT EXISTS keeps it
    assert(out.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L, 4L))
  }

  test("undersized filter stays correct (just prunes less)") {
    val corpus = spark.range(0, 3000)
      .select(concat(lit("c"), col("id")).as("k")).as[String]
    val incoming = spark.range(2900, 3100)
      .select(col("id"), concat(lit("c"), col("id")).as("k"))
    val out = BloomDedup.newRows(incoming, "k", corpus, expectedItems = 10)
    assert(out.select("id").as[Long].collect().sorted.toSeq ===
      (3000L until 3100L).toSeq)
  }
}
