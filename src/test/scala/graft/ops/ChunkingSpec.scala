package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkTokens: stride windows with overlap, last chunk clamped") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i"))).toDF("id", "toks")
    val got = Chunking.chunkTokens(df, col("id"), col("toks"), chunkSize = 4, stride = 3)
      .orderBy("chunk_start")
      .select("chunk_start", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (0L, 4L, "t1 t2 t3 t4"),
      (3L, 4L, "t4 t5 t6 t7"),
      (6L, 4L, "t7 t8 t9 t10"),
      (9L, 1L, "t10")))
  }

  test("chunkTokens: empty doc yields one empty chunk (doc survives)") {
    val df = Seq((1L, Seq.empty[String])).toDF("id", "toks")
    val got = Chunking.chunkTokens(df, col("id"), col("toks"), 4, 3)
      .select("chunk_start", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(got === Seq((0L, 0L, "")))
  }

  test("packTexts assembles each pack's documents in order with the separator") {
    val df = Seq(
      ("s", 1L, 300L, "one"), ("s", 2L, 300L, "two"),
      ("s", 3L, 500L, "three"), ("s", 4L, 100L, "four"))
      .toDF("g", "ord", "cost", "txt")
    val got = Chunking.packTexts(df, col("g"), col("ord"), col("cost"),
        budget = 500, col("txt"), sep = "<|eod|>")
      .orderBy("pack_id")
      .select("pack_id", "n_docs", "pack_cost", "packed_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    // excl cumsums 0,300,600,1100 -> packs 0,0,1,2
    assert(got === Seq(
      (0L, 2L, 600L, "one<|eod|>two"),
      (1L, 1L, 500L, "three"),
      (2L, 1L, 100L, "four")))
  }

  test("packByBudget: pack = exclusive cumsum / budget; straddlers keep their start pack") {
    val df = Seq(("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 500L), ("a", 4L, 100L))
      .toDF("g", "ord", "cost")
    val got = Chunking.packByBudget(df, col("g"), col("ord"), col("cost"), budget = 500)
      .orderBy("ord").select("ord", "pack_id").as[(Long, Long)].collect().toSeq
    // excl cumsums: 0, 300, 600, 1100 -> packs 0, 0, 1, 2
    assert(got === Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L)))
  }

  test("packGreedy: resets when budget would overflow; per-group counters") {
    val df = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 500L), ("a", 4L, 100L),
      ("b", 1L, 200L), ("b", 2L, 200L))
      .toDF("g", "ord", "cost")
    val got = Chunking.packGreedy(df, "g", "ord", "cost", budget = 500)
      .orderBy("g", "ord")
      .select("g", "ord", "pack_id").as[(String, Long, Long)].collect().toSeq
    // a: 300 | 300 (300+300>500 -> new) | 500 (300+500>500 -> new) | 100 (500+100>500 -> new)
    // b: 200, 200 fit together
    assert(got === Seq(
      ("a", 1L, 0L), ("a", 2L, 1L), ("a", 3L, 2L), ("a", 4L, 3L),
      ("b", 1L, 0L), ("b", 2L, 0L)))
  }

  test("packGreedy: oversized single doc gets its own pack, stream continues") {
    val df = Seq(("a", 1L, 100L), ("a", 2L, 9000L), ("a", 3L, 100L), ("a", 4L, 100L))
      .toDF("g", "ord", "cost")
    val got = Chunking.packGreedy(df, "g", "ord", "cost", budget = 500)
      .orderBy("ord").select("ord", "pack_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 2L)))
  }

  test("packGreedy: no pack exceeds budget unless it is a single oversized doc") {
    val rows = (1 to 200).map(i => ("g" + (i % 5), i.toLong, (i * 37 % 450 + 10).toLong))
    val df = rows.toDF("g", "ord", "cost")
    val packs = Chunking.packGreedy(df, "g", "ord", "cost", budget = 1000)
      .groupBy("g", "pack_id")
      .agg(sum("cost").as("tot"), count(lit(1)).as("n"))
      .filter(col("tot") > 1000 && col("n") > 1)
      .count()
    assert(packs === 0L)
  }

  test("packGreedy: IntegerType cost works; non-integral cost fails fast") {
    val intCost = Seq(("a", 1L, 300), ("a", 2L, 300)).toDF("g", "ord", "cost")
    val got = Chunking.packGreedy(intCost, "g", "ord", "cost", budget = 500)
      .orderBy("ord").select("pack_id").as[Long].collect().toSeq
    assert(got === Seq(0L, 1L))
    val doubleCost = Seq(("a", 1L, 300.0)).toDF("g", "ord", "cost")
    val e = intercept[IllegalArgumentException] {
      Chunking.packGreedy(doubleCost, "g", "ord", "cost", budget = 500)
    }
    assert(e.getMessage.contains("integral"))
  }
}
