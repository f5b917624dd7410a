package graft.index

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ConditionalUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newStore(): String = {
    val out = java.nio.file.Files.createTempDirectory("graft_cu_").toString
    SegmentShardSink.write(
      Seq(("1", "a", 5L), ("2", "b", 5L), ("3", "c", 7L))
        .toDF("id", "v", "_version_"),
      "id", out, shards = 2)
    out
  }

  test("all four _version_ arms behave per the Solr contract") {
    val store = newStore()
    val batch = Seq(
      ("1", "a2", 5L),   // exact match -> applies
      ("2", "b2", 9L),   // exact mismatch -> conflict
      ("3", "c2", 1L),   // must exist -> applies
      ("4", "d", -1L),   // must not exist -> insert
      ("1x", "z", 1L)    // must exist but absent -> conflict
    ).toDF("id", "v", "_version_")
    val (applied, conflicts) = SegmentShardSink.conditionalUpsert(
      spark, store, batch, "_version_", newVersion = 11L)
    assert(applied.select("id").as[String].collect().toSet === Set("1", "3", "4"))
    val confs = conflicts.select("id", "stored_version")
      .as[(String, Option[Long])].collect().toMap
    assert(confs === Map("2" -> Some(5L), "1x" -> None))
    val after = spark.read.format("graft-index").load(store)
      .select("id", "v", "_version_").as[(String, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(after("1") === (("a2", 11L)))
    assert(after("2") === (("b", 5L)))  // conflict left untouched
    assert(after("3") === (("c2", 11L)))
    assert(after("4") === (("d", 11L)))
    assert(after.size === 4)
  }

  test("expected 0 skips the check; conflicts never mutate the store") {
    val store = newStore()
    val batch = Seq(("2", "b9", 0L), ("3", "nope", 4L)).toDF("id", "v", "_version_")
    val (applied, conflicts) = SegmentShardSink.conditionalUpsert(
      spark, store, batch, "_version_", newVersion = 12L)
    assert(applied.count() === 1L)
    assert(conflicts.count() === 1L)
    val after = spark.read.format("graft-index").load(store)
      .select("id", "v").as[(String, String)].collect().toMap
    assert(after("2") === "b9")
    assert(after("3") === "c")
  }
}
