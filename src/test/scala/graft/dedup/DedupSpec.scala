package graft.dedup

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, lastModified, payload) — the reference's reducer-side shape
  private lazy val docs = Seq(
    ("a", 10L, "a-old"), ("a", 30L, "a-new"), ("a", 20L, "a-mid"),
    ("b", 5L, "b-only"),
    ("c", 7L, "c-1"), ("c", 7L, "c-dup")).toDF("id", "file_last_modified", "payload")

  test("A1 retainMostRecent keeps single max-orderBy row per key") {
    val got = Dedup.retainMostRecent(docs, Seq(col("id")),
        col("file_last_modified"), col("payload"))
      .select("id", "payload").as[(String, String)].collect().toMap
    assert(got === Map("a" -> "a-new", "b" -> "b-only", "c" -> "c-dup"))
  }

  test("A6 counters: duplicates (equal order value) vs outdated (superseded)") {
    val row = Dedup.retainMostRecentCounters(docs, Seq(col("id")),
      col("file_last_modified")).collect().head
    // c's 2-way tie at 7 = ONE duplicate beyond the retained doc
    // (reference counts collisions, not tied rows)
    assert(row.getAs[Long]("duplicates") === 1)
    assert(row.getAs[Long]("outdated") === 2)   // a-old, a-mid
    assert(row.getAs[Long]("total") === 6)
  }

  test("A3 rejecting: conflicts listed; strict mode throws; clean df passes") {
    val bad = Dedup.conflicts(docs, Seq(col("id"))).as[(String, Long)].collect().toMap
    assert(bad === Map("a" -> 3L, "c" -> 2L))
    intercept[IllegalArgumentException](Dedup.rejectOnConflict(docs, Seq(col("id"))))
    val clean = docs.filter($"payload".isin("a-new", "b-only", "c-1"))
    assert(Dedup.rejectOnConflict(clean, Seq(col("id"))).count() === 3)
  }

  test("A2 sortingLastWriterWins == retainMostRecent observable result") {
    val a = Dedup.sortingLastWriterWins(docs, Seq(col("id")),
      col("file_last_modified"), col("payload")).select("id", "payload").collect().toSet
    val b = Dedup.retainMostRecent(docs, Seq(col("id")),
      col("file_last_modified"), col("payload")).select("id", "payload").collect().toSet
    assert(a === b)
  }

  test("A5 null ordering: rows with a value beat missing-value rows by default") {
    val df = Seq(("k", Some(5L), "has"), ("k", None, "missing"),
      ("only-null", None, "survives")).toDF("id", "ts", "tag")
    val kept = Dedup.retainMostRecent(df, Seq(col("id")), col("ts"))
      .select("tag").as[String].collect().toSet
    assert(kept === Set("has", "survives"))
    val nullsWin = Dedup.retainMostRecentNulls(df, Seq(col("id")), col("ts"),
      nullsFirst = true).select("tag").as[String].collect().toSet
    assert(nullsWin === Set("missing", "survives"))
  }

  test("exactByContent dedups by content hash keeping first by keep-order") {
    val df = Seq(("x", 2, "keep2"), ("x", 1, "keep1"), ("y", 9, "only"))
      .toDF("content", "ord", "tag")
    val got = Dedup.exactByContent(df, col("content"), col("ord"))
      .select("tag").as[String].collect().toSet
    assert(got === Set("keep1", "only"))
  }

  test("dedupMap: losers map to the best-quality representative") {
    val df = Seq(
      (1L, "dup", 10L), (2L, "dup", 30L), (3L, "dup", 20L), // kept: 2 (q=30)
      (4L, "uniq", 5L),                                     // singleton: no row
      (5L, "pair", 7L), (6L, "pair", 7L)                    // q tie -> id asc: 5
    ).toDF("id", "content", "quality")
    val got = Dedup.dedupMap(df, col("id"), col("content"),
        Seq(col("quality").desc, col("id")))
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 3L), (3L, 2L, 3L), (6L, 5L, 2L)))
  }
}
