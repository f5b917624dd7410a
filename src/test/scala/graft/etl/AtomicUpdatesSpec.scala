package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AtomicUpdatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "en", 10L, Seq("a")),
    (2L, "de", 20L, Seq("b", "c")),
    (3L, "fr", 30L, null.asInstanceOf[Seq[String]])
  ).toDF("id", "lang", "n", "tags")

  test("set overwrites only non-null update values; inc adds; add appends") {
    val updates = Seq(
      (1L, Some("xx"), 5L, Seq("z")),   // set+inc+add
      (2L, Option.empty[String], 0L, Seq.empty[String]), // null set keeps old
      (3L, Some("yy"), 1L, Seq("w"))    // add onto a null array
    ).toDF("id", "lang", "n", "tags")
    val got = Etl.applyAtomicUpdates(base, updates, "id",
        set = Seq("lang"), inc = Seq("n"), add = Seq("tags"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.getSeq[String](3)).map(_.toList).orNull)).toSeq
    assert(got === Seq(
      (1L, "xx", 15L, List("a", "z")),
      (2L, "de", 20L, List("b", "c")),
      (3L, "yy", 31L, List("w"))))
  }

  test("docs without an update row pass through; dangling updates are ignored") {
    val updates = Seq((2L, 100L), (99L, 7L)).toDF("id", "n")
    val got = Etl.applyAtomicUpdates(base, updates, "id", inc = Seq("n"))
      .orderBy("id").select("id", "n").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L), (2L, 120L), (3L, 30L)))
  }

  test("inc on a null base field sets it to the delta (Solr absent-field inc)") {
    val b = Seq((1L, null.asInstanceOf[java.lang.Long]), (2L, java.lang.Long.valueOf(5L)))
      .toDF("id", "n")
    val updates = Seq((1L, 10L)).toDF("id", "n")
    val got = Etl.applyAtomicUpdates(b, updates, "id", inc = Seq("n"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toSeq
    assert(got === Seq(1L -> Some(10L), 2L -> Some(5L)))
  }

  test("duplicate update keys are rejected in-job, not silently fanned out") {
    val updates = Seq((2L, 10L), (2L, 20L)).toDF("id", "n")
    val ex = intercept[Exception] {
      Etl.applyAtomicUpdates(base, updates, "id", inc = Seq("n")).collect()
    }
    assert(ex.getMessage.contains("duplicate update") ||
      Option(ex.getCause).exists(_.getMessage.contains("duplicate update")))
  }

  test("updating the key or giving no fields is rejected") {
    val updates = Seq((1L, 1L)).toDF("id", "n")
    intercept[IllegalArgumentException] {
      Etl.applyAtomicUpdates(base, updates, "id", set = Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Etl.applyAtomicUpdates(base, updates, "id")
    }
  }

  test("remove drops occurrences but keeps duplicates of survivors") {
    val b = Seq((1L, Seq("a", "b", "a", "c")), (2L, Seq("x", "x"))).toDF("id", "tags")
    val u = Seq((1L, Seq("a"))).toDF("id", "tags")
    val got = Etl.applyAtomicUpdates(b, u, "id", remove = Seq("tags"))
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    assert(got === Seq((1L, Seq("b", "c")), (2L, Seq("x", "x"))))
  }

  test("removeregex drops entries matching any pattern") {
    val b = Seq((1L, Seq("n0", "n1", "keep", "n22"))).toDF("id", "tags")
    val u = Seq((1L, Seq("^n[0-9]$"))).toDF("id", "tags")
    val got = Etl.applyAtomicUpdates(b, u, "id", removeRegex = Seq("tags"))
      .as[(Long, Seq[String])].head()
    assert(got === ((1L, Seq("keep", "n22"))))
  }

  test("add-distinct appends only absent values, once each") {
    val b = Seq((1L, Seq("a", "b")), (2L, null.asInstanceOf[Seq[String]]))
      .toDF("id", "tags")
    val u = Seq((1L, Seq("b", "c", "c")), (2L, Seq("z", "z"))).toDF("id", "tags")
    val got = Etl.applyAtomicUpdates(b, u, "id", addDistinct = Seq("tags"))
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    assert(got === Seq((1L, Seq("a", "b", "c")), (2L, Seq("z"))))
  }
}
