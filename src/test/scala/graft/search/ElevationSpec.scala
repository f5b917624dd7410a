package graft.search

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** QueryElevationComponent semantics: pins lead in config order,
  * exclusions vanish, organic order follows, marker column set. */
class ElevationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val scored = Seq(
    ("a", 50L), ("b", 40L), ("c", 30L), ("d", 20L), ("e", 10L)
  ).toDF("id", "score")

  private def order(cfg: Elevation.Config): Seq[(String, Boolean)] =
    Elevation(scored, col("id"), col("score"), cfg)
      .select("id", "elevated").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq

  test("pinned ids lead in CONFIG order (not score order), rest organic") {
    assert(order(Elevation.Config(elevated = Seq("d", "b")))
      === Seq(("d", true), ("b", true), ("a", false), ("c", false), ("e", false)))
  }

  test("excluded ids vanish; empty elevation is organic order") {
    assert(order(Elevation.Config(elevated = Nil, excluded = Seq("b", "e")))
      === Seq(("a", false), ("c", false), ("d", false)))
  }

  test("a pinned id not in the match set is simply absent (no forceElevation)") {
    assert(order(Elevation.Config(elevated = Seq("zz", "c")))
      === Seq(("c", true), ("a", false), ("b", false), ("d", false), ("e", false)))
  }
}
