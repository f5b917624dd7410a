package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BFS shortest paths: all min-depth paths, visited pruning, bounds. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def paths(edges: Seq[(String, String)], src: String, dst: String,
                    maxDepth: Int): Seq[(String, Long)] =
    GraphOps.shortestPaths(edges.toDF("f", "t"), col("f"), col("t"),
        src, dst, maxDepth)
      .as[(String, Long)].collect().sortBy(_._1).toSeq

  test("all shortest paths emitted, longer paths suppressed") {
    // a->b->d, a->c->d (depth 2, both), plus a->e->f->d (depth 3, not emitted)
    val e = Seq("a" -> "b", "b" -> "d", "a" -> "c", "c" -> "d",
      "a" -> "e", "e" -> "f", "f" -> "d")
    assert(paths(e, "a", "d", 5) === Seq(("a>b>d", 2L), ("a>c>d", 2L)))
  }

  test("direct edge wins over longer alternatives") {
    val e = Seq("a" -> "d", "a" -> "b", "b" -> "d")
    assert(paths(e, "a", "d", 5) === Seq(("a>d", 1L)))
  }

  test("unreachable within maxDepth -> empty; cycles don't loop") {
    val e = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "d")
    assert(paths(e, "a", "d", 2) === Seq())
    assert(paths(e, "a", "d", 3) === Seq(("a>b>c>d", 3L)))
    // disconnected target terminates before maxDepth via empty frontier
    assert(paths(e, "a", "zz", 8) === Seq())
  }

  test("source == target is the zero path; duplicate edges collapse") {
    val e = Seq("a" -> "b", "a" -> "b", "b" -> "c")
    assert(paths(e, "a", "a", 3) === Seq(("a", 0L)))
    assert(paths(e, "a", "c", 3) === Seq(("a>b>c", 2L)))
  }
}
