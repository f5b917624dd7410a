package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BFS shortest paths: all min-depth paths, visited pruning, bounds —
  * every fixture asserted for BOTH strategies (bidirectional
  * meet-in-the-middle, the default, and the plain forward walk), which
  * must be result-identical by the GraphOps scaladoc proof. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pathsWith(bidi: Boolean)(edges: Seq[(String, String)],
      src: String, dst: String, maxDepth: Int): Seq[(String, Long)] =
    GraphOps.shortestPaths(edges.toDF("f", "t"), col("f"), col("t"),
        src, dst, maxDepth, bidirectional = bidi)
      .as[(String, Long)].collect().sortBy(_._1).toSeq

  /** Assert the expectation for both strategies. */
  private def check(edges: Seq[(String, String)], src: String, dst: String,
                    maxDepth: Int, expect: Seq[(String, Long)]): Unit = {
    assert(pathsWith(bidi = false)(edges, src, dst, maxDepth) === expect,
      "forward-only")
    assert(pathsWith(bidi = true)(edges, src, dst, maxDepth) === expect,
      "bidirectional")
  }

  test("all shortest paths emitted, longer paths suppressed") {
    // a->b->d, a->c->d (depth 2, both), plus a->e->f->d (depth 3, not emitted)
    val e = Seq("a" -> "b", "b" -> "d", "a" -> "c", "c" -> "d",
      "a" -> "e", "e" -> "f", "f" -> "d")
    check(e, "a", "d", 5, Seq(("a>b>d", 2L), ("a>c>d", 2L)))
  }

  test("direct edge wins over longer alternatives") {
    val e = Seq("a" -> "d", "a" -> "b", "b" -> "d")
    check(e, "a", "d", 5, Seq(("a>d", 1L)))
  }

  test("unreachable within maxDepth -> empty; cycles don't loop") {
    val e = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "d")
    check(e, "a", "d", 2, Seq())
    check(e, "a", "d", 3, Seq(("a>b>c>d", 3L)))
    // disconnected target terminates before maxDepth via empty frontier
    check(e, "a", "zz", 8, Seq())
  }

  test("source == target is the zero path; duplicate edges collapse") {
    val e = Seq("a" -> "b", "a" -> "b", "b" -> "c")
    check(e, "a", "a", 3, Seq(("a", 0L)))
    check(e, "a", "c", 3, Seq(("a>b>c", 2L)))
  }

  test("odd-length distances meet correctly (asymmetric split)") {
    // L=3: the meet fires at (2,1) or (1,2) depending on frontier sizes
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "d",
      "a" -> "x", "x" -> "c", // second depth-3 path a>x>c>d
      "a" -> "y", "y" -> "z") // dead weight on the forward side
    check(e, "a", "d", 6, Seq(("a>b>c>d", 3L), ("a>x>c>d", 3L)))
  }

  test("multiple meet nodes: every forward x backward splice appears once") {
    // two meet nodes m1/m2 at depth 2 of 4, two back-halves each from m1
    val e = Seq(
      "s" -> "a", "a" -> "m1", "s" -> "b", "b" -> "m2",
      "m1" -> "c", "c" -> "t", "m1" -> "d", "d" -> "t",
      "m2" -> "e", "e" -> "t")
    check(e, "s", "t", 8, Seq(
      ("s>a>m1>c>t", 4L), ("s>a>m1>d>t", 4L), ("s>b>m2>e>t", 4L)))
  }

  test("high back-degree graph: bidirectional and forward agree on a random DAG") {
    // deterministic pseudo-random layered DAG (no java.util.Random
    // seed drift: straight LCG), 5 layers x 8 nodes, ~3 edges/node
    var lcg = 42L
    def next(): Int = { lcg = (lcg * 6364136223846793005L + 1442695040888963407L); ((lcg >>> 33) % 997).toInt }
    val edges = for {
      layer <- 0 until 4
      i <- 0 until 8
      _ <- 0 until 3
    } yield (s"n${layer}_$i", s"n${layer + 1}_${next() % 8}")
    val f = pathsWith(bidi = false)(edges, "n0_0", "n4_5", 6)
    val b = pathsWith(bidi = true)(edges, "n0_0", "n4_5", 6)
    assert(f === b)
  }
}
