package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clustering.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap

  test("chain merges transitively to the min id (the pair-dedup gap)") {
    // A~B, B~C, no A~C edge: pairwise dropping could keep 2 of 3;
    // components must label all three together
    val labels = cc(Seq((1L, 2L), (2L, 3L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("disjoint components keep separate canonical labels") {
    val labels = cc(Seq((5L, 9L), (2L, 7L), (7L, 3L)))
    assert(labels === Map(5L -> 5L, 9L -> 5L, 2L -> 2L, 7L -> 2L, 3L -> 2L))
  }

  test("long path converges within the iteration budget") {
    val path = (1L until 15L).map(i => (i, i + 1))
    val labels = cc(path)
    assert(labels.values.toSet === Set(1L))
    assert(labels.size === 15)
  }

  test("cycle + direction-agnostic edges") {
    val labels = cc(Seq((4L, 2L), (2L, 8L), (8L, 4L), (9L, 1L)))
    assert(labels(4L) === 2L && labels(8L) === 2L && labels(2L) === 2L)
    assert(labels(9L) === 1L && labels(1L) === 1L)
  }
}
