package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN (q292's operator): codes bounded, encode
  * deterministic, and ADC ranking recalls most of the exact top-k on
  * clustered data — the quality bar that separates a quantizer from a
  * random projection. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs(n: Int, dim: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // three well-separated clusters + deterministic jitter: PQ should
    // rank same-cluster vectors ahead of cross-cluster ones
    (0 until n).map { i =>
      val c = i % 3
      val v = Array.tabulate(dim) { j =>
        val base = if (j % 3 == c) 1.0 else 0.1
        base + 0.01 * (((i * 31 + j * 17) % 13) - 6)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("codes are in [0, ksub), m per vector, stable across runs") {
    val df = vecs(300, 64)
    val out1 = Similarity.pqTopK(df, df.filter(col("vec_id") < 5), k = 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    val out2 = Similarity.pqTopK(df, df.filter(col("vec_id") < 5), k = 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(out1.toSeq === out2.toSeq)
    assert(out1.length === 25) // 5 queries x top-5
  }

  test("ADC top-5 stays within the query's cluster (quantization preserves " +
      "coarse neighborhoods; fine intra-cluster order is below PQ resolution)") {
    val df = vecs(300, 64)
    val queries = df.filter(col("vec_id") < 10)
    val pq = Similarity.pqTopK(df, queries, k = 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(pq.length === 50)
    pq.foreach { case (q, c) =>
      assert(c % 3 === q % 3,
        s"query $q (cluster ${q % 3}) retrieved cross-cluster id $c (cluster ${c % 3})")
    }
  }

  test("refine: exact re-rank of ADC candidates recalls >= 4 of the exact " +
      "top-5 (quantization error corrected by the second stage)") {
    val df = vecs(300, 64)
    val queries = df.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(df, queries, k = 5)
      .select(col("query_id"), col("corpus_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val refined = Similarity.ivfPqRefineTopK(df, queries, k = 5, dim = 64,
        kCandidates = 40, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    refined.foreach { case (q, ids) =>
      val overlap = ids.intersect(exact.getOrElse(q, Set.empty)).size
      assert(overlap >= 4, s"query $q: refine recalled only $overlap of exact top-5")
    }
  }

  test("IVF-PQ: probed-cell residual ADC also stays in-cluster, deterministic, " +
      "full k per query") {
    val df = vecs(300, 64)
    val queries = df.filter(col("vec_id") < 10)
    val a = Similarity.ivfPqTopK(df, queries, k = 5, dim = 64, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    val b = Similarity.ivfPqTopK(df, queries, k = 5, dim = 64, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(a.toSeq === b.toSeq)
    assert(a.length === 50)
    a.foreach { case (q, _, c) =>
      assert(c % 3 === q % 3,
        s"query $q (cluster ${q % 3}) retrieved cross-cluster id $c (cluster ${c % 3})")
    }
  }
}
