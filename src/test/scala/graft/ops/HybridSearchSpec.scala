package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** RRF: integer reciprocal-rank sums, absent-list docs contribute 0. */
class HybridSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two-list fusion: shared docs outrank single-list docs; integer math") {
    val lex = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("id", "rnk")
    val vec = Seq(("b", 1L), ("d", 2L), ("a", 3L)).toDF("id", "rnk")
    val got = HybridSearch.rrf(Seq(lex, vec), "id", "rnk")
      .as[(String, Long, Long)].collect().toSeq
    // scale=1e6, k0=60: r1=16393, r2=16129, r3=15873
    assert(got === Seq(
      ("b", 16129L + 16393L, 2L),  // 32522
      ("a", 16393L + 15873L, 2L),  // 32266
      ("d", 16129L, 1L),
      ("c", 15873L, 1L)))
  }

  test("single list degenerates to rank order") {
    val lex = Seq(("x", 1L), ("y", 2L)).toDF("id", "rnk")
    assert(HybridSearch.rrf(Seq(lex), "id", "rnk")
      .as[(String, Long, Long)].collect().toSeq
      === Seq(("x", 16393L, 1L), ("y", 16129L, 1L)))
  }

  test("Graft.hybridSearch composes the index-served BM25 leg and the " +
      "store-served {!knn} leg into exactly the RRF of the two legs " +
      "run separately") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf)
    val emb = graft.Tables.embeddings(spark, graft.TestSpark.sf)
    val docsStore =
      java.nio.file.Files.createTempDirectory("hyb_docs_").toString
    graft.index.SegmentShardSink.write(
      docs.select(col("doc_id").cast("string").as("id"), col("text")),
      "id", docsStore, shards = 2, analyzedFields = Set("text"))
    val annStore =
      java.nio.file.Files.createTempDirectory("hyb_ann_").toString
    HnswIndex.build(emb.filter(col("vec_id") < 200), annStore, dim = 64)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0)
    val knnQ = s"{!knn f=embedding topK=8}[${qvec.mkString(",")}]"
    val got = graft.Graft.hybridSearch(spark, docsStore, annStore,
        q = "text:spark", knnQ = knnQ, topN = 20)
      .as[(String, Long, Long)].collect().toSeq
    // the two legs run separately, fused by the same rrf
    val lexIds = graft.Graft.search(spark, docsStore, "text:spark",
        topK = 20).select(col("id")).collect().map(_.getString(0))
    val lex = lexIds.toSeq.zipWithIndex
      .map { case (id, i) => (id, (i + 1).toLong) }.toDF("id", "rnk")
    val ann = graft.Graft.knnServe(spark, annStore, Seq((-1L, knnQ)))
      .select(col("corpus_id").cast("string").as("id"),
        col("rank").cast("long").as("rnk"))
    val want = HybridSearch.rrf(Seq(lex, ann), "id", "rnk")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // an id present in both legs carries n_lists = 2 and outranks its
    // single-leg rrf contribution
    val both = got.filter(_._3 == 2L)
    both.foreach { case (_, score, _) => assert(score > 16393L / 2) }
  }

  test("hybridSearchBatch: per-request rows are bit-identical to " +
      "hybridSearch run in a loop (the batch fuses N requests in one " +
      "job, it must not change any answer)") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf)
    val emb = graft.Tables.embeddings(spark, graft.TestSpark.sf)
    val docsStore =
      java.nio.file.Files.createTempDirectory("hybb_docs_").toString
    graft.index.SegmentShardSink.write(
      docs.select(col("doc_id").cast("string").as("id"), col("text")),
      "id", docsStore, shards = 2, analyzedFields = Set("text"))
    val annStore =
      java.nio.file.Files.createTempDirectory("hybb_ann_").toString
    HnswIndex.build(emb.filter(col("vec_id") < 200), annStore, dim = 64)
    def vecOf(id: Long) = emb.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0).mkString(",")
    val reqs = Seq(
      (-1L, "text:join", s"{!knn f=embedding topK=8}[${vecOf(0)}]"),
      (-2L, "text:vector", s"{!knn f=embedding topK=8}[${vecOf(1)}]"),
      (-3L, "text:merge", s"{!knn f=embedding topK=8}[${vecOf(2)}]"))
    val batch = graft.Graft.hybridSearchBatch(spark, docsStore, annStore,
        reqs, topN = 20)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(batch.nonEmpty)
    reqs.foreach { case (rid, q, knnQ) =>
      val solo = graft.Graft.hybridSearch(spark, docsStore, annStore,
          q = q, knnQ = knnQ, topN = 20)
        .as[(String, Long, Long)].collect().toSeq
      val slice = batch.filter(_._1 == rid).map(t => (t._2, t._3, t._4))
      assert(slice === solo, s"request $rid diverged from the solo run")
    }
  }
}
