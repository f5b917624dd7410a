package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // realistic-enough docs: > 5 tokens, sane word lengths
  private def doc(i: Long, text: String) = (i, text)

  test("quality gate drops junk, exact dedup keeps the lowest id") {
    val docs = Seq(
      doc(1, "the quick brown fox jumps over the lazy dog today"),
      doc(2, "an entirely different document about spark query engines"),
      doc(3, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
      doc(4, "tiny")                                               // quality junk
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(docs, "doc_id", "text",
      CorpusPipeline.Config(nearDedupThreshold = None))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L))
  }

  test("PII is redacted in the surviving text") {
    val docs = Seq(
      doc(1, "please contact me at someone@example.com for more details soon")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(docs, "doc_id", "text",
      CorpusPipeline.Config(nearDedupThreshold = None))
    val text = out.select("text").as[String].collect().head
    assert(text.contains("<EMAIL>"))
    assert(!text.contains("example.com"))
  }

  test("canonical-URL dedup keeps one doc per canonical URL (lowest id)") {
    val docs = Seq(
      (1L, "first crawl of the page with plenty of words here", "HTTP://WWW.E.COM/a/?utm_source=x"),
      (2L, "second crawl of that page with plenty of words here", "http://e.com/a"),
      (3L, "a different page entirely with plenty of words here", "http://e.com/b")
    ).toDF("doc_id", "text", "url")
    val out = CorpusPipeline.prepare(docs, "doc_id", "text",
      CorpusPipeline.Config(urlCol = Some("url"), exactDedup = false, nearDedupThreshold = None))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 3L))
  }

  test("chunking mode emits training windows instead of docs") {
    val docs = Seq(
      doc(1, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(docs, "doc_id", "text",
      CorpusPipeline.Config(nearDedupThreshold = None, chunkSize = 5, chunkStride = 5))
    val chunks = out.orderBy("chunk_start")
      .select("chunk_start", "n_chunk_tokens").as[(Long, Long)].collect().toSeq
    assert(chunks === Seq((0L, 5L), (5L, 5L), (10L, 2L)))
  }

  test("string doc ids work; minQualityTokens below 5 actually lowers the floor") {
    val docs = Seq(
      ("doc-b", "three little words"),                      // 3 tokens
      ("doc-a", "three little words"),                      // exact dup, smaller id
      ("doc-c", "two words")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(docs, "doc_id", "text",
      CorpusPipeline.Config(minQualityTokens = 3, nearDedupThreshold = None))
    val ids = out.select("doc_id").as[String].collect().toSet
    // 3-token docs pass the lowered floor; dedup keeps the MIN string id
    assert(ids === Set("doc-a"))
  }

  test("near-dup stage drops planted high-id near-copies") {
    val base = (1L to 30L).map(i =>
      doc(i, s"document number $i carries some shared vocabulary plus unique token u$i and more filler words"))
    val copies = base.take(5).map { case (i, t) => (i + 1000L, t + " extra") }
    val docs = (base ++ copies).toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(docs, "doc_id", "text",
      CorpusPipeline.Config(nearDedupThreshold = Some(0.7)))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.filter(_ > 1000L).isEmpty)   // all planted copies gone
    assert((1L to 30L).forall(ids.contains)) // every original survives
  }

  test("auditDrops tags each dropped doc with the stage that dropped it") {
    val base = (1L to 30L).map(i =>
      doc(i, s"document number $i carries some shared vocabulary plus unique token u$i and more filler words"))
    val docs = (base ++ Seq(
      doc(1001, base.head._2),   // exact dup of doc 1
      doc(1002, base(1)._2 + " extra"), // near-dup of doc 2
      doc(1003, "x")             // quality junk
    )).toDF("doc_id", "text")
    val got = CorpusPipeline.auditDrops(docs, "doc_id", "text",
        CorpusPipeline.Config(nearDedupThreshold = Some(0.7)))
      .as[(Long, String)].collect().toMap
    assert(got(1001L) === "exact_dedup")
    assert(got(1002L) === "near_dedup")
    assert(got(1003L) === "quality")
    assert(got.keySet === Set(1001L, 1002L, 1003L)) // originals all survive
  }

  test("auditDrops skips disabled stages entirely") {
    val docs = Seq(
      doc(1, "the quick brown fox jumps over the lazy dog today"),
      doc(2, "the quick brown fox jumps over the lazy dog today"),
      doc(3, "tiny")).toDF("doc_id", "text")
    val got = CorpusPipeline.auditDrops(docs, "doc_id", "text",
        CorpusPipeline.Config(nearDedupThreshold = None))
      .as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "exact_dedup", 3L -> "quality"))
  }

  test("canonicalize=true collapses byte-level variants in exact dedup") {
    val base = "the quick brown fox jumps over the lazy café dog"
    val variant = "the quick  brown fox jumps over the lazy café dog" // extra space + decomposed
    val docs = Seq(doc(1, base), doc(2, variant)).toDF("doc_id", "text")
    val without = CorpusPipeline.prepare(docs, "doc_id", "text",
      CorpusPipeline.Config(nearDedupThreshold = None))
    assert(without.count() === 2) // byte-distinct -> both survive
    val withCanon = CorpusPipeline.prepare(docs, "doc_id", "text",
      CorpusPipeline.Config(canonicalize = true, nearDedupThreshold = None))
      .select("doc_id").as[Long].collect().toSeq
    assert(withCanon === Seq(1L)) // canonical forms equal -> min id wins
    val audited = CorpusPipeline.auditDrops(docs, "doc_id", "text",
      CorpusPipeline.Config(canonicalize = true, nearDedupThreshold = None))
      .as[(Long, String)].collect().toSeq
    assert(audited === Seq((2L, "exact_dedup")))
  }

  test("observe=true surfaces per-stage row counts on the caller's action") {
    val docs = Seq(
      doc(1, "the quick brown fox jumps over the lazy dog today"),
      doc(2, "an entirely different document about spark query engines"),
      doc(3, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
      doc(4, "tiny")                                               // quality junk
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(docs, "doc_id", "text",
      CorpusPipeline.Config(nearDedupThreshold = None, observe = true,
        observePrefix = "cp_spec_"))
    // collect() executes out's OWN QueryExecution — count() would spawn
    // a new one and leave out.queryExecution.observedMetrics empty
    assert(out.collect().length === 2)
    val metrics = out.queryExecution.observedMetrics
    assert(metrics("cp_spec_quality").getAs[Long]("rows") === 3L)
    assert(metrics("cp_spec_exact_dedup").getAs[Long]("rows") === 2L)
  }
}
