package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted LSH near-dup index: equivalence with the batch operator,
  * ingest growth, bucket partition pruning on the plan, and report
  * determinism. */
class LshIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def docs = Tables.documents(spark, TestSpark.sf)
    .select(col("doc_id"), col("text"))

  test("probe drops exactly the ids dropNearDuplicatesAgainst would " +
      "(same signatures, same threshold), and the report is " +
      "partitioning-invariant") {
    val store = java.nio.file.Files.createTempDirectory("lsh_eq_").toString
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    LshIndex.build(corpus, store)
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .unionByName(corpus.filter(col("doc_id") < 40)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" near duplicate suffix")).as("text")))
    val report = LshIndex.probe(spark, store, batch, thresholdMilli = 500L)
    val droppedIds = report.select("id").collect().map(_.getLong(0)).toSet
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val corpusSigs = ApproxDedup.signatureTable(corpus, col("doc_id"), toks)
    val survived = ApproxDedup.dropNearDuplicatesAgainst(batch,
        col("doc_id"), toks, corpusSigs, threshold = 0.5,
        maxBucket = Int.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(droppedIds === (batchIds -- survived),
      "store probe and the batch operator disagree on the dropped set")
    assert(droppedIds.nonEmpty, "fixture planted no near-dups")
    val again = LshIndex.probe(spark, store, batch.repartition(7),
        thresholdMilli = 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(again.toSeq === report.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq,
      "report depends on partitioning")
  }

  test("the ingest gate grows the store: near-dups of a previous " +
      "batch's SURVIVORS drop on the next ingest; re-ingesting the " +
      "same docs drops them all") {
    val store = java.nio.file.Files.createTempDirectory("lsh_grow_").toString
    LshIndex.build(docs.filter(col("doc_id") % 3 =!= 0), store)
    val fresh = docs.filter(col("doc_id") % 3 === 0)
    val r1 = LshIndex.ingestDedup(spark, store, fresh)
    // the synthetic corpus carries NATURAL near-dups (q22 finds 25
    // real pairs at est >= 0.5), so some fresh docs may legitimately
    // drop here; the growth property binds on the SURVIVORS
    val dropped1 = r1.select("id").collect().map(_.getLong(0)).toSet
    val survivors = fresh.filter(!col("doc_id").isin(
      dropped1.map(Long.box).toSeq: _*))
    assert(survivors.count() > 0, "nothing survived phase 1")
    // near-identical copies of the batch-1 SURVIVORS now drop —
    // their originals entered the store only via the ingest gate
    val copies = survivors.filter(col("doc_id") < 90)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(col("text"), lit(" near duplicate suffix")).as("text"))
    val nCopies = copies.count()
    assert(nCopies > 0, "fixture produced no copies")
    val r2 = LshIndex.ingestDedup(spark, store, copies)
    val dropped2 = r2.select("id").collect().map(_.getLong(0)).toSet
    assert(dropped2.size.toLong === nCopies,
      s"only ${dropped2.size} of $nCopies survivor near-dups dropped")
    // exact re-probe of the survivors matches each at est 1000
    val r3 = LshIndex.probe(spark, store, survivors,
      thresholdMilli = 1000L)
    assert(r3.count() === survivors.count(),
      "an indexed survivor did not exact-match itself")
  }

  test("the bands scan reads ONLY the probe's buckets (partition " +
      "filter on the plan)") {
    val store = java.nio.file.Files.createTempDirectory("lsh_plan_").toString
    LshIndex.build(docs, store, buckets = 64)
    val one = docs.filter(col("doc_id") === 3)
    val df = LshIndex.probe(spark, store, one)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val bandScans = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("bands")))
    assert(bandScans.nonEmpty, "no bands/ scan in the plan")
    bandScans.foreach { sc =>
      assert(sc.partitionFilters.exists(
          _.references.exists(_.name == "bucket")),
        "bucket must be a partition filter")
      assert(sc.selectedPartitions.partitionCount <= 8,
        "one doc probes at most its 8 band buckets, got " +
          s"${sc.selectedPartitions.partitionCount}")
    }
  }
}
