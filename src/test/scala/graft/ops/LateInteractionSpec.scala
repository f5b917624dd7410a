package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ColBERT MaxSim: hand-computed scores, candidate-bounded fetch, and
  * the re-rank surfacing a token-level match single-vector cosine
  * buries. */
class LateInteractionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-computed MaxSim: per query token the max doc-token " +
      "cosine (integer milli), summed; ranks by (score desc, id)") {
    import spark.implicits._
    // doc 1: tokens along x and y; doc 2: tokens along y and z
    val docTokens = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0)), (2L, Seq(0.0, 0.0, 1.0))
    ).toDF("doc_id", "tvec")
    // query 9: one token along x, one along z
    val queryTokens = Seq(
      (9L, 0, Seq(1.0, 0.0, 0.0)), (9L, 1, Seq(0.0, 0.0, 1.0))
    ).toDF("query_id", "qpos", "qvec")
    val cand = Seq((9L, 1L), (9L, 2L)).toDF("query_id", "corpus_id")
    val got = LateInteraction.maxSimRerank(cand, docTokens, queryTokens, 2)
      .orderBy("rank")
      .select("rank", "corpus_id", "maxsim_milli")
      .as[(Int, Long, Long)].collect().toSeq
    // doc 1: qtoken x -> max(1, 0) = 1000; qtoken z -> max(0, 0) = 0 -> 1000
    // doc 2: qtoken x -> 0; qtoken z -> max(0, 1) = 1000 -> 1000
    // tie at 1000 -> corpus_id ascending
    assert(got === Seq((1, 1L, 1000L), (2, 2L, 1000L)))
  }

  test("a token-level match outranks a diffuse candidate, and only " +
      "candidate ids are scored (absent ids never surface)") {
    import spark.implicits._
    val docTokens = Seq(
      // doc 1 has an exact token hit for BOTH query tokens
      (1L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0)),
      // doc 2 is diffuse: equal small cosine to both
      (2L, Seq(0.5, 0.5, 0.5, 0.5)),
      // doc 3 would win but is NOT a candidate
      (3L, Seq(1.0, 0.0, 0.0, 0.0)), (3L, Seq(0.0, 1.0, 0.0, 0.0))
    ).toDF("doc_id", "tvec")
    val queryTokens = Seq(
      (7L, 0, Seq(1.0, 0.0, 0.0, 0.0)), (7L, 1, Seq(0.0, 1.0, 0.0, 0.0))
    ).toDF("query_id", "qpos", "qvec")
    val cand = Seq((7L, 1L), (7L, 2L)).toDF("query_id", "corpus_id")
    val got = LateInteraction.maxSimRerank(cand, docTokens, queryTokens, 3)
      .select("rank", "corpus_id").as[(Int, Long)].collect().toSeq.sorted
    assert(got === Seq((1, 1L), (2, 2L)))
  }

  private def tokens(base: org.apache.spark.sql.DataFrame,
                     idName: String, posName: String, vecName: String,
                     positions: Seq[Int], stride: Int) = {
    def rotated(step: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(63)),
        j => element_at(col("e"), (pmod(j + step, lit(64)) + 1).cast("int")))
    base.select(col("vec_id").as(idName),
        col("embedding").cast("array<double>").as("e"))
      .withColumn(posName, explode(array(positions.map(lit): _*)))
      .select(col(idName), col(posName),
        rotated(col(posName) * stride).as(vecName))
  }

  test("token store: per-token probe scan is cell-partition-pruned, " +
      "the MaxSim fetch is bucket-pruned, and full probe + " +
      "corpus-covering tokenK equals MaxSim over ALL docs (the store " +
      "nominates everything the flat form would)") {
    val emb = graft.Tables.embeddings(spark, graft.TestSpark.sf)
      .filter(col("vec_id") < 120)
    val store = java.nio.file.Files.createTempDirectory("tokstore_").toString
    LateInteraction.buildTokenStore(
      tokens(emb, "doc_id", "tpos", "tvec", Seq(0, 1, 2), 7),
      store, dim = 64, nlist = 4, posStride = 4, buckets = 4)
    val queryTokens = tokens(emb.filter(col("vec_id") < 3),
      "query_id", "qpos", "qvec", Seq(0, 1), 11)
    // EXACTNESS at full coverage: nprobe = nlist and tokenK >= token
    // rows make the candidate set every doc — MaxSim over all docs
    val got = LateInteraction.queryTokenStore(spark, store, queryTokens,
        k = 5, tokenK = 400, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    import spark.implicits._
    val allCand = emb.select(col("vec_id")).as[Long].collect()
      .flatMap(c => (0L until 3L).map(q => (q, c))).toSeq
      .toDF("query_id", "corpus_id")
    val want = LateInteraction.maxSimRerank(allCand,
        tokens(emb, "doc_id", "tpos", "tvec", Seq(0, 1, 2), 7),
        queryTokens, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    assert(got === want, "full-coverage store diverged from flat MaxSim")
    // plan lock at the operating point: both scans partition-pruned
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val oneQ = tokens(emb.filter(col("vec_id") === 3), "query_id",
      "qpos", "qvec", Seq(0), 11)
    // the candidate stage is collected inside queryTokenStore, so its
    // plan is asserted on the lazy handle
    val candDf = LateInteraction.tokenCandidates(spark, store, oneQ,
      tokenK = 4, nprobe = 1)
    val cellScans = scans(candDf.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("cells")))
    assert(cellScans.nonEmpty, "no cells/ scan in the candidate plan")
    cellScans.foreach { sc =>
      assert(sc.partitionFilters.exists(
        _.references.exists(_.name == "cell")), "cells/ not cell-pruned")
      assert(sc.selectedPartitions.partitionCount <= 1,
        "nprobe=1 over one query token must read one cell")
    }
    val df = LateInteraction.queryTokenStore(spark, store, oneQ,
      k = 3, tokenK = 4, nprobe = 1)
    val fetchScans = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("doctokens")))
    assert(fetchScans.nonEmpty, "no doctokens/ scan in the fetch plan")
    fetchScans.foreach { sc =>
      assert(sc.partitionFilters.exists(
        _.references.exists(_.name == "bucket")),
        "doctokens/ not bucket-pruned")
    }
  }
}
