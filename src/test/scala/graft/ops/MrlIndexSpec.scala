package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The store-served Matryoshka tier: probed-cell partition pruning on
  * BOTH stages' plans, exactness at full probe + corpus rerank,
  * agreement with the flat operator at full coverage, recall at the
  * operating point, and the family lifecycle (frozen prefix-space
  * add, tombstones, purge over both subdirs). */
class MrlIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def emb = Tables.embeddings(spark, TestSpark.sf)

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "rank", "corpus_id")
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    .sorted.toSeq

  test("prefix scan AND sidecar fetch read ONLY probed cell " +
      "partitions (partition filters on both plans)") {
    val store = java.nio.file.Files.createTempDirectory("mrl_plan_").toString
    MrlIndex.build(emb, store, dim = 64, prefixDim = 16, nlist = 8)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val df = MrlIndex.query(spark, store,
      emb.filter(col("vec_id") === 3), k = 3, rerank = 8, nprobe = 2)
    val byDir = scans(df.queryExecution.executedPlan)
      .groupBy(_.relation.location.rootPaths.head.getName)
    Seq("cells", "vectors").foreach { sub =>
      val ss = byDir.getOrElse(sub,
        fail(s"no $sub/ file scan in the plan"))
      ss.foreach { s =>
        assert(s.partitionFilters.exists(
            _.references.exists(_.name == "cell")),
          s"$sub: cell must be a partition filter, got ${s.partitionFilters}")
        assert(s.selectedPartitions.partitionCount <= 2,
          s"$sub: nprobe=2 must select <=2 cell partitions, got " +
            s"${s.selectedPartitions.partitionCount}")
      }
    }
  }

  test("full probe + corpus-wide rerank is EXACT vs brute force, and " +
      "agrees with the flat matryoshkaTopK at matched (rerank, " +
      "prefixDim) when every cell is probed") {
    val store = java.nio.file.Files.createTempDirectory("mrl_full_").toString
    val base = emb.filter(col("vec_id") < 200)
    MrlIndex.build(base, store, dim = 64, prefixDim = 16, nlist = 4)
    val queries = base.filter(col("vec_id") < 5)
    assert(rows(MrlIndex.query(spark, store, queries,
        k = 5, rerank = 300, nprobe = 4)) ===
      rows(Similarity.bruteForceTopK(base, queries, 5)),
      "full-probe corpus-covering rerank diverged from brute force")
    // all cells probed => the candidate pool is the flat operator's
    // (same prefix cosine, same tie-breaks), so answers must match
    assert(rows(MrlIndex.query(spark, store, queries,
        k = 5, rerank = 32, nprobe = 4)) ===
      rows(Similarity.matryoshkaTopK(base, queries, k = 5,
        rerank = 32, prefixDim = 16)),
      "store-served diverged from the flat operator at full probe")
  }

  test("recall at the operating point (nprobe 8/16, rerank 32) holds " +
      "the pinned floor — low in ABSOLUTE terms by data property, not " +
      "store defect: on the isotropic synthetic embeddings a 16/64 " +
      "prefix carries 1/4 of the signal (measured 460 here, 200 at " +
      "sf0.1; real MRL-trained embeddings concentrate energy in the " +
      "prefix — and full-probe == flat is locked exactly above)") {
    val store = java.nio.file.Files.createTempDirectory("mrl_rec_").toString
    MrlIndex.build(emb, store, dim = 64, prefixDim = 16, nlist = 16)
    val queries = emb.filter(col("vec_id") < 10)
    val approx = MrlIndex.query(spark, store, queries,
        k = 5, rerank = 32, nprobe = 8)
      .select("query_id", "corpus_id")
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "corpus_id")
    val recall = RankingEval.annRecallAtK(exact, approx, 5)
      .agg(expr("sum(recall_milli) div count(1)")).head.getLong(0)
    assert(recall >= 300L, s"avg recall_milli $recall under the floor")
  }

  test("lifecycle: frozen prefix-space add keeps old answers; " +
      "tombstones hide immediately; purge reclaims BOTH subdirs and " +
      "preserves answers; a duplicate re-added id collapses to one " +
      "serving copy") {
    val store = java.nio.file.Files.createTempDirectory("mrl_life_").toString
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    MrlIndex.build(evens, store, dim = 64, prefixDim = 16, nlist = 4)
    val queries = emb.filter(col("vec_id") < 6)
    val before = rows(MrlIndex.query(spark, store, queries,
      k = 5, rerank = 16, nprobe = 4))
    MrlIndex.add(spark, store, odds)
    assert(rows(MrlIndex.query(spark, store, queries,
        k = 5, rerank = 16, nprobe = 4,
        allowed = Some(evens.select("vec_id")))) === before,
      "frozen add changed old answers")
    // duplicate re-add: the id serves once (best-copy collapse)
    MrlIndex.add(spark, store, odds.filter(col("vec_id") === 1))
    val served = MrlIndex.query(spark, store, queries,
        k = 5, rerank = 400, nprobe = 4)
      .filter(col("corpus_id") === 1)
    assert(served.groupBy("query_id").count()
        .filter(col("count") > 1).isEmpty,
      "a duplicated id served more than once per query")
    val victims = emb.filter(col("vec_id") % 7 === 1).select("vec_id")
    MrlIndex.removeIds(spark, store, victims)
    val afterDel = rows(MrlIndex.query(spark, store, queries,
      k = 5, rerank = 16, nprobe = 4))
    assert(afterDel.forall(_._3 % 7 != 1), "a tombstoned row surfaced")
    assert(MrlIndex.purgeDeletes(spark, store) > 0)
    assert(rows(MrlIndex.query(spark, store, queries,
      k = 5, rerank = 16, nprobe = 4)) === afterDel,
      "purge changed the served answers")
    Seq("cells", "vectors").foreach { sub =>
      assert(spark.read.parquet(s"$store/$sub")
          .filter(col("corpus_id") % 7 === 1).count() === 0,
        s"purge left tombstoned rows in $sub/")
    }
  }

  test("streamed adds are exactly-once, batch-boundary-invariant, " +
      "commit BOTH subdirs under one marker, and the ingest sink " +
      "DISPATCHES on the MRL marker") {
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    def mk(): String = {
      val o = java.nio.file.Files.createTempDirectory("mrl_stream_").toString
      MrlIndex.build(evens, o, dim = 64, prefixDim = 16, nlist = 4)
      o
    }
    val s1 = mk()
    // through the PUBLIC dispatcher — the marker must route to MRL
    assert(graft.streaming.StreamingIngest.annIngestBatch(spark, s1,
      odds, 0L, "s"))
    val s2 = mk()
    assert(graft.streaming.StreamingIngest.annIngestBatch(spark, s2,
      odds.filter(col("vec_id") < 50), 0L, "s"))
    assert(graft.streaming.StreamingIngest.annIngestBatch(spark, s2,
      odds.filter(col("vec_id") >= 50), 1L, "s"))
    // replay: same (stream, batch) id is a no-op skip on BOTH subdirs
    assert(!graft.streaming.StreamingIngest.annIngestBatch(spark, s2,
      odds.filter(col("vec_id") < 50), 0L, "s"))
    Seq("cells", "vectors").foreach { sub =>
      assert(spark.read.parquet(s"$s1/$sub").count() ===
        spark.read.parquet(s"$s2/$sub").count(), s"$sub row drift")
    }
    val queries = emb.filter(col("vec_id") < 6)
    def served(o: String) = rows(MrlIndex.query(spark, o, queries,
      k = 5, rerank = 16, nprobe = 4))
    assert(served(s1) === served(s2), "batch boundaries changed answers")
    // streamed == batch add (one lineage, same frozen quantizer)
    val s3 = mk()
    MrlIndex.add(spark, s3, odds)
    assert(served(s3) === served(s1), "streamed adds diverged from add")
  }

  test("pinned snapshot: pre-mutation answers bit-for-bit through " +
      "add/remove on BOTH stages; purge DEFERS while pinned (the " +
      "shared IvfIndex pass) and reclaims after release") {
    val store = java.nio.file.Files.createTempDirectory("mrl_pin_").toString
    val evens = emb.filter(col("vec_id") % 2 === 0)
    MrlIndex.build(evens, store, dim = 64, prefixDim = 16, nlist = 4)
    MrlIndex.removeIds(spark, store,
      emb.filter(col("vec_id") % 5 === 2).select("vec_id"))
    val tok = MrlIndex.pinGeneration(spark, store)
    assert(tok === 0)
    val queries = emb.filter(col("vec_id") < 6)
    val atPin = rows(MrlIndex.query(spark, store, queries,
      k = 5, rerank = 32, nprobe = 4))
    MrlIndex.add(spark, store, emb.filter(col("vec_id") % 2 === 1))
    MrlIndex.removeIds(spark, store,
      emb.filter(col("vec_id") % 3 === 0).select("vec_id"))
    assert(MrlIndex.purgeDeletes(spark, store) === 0,
      "purge must defer while its generation is pinned")
    assert(rows(MrlIndex.queryPinned(spark, store, tok, queries,
        k = 5, rerank = 32, nprobe = 4)) === atPin,
      "pinned query diverged from pin-time answers")
    IvfIndex.releaseGeneration(spark, store, tok)
    assert(MrlIndex.purgeDeletes(spark, store) > 0,
      "release must re-enable the purge")
    intercept[IllegalArgumentException] {
      MrlIndex.queryPinned(spark, store, tok, queries,
        k = 5, rerank = 32, nprobe = 4)
    }
  }

  test("prefix-space drift probe: an in-distribution recent batch " +
      "reads near the store mean; a shifted batch reads HIGHER (the " +
      "retrain signal), and tombstoned rows leave the store cohort") {
    val store = java.nio.file.Files.createTempDirectory("mrl_drift_").toString
    MrlIndex.build(emb, store, dim = 64, prefixDim = 16, nlist = 8)
    def report(recent: org.apache.spark.sql.DataFrame) =
      MrlIndex.assignmentDrift(spark, store, recent)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap
    val inDist = report(emb)
    assert(inDist("store")._1 === inDist("recent")._1)
    assert(inDist("store")._2 === inDist("recent")._2,
      "identical cohorts must produce identical sums")
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        (x, i) => x + when(i === 0, lit(0.5)).otherwise(lit(0.0)))
        .as("embedding"))
    val drifted = report(shifted)
    val storeMean = drifted("store")._2.toDouble / drifted("store")._1
    val recentMean = drifted("recent")._2.toDouble / drifted("recent")._1
    assert(recentMean > storeMean,
      s"shifted batch must read above the store mean ($recentMean vs $storeMean)")
    val n0 = report(emb)("store")._1
    MrlIndex.removeIds(spark, store,
      emb.filter(col("vec_id") % 4 === 0).select("vec_id"))
    assert(report(emb)("store")._1 < n0,
      "tombstoned rows must leave the store cohort")
  }
}
