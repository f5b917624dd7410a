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
}
