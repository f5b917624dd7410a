package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF index: build/load split over the batch ivfTopK —
  * frozen centroids, cell-partitioned corpus, probe-only reads. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def emb = Tables.embeddings(spark, TestSpark.sf)

  private lazy val idx: String = {
    val out = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    IvfIndex.build(emb, out, dim = 64)
    out
  }

  test("persisted query matches the batch operator bit-for-bit") {
    val queries = emb.filter(col("vec_id") < 10)
    val batch = Similarity.ivfTopK(emb, queries, k = 5, dim = 64, nprobe = 8)
      .select("query_id", "rank", "corpus_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val persisted = IvfIndex.query(spark, idx, queries, k = 5, nprobe = 8)
      .select("query_id", "rank", "corpus_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(persisted === batch) // includes exact double equality on cosine
  }

  test("query scan reads only the probed cell partitions (pruning on the plan)") {
    val queries = emb.filter(col("vec_id") === 3)
    val df = IvfIndex.query(spark, idx, queries, k = 5, nprobe = 2)
    // unwrap AQE (AdaptiveSparkPlanExec presents as a leaf) and find
    // the cells/ file scan: the cell filter must be a PARTITION
    // filter — pruning at planning, non-probed inverted lists never
    // opened
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val cellScans = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("cells")))
    assert(cellScans.nonEmpty, "no cells/ file scan in the plan")
    val s = cellScans.head
    assert(s.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"cell must be a partition filter, got ${s.partitionFilters}")
    assert(s.selectedPartitions.partitionCount <= 2,
      s"nprobe=2 must select <=2 cell partitions, got ${s.selectedPartitions.partitionCount}")
  }

  test("incremental add routes to frozen cells; old answers unchanged") {
    val out = java.nio.file.Files.createTempDirectory("ivf_add_").toString
    // build from the first half, add the second half incrementally
    IvfIndex.build(emb.filter(col("vec_id") % 2 === 0), out, dim = 64)
    val queries = emb.filter(col("vec_id") < 10)
    val before = IvfIndex.query(spark, out, queries, k = 3, nprobe = 8)
      .select("query_id", "rank", "corpus_id").collect().toSet
    IvfIndex.add(spark, out, emb.filter(col("vec_id") % 2 === 1))
    val after = IvfIndex.query(spark, out, queries, k = 50, nprobe = 8)
    // added vectors are now retrievable...
    assert(after.filter(col("corpus_id") % 2 === 1).count() > 0)
    // ...and an even-only rerun of the same top-3 is unchanged (the
    // frozen coarse quantizer never reassigns existing vectors)
    val evenAfter = after.filter(col("corpus_id") % 2 === 0)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("corpus_id").asc)))
      .filter(col("rank") <= 3)
      .select("query_id", "rank", "corpus_id").collect().toSet
    assert(evenAfter === before)
  }

  test("files per cell stay bounded across 12 incremental adds; answers unchanged") {
    val out = java.nio.file.Files.createTempDirectory("ivf_compact_").toString
    IvfIndex.build(emb.filter(col("vec_id") < 100), out, dim = 64)
    val queries = emb.filter(col("vec_id") < 5)
    def answer() = IvfIndex.query(spark, out, queries, k = 5, nprobe = 8)
      .select("query_id", "rank", "corpus_id").collect().toSet
    val root = new org.apache.hadoop.fs.Path(s"$out/cells")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def maxFilesPerCell(): Int = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .map(d => fs.listStatus(d.getPath)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))).max
    val budget = 4
    var prev = answer()
    (0 until 12).foreach { i =>
      val batch = emb.filter(col("vec_id") >= 100 + i * 33 &&
        col("vec_id") < 100 + (i + 1) * 33)
      IvfIndex.add(spark, out, batch, maxFilesPerCell = budget)
      // bound holds at EVERY observation point, not just the end —
      // compaction folds over-budget cells right after each append.
      // A single append can leave at most `shuffle partitions` files
      // per cell before the fold, so post-fold the pile is <= budget
      // OR freshly folded to its byte-target count (1 here).
      assert(maxFilesPerCell() <= budget,
        s"add #$i left ${maxFilesPerCell()} files in a cell (budget $budget)")
      val now = answer()
      // adds only ever EXTEND the candidate set; the top-5 over old
      // queries may change only by genuinely closer new vectors —
      // re-querying twice around a pure compaction must be identical
      val again = answer()
      assert(now === again, "compaction changed query answers")
      prev = now
    }
    assert(prev.nonEmpty)
  }

  test("remove_ids tombstones immediately; compact of a touched cell " +
      "reclaims; re-rank matches a fresh build over the survivors") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("ivf_del_").toString
    IvfIndex.build(emb, out, dim = 64)
    val queries = emb.filter(col("vec_id") < 5)
    val victims = IvfIndex.query(spark, out, queries, k = 3, nprobe = 8)
      .filter(col("rank") === 1).select("corpus_id")
      .collect().map(_.getLong(0)).distinct.toSeq
    IvfIndex.removeIds(spark, out, victims.toDF("vec_id"))
    val after = IvfIndex.query(spark, out, queries, k = 3, nprobe = 8)
      .select("query_id", "rank", "corpus_id").collect()
    assert(after.forall(r => !victims.contains(r.getLong(2))))
    // ranks recompute over survivors: every query still fills k slots
    // (corpus >> k) and rank sequences stay 1..k
    assert(after.groupBy(_.getLong(0)).values
      .forall(_.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3)))
    // purge reclaims physically and is answer-neutral
    IvfIndex.purgeDeletes(spark, out)
    assert(spark.read.parquet(s"$out/cells")
      .filter(col("corpus_id").isin(victims.map(Long.box): _*)).count() === 0)
    val afterPurge = IvfIndex.query(spark, out, queries, k = 3, nprobe = 8)
      .select("query_id", "rank", "corpus_id").collect()
    assert(afterPurge.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      === after.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq)
  }

  test("filtered search (IDSelector): ranking restricts to the allowed " +
      "set; scarce filters return fewer than k, never a disallowed id") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("ivf_filter_").toString
    IvfIndex.build(emb, out, dim = 64)
    val queries = emb.filter(col("vec_id") < 5)
    val allowed = emb.filter(col("label").isin(1, 2, 3)).select("vec_id")
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    val got = IvfIndex.queryFiltered(spark, out, queries, k = 5,
        allowed = allowed, nprobe = 8)
      .select("query_id", "rank", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.forall(t => allowedSet.contains(t._3)),
      "a disallowed id surfaced from filtered search")
    // parity: the unfiltered ranking restricted post-hoc to allowed
    // ids and re-ranked must equal the filtered search (same cosines,
    // same tie-break) — checked with a generous unfiltered k
    val unfiltered = IvfIndex.query(spark, out, queries, k = 1000, nprobe = 8)
      .select("query_id", "rank", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)) // collect() order is not rank order
    val expected = unfiltered.filter(t => allowedSet.contains(t._3))
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy(_._2).map(_._3).take(5).toSeq
          .zipWithIndex.map { case (c, i) => (q, i + 1, c) }
      }.sortBy(t => (t._1, t._2))
    assert(got.sortBy(t => (t._1, t._2)).toSeq === expected)
    // a scarce filter (single id) yields exactly <=1 row per query
    val scarce = IvfIndex.queryFiltered(spark, out, queries, k = 5,
        allowed = Seq(42L).toDF("vec_id"), nprobe = 8)
      .select("query_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(scarce.forall(_._2 == 42L))
    assert(scarce.groupBy(_._1).values.forall(_.length == 1))
    // PLAN LOCK: the allowed-id semi-join must not defeat probe
    // pruning — the cells scan under the filtered query still reads
    // only the probed partitions
    val planDf = IvfIndex.queryFiltered(spark, out,
      emb.filter(col("vec_id") === 3), k = 5, allowed = allowed, nprobe = 2)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val cellScans = scans(planDf.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("cells")))
    assert(cellScans.nonEmpty, "no cells/ scan in the filtered plan")
    val sc0 = cellScans.head
    assert(sc0.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"probe pruning lost under the filter: ${sc0.partitionFilters}")
    assert(sc0.selectedPartitions.partitionCount <= 2,
      s"nprobe=2 must select <=2 partitions under the filter, got " +
        s"${sc0.selectedPartitions.partitionCount}")
  }

  test("purgeDeletes rewrites a MULTI-cell touched set in a constant " +
      "number of jobs (one batched read-filter-write, not one job per cell)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("ivf_purgejobs_").toString
    IvfIndex.build(emb, out, dim = 64)
    // every 3rd id: the victims land across most of the 16 cells
    val victims = emb.filter(col("vec_id") % 3 === 0).select("vec_id")
    IvfIndex.removeIds(spark, out, victims)
    val touchedCells = spark.read.parquet(s"$out/cells")
      .join(victims.withColumnRenamed("vec_id", "corpus_id"),
        Seq("corpus_id"), "left_semi")
      .select("cell").distinct().count()
    assert(touchedCells >= 8, s"fixture too weak: only $touchedCells cells touched")
    val sc = spark.sparkContext
    val group = s"purge-jobs-${System.nanoTime()}"
    sc.setJobGroup(group, "purge job-count lock", interruptOnCancel = false)
    val purged = try IvfIndex.purgeDeletes(spark, out)
    finally sc.clearJobGroup()
    assert(purged === touchedCells)
    // job budget: touched-cell discovery + the single batched rewrite,
    // each costing a constant handful of jobs (parquet schema reads,
    // AQE stage jobs) — must NOT grow with the touched-cell count
    // (per-cell serialization here would be >= touched+2 = 18 jobs)
    val jobs = sc.statusTracker.getJobIdsForGroup(group).length
    assert(jobs <= 10 && jobs >= 1,
      s"purge of $touchedCells cells ran $jobs jobs — per-cell serialization?")
    // correctness unchanged: victims gone, survivors intact, tombstones cleared
    assert(spark.read.parquet(s"$out/cells")
      .join(victims.withColumnRenamed("vec_id", "corpus_id"),
        Seq("corpus_id"), "left_semi").count() === 0)
    assert(spark.read.parquet(s"$out/cells").count() ===
      emb.count() - victims.count())
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/deletes")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/.purge_tmp_cells")))
  }

  test("retrain: drift drops on a planted-shift corpus, answers match a " +
      "fresh build over the live corpus, old generation stays untouched " +
      "(serving until the _gen_N swap), deletes fold in") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("ivf_retrain_").toString
    val half = emb.filter(col("vec_id") < 250)
    // the distribution MOVES: the second half arrives displaced on dim 0
    val shifted = emb.filter(col("vec_id") >= 250).select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        (x, i) => x + when(i === 0, lit(0.5)).otherwise(lit(0.0)))
        .as("embedding"))
    IvfIndex.build(half, out, dim = 64)
    IvfIndex.add(spark, out, shifted)
    val victims = Seq(7L, 301L)
    IvfIndex.removeIds(spark, out, victims.toDF("vec_id"))
    def recentMeanMilli(): Double = {
      val r = IvfIndex.assignmentDrift(spark, out, shifted)
        .filter(col("cohort") === "recent").collect().head
      r.getLong(2).toDouble / r.getLong(1)
    }
    val driftBefore = recentMeanMilli()
    // freeze the old generation's physical state before the swap
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listing(dir: String): Set[(String, Long)] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      fs.listStatus(p).flatMap { d =>
        if (d.isDirectory) fs.listStatus(d.getPath)
          .map(f => (s"${d.getPath.getName}/${f.getPath.getName}", f.getLen))
        else Array((d.getPath.getName, d.getLen))
      }.toSet
    }
    val oldCells = listing(s"$out/cells")
    val gen = IvfIndex.retrain(spark, out)
    assert(gen === 1)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$out/_gen_1")))
    // the old generation's dirs are byte-identical — an in-flight query
    // that resolved its paths before the commit keeps serving them
    assert(listing(s"$out/cells") === oldCells,
      "retrain touched the old generation's files")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$out/g1/cells")))
    // the retrain trigger closes: centroids now describe the shifted
    // data, the recent cohort's mean assignment distance drops
    val driftAfter = recentMeanMilli()
    assert(driftAfter < driftBefore,
      s"drift did not drop after retrain: $driftBefore -> $driftAfter")
    // retrain-then-query == build-from-scratch-then-query over the SAME
    // live corpus (store + adds - deletes), cosines included
    val live = half.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .unionByName(shifted)
      .filter(!col("vec_id").isin(victims.map(Long.box): _*))
    val fresh = java.nio.file.Files.createTempDirectory("ivf_fresh_").toString
    IvfIndex.build(live, fresh, dim = 64)
    val queries = emb.filter(col("vec_id") < 10)
    def answers(o: String) = IvfIndex.query(spark, o, queries, k = 5, nprobe = 8)
      .select("query_id", "rank", "corpus_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(answers(out) === answers(fresh))
    // tombstones folded in physically and the tombstone dir cleared
    assert(spark.read.parquet(s"$out/g1/cells")
      .filter(col("corpus_id").isin(victims.map(Long.box): _*)).count() === 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/deletes")))
    // post-retrain adds land in the NEW generation and serve
    IvfIndex.add(spark, out,
      emb.filter(col("vec_id") === 0)
        .select((col("vec_id") + 50000L).as("vec_id"), col("embedding")))
    assert(spark.read.parquet(s"$out/g1/cells")
      .filter(col("corpus_id") === 50000L).count() === 1)
    assert(IvfIndex.query(spark, out, queries, k = 500, nprobe = 16)
      .filter(col("corpus_id") === 50000L).count() > 0)
    // a SECOND retrain (over the live corpus that now includes the
    // post-retrain add) supersedes g1; reclaim drops g1 (marker + dir)
    // while answers stay the current generation's
    assert(IvfIndex.retrain(spark, out) === 2)
    val afterG2 = answers(out)
    assert(IvfIndex.reclaimGenerations(spark, out, retain = 2) === 0,
      "retain window must protect the newest generations")
    assert(IvfIndex.reclaimGenerations(spark, out, retain = 1) === 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/_gen_1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/g1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$out/_gen_2")))
    assert(answers(out) === afterG2, "reclaim changed resolution")
  }

  test("a crash mid-purge-swap loses no rows: the rerun completes the " +
      "pending swap instead of deleting the only copy in the tmp dir") {
    val out = java.nio.file.Files.createTempDirectory("ivf_crash_purge_").toString
    val corpus = emb.filter(col("vec_id") < 600)
    IvfIndex.build(corpus, out, dim = 64)
    val victims = corpus.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("corpus_id"))
    IvfIndex.removeIds(spark, out, victims)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fabricate the post-crash state a mid-swap failure leaves: one
    // touched cell's purged rewrite sits COMPLETE (with _SUCCESS) in
    // the tmp dir, and its live dir was already moved aside (the trash
    // copy died with the crashed process's cleanup never running)
    val all = spark.read.parquet(s"$out/cells")
    val crashCell = all.join(victims, Seq("corpus_id"), "left_semi")
      .select("cell").orderBy("cell").first().getInt(0)
    val tmp = s"$out/.purge_tmp_cells"
    all.filter(col("cell") === crashCell)
      .join(victims, Seq("corpus_id"), "left_anti")
      .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/cells/cell=$crashCell"), true)
    // the rerun (tombstones still present) must restore the crashed
    // cell from tmp and purge the rest — zero rows lost
    IvfIndex.purgeDeletes(spark, out)
    val after = spark.read.parquet(s"$out/cells")
    assert(after.join(victims, Seq("corpus_id"), "left_semi").count() === 0)
    assert(after.count() === corpus.count() -
      victims.select("corpus_id").distinct().count())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tmp)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/.purge_trash_cells")))
  }

  test("a crash mid-compact-swap is completed by the next mutation entry") {
    val out = java.nio.file.Files.createTempDirectory("ivf_crash_compact_").toString
    val corpus = emb.filter(col("vec_id") < 300)
    IvfIndex.build(corpus, out, dim = 64)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = spark.read.parquet(s"$out/cells")
    val crashCell = all.select("cell").orderBy("cell").first().getInt(0)
    // the compacted rewrite landed whole in tmp; the original dir was
    // renamed aside and lost with the crash (compact tmp is NOT
    // cell-partitioned — it holds one cell's files directly)
    all.filter(col("cell") === crashCell).drop("cell").coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$out/.compact_tmp_cells_cell=$crashCell")
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/cells/cell=$crashCell"), true)
    IvfIndex.compact(spark, out) // recovery runs at the mutation entry
    assert(spark.read.parquet(s"$out/cells").count() === corpus.count())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$out/.compact_tmp_cells_cell=$crashCell")))
  }

  test("the tombstone warning fires past the configured bound on the " +
      "IVF read path") {
    val store = java.nio.file.Files.createTempDirectory("ivf_tomb_").toString
    IvfIndex.build(emb.filter(col("vec_id") < 40), store, dim = 64, nlist = 4)
    IvfIndex.removeIds(spark, store,
      emb.filter(col("vec_id") < 5).select("vec_id"))
    val queries = emb.filter(col("vec_id") < 3)
    try {
      spark.conf.set(AnnTombstones.ThresholdConf, "2")
      AnnTombstones.reset()
      IvfIndex.query(spark, store, queries, k = 3, nprobe = 4).collect()
      val w = AnnTombstones.lastWarning
      assert(w.isDefined, "no warning past the bound")
      assert(w.get.contains("ivf") && w.get.contains("purgeDeletes"))
    } finally {
      spark.conf.unset(AnnTombstones.ThresholdConf)
      AnnTombstones.reset()
    }
  }

  test("the tombstone count the warning reads comes off the marker " +
      "cache (maintained at delete/purge time), never a per-query " +
      "count() job; a malformed threshold conf falls back to the " +
      "default instead of failing the query") {
    val store = java.nio.file.Files.createTempDirectory("ivf_tombc_").toString
    IvfIndex.build(emb.filter(col("vec_id") < 40), store, dim = 64, nlist = 4)
    IvfIndex.removeIds(spark, store,
      emb.filter(col("vec_id") < 5).select("vec_id"))
    assert(AnnTombstones.cachedCount(spark, store) === Some(5L),
      "removeIds did not maintain the marker cache")
    val queries = emb.filter(col("vec_id") < 3)
    try {
      // prove the READ comes from the cache: plant an inflated value —
      // a count() of the 5 physical rows could never cross this bound
      graft.util.FsIo.writeSwapped(spark.sparkContext.hadoopConfiguration,
        s"$store/_tombcount", "999999999")
      AnnTombstones.reset()
      IvfIndex.query(spark, store, queries, k = 3, nprobe = 4).collect()
      assert(AnnTombstones.lastWarning.exists(_.contains("999999999")),
        "the query path counted instead of reading the cache")
      // malformed conf: the query must still answer (Try + default)
      spark.conf.set(AnnTombstones.ThresholdConf, "not-a-number")
      AnnTombstones.reset()
      val n = IvfIndex.query(spark, store, queries, k = 3, nprobe = 4).count()
      assert(n > 0, "malformed threshold conf broke the query")
    } finally {
      spark.conf.unset(AnnTombstones.ThresholdConf)
      AnnTombstones.reset()
    }
    // purge clears the cache with the tombstones
    IvfIndex.purgeDeletes(spark, store)
    assert(AnnTombstones.cachedCount(spark, store).isEmpty,
      "purge left a stale cached count")
  }

  test("a PINNED generation survives retrain+reclaim and reproduces " +
      "its pre-mutation answers bit-for-bit; physical rewrites of the " +
      "pinned generation DEFER; release re-opens reclaim") {
    val out = java.nio.file.Files.createTempDirectory("ivf_pin_").toString
    val base = emb.filter(col("vec_id") < 60)
    IvfIndex.build(base, out, dim = 64, nlist = 4)
    IvfIndex.retrain(spark, out) // gen 1 — a reclaimable, pinnable gen
    IvfIndex.removeIds(spark, out,
      base.filter(col("vec_id") === 7).select("vec_id"))
    val queries = emb.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sorted.toSeq
    val want = rows(IvfIndex.query(spark, out, queries, k = 5, nprobe = 4))
    val pin = IvfIndex.pinGeneration(spark, out)
    assert(pin === 1)
    // mutations: adds APPEND new files (never in the pin's list);
    // purge DEFERS while its generation is pinned (tombstone dir
    // survives, logically still applied); retrain rolls to gen 2 and
    // reclaim would drop gen 1 — the pin holds it
    IvfIndex.add(spark, out, emb.filter(col("vec_id") >= 60 &&
      col("vec_id") < 80))
    IvfIndex.removeIds(spark, out,
      base.filter(col("vec_id") === 9).select("vec_id"))
    assert(IvfIndex.purgeDeletes(spark, out) === 0, "purge did not defer")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$out/deletes")),
      "deferred purge must leave the tombstones")
    IvfIndex.retrain(spark, out) // gen 2 (purges tombstones into it)
    IvfIndex.retrain(spark, out) // gen 3
    assert(IvfIndex.reclaimGenerations(spark, out, retain = 1) === 1,
      "only the unpinned shadowed generation reclaims")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$out/g1")),
      "reclaim deleted a pinned generation")
    val pinned = rows(IvfIndex.queryPinned(spark, out, pin, queries,
      k = 5, nprobe = 4))
    assert(pinned === want, "pinned answers drifted under mutations")
    // live view reflects the mutations (id 9 gone via retrain-fold)
    val live = rows(IvfIndex.query(spark, out, queries, k = 5, nprobe = 4))
    assert(!live.exists(_._3 == 9L))
    IvfIndex.releaseGeneration(spark, out, pin)
    assert(IvfIndex.reclaimGenerations(spark, out, retain = 1) === 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/g1")))
    assert(rows(IvfIndex.query(spark, out, queries, k = 5, nprobe = 4))
      === live)
  }
}
