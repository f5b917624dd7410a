package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HNSW DELTA tier (Lucene NRT): exactly-once streamed batches,
  * batch-boundary invariance, upsert shadowing over the graph, folds
  * that are bit-identical to batch adds, and crash recovery of a
  * half-done delta swap. */
class HnswDeltaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def emb = Tables.embeddings(spark, TestSpark.sf)
  private def emb100 = emb.filter(col("vec_id") < 100)
  private def evens = emb100.filter(col("vec_id") % 2 === 0)
  private def odds = emb100.filter(col("vec_id") % 2 === 1)

  private def mkStore(): String = {
    val o = java.nio.file.Files.createTempDirectory("hnsw_delta_").toString
    HnswIndex.build(evens, o, dim = 64)
    o
  }

  private def graphRowsLive(o: String): Set[(Long, Int, Seq[Seq[Long]])] =
    HnswIndex.readGraph(spark, o)
      .select("corpus_id", "level", "nbrs")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[scala.collection.Seq[Long]](2).map(_.toSeq).toSeq)).toSet

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "rank", "corpus_id")
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    .sorted.toSeq

  test("streamed batches are exactly-once and batch-boundary-" +
      "invariant: one batch == two batches; a replayed batch id is " +
      "skipped") {
    val s1 = mkStore()
    assert(HnswIndex.addBatchDelta(spark, s1, odds, 0L, "s"))
    val s2 = mkStore()
    assert(HnswIndex.addBatchDelta(spark, s2,
      odds.filter(col("vec_id") < 50), 0L, "s"))
    assert(HnswIndex.addBatchDelta(spark, s2,
      odds.filter(col("vec_id") >= 50), 1L, "s"))
    // replay: same (stream, batch) id must be a no-op skip
    assert(!HnswIndex.addBatchDelta(spark, s2,
      odds.filter(col("vec_id") < 50), 0L, "s"))
    val queries = emb.filter(col("vec_id") < 6)
    assert(rows(HnswIndex.query(spark, s1, queries, k = 5)) ===
      rows(HnswIndex.query(spark, s2, queries, k = 5)))
    // a second stream reuses batch id 0 without colliding
    assert(HnswIndex.addBatchDelta(spark, s2,
      emb.filter(col("vec_id") === 101), 0L, "other"))
    assert(HnswIndex.readDelta(spark, s2).get
      .filter(col("corpus_id") === 101).count() === 1)
    // COMMIT order wins, not batch id: a relaunch under a fresh
    // checkpoint restarts batch ids at 0 — its re-streamed vector
    // must still supersede the one committed at a higher batch id
    val relaunched = emb.filter(col("vec_id") === 101)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => x * lit(-1.0)).as("embedding"))
    assert(HnswIndex.addBatchDelta(spark, s2, relaunched, 0L, "relaunch"))
    val served = HnswIndex.readDelta(spark, s2).get
      .filter(col("corpus_id") === 101).collect()
    assert(served.length === 1)
    val orig = emb.filter(col("vec_id") === 101)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0)
    assert(served.head.getSeq[Double](1) === orig.map(-_),
      "a relaunched stream's lower batch id shadowed its NEWER commit")
  }

  test("delta ids SHADOW the graph (upsert), a re-streamed id " +
      "replaces its older delta row, and the merged filtered query " +
      "is exact vs brute force over the live corpus") {
    val s = mkStore()
    assert(HnswIndex.addBatchDelta(spark, s, odds, 0L, "u"))
    // re-stream id 1 with a negated vector — replaces, never duplicates
    val shifted = odds.filter(col("vec_id") === 1)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => x * lit(-1.0)).as("embedding"))
    assert(HnswIndex.addBatchDelta(spark, s, shifted, 1L, "u"))
    val delta = HnswIndex.readDelta(spark, s).get
    assert(delta.filter(col("corpus_id") === 1).count() === 1)
    assert(delta.count() === odds.count())
    val queries = emb.filter(col("vec_id") < 6)
    // allowed = every id: acceptance is scarce per shard (~25 <= ef),
    // so both legs are exact — brute force is the ground truth
    val live = emb100.filter(col("vec_id") =!= 1)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .unionByName(shifted)
    val got = rows(HnswIndex.queryFiltered(spark, s, queries, k = 5,
      emb100.select("vec_id"), efSearch = 64))
    val want = rows(Similarity.bruteForceTopK(live, queries, 5))
    assert(got === want, "merged graph+delta diverged from brute force")
    // a direct add supersedes the delta row for the same id
    HnswIndex.add(spark, s, emb.filter(col("vec_id") === 3))
    assert(HnswIndex.readDelta(spark, s).get
      .filter(col("corpus_id") === 3).count() === 0)
    // an id duplicated WITHIN one batch (at-least-once upstream)
    // resolves to ONE row — never two ranks in a top-k
    val dup = odds.filter(col("vec_id") === 21)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    assert(HnswIndex.addBatchDelta(spark, s, dup.unionByName(
      dup.select(col("vec_id"),
        transform(col("embedding"), x => x * lit(0.5)).as("embedding"))),
      2L, "u"))
    assert(HnswIndex.readDelta(spark, s).get
      .filter(col("corpus_id") === 21).count() === 1,
      "within-batch duplicate id surfaced twice from the delta")
    val hits = HnswIndex.queryFiltered(spark, s, queries, k = 5,
        emb100.select("vec_id"), efSearch = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(hits.distinct.length === hits.length,
      "a (query, corpus) pair took two ranks")
  }

  test("foldDelta rebuilds the graph bit-identically to a fresh " +
      "build over (graph ∪ delta) and clears the delta; the fold " +
      "threshold triggers it from the batch path") {
    val s = mkStore()
    assert(HnswIndex.addBatchDelta(spark, s, odds, 0L, "f"))
    assert(HnswIndex.foldDelta(spark, s) === odds.count())
    assert(HnswIndex.readDelta(spark, s).isEmpty)
    val fresh = java.nio.file.Files.createTempDirectory("hnsw_fresh_").toString
    HnswIndex.build(emb100, fresh, dim = 64)
    assert(graphRowsLive(s) === graphRowsLive(fresh),
      "folded graph != fresh build over the union")
    // threshold: a batch that tips the delta over foldThreshold folds
    val s2 = mkStore()
    assert(HnswIndex.addBatchDelta(spark, s2, odds, 0L, "t",
      foldThreshold = 1L))
    assert(HnswIndex.readDelta(spark, s2).isEmpty, "threshold fold skipped")
    assert(graphRowsLive(s2) === graphRowsLive(fresh))
  }

  test("tombstones hide delta rows; purgeDeletes reclaims them from " +
      "the delta too; a half-done delta swap recovers at the next " +
      "mutation entry") {
    val s = mkStore()
    assert(HnswIndex.addBatchDelta(spark, s, odds, 0L, "d"))
    HnswIndex.removeIds(spark, s,
      emb100.filter(col("vec_id") % 10 === 1).select("vec_id"))
    val queries = emb.filter(col("vec_id") < 6)
    val got = rows(HnswIndex.queryFiltered(spark, s, queries, k = 5,
      emb100.select("vec_id"), efSearch = 64))
    assert(got.forall(_._3 % 10 != 1), "a tombstoned delta id surfaced")
    HnswIndex.purgeDeletes(spark, s)
    assert(HnswIndex.readDelta(spark, s).get
      .filter(col("corpus_id") % 10 === 1).count() === 0,
      "purge left tombstoned rows in the delta")
    // crash simulation: delta moved aside mid-swap (tmp complete,
    // live dir missing) — the next mutation completes the swap
    val fs = new org.apache.hadoop.fs.Path(s)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = HnswIndex.readDelta(spark, s).get.count()
    assert(before > 0)
    val dp = new org.apache.hadoop.fs.Path(s"$s/delta")
    val tmp = new org.apache.hadoop.fs.Path(s"$s/.delta_tmp")
    // rebuild the tmp exactly as swapDelta would have (with _SUCCESS)
    spark.read.parquet(dp.toString).write.parquet(tmp.toString)
    fs.delete(dp, true)
    assert(HnswIndex.readDelta(spark, s).isEmpty, "phantom delta")
    HnswIndex.recoverDelta(spark, s)
    assert(HnswIndex.readDelta(spark, s).get.count() === before,
      "recovery lost delta rows")
  }

  test("a crash between add's generation commit and its delta drop " +
      "neither loses the id nor serves the stale delta shadow: the " +
      "committed drop intent masks the ids at read time and the next " +
      "mutation entry completes the drop physically") {
    val s = mkStore()
    // id 1's only live copy is a streamed delta row
    assert(HnswIndex.addBatchDelta(spark, s,
      odds.filter(col("vec_id") === 1), 0L, "c"))
    // the add re-submits id 1 with a NEGATED vector; simulate the
    // crash by running exactly what add() runs up to the commit —
    // intent staged, generation committed — and stopping before the
    // delta drop
    val newVec = emb100.filter(col("vec_id") === 1)
      .select(col("vec_id"), transform(col("embedding")
        .cast("array<double>"), x => x * lit(-1.0)).as("embedding"))
    val fs = new org.apache.hadoop.fs.Path(s)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    Seq(1L).toDF("corpus_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$s/.drop_intent_ids")
    graft.util.FsIo.writeSmallFile(
      spark.sparkContext.hadoopConfiguration, s"$s/_drop_intent", "1")
    HnswIndex.addInternal(spark, s, newVec) // commits _gen_1, then CRASH
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$s/_gen_1")))
    // READ correctness before any mutation runs: the committed intent
    // masks the stale delta row, so the query serves the new vector —
    // exact compare vs a fresh build over the post-add live set
    val queries = emb.filter(col("vec_id") < 6)
    def exact(o: String) = rows(HnswIndex.queryFiltered(spark, o, queries,
      k = 5, emb100.select("vec_id"), efSearch = 512))
    val want = {
      val o = java.nio.file.Files.createTempDirectory("hnsw_want_").toString
      HnswIndex.build(evens.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        .unionByName(newVec), o, dim = 64)
      exact(o)
    }
    assert(exact(s) === want, "crashed add served a stale delta shadow")
    // the next mutation entry completes the drop physically and
    // clears the intent
    assert(HnswIndex.foldDelta(spark, s) === 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$s/_drop_intent")))
    assert(HnswIndex.readDelta(spark, s).isEmpty,
      "completed drop left the stale delta row")
    assert(exact(s) === want)
  }

  test("a crash BEFORE add's generation commit voids the intent: the " +
      "delta row stays the live copy (it was the only one)") {
    val s = mkStore()
    assert(HnswIndex.addBatchDelta(spark, s,
      odds.filter(col("vec_id") === 1), 0L, "v"))
    val queries = emb.filter(col("vec_id") < 6)
    def exact() = rows(HnswIndex.queryFiltered(spark, s, queries,
      k = 5, emb100.select("vec_id"), efSearch = 512))
    val before = exact()
    // intent staged for a generation that never committed
    import spark.implicits._
    Seq(1L).toDF("corpus_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$s/.drop_intent_ids")
    graft.util.FsIo.writeSmallFile(
      spark.sparkContext.hadoopConfiguration, s"$s/_drop_intent", "1")
    assert(exact() === before,
      "an UNcommitted intent masked the only live copy")
    HnswIndex.resolveDropIntent(spark, s)
    val fs = new org.apache.hadoop.fs.Path(s)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$s/_drop_intent")))
    assert(HnswIndex.readDelta(spark, s).get
      .filter(org.apache.spark.sql.functions.col("corpus_id") === 1)
      .count() === 1, "voiding the intent dropped the live delta row")
    assert(exact() === before)
  }

  test("a TORN drop-intent file (a parseable prefix of the real " +
      "generation that happens to name an older, existing generation) " +
      "is treated as void — it never drops delta rows whose " +
      "replacement generation may not exist") {
    val s = mkStore()
    // id 1's only live copy is a delta row; two non-overlapping direct
    // adds commit _gen_1 and _gen_2 (so generations.last == 2)
    assert(HnswIndex.addBatchDelta(spark, s,
      odds.filter(col("vec_id") === 1), 0L, "t"))
    HnswIndex.add(spark, s, emb.filter(col("vec_id") === 102))
    HnswIndex.add(spark, s, emb.filter(col("vec_id") === 104))
    val fs = new org.apache.hadoop.fs.Path(s)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$s/_gen_1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$s/_gen_2")))
    // crash simulation: an add targeting gen 13 tore its intent to
    // '1' — a LEGACY truncate-write artifact; '_gen_1' exists, so the
    // old existence check would have read it as committed and dropped
    // id 1's only live copy
    import spark.implicits._
    Seq(1L).toDF("corpus_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$s/.drop_intent_ids")
    graft.util.FsIo.writeSmallFile(
      spark.sparkContext.hadoopConfiguration, s"$s/_drop_intent", "1")
    // read side: the torn intent must not mask the live delta row
    val queries = emb.filter(col("vec_id") < 6)
    assert(rows(HnswIndex.queryFiltered(spark, s, queries, k = 5,
        emb100.select("vec_id"), efSearch = 512))
      .exists(_._3 == 1L) ||
      HnswIndex.readDelta(spark, s).get
        .filter(col("corpus_id") === 1).count() === 1,
      "torn intent masked the only live copy at read time")
    // recovery voids it and keeps the delta row
    HnswIndex.resolveDropIntent(spark, s)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$s/_drop_intent")))
    assert(HnswIndex.readDelta(spark, s).get
      .filter(col("corpus_id") === 1).count() === 1,
      "torn intent dropped the only live copy")
  }

  test("batch-marker compaction: markers fold into the stream hwm, " +
      "replay protection and committed delta files survive, and the " +
      "seq counter keeps latest-commit-wins across the compaction") {
    val s = mkStore()
    assert(HnswIndex.addBatchDelta(spark, s,
      odds.filter(col("vec_id") === 1), 0L, "m"))
    assert(HnswIndex.addBatchDelta(spark, s,
      odds.filter(col("vec_id") === 3), 1L, "m"))
    val fs = new org.apache.hadoop.fs.Path(s)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def markers() = fs.listStatus(new org.apache.hadoop.fs.Path(s))
      .count(_.getPath.getName.startsWith("_hnsw_batch_"))
    assert(markers() === 2)
    assert(HnswIndex.compactBatchMarkers(spark, s, "m") === 2)
    assert(markers() === 0, "compaction left markers behind")
    // replay of a compacted batch is still skipped
    assert(!HnswIndex.addBatchDelta(spark, s,
      odds.filter(col("vec_id") === 1), 0L, "m"))
    assert(!HnswIndex.addBatchDelta(spark, s,
      odds.filter(col("vec_id") === 3), 1L, "m"))
    // the committed files still serve (hwm vouches for them)
    assert(HnswIndex.readDelta(spark, s).get.count() === 2)
    // a post-compaction re-stream of id 1 must still supersede the
    // pre-compaction row (the durable seq counter outlives markers)
    val negated = emb100.filter(col("vec_id") === 1)
      .select(col("vec_id"), transform(col("embedding")
        .cast("array<double>"), x => x * lit(-1.0)).as("embedding"))
    assert(HnswIndex.addBatchDelta(spark, s, negated, 2L, "m"))
    val served = HnswIndex.readDelta(spark, s).get
      .filter(col("corpus_id") === 1).collect()
    assert(served.length === 1)
    val orig = emb100.filter(col("vec_id") === 1)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0)
    assert(served.head.getSeq[Double](1) === orig.map(-_),
      "seq regression after marker compaction flipped the upsert")
  }

  test("a Serving handle PINS the delta snapshot: a concurrent fold's " +
      "physical file swap cannot fail or change an open handle's " +
      "answers; mutations become visible on reopen") {
    val s = mkStore()
    assert(HnswIndex.addBatchDelta(spark, s, odds, 0L, "p"))
    val queries = emb.filter(col("vec_id") < 6)
    val serving = HnswIndex.open(spark, s)
    try {
      val before = rows(serving.query(queries, k = 5, efSearch = 64))
      // mutations land while the handle is open: the fold DELETES the
      // delta files the one-shot path would still reference, and a
      // fresh batch adds a brand-new id
      HnswIndex.foldDelta(spark, s)
      assert(HnswIndex.addBatchDelta(spark, s,
        emb.filter(col("vec_id") === 101), 1L, "p"))
      val after = rows(serving.query(queries, k = 5, efSearch = 64))
      assert(after === before, "open handle's answers moved under it")
      assert(!after.exists(_._3 == 101L), "snapshot saw a later commit")
    } finally serving.close()
    // a REOPENED handle sees the folded graph + the new delta row
    val reopened = HnswIndex.open(spark, s)
    try {
      val fresh = rows(HnswIndex.query(spark, s, queries, k = 5))
      assert(rows(reopened.query(queries, k = 5)) === fresh)
    } finally reopened.close()
  }
}
