package graft.index

import graft.{Graft, TestSpark}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Commit retention + snapshot reads (Lucene IndexDeletionPolicy /
  * Delta versionAsOf analog): `retainGenerations = K` keeps the
  * newest K commit points and every file they reference, so a reader
  * pinned at any retained generation holds a complete immutable
  * snapshot while upserts and merges commit concurrently; the
  * default K=1 reproduces keep-last-commit exactly. */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def conf = new org.apache.hadoop.conf.Configuration()

  private def docsOf(r: SegmentIndex.Reader): Map[String, String] =
    r.allDocs().map { d =>
      val m = d.toMap; m("id") -> m("v")
    }.toMap

  test("retain=1 (default) reproduces keep-last-commit: old gen files reclaimed at once") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("ret1_").toString)
    val fs = dir.getFileSystem(conf)
    val w = new SegmentIndex.Writer(fs, dir)
    (0 until 10).foreach(i => w.addDocument(Seq("id" -> i.toString, "v" -> "a")))
    w.commit() // gen 1
    w.deleteDocuments("id", "3")
    w.addDocument(Seq("id" -> "3", "v" -> "b"))
    w.commit() // gen 2
    assert(!fs.exists(new Path(dir, "segments_1")))
    // forceMerge drops the pre-merge segment files immediately
    val before = fs.listStatus(dir).map(_.getPath.getName).filter(_.endsWith(".fld")).toSet
    w.forceMerge(1) // gen 3
    assert(!fs.exists(new Path(dir, "segments_2")))
    before.foreach(f => assert(!fs.exists(new Path(dir, f)), s"pre-merge $f not reclaimed"))
    val r = new SegmentIndex.Reader(fs, dir)
    assert(r.numDocs === 10)
    assert(docsOf(r)("3") === "b")
  }

  test("retain=2: a reader pinned at gen N survives a concurrent upsert commit, " +
      "sees the exact old snapshot, and the snapshot is reclaimed one commit later") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("ret2_").toString)
    val fs = dir.getFileSystem(conf)
    val w = new SegmentIndex.Writer(fs, dir, retainGenerations = 2)
    (0 until 8).foreach(i => w.addDocument(Seq("id" -> i.toString, "v" -> "old")))
    w.commit() // gen 1
    // pin the snapshot the way a planned scan does
    val pinnedGen = SegmentIndex.latestCommit(fs, dir).get.gen

    // concurrent upsert: delete-then-add two ids, one new id -> gen 2
    Seq("2", "5").foreach(id => w.deleteDocuments("id", id))
    Seq("2", "5", "8").foreach(id => w.addDocument(Seq("id" -> id, "v" -> "new")))
    w.commit() // gen 2
    assert(fs.exists(new Path(dir, "segments_1")), "retained gen must keep its commit file")

    // the pinned reader opens AFTER the new commit landed — snapshot intact
    val snap = new SegmentIndex.Reader(fs, dir, expectedGen = Some(pinnedGen))
    assert(snap.numDocs === 8)
    assert(docsOf(snap).values.toSet === Set("old"))
    // live reader sees the upsert
    val live = new SegmentIndex.Reader(fs, dir)
    assert(live.numDocs === 9)
    assert(docsOf(live)("5") === "new")

    // one more commit pushes gen 1 out of the window: files reclaimed,
    // pinned open now fails loudly (never silently reads a different gen)
    w.deleteDocuments("id", "0")
    w.commit() // gen 3 -> window {2,3}
    assert(!fs.exists(new Path(dir, "segments_1")))
    val ex = intercept[IllegalStateException] {
      new SegmentIndex.Reader(fs, dir, expectedGen = Some(pinnedGen))
    }
    assert(ex.getMessage.contains("retention"))
  }

  test("retention never touches files referenced by a retained commit " +
      "(shared segments across generations) nor unpublished flushed segments") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("ret_shared_").toString)
    val fs = dir.getFileSystem(conf)
    val w = new SegmentIndex.Writer(fs, dir, maxBufferedDocs = 4, retainGenerations = 2)
    (0 until 8).foreach(i => w.addDocument(Seq("id" -> i.toString, "v" -> "x")))
    w.commit() // gen 1: two 4-doc segments, both referenced by gen 2 too
    val segFiles = fs.listStatus(dir).map(_.getPath.getName).filter(_.endsWith(".fld")).toSet
    w.addDocument(Seq("id" -> "8", "v" -> "x"))
    w.commit() // gen 2 references gen 1's segments + one new
    w.addDocument(Seq("id" -> "9", "v" -> "x"))
    w.commit() // gen 3 -> gen 1 dropped; its segments still live in gen 2/3
    segFiles.foreach(f => assert(fs.exists(new Path(dir, f)), s"shared segment $f deleted"))
    assert(new SegmentIndex.Reader(fs, dir).numDocs === 10)
  }

  test("DSv2 snapshot option: Graft.indexSnapshot token time-travels the table " +
      "across an upsert, plan marks the pin, live read sees the new state") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("snap_store_").toString + "/store"
    val base = (0 until 40).map(i => (i.toString, s"t$i", i % 5)).toDF("id", "title", "grp")
    Graft.buildSegmentIndex(base, "id", store, shards = 2)

    val token = Graft.indexSnapshot(spark, store)
    // upsert with retention: keep enough generations for the token's
    // pinned commits to survive the batch commit + any merge folds
    val delta = Seq(("7", "CHANGED", 99), ("40", "added", 99)).toDF("id", "title", "grp")
    Graft.upsertIndex(spark, store, delta, retainGenerations = 4)

    val snap = Graft.openSegmentIndex(spark, store, snapshot = Some(token))
    assert(snap.queryExecution.executedPlan.toString.contains("snapshot=pinned"))
    assert(snap.count() === 40)
    assert(snap.filter($"id" === "7").select("title").as[String].head() === "t7")
    assert(snap.filter($"id" === "40").count() === 0)

    val live = Graft.openSegmentIndex(spark, store)
    assert(live.count() === 41)
    assert(live.filter($"id" === "7").select("title").as[String].head() === "CHANGED")
  }

  test("default-retention upsert reclaims the planned snapshot: pinned read fails fast") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("snap_gone_").toString + "/store"
    val base = (0 until 10).map(i => (i.toString, s"t$i")).toDF("id", "title")
    Graft.buildSegmentIndex(base, "id", store, shards = 1)
    val token = Graft.indexSnapshot(spark, store)
    Graft.upsertIndex(spark, store, Seq(("3", "x")).toDF("id", "title")) // retain=1
    val ex = intercept[Exception] {
      Graft.openSegmentIndex(spark, store, snapshot = Some(token)).count()
    }
    assert(ex.getMessage.contains("not available") ||
      Option(ex.getCause).exists(_.getMessage.contains("not available")))
  }

  test("PINNED snapshot survives K+1 commits under retain=K " +
      "(SnapshotDeletionPolicy hold); release + next commit reclaims it") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("snap_pin_").toString + "/store"
    val base = (0 until 20).map(i => (i.toString, s"t$i")).toDF("id", "title")
    Graft.buildSegmentIndex(base, "id", store, shards = 1)
    val token = Graft.indexSnapshot(spark, store, pin = true)

    // K+1 = 3 upsert commits at retainGenerations = 2: the pinned
    // generation is well outside the window — only the pin holds it
    (0 until 3).foreach { i =>
      Graft.upsertIndex(spark, store,
        Seq(("0", s"v$i")).toDF("id", "title"), retainGenerations = 2)
    }
    val snap = Graft.openSegmentIndex(spark, store, snapshot = Some(token))
    assert(snap.count() === 20)
    assert(snap.filter($"id" === "0").select("title").as[String].head() === "t0",
      "pinned snapshot must show the pre-upsert values")
    val live = Graft.openSegmentIndex(spark, store)
    assert(live.filter($"id" === "0").select("title").as[String].head() === "v2")

    // release the hold: the NEXT commit's reclaim drops the old gen,
    // and the pinned open now fails loudly with the retention message
    Graft.releaseIndexSnapshot(spark, store, token)
    Graft.upsertIndex(spark, store,
      Seq(("19", "last")).toDF("id", "title"), retainGenerations = 2)
    val ex = intercept[Exception] {
      Graft.openSegmentIndex(spark, store, snapshot = Some(token)).count()
    }
    assert(ex.getMessage.contains("not available") ||
      Option(ex.getCause).exists(_.getMessage.contains("not available")))
  }
}
