package graft.index

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tiered merge policy (solrconfig_merge.xml:6-12 TieredMergePolicy
  * parity): over-full size tiers fold incrementally, bounding
  * steady-state segment count at O(log docs) across continuous
  * upserts — the counter-force forceMerge is too expensive to be. */
class TieredMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def conf = new org.apache.hadoop.conf.Configuration()

  test("tierOf is geometric in liveDocs; maxSegments logarithmic") {
    val p = SegmentIndex.MergePolicy(segmentsPerTier = 3, maxMergeAtOnce = 3,
      floorDocs = 4)
    assert(p.tierOf(1) === 0)
    assert(p.tierOf(4) === 0)
    assert(p.tierOf(5) === 1)
    assert(p.tierOf(12) === 1)
    assert(p.tierOf(13) === 2)
    assert(p.tierOf(36) === 2)
    assert(p.tierOf(37) === 3)
    // bound grows with log(docs), not docs
    assert(p.maxSegments(1000) <= p.maxSegments(100000))
    assert(p.maxSegments(100000) <= 3 * 12) // 3 per tier, log3(25000)+1 tiers
  }

  test("maybeMerge folds clean equal-size segments via the raw merge, content preserved") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("tiered_raw_").toString)
    val fs = dir.getFileSystem(conf)
    // 100 docs at 4-doc flushes -> 25 tier-0 segments
    val w = new SegmentIndex.Writer(fs, dir, maxBufferedDocs = 4)
    (0 until 100).foreach(i => w.addDocument(Seq("id" -> i.toString, "k" -> (i % 7).toString)))
    w.commit()
    assert(new SegmentIndex.Reader(fs, dir).numSegments === 25)
    val policy = SegmentIndex.MergePolicy(segmentsPerTier = 3, maxMergeAtOnce = 3,
      floorDocs = 4)
    w.maybeMerge(policy)
    val r = new SegmentIndex.Reader(fs, dir)
    assert(r.numDocs === 100)
    assert(r.numSegments <= policy.maxSegments(100))
    assert(r.numSegments < 25)
    // every tier within its budget — the policy's own invariant
    val byTier = r.commit.segments.groupBy(s => policy.tierOf(s.liveDocs))
    byTier.foreach { case (t, segs) =>
      assert(segs.lengthIs <= policy.segmentsPerTier, s"tier $t over budget: $segs")
    }
    // contents identical: ids complete, postings correct after the fold
    assert(r.allDocs().flatMap(_.collect { case ("id", v) => v }).toSet ===
      (0 until 100).map(_.toString).toSet)
    assert(r.termDocs("k", "3").flatMap(_.collect { case ("id", v) => v.toInt }).toSet ===
      (0 until 100).filter(_ % 7 == 3).toSet)
  }

  test("reference knobs (segmentsPerTier=100, maxMergeAtOnce=10000) reproduce the " +
      "offline shape: nothing folds under the tier budget, one fold past it") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("tiered_ref_").toString)
    val fs = dir.getFileSystem(conf)
    val w = new SegmentIndex.Writer(fs, dir, maxBufferedDocs = 2)
    (0 until 60).foreach(i => w.addDocument(Seq("id" -> i.toString)))
    w.commit()
    assert(new SegmentIndex.Reader(fs, dir).numSegments === 30)
    // the reference's solrconfig_merge.xml values: 30 segments sit far
    // under the 100-per-tier budget, so maybeMerge is a no-op — the
    // offline contract where no query reads the intermediate state
    val ref = SegmentIndex.MergePolicy(segmentsPerTier = 100, maxMergeAtOnce = 10000,
      floorDocs = 2)
    w.maybeMerge(ref)
    assert(new SegmentIndex.Reader(fs, dir).numSegments === 30)
    // drop the budget below the pile: ONE unbounded-fan-in fold takes
    // every tier-0 segment at once (maxMergeAtOnce > pile size)
    w.maybeMerge(SegmentIndex.MergePolicy(segmentsPerTier = 5, maxMergeAtOnce = 10000,
      floorDocs = 2))
    val r = new SegmentIndex.Reader(fs, dir)
    assert(r.numSegments === 1)
    assert(r.numDocs === 60)
    assert(r.allDocs().flatMap(_.collect { case ("id", v) => v }).toSet ===
      (0 until 60).map(_.toString).toSet)
  }

  test("facade passes non-default merge knobs through (Graft.upsertIndex/mergeIndex)") {
    import graft.Graft
    val out = java.nio.file.Files.createTempDirectory("tiered_facade_").toString
    val docs = spark.range(0, 40).selectExpr("cast(id as string) as id",
      "cast(id % 5 as string) as grp")
    SegmentShardSink.write(docs, "id", out, shards = 1)
    // 8 upsert batches with folding disabled-in-practice (huge budget):
    // segments accumulate one per batch
    val lax = SegmentIndex.MergePolicy(segmentsPerTier = 1000, maxMergeAtOnce = 10000)
    (0 until 8).foreach { b =>
      Graft.upsertIndex(spark, out,
        docs.filter(col("id").cast("long") % 8 === b), mergePolicy = lax)
    }
    val dir = new Path(s"$out/part-00000/data/index")
    val fs = dir.getFileSystem(conf)
    assert(new SegmentIndex.Reader(fs, dir).numSegments >= 8)
    // the standalone facade merge with a tight budget folds them
    Graft.mergeIndex(spark, out,
      SegmentIndex.MergePolicy(segmentsPerTier = 2, maxMergeAtOnce = 4, floorDocs = 2))
    val r = new SegmentIndex.Reader(fs, dir)
    assert(r.numSegments < 8)
    assert(r.allDocs().flatMap(_.collect { case ("id", v) => v.toInt }).toSet ===
      (0 until 40).toSet)
  }

  test("maybeMerge reclaims tombstoned victims through the rewrite path") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("tiered_del_").toString)
    val fs = dir.getFileSystem(conf)
    val w = new SegmentIndex.Writer(fs, dir, maxBufferedDocs = 4)
    (0 until 40).foreach(i => w.addDocument(Seq("id" -> i.toString)))
    w.commit()
    // tombstone the odd ids across every segment, then fold
    w.deleteDocumentsBatch("id", (0 until 40).filter(_ % 2 == 1).map(_.toString).toSet)
    w.commit()
    val policy = SegmentIndex.MergePolicy(segmentsPerTier = 2, maxMergeAtOnce = 4,
      floorDocs = 2)
    w.maybeMerge(policy)
    val r = new SegmentIndex.Reader(fs, dir)
    assert(r.numDocs === 20)
    assert(r.allDocs().flatMap(_.collect { case ("id", v) => v.toInt }).toSet ===
      (0 until 40).filter(_ % 2 == 0).toSet)
    // the rewrite reclaimed the deletes: no segment carries tombstones
    assert(r.commit.segments.forall(_.dels === 0) ||
      r.commit.segments.count(_.dels > 0) < 10) // at most unmerged stragglers
  }

  test("maybeMerge rewrite path preserves a non-default stored codec (no mixed-codec store)") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("tiered_codec_").toString)
    val fs = dir.getFileSystem(conf)
    val w = new SegmentIndex.Writer(fs, dir, maxBufferedDocs = 4)
    w.storedCodecMagic = SegmentIndex.FLD_MAGIC2 // deflate A/B knob
    (0 until 40).foreach(i => w.addDocument(Seq("id" -> i.toString)))
    w.commit()
    // tombstones force the rewrite (non-raw) merge path
    w.deleteDocumentsBatch("id", (0 until 40).filter(_ % 2 == 1).map(_.toString).toSet)
    w.commit()
    w.maybeMerge(SegmentIndex.MergePolicy(segmentsPerTier = 2, maxMergeAtOnce = 4,
      floorDocs = 2))
    val r = new SegmentIndex.Reader(fs, dir)
    assert(r.numDocs === 20)
    // every surviving segment still carries the deflate magic
    val magics = r.commit.segments.map { s =>
      val in = new java.io.DataInputStream(fs.open(new Path(dir, s"${s.name}.fld")))
      try in.readInt() finally in.close()
    }
    assert(magics.toSet === Set(SegmentIndex.FLD_MAGIC2))
  }

  test("12 upsert batches stay bounded per part and answer correctly (q286 flow)") {
    val d = graft.TestSpark.sf
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id").cast("string").as("id"), col("lang"), col("n_chars"))
    val out = java.nio.file.Files.createTempDirectory("tiered_store_").toString
    SegmentShardSink.write(docs, "id", out, shards = 2)
    val policy = SegmentIndex.MergePolicy() // the upsert default
    val hconf = ShardIndex.hadoopConf(spark)
    def perPartSegments: Seq[Int] =
      SegmentShardSink.partIndexDirs(spark, out).map { dd =>
        val p = new Path(dd)
        SegmentIndex.latestCommit(p.getFileSystem(hconf), p)
          .map(_.segments.length).getOrElse(0)
      }
    (0 until 12).foreach { b =>
      val delta = docs.filter(pmod(col("id").cast("long"), lit(12)) === b)
        .withColumn("n_chars", col("n_chars") + lit((b + 1) * 1000L))
      SegmentShardSink.upsert(spark, out, delta)
      // the merge runs inside each batch: the count never exceeds the
      // tier budget at any observation point — this is the "flat
      // across batch count" contract, not just a final-state check
      perPartSegments.foreach { n =>
        assert(n <= policy.segmentsPerTier,
          s"batch $b left $n segments in a part (budget ${policy.segmentsPerTier})")
      }
    }
    val total = docs.count()
    perPartSegments.foreach(n => assert(n <= policy.maxSegments(total)))
    // final state correct through the DSv2 table (q286's oracle shape)
    val got = spark.read.format("graft-index").load(out)
      .select(col("id").cast("long").as("doc_id"),
        col("n_chars").cast("long").as("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) + 1000L * (1 + r.getLong(0) % 12))).toMap
    assert(got === want)
  }
}
