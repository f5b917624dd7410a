package graft.index

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Persisted docValues (`.dvd` — the reference schema.xml:70
  * `docValues="true"` contract): the forward doc→value column is
  * written once at index time, so pivot/grouped-stat queries read a
  * packed ord column instead of re-inverting postings per query. */
class DocValuesSpec extends AnyFunSuite {

  private def conf = new org.apache.hadoop.conf.Configuration()

  private def buildSeg(dir: Path, nDocs: Int = 60): Unit = {
    val fs = dir.getFileSystem(conf)
    val w = new SegmentIndex.Writer(fs, dir)
    (0 until nDocs).foreach { i =>
      val base = Seq("id" -> i.toString, "grp" -> ("g" + (i % 4)),
        "val" -> f"${i % 9}%03d")
      // every third doc lacks `cat` (null-bucket coverage); doc 7 is
      // multivalued on `tags` (excluded from docValues)
      val cat = if (i % 3 == 0) Nil else Seq("cat" -> ("c" + (i % 2)))
      val tags = if (i == 7) Seq("tags" -> "a", "tags" -> "b") else Seq("tags" -> "x")
      w.addDocument(base ++ cat ++ tags)
    }
    w.commit()
    ()
  }

  test("single-valued fields persist a .dvd column; multivalued are excluded") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("dv_write_").toString)
    val fs = dir.getFileSystem(conf)
    buildSeg(dir)
    val seg = SegmentIndex.latestCommit(fs, dir).get.segments.head.name
    assert(fs.exists(new Path(dir, s"$seg.dvd")))
    val dv = SegmentIndex.readDocValues(fs, dir, seg, None)
    assert(dv.keySet === Set("id", "grp", "val", "cat")) // tags multivalued → absent
    val (terms, idx) = dv("grp")
    assert(terms.toSeq === Seq("g0", "g1", "g2", "g3"))
    assert(idx.length === 60)
    (0 until 60).foreach(i => assert(terms(idx(i)) === "g" + (i % 4)))
    // missing-field docs carry -1
    val (_, catIdx) = dv("cat")
    (0 until 60).foreach { i =>
      if (i % 3 == 0) assert(catIdx(i) === -1) else assert(catIdx(i) >= 0)
    }
  }

  test("pivot and grouped stats answer from docValues with zero inversions") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("dv_query_").toString)
    val fs = dir.getFileSystem(conf)
    buildSeg(dir)
    val r = new SegmentIndex.Reader(fs, dir)
    SegmentIndex.dvFallbacks.set(0)
    val pivot = r.pivotCounts("grp", "cat", MatchAll)
    val stats = r.groupedStats("grp", Seq("val"), MatchAll)
    assert(SegmentIndex.dvFallbacks.get() === 0,
      "dvd-bearing store must not invert postings for forward views")
    // answers correct (closed form: i%4 x i%2 with i%3==0 null bucket)
    assert(pivot((Some("g0"), Some("c0"))) ===
      (0 until 60).count(i => i % 4 == 0 && i % 3 != 0 && i % 2 == 0).toLong)
    assert(pivot((Some("g1"), None)) ===
      (0 until 60).count(i => i % 4 == 1 && i % 3 == 0).toLong)
    val (cnt, mm, _) = stats(Some("g2"))
    assert(cnt === 15)
    assert(mm("val") === (f"${(0 until 60).filter(_ % 4 == 2).map(_ % 9).min}%03d",
      f"${(0 until 60).filter(_ % 4 == 2).map(_ % 9).max}%03d"))
  }

  test("legacy segments (no .dvd) fall back to inversion, same answers") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("dv_legacy_").toString)
    val fs = dir.getFileSystem(conf)
    buildSeg(dir)
    val seg = SegmentIndex.latestCommit(fs, dir).get.segments.head.name
    val withDv = new SegmentIndex.Reader(fs, dir).pivotCounts("grp", "cat", MatchAll)
    fs.delete(new Path(dir, s"$seg.dvd"), false) // simulate a pre-dvd store
    SegmentIndex.dvFallbacks.set(0)
    val without = new SegmentIndex.Reader(fs, dir).pivotCounts("grp", "cat", MatchAll)
    assert(SegmentIndex.dvFallbacks.get() > 0)
    assert(withDv === without)
  }

  test("raw merge relocates docValues columns with term-dict remap") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("dv_merge_").toString)
    val fs = dir.getFileSystem(conf)
    // two flushes with DISJOINT term dicts for grp → merge must remap
    val w = new SegmentIndex.Writer(fs, dir, maxBufferedDocs = 30)
    (0 until 30).foreach(i => w.addDocument(Seq("id" -> i.toString, "grp" -> ("a" + (i % 3)))))
    (30 until 60).foreach(i => w.addDocument(Seq("id" -> i.toString, "grp" -> ("b" + (i % 3)))))
    w.commit()
    assert(new SegmentIndex.Reader(fs, dir).numSegments === 2)
    w.forceMerge(1)
    val r = new SegmentIndex.Reader(fs, dir)
    assert(r.numSegments === 1)
    val seg = r.commit.segments.head.name
    val dv = SegmentIndex.readDocValues(fs, dir, seg, Some(Set("grp")))
    assert(dv.contains("grp"), "raw merge must carry the dvd column")
    val (terms, idx) = dv("grp")
    assert(terms.toSeq === Seq("a0", "a1", "a2", "b0", "b1", "b2"))
    (0 until 60).foreach { i =>
      val want = (if (i < 30) "a" else "b") + (i % 3)
      assert(terms(idx(i)) === want, s"doc $i")
    }
    SegmentIndex.dvFallbacks.set(0)
    val pivot = r.pivotCounts("grp", "grp", MatchAll)
    assert(SegmentIndex.dvFallbacks.get() === 0)
    assert(pivot((Some("a0"), Some("a0"))) === 10L)
  }

  test("multivalued and analyzed fields persist a .dvm SORTED_SET column") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("dvm_write_").toString)
    val fs = dir.getFileSystem(conf)
    val w = new SegmentIndex.Writer(fs, dir, analyzed = Set("body"))
    (0 until 40).foreach { i =>
      val tags = Seq("tags" -> ("t" + (i % 3))) ++
        (if (i % 2 == 0) Seq("tags" -> ("t" + ((i + 1) % 3))) else Nil)
      val body = if (i % 5 == 0) Nil else Seq("body" -> s"alpha beta w${i % 4}")
      w.addDocument(Seq("id" -> i.toString) ++ tags ++ body)
    }
    w.commit()
    val seg = SegmentIndex.latestCommit(fs, dir).get.segments.head.name
    assert(fs.exists(new Path(dir, s"$seg.dvm")))
    val dvm = SegmentIndex.readSortedSet(fs, dir, seg, None)
    assert(dvm.keySet === Set("tags", "body")) // single-valued id stays in .dvd
    val (tTerms, tCsr, tLists) = dvm("tags")
    assert(tTerms.toSeq === Seq("t0", "t1", "t2"))
    (0 until 40).foreach { i =>
      val got = (tCsr(i) until tCsr(i + 1)).map(j => tTerms(tLists(j))).toSet
      val want = Set("t" + (i % 3)) ++ (if (i % 2 == 0) Set("t" + ((i + 1) % 3)) else Set())
      assert(got === want, s"doc $i tags")
      // ascending dict order within each doc
      assert((tCsr(i) until tCsr(i + 1)).map(tLists).sorted ===
        (tCsr(i) until tCsr(i + 1)).map(tLists))
    }
    val (bTerms, bCsr, bLists) = dvm("body")
    (0 until 40).foreach { i =>
      val got = (bCsr(i) until bCsr(i + 1)).map(j => bTerms(bLists(j))).toSet
      val want = if (i % 5 == 0) Set.empty[String] else Set("alpha", "beta", s"w${i % 4}")
      assert(got === want, s"doc $i body tokens")
    }
  }

  test("facetCounts serves analyzed/multivalued facets from .dvm — zero fallbacks, " +
      "same answers as the postings walk") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("dvm_facet_").toString)
    val fs = dir.getFileSystem(conf)
    val w = new SegmentIndex.Writer(fs, dir, analyzed = Set("body"))
    (0 until 60).foreach { i =>
      w.addDocument(Seq("id" -> i.toString, "grp" -> ("g" + (i % 2))) ++
        (if (i % 7 == 0) Nil else Seq("body" -> s"spark data w${i % 5}")))
    }
    w.commit()
    val seg = SegmentIndex.latestCommit(fs, dir).get.segments.head.name
    val r = new SegmentIndex.Reader(fs, dir)
    SegmentIndex.dvFallbacks.set(0)
    val all = r.facetCounts("body", MatchAll)
    val filtered = r.facetCounts("body", TermQuery("grp", Seq("g1")))
    assert(SegmentIndex.dvFallbacks.get() === 0,
      "dvm-bearing store must not walk facet-field postings")
    // closed form: every non-(i%7==0) doc carries spark, data, w(i%5)
    assert(all._1("spark") === (0 until 60).count(_ % 7 != 0).toLong)
    assert(all._1("w3") === (0 until 60).count(i => i % 7 != 0 && i % 5 == 3).toLong)
    assert(all._2 === (0 until 60).count(_ % 7 == 0).toLong) // null bucket
    assert(filtered._1("spark") ===
      (0 until 60).count(i => i % 7 != 0 && i % 2 == 1).toLong)
    // legacy fallback (no .dvm): identical answers, counter bumps
    fs.delete(new Path(dir, s"$seg.dvm"), false)
    fs.delete(new Path(dir, s"$seg.dvd"), false)
    SegmentIndex.dvFallbacks.set(0)
    val r2 = new SegmentIndex.Reader(fs, dir)
    assert(r2.facetCounts("body", MatchAll) === all)
    assert(r2.facetCounts("body", TermQuery("grp", Seq("g1"))) === filtered)
    assert(SegmentIndex.dvFallbacks.get() > 0)
  }

  test("raw merge relocates .dvm columns with dict-union remap; deletes respected after") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("dvm_merge_").toString)
    val fs = dir.getFileSystem(conf)
    // two flushes with OVERLAPPING-but-different tag dicts → remap
    val w = new SegmentIndex.Writer(fs, dir, maxBufferedDocs = 20)
    (0 until 20).foreach(i => w.addDocument(
      Seq("id" -> i.toString, "tags" -> ("a" + (i % 2)), "tags" -> "shared")))
    (20 until 40).foreach(i => w.addDocument(
      Seq("id" -> i.toString, "tags" -> ("b" + (i % 2)), "tags" -> "shared")))
    w.commit()
    assert(new SegmentIndex.Reader(fs, dir).numSegments === 2)
    w.forceMerge(1)
    val r = new SegmentIndex.Reader(fs, dir)
    val seg = r.commit.segments.head.name
    val dvm = SegmentIndex.readSortedSet(fs, dir, seg, Some(Set("tags")))
    assert(dvm.contains("tags"), "raw merge must carry the dvm column")
    val (terms, csr, lists) = dvm("tags")
    assert(terms.toSeq === Seq("a0", "a1", "b0", "b1", "shared"))
    (0 until 40).foreach { i =>
      val got = (csr(i) until csr(i + 1)).map(j => terms(lists(j))).toSet
      val want = Set((if (i < 20) "a" else "b") + (i % 2), "shared")
      assert(got === want, s"doc $i")
    }
    SegmentIndex.dvFallbacks.set(0)
    val (counts, nulls) = r.facetCounts("tags", MatchAll)
    assert(SegmentIndex.dvFallbacks.get() === 0)
    assert(counts("shared") === 40L && counts("a0") === 10L && nulls === 0L)
  }

  test("pivotCountsMulti: cartesian per doc over multivalued axes, null buckets, " +
      "fq composition, legacy postings fallback agrees") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("dvm_pivot_").toString)
    val fs = dir.getFileSystem(conf)
    val w = new SegmentIndex.Writer(fs, dir)
    // 30 docs: grp single-valued g0/g1/g2; tags multivalued — every doc
    // gets t(i%2), even docs also t2; docs i%5==0 get NO tags at all
    (0 until 30).foreach { i =>
      val tags =
        if (i % 5 == 0) Nil
        else Seq("tags" -> ("t" + (i % 2))) ++
          (if (i % 2 == 0) Seq("tags" -> "t2") else Nil)
      w.addDocument(Seq("id" -> i.toString, "grp" -> ("g" + (i % 3))) ++ tags)
    }
    w.commit()
    val r = new SegmentIndex.Reader(fs, dir)
    SegmentIndex.dvFallbacks.set(0)
    val pv = r.pivotCountsMulti("grp", "tags", MatchAll)
    assert(SegmentIndex.dvFallbacks.get() === 0)
    // closed form
    def expect(g: Int, t: Option[Int]): Long = (0 until 30).count { i =>
      i % 3 == g && (t match {
        case None => i % 5 == 0
        case Some(2) => i % 5 != 0 && i % 2 == 0
        case Some(x) => i % 5 != 0 && i % 2 == x
      })
    }.toLong
    (0 until 3).foreach { g =>
      assert(pv.getOrElse((Some(s"g$g"), Some("t0")), 0L) === expect(g, Some(0)), s"g$g t0")
      assert(pv.getOrElse((Some(s"g$g"), Some("t2")), 0L) === expect(g, Some(2)), s"g$g t2")
      assert(pv.getOrElse((Some(s"g$g"), None), 0L) === expect(g, None), s"g$g null")
    }
    // a doc with two tags counted once under EACH combination: total
    // pivot mass = sum over docs of |tags| (or 1 when empty)
    assert(pv.values.sum === (0 until 30).map(i =>
      if (i % 5 == 0) 1 else if (i % 2 == 0) 2 else 1).sum.toLong)
    // fq composes
    val fq = r.pivotCountsMulti("grp", "tags", TermQuery("grp", Seq("g1")))
    assert(fq.keys.forall(_._1 === Some("g1")))
    assert(fq.values.sum === (0 until 30).filter(_ % 3 == 1).map(i =>
      if (i % 5 == 0) 1 else if (i % 2 == 0) 2 else 1).sum.toLong)
    // legacy store (no .dvm/.dvd): postings inversion, same answers
    val seg = r.commit.segments.head.name
    fs.delete(new Path(dir, s"$seg.dvm"), false)
    fs.delete(new Path(dir, s"$seg.dvd"), false)
    SegmentIndex.dvFallbacks.set(0)
    val legacy = new SegmentIndex.Reader(fs, dir).pivotCountsMulti("grp", "tags", MatchAll)
    assert(SegmentIndex.dvFallbacks.get() > 0)
    assert(legacy === pv)
  }
}
