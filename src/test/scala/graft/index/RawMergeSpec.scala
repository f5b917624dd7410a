package graft.index

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The postings-level forceMerge (mergeSegmentsRaw) must be
  * indistinguishable from the doc-rewrite merge on every read
  * surface: stored docs, postings, positions, norms, zone-map stats,
  * and follow-up deletes. Twin stores get identical docs via two
  * writer sessions (→ two segments each); one merges raw (clean
  * segments), the other is forced down the rewrite path by a
  * same-doc-count delete+re-add that leaves a tombstone. */
class RawMergeSpec extends AnyFunSuite {
  private val conf = new Configuration()
  private def tmp(): Path =
    new Path(java.nio.file.Files.createTempDirectory("graft_rawmerge_").toString)

  private val analyzed = Set("text")
  private def docs1: Seq[SegmentIndex.Doc] = Seq(
    Seq("id" -> "a", "text" -> "spark merges segments fast", "n" -> "5"),
    Seq("id" -> "b", "text" -> "postings merge not rewrite", "n" -> "2"),
    Seq("id" -> "c", "text" -> "spark spark spark"))
  private def docs2: Seq[SegmentIndex.Doc] = Seq(
    Seq("id" -> "d", "text" -> "segments concatenate bytes", "n" -> "9"),
    Seq("id" -> "e", "tag" -> "no-text-here"))

  private def build(dir: Path): SegmentIndex.Writer = {
    val fs = dir.getFileSystem(conf)
    val w1 = new SegmentIndex.Writer(fs, dir, analyzed)
    docs1.foreach(w1.addDocument); w1.commit()
    val w2 = new SegmentIndex.Writer(fs, dir, analyzed)
    docs2.foreach(w2.addDocument); w2.commit()
    w2
  }

  test("raw merge path is taken for clean segments and matches the rewrite") {
    val rawDir = tmp(); val rwDir = tmp()
    val fs = rawDir.getFileSystem(conf)

    val wRaw = build(rawDir)
    assert(SegmentIndex.latestCommit(fs, rawDir).get.segments.length === 2)
    assert(SegmentIndex.canRawMerge(fs, rawDir,
      SegmentIndex.latestCommit(fs, rawDir).get.segments, analyzed))
    wRaw.forceMerge(1)

    // rewrite twin: tombstone 'e' then re-add it — forces the
    // doc-rewrite path (canRawMerge false), same logical content
    val wRw = build(rwDir)
    wRw.deleteDocuments("id", "e")
    wRw.addDocument(Seq("id" -> "e", "tag" -> "no-text-here"))
    wRw.commit()
    wRw.forceMerge(1)

    val rRaw = new SegmentIndex.Reader(fs, rawDir)
    val rRw = new SegmentIndex.Reader(fs, rwDir)
    assert(rRaw.numSegments === 1)
    assert(rRw.numSegments === 1)
    assert(rRaw.numDocs === 5)
    // stored docs identical as SETS (rewrite reorders the re-added doc)
    assert(rRaw.allDocs().map(_.toMap).toSet === rRw.allDocs().map(_.toMap).toSet)
    // term queries agree on every term of every field
    for ((f, t) <- Seq("id" -> "a", "id" -> "e", "text" -> "spark",
        "text" -> "merge", "n" -> "5", "tag" -> "no-text-here")) {
      val a = rRaw.termDocs(f, t).map(_.toMap).toSet
      val b = rRw.termDocs(f, t).map(_.toMap).toSet
      assert(a === b, s"term $f:$t diverged")
    }
  }

  test("raw-merged positions support phrase matching; norms survive") {
    val dir = tmp()
    val fs = dir.getFileSystem(conf)
    val w = build(dir)
    w.forceMerge(1)
    val cp = SegmentIndex.latestCommit(fs, dir).get
    val seg = cp.segments.head
    val posts = SegmentIndex.readPostingsPositions(fs, dir, seg.name)
    // "postings merge" is a phrase in doc b (ord 1): consecutive positions
    val pm = posts("text")("postings").head
    val mg = posts("text")("merge").head
    assert(pm._1 === mg._1) // same ordinal
    assert(mg._2.exists(p => pm._2.contains(p - 1)), "phrase adjacency lost")
    // norms: token counts per ord — doc c ("spark spark spark") has 3
    val norms = SegmentIndex.readNorms(fs, dir, seg.name)("text")
    assert(norms(2) === 3)
    assert(norms.length === 5)
    assert(norms(4) === 0) // doc e has no text field
    // zone-map stats combined across sources
    assert(seg.stats("id") === ("a", "e"))
    assert(seg.stats("n") === ("2", "9"))
  }

  test("deletes on a raw-merged segment work (ordinals aligned)") {
    val dir = tmp()
    val fs = dir.getFileSystem(conf)
    val w = build(dir)
    w.forceMerge(1)
    val w2 = new SegmentIndex.Writer(fs, dir, analyzed)
    assert(w2.deleteDocuments("id", "d") === 1)
    w2.commit()
    val r = new SegmentIndex.Reader(fs, dir)
    assert(r.numDocs === 4)
    assert(r.termDocs("id", "d").isEmpty)
    assert(r.termDocs("id", "e").nonEmpty)
  }

  test("empty-source and single-segment edge cases") {
    val dir = tmp()
    val fs = dir.getFileSystem(conf)
    // one empty committed writer session + one with docs
    val w0 = new SegmentIndex.Writer(fs, dir, analyzed)
    w0.commit() // no segment at all (empty pending)
    val w1 = new SegmentIndex.Writer(fs, dir, analyzed)
    docs1.foreach(w1.addDocument); w1.commit()
    val w2 = new SegmentIndex.Writer(fs, dir, analyzed)
    docs2.foreach(w2.addDocument); w2.commit()
    w2.forceMerge(1)
    val r = new SegmentIndex.Reader(fs, dir)
    assert(r.numDocs === 5)
    assert(r.numSegments === 1)
  }
}
