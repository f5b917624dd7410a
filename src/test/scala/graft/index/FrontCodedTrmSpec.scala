package graft.index

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** v4 `.trm` (front-coded terms + per-field positions flag): postings
  * round-trip bit-equal semantics vs what a v3 reader produced,
  * surrogate pairs never split at the prefix boundary, legacy v3
  * blocks stay readable, and v3+v4 segments raw-merge together. */
class FrontCodedTrmSpec extends AnyFunSuite {
  private def conf = new org.apache.hadoop.conf.Configuration()
  private def tmpDir() = new Path(
    java.nio.file.Files.createTempDirectory("trm4_").toString)

  test("front-coded terms round-trip: sorted id-like vocab, unicode, surrogate pairs") {
    val dir = tmpDir()
    val fs = dir.getFileSystem(conf)
    val w = new SegmentIndex.Writer(fs, dir, analyzed = Set("body"))
    // id-like shared prefixes, an emoji family differing only in the
    // LOW surrogate (the split hazard), combining chars, empty-ish
    val ids = Seq("order#1000", "order#1001", "order#1002", "order#2000",
      "😀a", "😁b", "😂", "zz")
    ids.zipWithIndex.foreach { case (id, i) =>
      w.addDocument(Seq("id" -> id, "k" -> s"g${i % 3}",
        "body" -> s"alpha beta gamma$i alpha"))
    }
    w.commit()
    val r = new SegmentIndex.Reader(fs, dir)
    // every id resolves through the front-coded dictionary
    ids.foreach { id =>
      val hits = r.termDocs("id", id)
      assert(hits.lengthIs == 1, s"id '$id' not found")
      assert(hits.head.exists { case (f, v) => f == "id" && v == id })
    }
    // analyzed field keeps positions (phrase machinery depends on them)
    val seg = r.commit.segments.head.name
    val posts = SegmentIndex.readPostingsPositionsField(fs, dir, seg, "body")
    assert(posts("alpha").forall(_._2.length == 2)) // two alphas per doc
    assert(posts("beta").forall(_._2.length == 1))
    // non-analyzed field carries NO positions (the flag dropped them)
    val kPosts = SegmentIndex.readPostingsPositionsField(fs, dir, seg, "k")
    assert(kPosts.nonEmpty && kPosts.values.forall(_.forall(_._2.isEmpty)))
  }

  test("legacy v3 block (explicit per-posting position counts, verbatim terms) still reads") {
    val dir = tmpDir()
    val fs = dir.getFileSystem(conf)
    // hand-write a v3 file: header, one field block, footer, trailer
    val TRM3 = 0x4754524F
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    def vint(v0: Int): Unit = {
      var v = v0
      while ((v & ~0x7F) != 0) { out.writeByte((v & 0x7F) | 0x80); v >>>= 7 }
      out.writeByte(v)
    }
    def str(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      vint(b.length); out.write(b)
    }
    out.writeInt(TRM3)
    val blockOff = bos.size().toLong
    str("tag"); vint(2)
    str("aa"); vint(2); vint(0); vint(0); vint(2); vint(0) // ords 0,2; no positions
    str("ab"); vint(1); vint(1); vint(0)                    // ord 1
    val footerOff = bos.size().toLong
    vint(1); str("tag"); out.writeLong(blockOff)
    out.writeLong(footerOff); out.writeInt(TRM3)
    val os = fs.create(new Path(dir, "_0.trm"), true)
    try os.write(bos.toByteArray) finally os.close()
    val posts = SegmentIndex.readPostingsFields(fs, dir, "_0", Set("tag"))
    assert(posts("tag")("aa").toSeq === Seq(0, 2))
    assert(posts("tag")("ab").toSeq === Seq(1))
  }

  test("v4 segments raw-merge (ord-shifted dictionary union), postings correct after") {
    val dir = tmpDir()
    val fs = dir.getFileSystem(conf)
    val w = new SegmentIndex.Writer(fs, dir, analyzed = Set("t"), maxBufferedDocs = 5)
    (0 until 20).foreach(i => w.addDocument(Seq(
      "id" -> f"doc$i%04d", "t" -> s"common token$i")))
    w.commit()
    assert(new SegmentIndex.Reader(fs, dir).numSegments === 4)
    val cp = w.forceMerge(1)
    assert(cp.segments.lengthIs == 1)
    val r = new SegmentIndex.Reader(fs, dir)
    assert(r.numDocs === 20)
    assert(r.termDocs("t", "common").size === 20)   // analyzed token, all docs
    assert(r.termDocs("id", "doc0013").size === 1)  // front-coded exact id
    val posts = SegmentIndex.readPostingsPositionsField(fs, dir,
      cp.segments.head.name, "t")
    assert(posts("common").forall(_._2.sameElements(Array(0))))
  }
}
