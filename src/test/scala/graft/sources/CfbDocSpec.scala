package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Legacy .doc extraction against a spec-conformant CFB fixture built
  * byte-by-byte from [MS-CFB]/[MS-DOC]: v3 512-byte sectors, a FAT
  * chain for the WordDocument stream, the 1Table stream in the MINI
  * stream (under the 4096 cutoff → exercises the mini-FAT path), a
  * CLX with a leading Prc to skip, and a two-piece piece table
  * covering BOTH text encodings (CP1252 compressed + UTF-16LE). */
class CfbDocSpec extends AnyFunSuite {

  // ---- fixture builder ----------------------------------------------------
  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  private val piece1 = "Hello legacy Word.\r" // CP1252, ends in a paragraph mark
  private val piece2 = "Ünïcode piece — два" // forced UTF-16LE

  /** WordDocument stream: FIB + text regions at known offsets. */
  private def wordDocumentStream(tableLen: Int): Array[Byte] = {
    val textOff1 = 1024 // CP1252 piece bytes
    val textOff2 = 4096 // UTF-16LE piece bytes (stream stays >= the
    // 4096 mini cutoff: real WordDocument streams are FAT-resident)
    val wd = new Array[Byte](4096 + piece2.length * 2)
    putU16(wd, 0, 0xA5EC) // wIdent
    putU16(wd, 2, 0x00C1) // nFib (Word 97)
    putU16(wd, 0x0A, 0x0200) // fWhichTblStm = 1 -> "1Table"
    val csw = 14
    putU16(wd, 0x20, csw)
    val lwOff = 0x22 + csw * 2
    val cslw = 22
    putU16(wd, lwOff, cslw)
    val ccpText = piece1.length + piece2.length
    putI32(wd, lwOff + 2 + 3 * 4, ccpText) // FibRgLw97.ccpText
    val fcLcbCountOff = lwOff + 2 + cslw * 4
    putU16(wd, fcLcbCountOff, 93) // cbRgFcLcb (nFib 0x00C1)
    val blobOff = fcLcbCountOff + 2
    putI32(wd, blobOff + 33 * 8, 0) // fcClx = 0 (CLX at 1Table start)
    putI32(wd, blobOff + 33 * 8 + 4, tableLen) // lcbClx
    // text payloads
    val p1 = piece1.getBytes("windows-1252")
    System.arraycopy(p1, 0, wd, textOff1, p1.length)
    val p2 = piece2.getBytes("UTF-16LE")
    System.arraycopy(p2, 0, wd, textOff2, p2.length)
    wd
  }

  /** CLX: one Prc to skip, then the Pcdt with two pieces. */
  private def tableStream: Array[Byte] = {
    val nPieces = 2
    val lcbPlc = (nPieces + 1) * 4 + nPieces * 8
    val prcBody = 2
    val out = new Array[Byte](1 + 2 + prcBody + 1 + 4 + lcbPlc)
    var p = 0
    out(p) = 0x01; putU16(out, p + 1, prcBody); p += 3 + prcBody // Prc (skipped)
    out(p) = 0x02; putI32(out, p + 1, lcbPlc); p += 5 // Pcdt
    // CPs
    putI32(out, p, 0)
    putI32(out, p + 4, piece1.length)
    putI32(out, p + 8, piece1.length + piece2.length)
    p += 12
    // PCD 1: compressed (CP1252) at byte 1024 -> fc = 0x40000000 | 2048
    putU16(out, p, 0); putI32(out, p + 2, 0x40000000 | (1024 * 2)); putU16(out, p + 6, 0)
    p += 8
    // PCD 2: unicode at byte 2048 -> fc = 2048
    putU16(out, p, 0); putI32(out, p + 2, 4096); putU16(out, p + 6, 0)
    out
  }

  /** Minimal conformant v3 CFB: FAT sector 0, directory sector 1,
    * WordDocument in FAT sectors, 1Table in the mini stream. */
  private[sources] def buildDoc(): Array[Byte] = {
    val S = 512
    val table = tableStream
    val wd = wordDocumentStream(table.length)
    val wdSectors = (wd.length + S - 1) / S
    val wdStart = 2
    val miniStreamSector = wdStart + wdSectors // holds 1Table (<= 64*8 bytes)
    val miniFatSector = miniStreamSector + 1
    val totalSectors = miniFatSector + 1
    val bytes = new Array[Byte](S * (totalSectors + 1))
    // header
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    magic.indices.foreach(i => bytes(i) = magic(i).toByte)
    putU16(bytes, 26, 3) // major version
    putU16(bytes, 28, 0xFFFE) // little-endian
    putU16(bytes, 30, 9) // sector shift -> 512
    putU16(bytes, 32, 6) // mini sector shift -> 64
    putI32(bytes, 44, 1) // one FAT sector
    putI32(bytes, 48, 1) // first directory sector
    putI32(bytes, 56, 4096) // mini cutoff
    putI32(bytes, 60, miniFatSector)
    putI32(bytes, 64, 1) // one mini-FAT sector
    putI32(bytes, 68, -2) // no DIFAT chain (ENDOFCHAIN)
    putI32(bytes, 72, 0)
    putI32(bytes, 76, 0) // DIFAT[0] = FAT sector 0
    (1 until 109).foreach(i => putI32(bytes, 76 + i * 4, -1)) // FREESECT
    def sec(s: Int) = (s + 1) * S
    // FAT sector 0
    val fat = sec(0)
    (0 until S / 4).foreach(i => putI32(bytes, fat + i * 4, -1))
    putI32(bytes, fat, -3) // FATSECT marker for itself
    putI32(bytes, fat + 1 * 4, -2) // directory: single sector
    (0 until wdSectors).foreach { i =>
      putI32(bytes, fat + (wdStart + i) * 4,
        if (i == wdSectors - 1) -2 else wdStart + i + 1)
    }
    putI32(bytes, fat + miniStreamSector * 4, -2)
    putI32(bytes, fat + miniFatSector * 4, -2)
    // directory sector 1: Root, WordDocument, 1Table
    def dirEntry(idx: Int, name: String, objType: Int, start: Int, size: Long): Unit = {
      val o = sec(1) + idx * 128
      val n = name.getBytes("UTF-16LE")
      System.arraycopy(n, 0, bytes, o, n.length)
      putU16(bytes, o + 64, n.length + 2)
      bytes(o + 66) = objType.toByte
      putI32(bytes, o + 68, -1); putI32(bytes, o + 72, -1); putI32(bytes, o + 76, -1)
      putI32(bytes, o + 116, start)
      putI32(bytes, o + 120, size.toInt)
    }
    dirEntry(0, "Root Entry", 5, miniStreamSector, 64L)
    dirEntry(1, "WordDocument", 2, wdStart, wd.length.toLong)
    dirEntry(2, "1Table", 2, 0, table.length.toLong) // mini sector 0
    // WordDocument payload
    System.arraycopy(wd, 0, bytes, sec(wdStart), wd.length)
    // mini stream (root's chain): 1Table at mini sector 0
    System.arraycopy(table, 0, bytes, sec(miniStreamSector), table.length)
    // mini-FAT: entry 0 = ENDOFCHAIN, rest free
    val mf = sec(miniFatSector)
    (0 until S / 4).foreach(i => putI32(bytes, mf + i * 4, -1))
    putI32(bytes, mf, -2)
    bytes
  }

  // ---- tests --------------------------------------------------------------

  private val expectedText =
    (piece1 + piece2).replace('\r', '\n').trim

  test("CFB reader: streams resolve through FAT and mini-FAT") {
    val doc = buildDoc()
    assert(Cfb.isCfb(doc))
    assert(Cfb.entryNames(doc).toSet === Set("Root Entry", "WordDocument", "1Table"))
    val wd = Cfb.stream(doc, "WordDocument").get
    assert(wd.length > 4096)
    val tbl = Cfb.stream(doc, "1Table").get // mini-stream path
    assert(tbl.length === tableStream.length)
    assert(Cfb.stream(doc, "Nope").isEmpty)
  }

  test(".doc extracts both piece encodings, in order, with Word control chars mapped") {
    val parsed = DocumentParser.parse("application/msword", buildDoc())
    assert(parsed.text === expectedText)
    assert(parsed.metadata.get("parse_error").isEmpty)
  }

  test("OLE2 magic refines to msword and dispatches (the sniff path)") {
    val doc = buildDoc()
    assert(DocumentParser.sniffOleDocument(doc) === Some("application/msword"))
    val parsed = DocumentParser.parse("application/x-ole2-storage", doc)
    assert(parsed.text === expectedText)
  }

  test("pre-97 and malformed variants fall through to pass-through, never throw") {
    // pre-97 nFib
    val old = buildDoc()
    val wdSec = 512 * 3 // sector 2 data
    putU16(old, wdSec + 2, 0x0063)
    val p1 = DocumentParser.parse("application/msword", old)
    assert(p1.text === "")
    assert(p1.metadata.contains("doc_variant"))
    // bad wIdent
    val bad = buildDoc()
    putU16(bad, wdSec, 0x1234)
    assert(DocumentParser.parse("application/msword", bad).text === "")
  }

  test("fuzz: adversarial bytes with the CFB magic terminate cleanly") {
    val rnd = new scala.util.Random(4242)
    (0 until 200).foreach { i =>
      val n = 512 + rnd.nextInt(4096)
      val junk = new Array[Byte](n)
      rnd.nextBytes(junk)
      Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).zipWithIndex
        .foreach { case (v, j) => junk(j) = v.toByte }
      // must not throw and must not hang (cyclic FAT chains bounded)
      val p = DocumentParser.parse("application/x-ole2-storage", junk)
      assert(p.text != null, s"fuzz case $i")
    }
  }
}
