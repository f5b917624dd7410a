package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Legacy binary Excel/PowerPoint extraction against hand-built
  * [MS-XLS]/[MS-PPT] fixtures inside a minimal CFB container — the
  * SST Continue-boundary grbit re-read, cp1252/UTF-16 runs, rich-run
  * skips, sheet names, the PPT record-tree walk, sniff refinement,
  * and the fuzz-termination contract. */
class XlsPptSpec extends AnyFunSuite {

  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
    putU16(b, o, v & 0xffff); putU16(b, o + 2, (v >> 16) & 0xffff)
  }

  /** Minimal v3 CFB: one stream, regular FAT chain (payload padded to
    * the 4096 mini cutoff so it never routes through the mini stream). */
  private def buildCfb(streamName: String, content: Array[Byte]): Array[Byte] = {
    val S = 512
    val payload = if (content.length >= 4096) content
      else content ++ new Array[Byte](4096 - content.length)
    val pSectors = (payload.length + S - 1) / S
    val pStart = 2 // 0 = FAT, 1 = directory
    val total = pStart + pSectors
    val bytes = new Array[Byte](S * (total + 1))
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    magic.indices.foreach(i => bytes(i) = magic(i).toByte)
    putU16(bytes, 26, 3); putU16(bytes, 28, 0xFFFE)
    putU16(bytes, 30, 9); putU16(bytes, 32, 6)
    putI32(bytes, 44, 1) // one FAT sector
    putI32(bytes, 48, 1) // directory at sector 1
    putI32(bytes, 56, 4096)
    putI32(bytes, 60, -2); putI32(bytes, 64, 0) // no mini FAT
    putI32(bytes, 68, -2); putI32(bytes, 72, 0) // no DIFAT chain
    putI32(bytes, 76, 0)
    (1 until 109).foreach(i => putI32(bytes, 76 + i * 4, -1))
    def sec(s: Int) = (s + 1) * S
    val fat = sec(0)
    (0 until S / 4).foreach(i => putI32(bytes, fat + i * 4, -1))
    putI32(bytes, fat, -3) // FATSECT
    putI32(bytes, fat + 4, -2) // single directory sector
    (0 until pSectors).foreach { i =>
      putI32(bytes, fat + (pStart + i) * 4,
        if (i == pSectors - 1) -2 else pStart + i + 1)
    }
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
    dirEntry(0, "Root Entry", 5, -2, 0L)
    dirEntry(1, streamName, 2, pStart, payload.length.toLong)
    System.arraycopy(payload, 0, bytes, sec(pStart), payload.length)
    bytes
  }

  // ---- BIFF8 workbook fixture ------------------------------------------

  private def biffRecord(typ: Int, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](4 + data.length)
    putU16(out, 0, typ); putU16(out, 2, data.length)
    System.arraycopy(data, 0, out, 4, data.length)
    out
  }

  /** SST split mid-string: "ABCDEFGH" starts compressed in the SST
    * record (3 chars) and continues UTF-16 after a fresh grbit in the
    * Continue — the boundary re-read [MS-XLS] 2.5.293 requires. */
  private def buildXls(): Array[Byte] = {
    val bof = biffRecord(0x0809, {
      val d = new Array[Byte](16); putU16(d, 0, 0x0600); putU16(d, 2, 5); d
    })
    val sheet = biffRecord(0x0085, {
      val name = "Sheet1".getBytes("windows-1252")
      val d = new Array[Byte](8 + name.length)
      putI32(d, 0, 0); putU16(d, 4, 0)
      d(6) = name.length.toByte; d(7) = 0
      System.arraycopy(name, 0, d, 8, name.length); d
    })
    val sst = {
      val b = java.nio.ByteBuffer.allocate(256)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(5).putInt(5) // cstTotal, cstUnique
      // "hello" compressed
      b.putShort(5).put(0.toByte).put("hello".getBytes("windows-1252"))
      // "wörld" compressed (cp1252 high byte)
      b.putShort(5).put(0.toByte).put("wörld".getBytes("windows-1252"))
      // "日本語" UTF-16
      b.putShort(3).put(1.toByte).put("日本語".getBytes("UTF-16LE"))
      // rich string: cRun=1, chars "rich", then 4 run bytes to skip
      b.putShort(4).put(0x08.toByte).putShort(1)
        .put("rich".getBytes("windows-1252")).putInt(0xDEAD)
      // split string: cch=8, compressed, only "ABC" fits here
      b.putShort(8).put(0.toByte).put("ABC".getBytes("windows-1252"))
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    val cont = {
      val b = java.nio.ByteBuffer.allocate(16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put("DEFGH".getBytes("UTF-16LE")) // fresh grbit: UTF-16
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    val eof = biffRecord(0x000A, Array.empty)
    val wb = bof ++ sheet ++ biffRecord(0x00FC, sst) ++
      biffRecord(0x003C, cont) ++ eof
    buildCfb("Workbook", wb)
  }

  // ---- PPT fixture ------------------------------------------------------

  private def pptRecord(ver: Int, typ: Int, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + data.length)
    putU16(out, 0, ver & 0xF); putU16(out, 2, typ); putI32(out, 4, data.length)
    System.arraycopy(data, 0, out, 8, data.length)
    out
  }

  private def buildPpt(): Array[Byte] = {
    val chars = pptRecord(0, 0x0FA0, "Hello".getBytes("UTF-16LE"))
    val bytesAtom = pptRecord(0, 0x0FA8, "World\r2nd".getBytes("windows-1252"))
    val container = pptRecord(0xF, 0x03EE, chars ++ bytesAtom)
    val top = pptRecord(0, 0x0FA8, "Again".getBytes("windows-1252"))
    buildCfb("PowerPoint Document", container ++ top)
  }

  // ---- tests ------------------------------------------------------------

  test(".xls: SST strings across a Continue boundary, both encodings, rich runs skipped") {
    val parsed = DocumentParser.parse("application/vnd.ms-excel", buildXls())
    assert(parsed.text === "hello\nwörld\n日本語\nrich\nABCDEFGH")
    assert(parsed.metadata("n_strings") === "5")
    assert(parsed.metadata("sheets") === "Sheet1")
    assert(parsed.metadata.get("parse_error").isEmpty)
  }

  test(".xls: OLE2 sniff refines to vnd.ms-excel and dispatches") {
    val xls = buildXls()
    assert(DocumentParser.sniffOleDocument(xls) === Some("application/vnd.ms-excel"))
    val parsed = DocumentParser.parse("application/x-ole2-storage", xls)
    assert(parsed.text.startsWith("hello"))
  }

  test(".xls: BIFF5 Book stream and missing streams fall through, never throw") {
    val biff5 = buildCfb("Book", new Array[Byte](64))
    val p1 = DocumentParser.parse("application/vnd.ms-excel", biff5)
    assert(p1.text === "")
    assert(p1.metadata("xls_variant") === "BIFF5 Book stream")
    val empty = buildCfb("SomethingElse", new Array[Byte](64))
    assert(DocumentParser.parse("application/vnd.ms-excel", empty).text === "")
  }

  test(".xls: truncated SST keeps the strings that decoded") {
    // chop the workbook stream just after "hello": rebuild with a lying
    // SST (cstUnique says 5, data holds 1.5 strings)
    val sst = {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(5).putInt(5)
      b.putShort(5).put(0.toByte).put("hello".getBytes("windows-1252"))
      b.putShort(9).put(0.toByte).put("trunc".getBytes("windows-1252"))
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    val wb = biffRecord(0x00FC, sst)
    val parsed = DocumentParser.parse("application/vnd.ms-excel",
      buildCfb("Workbook", wb))
    assert(parsed.text === "hello")
  }

  test(".ppt: text atoms inside containers and at top level, in stream order") {
    val parsed = DocumentParser.parse("application/vnd.ms-powerpoint", buildPpt())
    assert(parsed.text === "Hello\nWorld\n2nd\nAgain")
    assert(parsed.metadata("n_text_atoms") === "3")
  }

  test(".ppt: OLE2 sniff refines to vnd.ms-powerpoint") {
    val ppt = buildPpt()
    assert(DocumentParser.sniffOleDocument(ppt) ===
      Some("application/vnd.ms-powerpoint"))
    assert(DocumentParser.parse("application/x-ole2-storage", ppt)
      .text.startsWith("Hello"))
  }

  test("fuzz: adversarial Workbook/PowerPoint streams terminate cleanly") {
    val rnd = new scala.util.Random(8484)
    (0 until 200).foreach { i =>
      val n = 64 + rnd.nextInt(4096)
      val junk = new Array[Byte](n)
      rnd.nextBytes(junk)
      val name = if (i % 2 == 0) "Workbook" else "PowerPoint Document"
      val mime = if (i % 2 == 0) "application/vnd.ms-excel"
                 else "application/vnd.ms-powerpoint"
      val p = DocumentParser.parse(mime, buildCfb(name, junk))
      assert(p.text != null, s"fuzz case $i")
    }
  }
}
