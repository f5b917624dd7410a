package graft.sources

/**
 * Compound File Binary (OLE2 structured storage) reader — the
 * container of legacy Office documents (.doc/.xls/.ppt/.msg). Format
 * per the PUBLIC [MS-CFB] specification: a 512-byte header with a
 * 109-entry DIFAT, FAT sector chains, a directory of 128-byte
 * entries, and a mini-FAT whose 64-byte sectors live inside the root
 * entry's mini stream (streams under the 4096-byte cutoff).
 *
 * Scope: read-only stream extraction (`stream(bytes, name)`), v3
 * (512-byte sectors) and v4 (4096), DIFAT overflow chains included.
 * Every chain walk is bounded by the file's sector count, so cyclic
 * FAT chains in corrupt/adversarial input terminate instead of
 * spinning (the RTF fuzz-termination discipline,
 * DocumentParser.scala's parser contract).
 */
object Cfb {

  private val Magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 512 && Magic.indices.forall(i => bytes(i) == Magic(i))

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def i64(b: Array[Byte], o: Int): Long =
    (i32(b, o) & 0xFFFFFFFFL) | ((i32(b, o + 4) & 0xFFFFFFFFL) << 32)

  /** One directory entry: (name, objectType, startSector, size). */
  final case class Entry(name: String, objType: Int, start: Int, size: Long)

  private final class Container(bytes: Array[Byte]) {
    require(isCfb(bytes), "not a CFB container")
    private val sectorShift = u16(bytes, 30)
    require(sectorShift == 9 || sectorShift == 12,
      s"unsupported CFB sector shift $sectorShift")
    val sectorSize: Int = 1 << sectorShift
    val miniSectorSize: Int = 1 << u16(bytes, 32)
    val miniCutoff: Int = i32(bytes, 56)
    private val numFatSectors = i32(bytes, 44)
    private val firstDirSector = i32(bytes, 48)
    private val firstMiniFatSector = i32(bytes, 60)
    private val numMiniFatSectors = i32(bytes, 64)
    private val firstDifatSector = i32(bytes, 68)
    private val numDifatSectors = i32(bytes, 72)
    private val maxSectors = math.max(0, (bytes.length - sectorSize) / sectorSize) + 1

    private def sectorOffset(s: Int): Int = (s + 1) * sectorSize

    /** FAT sector list: 109 header DIFAT entries + overflow chain. */
    private val fatSectors: IndexedSeq[Int] = {
      val out = IndexedSeq.newBuilder[Int]
      var taken = 0
      var i = 0
      while (i < 109 && taken < numFatSectors) {
        val s = i32(bytes, 76 + i * 4)
        if (s != FreeSect && s >= 0) { out += s; taken += 1 }
        i += 1
      }
      var difat = firstDifatSector
      var guard = 0
      val perSector = sectorSize / 4 - 1
      while (taken < numFatSectors && difat != EndOfChain && difat >= 0 &&
          guard < numDifatSectors + 2 && guard < maxSectors) {
        val base = sectorOffset(difat)
        require(base + sectorSize <= bytes.length, "DIFAT sector out of range")
        var j = 0
        while (j < perSector && taken < numFatSectors) {
          val s = i32(bytes, base + j * 4)
          if (s != FreeSect && s >= 0) { out += s; taken += 1 }
          j += 1
        }
        difat = i32(bytes, base + perSector * 4)
        guard += 1
      }
      out.result()
    }

    /** Next sector in a FAT chain. */
    private def fatNext(sector: Int): Int = {
      val per = sectorSize / 4
      fatSectors.lift(sector / per) match {
        case None => EndOfChain
        case Some(fatSec) =>
          val off = sectorOffset(fatSec) + (sector % per) * 4
          if (off + 4 > bytes.length) EndOfChain else i32(bytes, off)
      }
    }

    /** Read a FAT chain as bytes, truncated to `size`. Chain walks are
      * bounded by the container's sector count. */
    def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(
        math.min(size, 1L << 26).toInt.max(64))
      var s = start
      var remaining = size
      var guard = 0
      while (s != EndOfChain && s >= 0 && remaining > 0 && guard <= maxSectors) {
        val off = sectorOffset(s)
        if (off >= bytes.length) return out.toByteArray
        val n = math.min(math.min(sectorSize.toLong, remaining),
          (bytes.length - off).toLong).toInt
        out.write(bytes, off, n)
        remaining -= n
        s = fatNext(s)
        guard += 1
      }
      out.toByteArray
    }

    /** All directory entries, chain order. */
    val entries: IndexedSeq[Entry] = {
      // directory stream size is implicit (chain length) — read greedily
      val dirBytes = readChain(firstDirSector, maxSectors.toLong * sectorSize)
      (0 until dirBytes.length / 128).flatMap { i =>
        val o = i * 128
        val nameLen = u16(dirBytes, o + 64) // bytes incl. terminator
        val objType = dirBytes(o + 66) & 0xff
        if (nameLen < 2 || nameLen > 64 || objType == 0) None
        else {
          val name = new String(dirBytes, o, nameLen - 2, "UTF-16LE")
          Some(Entry(name, objType, i32(dirBytes, o + 116), i64(dirBytes, o + 120)))
        }
      }
    }

    private lazy val root: Option[Entry] = entries.find(_.objType == 5)

    /** Mini-FAT table (as one array of ints) and the mini stream. */
    private lazy val miniFat: Array[Int] = {
      val raw = readChain(firstMiniFatSector,
        numMiniFatSectors.toLong * sectorSize)
      Array.tabulate(raw.length / 4)(i => i32(raw, i * 4))
    }
    private lazy val miniStream: Array[Byte] =
      root.map(r => readChain(r.start, r.size)).getOrElse(Array.emptyByteArray)

    private def readMiniChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(
        math.min(size, 1L << 26).toInt.max(64))
      var s = start
      var remaining = size
      var guard = 0
      val maxMini = miniStream.length / miniSectorSize + 1
      while (s != EndOfChain && s >= 0 && remaining > 0 && guard <= maxMini) {
        val off = s * miniSectorSize
        if (off >= miniStream.length) return out.toByteArray
        val n = math.min(math.min(miniSectorSize.toLong, remaining),
          (miniStream.length - off).toLong).toInt
        out.write(miniStream, off, n)
        remaining -= n
        s = if (s < miniFat.length) miniFat(s) else EndOfChain
        guard += 1
      }
      out.toByteArray
    }

    def stream(name: String): Option[Array[Byte]] =
      entries.find(e => e.objType == 2 && e.name.equalsIgnoreCase(name))
        .map { e =>
          if (e.size < miniCutoff) readMiniChain(e.start, e.size)
          else readChain(e.start, e.size)
        }
  }

  /** Named stream's bytes, or None (absent stream / not a CFB /
    * malformed container — extraction must never throw on crawl
    * input). */
  def stream(bytes: Array[Byte], name: String): Option[Array[Byte]] =
    try {
      if (!isCfb(bytes)) None else new Container(bytes).stream(name)
    } catch { case _: Exception => None }

  /** Directory entry names (streams and storages) — the refinement
    * key for OLE2 MIME sniffing (WordDocument → msword, Workbook →
    * excel, "PowerPoint Document" → powerpoint). */
  def entryNames(bytes: Array[Byte]): Seq[String] =
    try {
      if (!isCfb(bytes)) Seq.empty
      else new Container(bytes).entries.map(_.name)
    } catch { case _: Exception => Seq.empty }
}
