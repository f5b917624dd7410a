package graft.sources

import scala.collection.mutable.ArrayBuffer

/**
 * ISO Base Media File Format (MP4/QuickTime family) box reader — the
 * video-container half of the reference's declared Tika parser set
 * (solrCellDocumentTypes.conf:256 `MP4Parser`). Format per the PUBLIC
 * ISO/IEC 14496-12 specification: a file is a sequence of boxes
 * (32-bit big-endian size + fourcc type; size==1 → 64-bit largesize;
 * size==0 → box extends to the end of its container), with movie
 * metadata under `moov` (mvhd timescale/duration; per-track `trak` →
 * tkhd id/width/height, mdia → mdhd timescale/duration + hdlr handler,
 * stbl sample tables).
 *
 * Scope: read-only metadata + REAL per-sample byte offsets — the
 * sample tables (stsz sizes, stsc sample→chunk runs, stco/co64 chunk
 * offsets, stss sync samples) are resolved to absolute
 * (sample, offset, size, keyframe) tuples, which is what a frame-
 * sampling pipeline needs instead of a byte-stride stand-in
 * (Multimodal.sampleByteFrames). Every walk is bounded by the buffer
 * length and a box-count guard, so cyclic/adversarial sizes terminate
 * (the Cfb.scala fuzz-termination discipline); malformed input yields
 * `None`, never a throw.
 *
 * `write(...)` emits a minimal deterministic MP4 (ftyp + mdat + moov,
 * mdat-first so chunk offsets are closed-form: ftyp(24) + mdat header
 * (8) + cumulative sample sizes) — the fixture generator for the
 * round-trip oracle (SparkEntry q279/q221: DuckDB recomputes the
 * offsets from the same generative arithmetic, the parser must read
 * them back bit-equal from the real binary).
 */
object IsoBmff {

  /** One resolved media sample: absolute byte offset into the file. */
  final case class Sample(index: Int, offset: Long, size: Long, keyframe: Boolean)

  /** One track: handler is 'vide'/'soun'/..., codec the stsd fourcc. */
  final case class Track(id: Long, handler: String, codec: String,
                         timescale: Long, duration: Long,
                         width: Int, height: Int, samples: IndexedSeq[Sample])

  final case class Mp4Info(brand: String, timescale: Long, duration: Long,
                           tracks: IndexedSeq[Track]) {
    def durationMillis: Long =
      if (timescale <= 0) 0L else duration * 1000L / timescale
  }

  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p'

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** One parsed box: payload [start, end) inside the buffer. */
  private final case class Box(typ: String, start: Int, end: Int)

  /** Child boxes of [from, to): bounded, monotone, throw-free. A box
    * whose declared size is non-positive, misaligned, or runs past
    * `to` ends the walk (stop at the first structurally-broken box —
    * the TfRecord framing contract). */
  private def boxes(b: Array[Byte], from: Int, to: Int): Seq[Box] = {
    val out = ArrayBuffer.empty[Box]
    var pos = from
    var guard = 0
    while (pos + 8 <= to && guard < 4096) {
      val size32 = u32(b, pos)
      val typ = fourcc(b, pos + 4)
      val (payload, size) =
        if (size32 == 1L && pos + 16 <= to) (pos + 16, u64(b, pos + 8))
        else if (size32 == 0L) (pos + 8, (to - pos).toLong)
        else (pos + 8, size32)
      // subtraction-form guard: size is untrusted 64-bit
      if (size < (payload - pos) || size > to - pos) return out.toSeq
      out += Box(typ, payload, pos + size.toInt)
      pos += size.toInt
      guard += 1
    }
    out.toSeq
  }

  private def find(bs: Seq[Box], typ: String): Option[Box] = bs.find(_.typ == typ)

  /** Versioned full-box header: returns (version, payload offset). */
  private def fullBox(b: Array[Byte], box: Box): (Int, Int) =
    (b(box.start) & 0xff, box.start + 4)

  /** Parse; None for non-MP4 / malformed input. */
  def parse(bytes: Array[Byte]): Option[Mp4Info] =
    try {
      if (!isMp4(bytes)) return None
      val top = boxes(bytes, 0, bytes.length)
      val brand = find(top, "ftyp")
        .filter(f => f.end - f.start >= 4)
        .map(f => fourcc(bytes, f.start)).getOrElse("")
      val moov = find(top, "moov").getOrElse(return None)
      val mkids = boxes(bytes, moov.start, moov.end)
      val (mvTs, mvDur) = find(mkids, "mvhd").map { h =>
        val (v, o) = fullBox(bytes, h)
        if (v == 1) (u32(bytes, o + 16), u64(bytes, o + 20))
        else (u32(bytes, o + 8), u32(bytes, o + 12))
      }.getOrElse((0L, 0L))
      val tracks = mkids.filter(_.typ == "trak").flatMap(parseTrack(bytes, _))
      Some(Mp4Info(brand, mvTs, mvDur, tracks.toIndexedSeq))
    } catch { case _: Exception => None }

  private def parseTrack(b: Array[Byte], trak: Box): Option[Track] = {
    val tkids = boxes(b, trak.start, trak.end)
    val (id, w, h) = find(tkids, "tkhd").map { t =>
      val (v, o) = fullBox(b, t)
      // tkhd: {creation,modification}(4/8 each) id(4) reserved(4)
      // duration(4/8) reserved(8) layer/group/volume/reserved(8)
      // matrix(36) — width/height are 16.16 fixed at payload offset
      // 72 (v0) / 84 (v1)
      val idOff = if (v == 1) o + 16 else o + 8
      val whOff = if (v == 1) o + 84 else o + 72
      val tid = u32(b, idOff)
      if (whOff + 8 <= t.end)
        (tid, (u32(b, whOff) >> 16).toInt, (u32(b, whOff + 4) >> 16).toInt)
      else (tid, 0, 0)
    }.getOrElse((0L, 0, 0))
    val mdia = find(tkids, "mdia").getOrElse(return None)
    val mdids = boxes(b, mdia.start, mdia.end)
    val (ts, dur) = find(mdids, "mdhd").map { m =>
      val (v, o) = fullBox(b, m)
      if (v == 1) (u32(b, o + 16), u64(b, o + 20))
      else (u32(b, o + 8), u32(b, o + 12))
    }.getOrElse((0L, 0L))
    val handler = find(mdids, "hdlr")
      .filter(hd => hd.start + 12 <= hd.end)
      .map(hd => fourcc(b, hd.start + 8)).getOrElse("")
    val stbl = find(mdids, "minf")
      .map(mi => boxes(b, mi.start, mi.end)).flatMap(find(_, "stbl"))
    val stids = stbl.map(s => boxes(b, s.start, s.end)).getOrElse(Seq.empty)
    val codec = find(stids, "stsd").filter(s => s.start + 16 <= s.end)
      .map(s => fourcc(b, s.start + 12)).getOrElse("")
    Some(Track(id, handler, codec, ts, dur, w, h, resolveSamples(b, stids)))
  }

  /** stsz × stsc × stco/co64 × stss → absolute per-sample offsets.
    * Table sizes are clamped to what the buffer can actually hold, so
    * an adversarial count cannot allocate beyond the input's length. */
  private def resolveSamples(b: Array[Byte], stids: Seq[Box]): IndexedSeq[Sample] = {
    val sizes: IndexedSeq[Long] = find(stids, "stsz") match {
      case Some(box) =>
        val (_, o) = fullBox(b, box)
        val fixed = u32(b, o)
        val declared = u32(b, o + 4)
        if (fixed > 0) // constant-size: count clamped, no table to read
          IndexedSeq.fill(math.min(declared, 1L << 20).toInt.max(0))(fixed)
        else IndexedSeq.tabulate(
          math.min(declared, (box.end - o - 8).toLong / 4).toInt.max(0))(
          i => u32(b, o + 8 + i * 4))
      case None => return IndexedSeq.empty
    }
    val chunkOffsets: IndexedSeq[Long] = find(stids, "co64") match {
      case Some(box) =>
        val (_, o) = fullBox(b, box)
        val n = math.min(u32(b, o), (box.end - o - 4).toLong / 8).toInt.max(0)
        IndexedSeq.tabulate(n)(i => u64(b, o + 4 + i * 8))
      case None => find(stids, "stco") match {
        case Some(box) =>
          val (_, o) = fullBox(b, box)
          val n = math.min(u32(b, o), (box.end - o - 4).toLong / 4).toInt.max(0)
          IndexedSeq.tabulate(n)(i => u32(b, o + 4 + i * 4))
        case None => return IndexedSeq.empty
      }
    }
    // stsc: (first_chunk, samples_per_chunk, desc_idx) runs, 1-based
    val stscRuns: IndexedSeq[(Long, Long)] = find(stids, "stsc") match {
      case Some(box) =>
        val (_, o) = fullBox(b, box)
        val n = math.min(u32(b, o), (box.end - o - 4).toLong / 12).toInt.max(0)
        IndexedSeq.tabulate(n)(i =>
          (u32(b, o + 4 + i * 12), u32(b, o + 8 + i * 12)))
      case None => IndexedSeq((1L, 1L))
    }
    val sync: Set[Long] = find(stids, "stss") match {
      case Some(box) =>
        val (_, o) = fullBox(b, box)
        val n = math.min(u32(b, o), (box.end - o - 4).toLong / 4).toInt.max(0)
        (0 until n).map(i => u32(b, o + 4 + i * 4)).toSet
      case None => Set.empty // no stss → every sample is a sync sample
    }
    val allSync = sync.isEmpty
    // walk chunks in order, consuming samples per the active stsc run
    val out = ArrayBuffer.empty[Sample]
    var sample = 0
    var run = 0
    var chunk = 0
    while (chunk < chunkOffsets.length && sample < sizes.length) {
      while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk + 1)
        run += 1
      val perChunk = math.min(stscRuns(run)._2, sizes.length.toLong).toInt.max(0)
      var off = chunkOffsets(chunk)
      var i = 0
      while (i < perChunk && sample < sizes.length) {
        val sz = sizes(sample)
        out += Sample(sample, off, sz, allSync || sync.contains(sample + 1L))
        off += sz
        sample += 1
        i += 1
      }
      chunk += 1
    }
    out.toIndexedSeq
  }

  // --------------------------------------------------------------------
  // fixture writer
  // --------------------------------------------------------------------

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ body
  }
  private def full(typ: String, payload: Array[Byte]*): Array[Byte] =
    box(typ, (Array[Byte](0, 0, 0, 0) +: payload): _*)

  /** Fixture payload offset formula: first sample of the file starts
    * at ftyp(24) + mdat header(8) = 32; samples are packed
    * back-to-back inside one mdat in chunk groups of
    * `samplesPerChunk`. The DuckDB oracle replays exactly this. */
  val FirstSampleOffset: Long = 32L

  /**
   * Minimal valid single-video-track MP4: ftyp + mdat (samples
   * back-to-back) + moov(mvhd, trak(tkhd, mdia(mdhd, hdlr,
   * minf(stbl(stsd, stsz, stsc, stco, stss))))). Sync samples: every
   * `keyEvery`-th sample starting at the first. Deterministic byte
   * output for a given argument list.
   */
  def write(sampleSizes: Seq[Int], timescale: Long, duration: Long,
            width: Int, height: Int, samplesPerChunk: Int = 3,
            keyEvery: Int = 4, trackId: Long = 1L): Array[Byte] = {
    require(sampleSizes.nonEmpty && samplesPerChunk > 0 && keyEvery > 0)
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"), be32(512L),
      "isom".getBytes("ISO-8859-1"), "mp41".getBytes("ISO-8859-1"))
    require(ftyp.length == 24, s"ftyp must be 24 bytes, got ${ftyp.length}")
    // deterministic sample bytes: sample i filled with (i*31+len)%251
    val mdatBody = sampleSizes.zipWithIndex.flatMap { case (len, i) =>
      Array.fill(len)(((i * 31 + len) % 251).toByte)
    }.toArray
    val mdat = box("mdat", mdatBody)
    // chunk offsets: cumulative over chunk groups
    val chunkOffs = ArrayBuffer.empty[Long]
    var off = FirstSampleOffset
    sampleSizes.grouped(samplesPerChunk).foreach { g =>
      chunkOffs += off
      off += g.map(_.toLong).sum
    }
    val nSamples = sampleSizes.length
    val stsz = full("stsz", be32(0L), be32(nSamples.toLong),
      sampleSizes.flatMap(s => be32(s.toLong)).toArray)
    val stsc = full("stsc", be32(1L), be32(1L), be32(samplesPerChunk.toLong), be32(1L))
    val stco = full("stco", be32(chunkOffs.length.toLong),
      chunkOffs.flatMap(be32).toArray)
    val syncIdx = (1 to nSamples by keyEvery).map(_.toLong)
    val stss = full("stss", be32(syncIdx.length.toLong),
      syncIdx.flatMap(be32).toArray)
    // stsd: one dummy visual sample entry, fourcc mp4v (86-byte body)
    val sampleEntry = be32(86L) ++ "mp4v".getBytes("ISO-8859-1") ++
      new Array[Byte](78)
    val stsd = full("stsd", be32(1L), sampleEntry)
    val stts = full("stts", be32(1L), be32(nSamples.toLong), be32(1L))
    val stbl = box("stbl", stsd, stts, stsz, stsc, stco, stss)
    val vmhd = full("vmhd", new Array[Byte](8))
    val minf = box("minf", vmhd, stbl)
    val hdlr = full("hdlr", be32(0L), "vide".getBytes("ISO-8859-1"),
      new Array[Byte](12), Array[Byte](0))
    val mdhd = full("mdhd", be32(0L), be32(0L), be32(timescale), be32(duration),
      Array[Byte](0x55, (0xc4 & 0xff).toByte, 0, 0))
    val mdia = box("mdia", mdhd, hdlr, minf)
    // tkhd v0: creation(4) modification(4) id(4) reserved(4) duration(4)
    // reserved(8) layer(2) group(2) volume(2) reserved(2) matrix(36)
    // width(4, 16.16) height(4, 16.16)
    val tkhd = full("tkhd", be32(0L), be32(0L), be32(trackId), be32(0L),
      be32(duration), new Array[Byte](16), identityMatrix,
      be32(width.toLong << 16), be32(height.toLong << 16))
    val trak = box("trak", tkhd, mdia)
    val mvhd = full("mvhd", be32(0L), be32(0L), be32(timescale), be32(duration),
      be32(0x00010000L), Array[Byte](0x01, 0x00), new Array[Byte](10),
      identityMatrix, new Array[Byte](24), be32(trackId + 1))
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  private def identityMatrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0L) ++ be32(0L) ++
      be32(0L) ++ be32(0x00010000L) ++ be32(0L) ++
      be32(0L) ++ be32(0L) ++ be32(0x40000000L)
}
