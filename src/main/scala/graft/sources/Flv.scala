package graft.sources

import scala.collection.mutable.ArrayBuffer

/**
 * FLV (Flash Video) container reader — the second video parser in the
 * reference's declared Tika set (solrCellDocumentTypes.conf:265
 * `FLVParser`). Format per the PUBLIC Adobe Video File Format
 * Specification v10: a 9-byte header (`FLV` + version + a/v flags +
 * data offset), then back-to-back tags, each `type(1) dataSize(3)
 * timestamp(3+1ext) streamId(3) data[dataSize]` framed by 4-byte
 * previous-tag-size words. Video tag payloads lead with a
 * frametype/codec nibble pair (frametype 1 = keyframe).
 *
 * Scope mirrors IsoBmff: metadata (duration from the max timestamp,
 * tag counts) plus REAL keyframe byte offsets (the offset of the
 * video payload inside the file). Bounded walk — a tag whose declared
 * size runs past the buffer ends the parse (stop at the first
 * structurally-broken frame); malformed input → None, never a throw.
 *
 * `write(...)` emits a deterministic fixture: header(9) + PTS0(4)
 * puts the first tag at offset 13; each tag's payload starts 11 bytes
 * after the tag, and tags are chained with exact previous-size words,
 * so payload offsets are closed-form for the round-trip oracle.
 */
object Flv {

  final case class Tag(tagType: Int, offset: Long, dataSize: Long,
                       timestampMs: Long, keyframe: Boolean)

  final case class FlvInfo(version: Int, hasVideo: Boolean, hasAudio: Boolean,
                           durationMs: Long, tags: IndexedSeq[Tag]) {
    def keyframes: IndexedSeq[Tag] = tags.filter(_.keyframe)
  }

  def isFlv(bytes: Array[Byte]): Boolean =
    bytes.length >= 9 && bytes(0) == 'F' && bytes(1) == 'L' && bytes(2) == 'V'

  private def u24(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  def parse(bytes: Array[Byte]): Option[FlvInfo] =
    try {
      if (!isFlv(bytes)) return None
      val version = bytes(3) & 0xff
      val flags = bytes(4) & 0xff
      val dataOffset = u32(bytes, 5)
      if (dataOffset < 9 || dataOffset > bytes.length) return None
      val tags = ArrayBuffer.empty[Tag]
      var pos = dataOffset.toInt + 4 // skip PreviousTagSize0
      var guard = 0
      var maxTs = 0L
      while (pos + 11 <= bytes.length && guard < (1 << 20)) {
        val tagType = bytes(pos) & 0xff
        val dataSize = u24(bytes, pos + 1).toLong
        val ts = u24(bytes, pos + 4).toLong | ((bytes(pos + 7) & 0xffL) << 24)
        // subtraction-form guard against crafted sizes
        if (dataSize > bytes.length - pos - 11 - 4) {
          return Some(FlvInfo(version, (flags & 1) != 0, (flags & 4) != 0,
            maxTs, tags.toIndexedSeq))
        }
        val payloadOff = pos + 11
        val key = tagType == 9 && dataSize > 0 &&
          ((bytes(payloadOff) & 0xf0) >> 4) == 1
        tags += Tag(tagType, payloadOff.toLong, dataSize, ts, key)
        if (ts > maxTs) maxTs = ts
        pos = payloadOff + dataSize.toInt + 4 // + PreviousTagSize
        guard += 1
      }
      Some(FlvInfo(version, (flags & 1) != 0, (flags & 4) != 0,
        maxTs, tags.toIndexedSeq))
    } catch { case _: Exception => None }

  // --------------------------------------------------------------------
  // fixture writer
  // --------------------------------------------------------------------

  private def be24(v: Int): Array[Byte] =
    Array(((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** First tag's payload offset in any `write` output: header(9) +
    * PTS0(4) + tag header(11). */
  val FirstPayloadOffset: Long = 24L

  /**
   * Deterministic fixture: video tags only, sizes/timestamps given;
   * every `keyEvery`-th tag (starting with the first) is a keyframe.
   * Payload i offset = 24 + Σ_{j<i} (sizes(j) + 15).
   */
  def write(payloadSizes: Seq[Int], msPerTag: Int, keyEvery: Int = 4): Array[Byte] = {
    require(payloadSizes.nonEmpty && payloadSizes.forall(_ >= 1) && keyEvery > 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write("FLV".getBytes("ISO-8859-1"))
    out.write(1)         // version
    out.write(0x01)      // video present
    out.write(be32(9L))  // data offset
    out.write(be32(0L))  // PreviousTagSize0
    payloadSizes.zipWithIndex.foreach { case (len, i) =>
      val ts = i.toLong * msPerTag
      out.write(9)       // video tag
      out.write(be24(len))
      out.write(be24((ts & 0xffffff).toInt))
      out.write(((ts >> 24) & 0xff).toInt)
      out.write(be24(0)) // stream id
      val frameType = if (i % keyEvery == 0) 1 else 2
      out.write((frameType << 4) | 2) // codec id 2 (H.263) — fixture
      var j = 1
      while (j < len) { out.write((i * 17 + j) % 251); j += 1 }
      out.write(be32(11L + len))
    }
    out.toByteArray
  }
}
