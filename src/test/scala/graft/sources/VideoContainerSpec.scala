package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** MP4 (ISO-BMFF) and FLV container parsing: round-trip against the
  * deterministic fixture writers (offsets must equal the closed-form
  * layout arithmetic the DuckDB oracle replays), plus the fuzz
  * discipline every parser in this package carries — truncation and
  * byte-flip sweeps must terminate without throwing (Cfb/TfRecord
  * contract). */
class VideoContainerSpec extends AnyFunSuite {

  private val sizes = Seq(100, 107, 114, 121, 128, 135, 142)
  private val mp4 = IsoBmff.write(sizes, timescale = 1000, duration = 3500,
    width = 640, height = 360, samplesPerChunk = 3, keyEvery = 4)

  test("mp4 round-trip: brand, timing, track metadata") {
    val info = IsoBmff.parse(mp4).get
    assert(info.brand == "isom")
    assert(info.timescale == 1000L && info.duration == 3500L)
    assert(info.durationMillis == 3500L)
    assert(info.tracks.length == 1)
    val t = info.tracks.head
    assert(t.handler == "vide" && t.codec == "mp4v")
    assert(t.width == 640 && t.height == 360)
    assert(t.timescale == 1000L && t.duration == 3500L)
  }

  test("mp4 sample table resolves to closed-form offsets") {
    val t = IsoBmff.parse(mp4).get.tracks.head
    assert(t.samples.length == sizes.length)
    var off = IsoBmff.FirstSampleOffset
    sizes.zipWithIndex.foreach { case (sz, i) =>
      val s = t.samples(i)
      assert(s.index == i && s.offset == off && s.size == sz.toLong,
        s"sample $i: $s expected offset $off size $sz")
      assert(s.keyframe == (i % 4 == 0))
      off += sz
    }
    // the samples really live there: fixture fills sample i with
    // (i*31+len)%251
    val s3 = t.samples(3)
    assert(mp4(s3.offset.toInt) == ((3 * 31 + sizes(3)) % 251).toByte)
  }

  test("mp4 chunk grouping: stsc/stco walk spans partial last chunk") {
    // 7 samples, 3 per chunk -> chunks of 3,3,1; all offsets contiguous
    val t = IsoBmff.parse(mp4).get.tracks.head
    val total = t.samples.map(_.size).sum
    assert(t.samples.last.offset + t.samples.last.size ==
      IsoBmff.FirstSampleOffset + total)
  }

  test("mp4 sniffed and parsed through DocumentParser") {
    val doc = DocumentParser.parse("video/mp4", mp4)
    assert(doc.metadata("duration_ms") == "3500")
    assert(doc.metadata("n_samples") == "7")
    assert(doc.metadata("n_keyframes") == "2")
    assert(doc.metadata("width") == "640" && doc.metadata("height") == "360")
    assert(doc.metadata("codecs") == "mp4v")
  }

  test("mp4 fuzz: truncations and byte flips terminate, never throw") {
    (0 until mp4.length by 7).foreach { cut =>
      IsoBmff.parse(mp4.take(cut)) // must not throw
    }
    (0 until mp4.length by 3).foreach { i =>
      val mutated = mp4.clone()
      mutated(i) = (mutated(i) ^ 0xff).toByte
      IsoBmff.parse(mutated) // must not throw
      DocumentParser.parse("video/mp4", mutated)
    }
  }

  test("mp4 adversarial: 64-bit largesize overflow cannot wrap the walk") {
    val evil = mp4.clone()
    // rewrite the mdat header to size==1 + largesize near Long.MaxValue
    // (subtraction-form guard must reject, not wrap)
    evil(24) = 0; evil(25) = 0; evil(26) = 0; evil(27) = 1
    val info = IsoBmff.parse(evil) // moov now unreachable -> None
    assert(info.isEmpty || info.get.tracks.isEmpty)
  }

  private val flvSizes = Seq(40, 47, 54, 61, 68)
  private val flv = Flv.write(flvSizes, msPerTag = 40, keyEvery = 3)

  test("flv round-trip: tags, keyframes, closed-form payload offsets") {
    val info = Flv.parse(flv).get
    assert(info.version == 1 && info.hasVideo && !info.hasAudio)
    assert(info.tags.length == flvSizes.length)
    assert(info.durationMs == (flvSizes.length - 1) * 40L)
    var off = Flv.FirstPayloadOffset
    flvSizes.zipWithIndex.foreach { case (sz, i) =>
      val t = info.tags(i)
      assert(t.offset == off && t.dataSize == sz.toLong)
      assert(t.timestampMs == i * 40L)
      assert(t.keyframe == (i % 3 == 0))
      off += sz + 15
    }
    assert(info.keyframes.length == 2)
  }

  test("flv through DocumentParser") {
    val doc = DocumentParser.parse("video/x-flv", flv)
    assert(doc.metadata("n_tags") == "5")
    assert(doc.metadata("n_keyframes") == "2")
    assert(doc.metadata("duration_ms") == "160")
  }

  test("flv fuzz: truncations and byte flips terminate, never throw") {
    (0 until flv.length by 5).foreach(cut => Flv.parse(flv.take(cut)))
    (0 until flv.length by 3).foreach { i =>
      val mutated = flv.clone()
      mutated(i) = (mutated(i) ^ 0xff).toByte
      Flv.parse(mutated)
    }
  }

  test("flv adversarial: crafted dataSize past the buffer stops cleanly") {
    val evil = flv.clone()
    evil(14) = 0xff.toByte; evil(15) = 0xff.toByte; evil(16) = 0xff.toByte
    val info = Flv.parse(evil).get
    assert(info.tags.isEmpty) // first frame structurally broken -> stop
  }

  test("non-container bytes: both parsers decline") {
    val junk = Array.tabulate[Byte](256)(i => (i * 7).toByte)
    assert(IsoBmff.parse(junk).isEmpty)
    assert(Flv.parse(junk).isEmpty)
  }
}
