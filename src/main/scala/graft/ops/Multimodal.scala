package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column plumbing: opaque `binary`
 * payloads + typed metadata, the Spark-side shape a training-data
 * pipeline needs even when the actual codecs live elsewhere. The
 * reference's analog is the `_attachment_body`/`_attachment_mimetype`
 * pseudo-fields every morphline record carries
 * (MorphlineMapRunner.java:195,233-234) and the `detectMimeType` /
 * `decompress` commands (solrCellDocumentTypes.conf:52-77).
 *
 * Codec note: image decode is REAL for the formats the JDK's
 * `javax.imageio` ships codecs for (PNG/JPEG/GIF/BMP — decoded
 * headless, dimensions/channels/features from actual pixels). For
 * payloads ImageIO cannot decode (no external codec libraries in this
 * container: webp, video, audio) the decode falls back to a
 * clearly-marked deterministic FAKE so the pipeline shape stays
 * testable. Everything around the codec — schema, batched
 * per-partition execution, partitioning so one partition's payloads
 * fit in executor memory — is real and tested either way.
 */
object Multimodal {

  /** Typed metadata row for a binary asset column. */
  case class AssetMeta(path: String, mime: String, length: Long)
  case class DecodedImage(path: String, width: Int, height: Int,
                          channels: Int, features: Array[Float])

  /**
   * Read a directory of files as a binary-asset DataFrame:
   * (path, modificationTime, length, content) — S5 whole-file read.
   * `withContent=false` = the reference's `morphlineDisableFileOpen`
   * metadata-only mode (MorphlineMapRunner.java:84-87): Catalyst prunes
   * the content column so file bytes are never read.
   */
  def readBinary(spark: SparkSession, path: String, glob: String = "*",
                 withContent: Boolean = true): DataFrame = {
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(path)
    if (withContent) df else df.drop("content")
  }

  /**
   * detectMimeType (S10): magic-byte sniffing as a column expression
   * over the first bytes of the binary payload — no UDF, stays in
   * codegen; extend the `when` chain per format.
   */
  def sniffMime(df: DataFrame, content: String = "content"): DataFrame = {
    val head4 = hex(substring(col(content), 1, 4))
    df.withColumn("mime",
      when(head4.startsWith("89504E47"), "image/png")
        .when(head4.startsWith("FFD8FF"), "image/jpeg")
        .when(head4.startsWith("47494638"), "image/gif")
        .when(head4.startsWith("424D"), "image/bmp")
        .when(head4.startsWith("50415231"), "application/x-parquet") // PAR1
        .when(head4.startsWith("504B0304"), "application/zip")
        .when(head4.startsWith("1F8B"), "application/gzip")
        .when(head4.startsWith("28B52FFD"), "application/zstd")
        .when(head4.startsWith("04224D18"), "application/x-lz4")
        .when(head4.startsWith("FF060000"), "application/x-snappy-framed")
        .when(head4.startsWith("25504446"), "application/pdf")
        .when(head4.startsWith("D0CF11E0"), "application/x-ole2-storage")
        .when(head4.startsWith("4F676753"), "audio/ogg")
        // RIFF is a family: refine by the form type at bytes 9-12
        .when(head4.startsWith("52494646") &&
          hex(substring(col(content), 9, 4)) === "57415645", "audio/wav")
        .when(head4.startsWith("52494646") &&
          hex(substring(col(content), 9, 4)) === "57454250", "image/webp")
        .when(head4.startsWith("52494646") &&
          hex(substring(col(content), 9, 4)) === "41564920", "video/x-msvideo")
        .when(head4.startsWith("52494646"), "audio/wav")
        // ISO-BMFF: the ftyp box type at bytes 5-8 (size varies)
        .when(hex(substring(col(content), 5, 4)) === "66747970", "video/mp4")
        .when(head4.startsWith("464C56"), "video/x-flv") // "FLV"
        .when(head4.startsWith("494433"), "audio/mpeg") // ID3v2
        .when(head4.startsWith("FFFB") || head4.startsWith("FFF3") ||
          head4.startsWith("FFF2"), "audio/mpeg") // bare MPEG frame sync
        .when(head4.startsWith("664C6143"), "audio/flac") // fLaC
        .when(head4.startsWith("49492A00") ||
          head4.startsWith("4D4D002A"), "image/tiff") // II*\0 / MM\0*
        .when(head4.startsWith("38425053"), "image/vnd.adobe.photoshop") // 8BPS
        .when(head4.startsWith("4D546864"), "audio/midi") // MThd
        .when(head4.startsWith("7F454C46"), "application/x-executable") // \x7fELF
        .when(head4.startsWith("CAFEBABE"), "application/java-vm")
        .when(head4.startsWith("4F54544F"), "font/otf") // OTTO
        .when(head4.startsWith("00010000"), "font/ttf") // sfnt v1.0
        .when(head4.startsWith("4D5A"), "application/x-msdownload") // MZ
        .otherwise("application/octet-stream"))
  }

  /**
   * Decode/feature-extract, batched per partition (the Scala analog of
   * a Pandas-UDF `mapInPandas` stage: one iterator per partition, so
   * codec init amortizes across the batch).
   *
   * Real decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP); payloads it
   * cannot decode take the deterministic fake path (`fakeDecode`) so
   * non-image assets still flow with a consistent schema.
   */
  def decodeImages(spark: SparkSession, assets: DataFrame,
                   batchHint: Int = 64): Dataset[DecodedImage] = {
    import spark.implicits._
    assets.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens here (codec/model load, once)
        it.map { case (path, bytes) => decodeOne(path, bytes) }
      }
  }

  private def decodeOne(path: String, bytes: Array[Byte]): DecodedImage = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null } // corrupt/unsupported -> fake path
    if (img == null) fakeDecode(path, bytes)
    else {
      val w = img.getWidth
      val h = img.getHeight
      // 8 real pixel features over a bounded <=32x32 sample grid (cost
      // independent of image size): mean R/G/B/luma + per-quadrant luma
      val feats = new Array[Float](8)
      val gx = math.min(32, w)
      val gy = math.min(32, h)
      var yi = 0
      while (yi < gy) {
        val y = yi * h / gy
        var xi = 0
        while (xi < gx) {
          val x = xi * w / gx
          val rgb = img.getRGB(x, y)
          val r = ((rgb >> 16) & 0xFF) / 255.0f
          val g = ((rgb >> 8) & 0xFF) / 255.0f
          val b = (rgb & 0xFF) / 255.0f
          val luma = 0.299f * r + 0.587f * g + 0.114f * b
          feats(0) += r; feats(1) += g; feats(2) += b; feats(3) += luma
          feats(4 + (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)) += luma
          xi += 1
        }
        yi += 1
      }
      val total = (gx * gy).toFloat
      feats(0) /= total; feats(1) /= total; feats(2) /= total; feats(3) /= total
      var q = 4
      while (q < 8) { feats(q) /= total / 4.0f; q += 1 }
      DecodedImage(path, w, h, img.getColorModel.getNumComponents, feats)
    }
  }

  /** ??? in spirit: a deterministic fake decode standing in for codecs
    * the JDK lacks (webp/video/audio) — size-derived dims, 8 byte-
    * moment features. Keeps undecodable payloads flowing with the same
    * schema. */
  private def fakeDecode(path: String, bytes: Array[Byte]): DecodedImage = {
    val n = bytes.length
    val w = 64 + (n % 512)
    val h = 64 + ((n / 512) % 512)
    val feats = new Array[Float](8)
    var i = 0
    while (i < n) { feats(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    if (n > 0) { var j = 0; while (j < 8) { feats(j) /= math.max(1, n / 8).toFloat; j += 1 } }
    DecodedImage(path, w, h, 3, feats)
  }

  /**
   * Resize planning: aspect-preserving target dimensions capped at
   * `maxDim` (the Spark-side arithmetic of a resize stage — the pixel
   * resample itself belongs in the decode codec, see decodeImages).
   * Never upscales.
   */
  def resizePlan(df: DataFrame, widthCol: String, heightCol: String,
                 maxDim: Int = 512): DataFrame = {
    val w = col(widthCol).cast("double")
    val h = col(heightCol).cast("double")
    val scale = least(lit(1.0), lit(maxDim.toDouble) / greatest(w, h))
    df.withColumn("target_width", greatest(lit(1), round(w * scale).cast("int")))
      .withColumn("target_height", greatest(lit(1), round(h * scale).cast("int")))
  }

  /**
   * Frame-sampling plan for video assets: every `everyNth` frame index
   * up to `maxFrames` — the explode pattern that turns one video row
   * into N frame rows with bounded fan-out (bound it BEFORE the
   * explode so the shuffle sees only sampled frames).
   */
  def sampleFrameIndexes(df: DataFrame, frameCount: String,
                         everyNth: Int = 30, maxFrames: Int = 32): DataFrame =
    df.withColumn("frame_index",
      explode(slice(sequence(lit(0), greatest(col(frameCount) - 1, lit(0)), lit(everyNth)),
        1, maxFrames)))

  /**
   * Byte-level frame extraction over whole-file binary assets (the
   * container-agnostic form of [[sampleFrameIndexes]]: fixed-stride
   * byte windows standing in for codec-aware frame boundaries — the
   * stride/window mirror a keyframe interval; a real demuxer slots in
   * where the substring is). Offsets are bounded BEFORE the explode
   * (`maxFrames` cap), so the fan-out a 4 GB video would otherwise
   * cause never reaches the shuffle; the frame bytes ride Spark's
   * binary substring (real bytes, zero-copy slice of the row value).
   * Output: (path, length, frame_idx, byte_off, frame_len, frame).
   */
  /** One sampled frame: real container sample for MP4/FLV payloads,
    * stride window otherwise (`container` says which path fired). */
  case class SampledFrame(path: String, length: Long, frame_idx: Int,
                          byte_off: Long, frame_len: Long,
                          keyframe: Boolean, container: String)

  /**
   * Container-aware frame sampling — the upgrade over the byte-stride
   * stand-in: payloads that parse as ISO-BMFF (graft.sources.IsoBmff)
   * or FLV (graft.sources.Flv) emit their REAL keyframe byte offsets
   * and sizes from the container's own sample tables (stsz/stsc/stco/
   * stss, video-tag frametype); anything else falls back to the exact
   * `sampleByteFrames` stride arithmetic. Runs as one batched
   * per-partition pass (the mapInPandas shape) — parser state is
   * per-task, payload bytes never leave the executor.
   */
  def sampleContainerFrames(spark: SparkSession, df: DataFrame,
                            every: Int, frameLen: Int,
                            maxFrames: Int = 64): Dataset[SampledFrame] = {
    require(every > 0 && frameLen > 0 && maxFrames > 0)
    import spark.implicits._
    import graft.sources.{Flv, IsoBmff}
    df.select(col("path"), col("length"), col("content"))
      .as[(String, Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, length, content) =>
        lazy val stride = {
          val n = math.min(maxFrames.toLong,
            math.max(length - 1, 0L) / every + 1).toInt
          (0 until n).map { i =>
            val off = i.toLong * every
            SampledFrame(path, length, i, off,
              math.min(frameLen.toLong, length - off), keyframe = false,
              "stride")
          }
        }
        // a container that parses but yields NO keyframes (empty/absent
        // sample tables) falls back to stride like any other payload —
        // a file must never silently contribute zero rows
        val mp4Frames = IsoBmff.parse(content).map(info =>
          info.tracks.flatMap(_.samples).filter(_.keyframe)
            .sortBy(s => (s.offset, s.index)).take(maxFrames).zipWithIndex
            .map { case (s, i) =>
              SampledFrame(path, length, i, s.offset, s.size,
                keyframe = true, "mp4")
            })
        lazy val flvFrames = Flv.parse(content).map(info =>
          info.keyframes.take(maxFrames).zipWithIndex.map { case (t, i) =>
            SampledFrame(path, length, i, t.offset, t.dataSize,
              keyframe = true, "flv")
          })
        mp4Frames.filter(_.nonEmpty)
          .orElse(flvFrames.filter(_.nonEmpty))
          .getOrElse(stride)
      })
  }

  def sampleByteFrames(df: DataFrame, every: Int, frameLen: Int,
                       maxFrames: Int = 64): DataFrame = {
    require(every > 0 && frameLen > 0 && maxFrames > 0)
    val offs = slice(
      sequence(lit(0L), greatest(col("length") - 1, lit(0L)), lit(every.toLong)),
      1, maxFrames)
    df.select(col("path"), col("length"), col("content"),
        posexplode(offs).as(Seq("frame_idx", "byte_off")))
      .withColumn("frame_len",
        least(lit(frameLen.toLong), col("length") - col("byte_off")))
      .withColumn("frame",
        expr(s"substring(content, byte_off + 1, $frameLen)"))
      .drop("content")
  }
}
