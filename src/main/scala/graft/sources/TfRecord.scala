package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * TFRecord container source/sink — the sharded record format training
 * jobs stream (`tf.data.TFRecordDataset`). Format per the PUBLIC
 * TensorFlow spec: each record is
 *
 *   uint64 length (little-endian)
 *   uint32 masked crc32c of the length bytes
 *   byte   data[length]
 *   uint32 masked crc32c of the data
 *
 * with `mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8` (the
 * published masked-CRC). CRC32C comes from the JDK
 * (`java.util.zip.CRC32C`), so framing is bit-exact with TensorFlow's
 * readers — a shard written here loads in `tf.data` unmodified, and
 * Common-Crawl-scale corpora exported for training round-trip.
 *
 * Payloads are opaque bytes (callers typically serialize one JSON or
 * protobuf example per record). Scale shape mirrors [[AvroSource]]:
 * the sink streams each partition to its own `part-NNNNN.tfrecord`
 * through an attempt-unique temp file + rename (speculation-safe);
 * the source is one `binaryFile` scan with a per-file lazy record
 * walk — files are the unit of parallelism, the standard many-shard
 * layout.
 */
object TfRecord {

  private val MaskDelta = 0xa282ead8L

  private[sources] def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue // unsigned 32-bit in a long
    val rot = ((crc >>> 15) | (crc << 17)) & 0xFFFFFFFFL
    ((rot + MaskDelta) & 0xFFFFFFFFL).toInt
  }

  /** Frame one record (for tests and single-record uses). */
  private[sources] def frame(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 16)
    val lenBytes = new Array[Byte](8)
    var l = payload.length.toLong
    var i = 0
    while (i < 8) { lenBytes(i) = (l & 0xff).toByte; l >>>= 8; i += 1 }
    out.write(lenBytes)
    writeIntLE(out, maskedCrc(lenBytes, 0, 8))
    out.write(payload)
    writeIntLE(out, maskedCrc(payload, 0, payload.length))
    out.toByteArray
  }

  private def writeIntLE(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  /** Write `payload` (a binary column) as TFRecord shards at `path`,
    * one `part-NNNNN.tfrecord` per partition (attempt-unique temp +
    * rename, same commit discipline as [[AvroSource.write]]). */
  def write(df: DataFrame, payload: Column, path: String): Unit = {
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new org.apache.hadoop.fs.Path(path)
    out.getFileSystem(confSer.value).mkdirs(out)
    df.select(payload.cast("binary").as("__p")).foreachPartition {
      (rows: Iterator[Row]) =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val finalP = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.tfrecord")
        val tmpP = new org.apache.hadoop.fs.Path(path,
          f".part-$pid%05d-attempt-${tc.taskAttemptId()}.tfrecord.tmp")
        val fs = finalP.getFileSystem(confSer.value)
        val os = new java.io.BufferedOutputStream(fs.create(tmpP, true))
        var ok = false
        try {
          rows.foreach { r =>
            val p = r.getAs[Array[Byte]](0)
            os.write(frame(if (p == null) Array.emptyByteArray else p))
          }
          ok = true
        } finally {
          os.close()
          if (ok) {
            fs.delete(finalP, false)
            if (!fs.rename(tmpP, finalP))
              throw new java.io.IOException(s"commit rename failed: $tmpP -> $finalP")
          } else fs.delete(tmpP, false)
        }
    }
  }

  /** One parsed record; `corrupt` flags a CRC mismatch (the payload
    * is still surfaced — training pipelines typically count + skip). */
  private[sources] final case class TfRec(
      path: String, record_index: Long, payload: Array[Byte], corrupt: Boolean)

  /** Read TFRecord shards: (path, record_index, payload, corrupt).
    * One binaryFile scan; the per-file walk streams records lazily and
    * stops at the first structurally-broken frame (truncation). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path").cast("string"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseFile(p, if (bytes == null) Array.emptyByteArray else bytes)
      }
      .select(col("path"), col("record_index"), col("payload"), col("corrupt"))
  }

  private[sources] def parseFile(path: String, bytes: Array[Byte]): Iterator[TfRec] =
    new Iterator[TfRec] {
      private var pos = 0
      private var idx = 0L
      private var nextRec: TfRec = null
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): TfRec = { val r = nextRec; advance(); r }
      private def advance(): Unit = {
        nextRec = null
        if (pos + 12 > bytes.length) return
        var len = 0L
        var i = 7
        while (i >= 0) { len = (len << 8) | (bytes(pos + i) & 0xffL); i -= 1 }
        // structurally impossible length -> stop (truncated/corrupt tail).
        // Subtraction form: an adversarial 8-byte length near Long.MaxValue
        // would wrap `pos + 12 + len + 4` negative and bypass an addition-form
        // guard, crashing the task in copyOfRange instead of stopping cleanly.
        if (len < 0 || len > bytes.length.toLong - pos - 16) return
        val lenCrcOk = readIntLE(bytes, pos + 8) == maskedCrc(bytes, pos, 8)
        if (!lenCrcOk) return // cannot trust the frame boundary itself
        val dataOff = pos + 12
        val payload = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + len.toInt)
        val dataCrcOk =
          readIntLE(bytes, dataOff + len.toInt) == maskedCrc(payload, 0, payload.length)
        nextRec = TfRec(path, idx, payload, corrupt = !dataCrcOk)
        idx += 1
        pos = dataOff + len.toInt + 4
      }
    }

  private def readIntLE(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
}
