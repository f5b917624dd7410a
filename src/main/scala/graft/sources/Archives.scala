package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * decompress / unpack (S11): the reference re-emits the inner files of
 * gzip/bzip2/tar/zip attachments as separate records
 * (solrCellDocumentTypes.conf:60-77). Here: a codec UDF over the
 * binary content column producing array<struct<name,bytes>>, exploded
 * into one row per inner entry — record-to-N-records = Generator
 * semantics (SURVEY.md §2.9).
 *
 * The UDF is the right tool here (unlike scalar hot paths): archive
 * decoding is per-blob imperative IO with no columnar form, and blobs
 * are bounded by `maxEntryBytes` so one task never inflates an
 * unbounded archive into memory (zip-bomb guard the reference lacks).
 */
object Archives {

  case class ArchiveEntry(name: String, content: Array[Byte])

  private val MaxEntryBytes = 64 * 1024 * 1024

  private def readAll(in: java.io.InputStream, cap: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      require(out.size() <= cap, s"archive entry exceeds $cap bytes")
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** Shared shape of every single-entry decompressor: wrap the bytes
    * in the codec stream, read capped, name = outer minus suffixes. */
  private def decompressOne(name: String, bytes: Array[Byte],
                            suffixes: Seq[String],
                            mkStream: java.io.InputStream => java.io.InputStream)
      : Seq[ArchiveEntry] = {
    val in = mkStream(new java.io.ByteArrayInputStream(bytes))
    try Seq(ArchiveEntry(
      suffixes.foldLeft(name)(_ stripSuffix _), readAll(in, MaxEntryBytes)))
    finally in.close()
  }

  /** gzip: one inner entry, named after the outer file minus `.gz`. */
  def gunzip(name: String, bytes: Array[Byte]): Seq[ArchiveEntry] =
    decompressOne(name, bytes, Seq(".gz", ".gzip"),
      new java.util.zip.GZIPInputStream(_))

  def unzip(bytes: Array[Byte]): Seq[ArchiveEntry] = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .filterNot(_.isDirectory)
        .map(e => ArchiveEntry(e.getName, readAll(zin, MaxEntryBytes)))
        .toList
    } finally zin.close()
  }

  def untar(bytes: Array[Byte]): Seq[ArchiveEntry] = {
    val tin = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      Iterator.continually(tin.getNextEntry).takeWhile(_ != null)
        .filter(_.isFile)
        .map(e => ArchiveEntry(e.getName, readAll(tin, MaxEntryBytes)))
        .toList
    } finally tin.close()
  }

  def bunzip2(name: String, bytes: Array[Byte]): Seq[ArchiveEntry] =
    decompressOne(name, bytes, Seq(".bz2"),
      new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(_))

  /** zstd — the dominant training-corpus codec (zstd-jni ships with
    * Spark; commons-compress fronts it). */
  def unzstd(name: String, bytes: Array[Byte]): Seq[ArchiveEntry] =
    decompressOne(name, bytes, Seq(".zst", ".zstd"),
      new org.apache.commons.compress.compressors.zstandard.ZstdCompressorInputStream(_))

  /** lz4 frame format (commons-compress pure-Java). */
  def unlz4(name: String, bytes: Array[Byte]): Seq[ArchiveEntry] =
    decompressOne(name, bytes, Seq(".lz4"),
      new org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorInputStream(_))

  /** framed snappy (commons-compress pure-Java). */
  def unsnappy(name: String, bytes: Array[Byte]): Seq[ArchiveEntry] =
    decompressOne(name, bytes, Seq(".sz", ".snappy"),
      new org.apache.commons.compress.compressors.snappy.FramedSnappyCompressorInputStream(_))

  /** Dispatch on magic bytes like the reference's detectMimeType →
    * decompress/unpack chain; unknown formats pass through unchanged. */
  def expandEntries(name: String, bytes: Array[Byte]): Seq[ArchiveEntry] = {
    def hasPrefix(p: Int*): Boolean =
      bytes.length >= p.length && p.zipWithIndex.forall { case (b, i) => (bytes(i) & 0xff) == b }
    val expanded =
      try {
        if (hasPrefix(0x1f, 0x8b)) {
          // gzip; the inner payload may itself be a tar
          val inner = gunzip(name, bytes)
          inner.flatMap(e => expandEntries(e.name, e.content))
        } else if (hasPrefix(0x50, 0x4b, 0x03, 0x04)) unzip(bytes)
        else if (hasPrefix(0x42, 0x5a, 0x68)) bunzip2(name, bytes).flatMap(e => expandEntries(e.name, e.content))
        else if (hasPrefix(0x28, 0xb5, 0x2f, 0xfd))
          unzstd(name, bytes).flatMap(e => expandEntries(e.name, e.content))
        else if (hasPrefix(0x04, 0x22, 0x4d, 0x18))
          unlz4(name, bytes).flatMap(e => expandEntries(e.name, e.content))
        else if (hasPrefix(0xff, 0x06, 0x00, 0x00, 0x73, 0x4e, 0x61, 0x50, 0x70, 0x59))
          unsnappy(name, bytes).flatMap(e => expandEntries(e.name, e.content))
        else if (name.endsWith(".tar")) untar(bytes)
        else Seq(ArchiveEntry(name, bytes))
      } catch {
        // corrupt archive → quarantine as the raw blob (reference
        // fault-tolerance posture: recoverable per-record failure)
        case _: Exception => Seq(ArchiveEntry(name, bytes))
      }
    // a corrupt archive can also parse to zero entries (ZipInputStream
    // returns null on a bad header instead of throwing) — a row must
    // never silently vanish through the explode
    if (expanded.isEmpty) Seq(ArchiveEntry(name, bytes)) else expanded
  }

  private val expandUdf =
    udf((name: String, bytes: Array[Byte]) => expandEntries(name, bytes))

  /**
   * Explode archive rows into per-inner-file rows: adds
   * `entry_name` + `entry_content`, replacing one archive row with N.
   */
  def unpack(df: DataFrame, nameCol: Column, contentCol: Column): DataFrame =
    df.withColumn("__entries", expandUdf(nameCol, contentCol))
      .withColumn("__e", explode(col("__entries")))
      .drop("__entries")
      .withColumn("entry_name", col("__e.name"))
      .withColumn("entry_content", col("__e.content"))
      .drop("__e")
}
