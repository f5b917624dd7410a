package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WET/WARC record source — the container format LLM pipelines ingest
 * Common Crawl through (ISO 28500 WARC; WET is its text-conversion
 * profile: one `WARC/1.0` record per document, colon headers, a blank
 * line, then the extracted text). A training-data engine that cannot
 * read WET cannot read the largest public corpus there is.
 *
 * Framing is Content-Length-exact, per ISO 28500: each record's body
 * is sliced as exactly `Content-Length` OCTETS after the header
 * block's blank line, so a crawled page that itself quotes
 * `WARC/1.0\r\n` at a line start cannot fracture the record — the
 * parser never pattern-matches inside a length-framed body. Only when
 * a record omits Content-Length (off-spec, but seen in the wild) does
 * the parser fall back to delimiter scanning for the next version
 * marker.
 *
 * Files are the unit of parallelism: one `binaryFile` scan, then a
 * per-file byte-walk in a `flatMap` that streams records out lazily
 * (no whole-file record buffering beyond the mmapped bytes Spark
 * already holds). The WARC-standard layout is many ~1 GB files, so a
 * crawl segment spreads across the cluster file-per-task exactly like
 * the reference's file lists.
 *
 * Scope: WET text records (`WARC-Type: conversion` and the `warcinfo`
 * prelude; gzip members are handled upstream by
 * [[graft.sources.Archives]] decompression). Bodies decode as UTF-8;
 * Content-Length is counted in octets on both the read and write
 * sides, so non-ASCII round-trips byte-exactly.
 */
object Warc {

  /** One parsed WET record; `uri` is null for `warcinfo` preludes. */
  private[sources] final case class WetRecord(
      path: String, rec_type: String, uri: String, body: String)

  /** Read WET files as (path, uri, rec_type, body). `warcinfo`
    * prelude records carry a null URI; filter `rec_type =
    * 'conversion'` for documents. */
  def readWet(spark: SparkSession, path: String): DataFrame =
    parseRecords(spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content").as("__bytes")))

  /** [[readWet]] over COMPRESSED crawl files (`.wet.gz` is how
    * Common Crawl actually ships): bytes route through the archive
    * expander first (gzip/bzip2/zstd all work — magic-byte sniffed,
    * plain files pass through), then the same record parse. One
    * scan, decompression riding the same task as the parse. */
  def readWetArchive(spark: SparkSession, path: String): DataFrame =
    parseRecords(Archives.unpack(
        spark.read.format("binaryFile").load(path),
        col("path"), col("content"))
      .select(col("entry_name").as("path"),
        col("entry_content").as("__bytes")))

  private def parseRecords(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path").cast("string"), col("__bytes").cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseFile(p, if (bytes == null) Array.emptyByteArray else bytes)
      }
      .select(col("path"), col("rec_type"), col("uri"), col("body"))
  }

  private val Marker = "WARC/1.0\r\n".getBytes("US-ASCII")
  private val BlankLine = "\r\n\r\n".getBytes("US-ASCII")

  /** Byte-walk one WET file into records, lazily. Content-Length
    * slices the body when present (mandatory in spec-conformant WET);
    * delimiter fallback otherwise. Whitespace between records (the
    * CRLF CRLF trailer plus any writer-introduced separators such as
    * a text sink's per-row newline) is skipped, never attributed to a
    * body. */
  private[sources] def parseFile(
      path: String, bytes: Array[Byte]): Iterator[WetRecord] =
    new Iterator[WetRecord] {
      private var pos = skipWs(bytes, 0)
      private var nextRec: WetRecord = null
      advance()

      override def hasNext: Boolean = nextRec != null
      override def next(): WetRecord = {
        val r = nextRec; advance(); r
      }

      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && pos < bytes.length) {
          if (!startsWith(bytes, pos, Marker)) {
            // resync: garbage before the next version marker is skipped
            val nm = byteIndexOf(bytes, Marker, pos)
            pos = if (nm < 0) bytes.length else nm
          }
          if (pos < bytes.length) {
            val hdrStart = pos + Marker.length
            val hdrEnd = byteIndexOf(bytes, BlankLine, hdrStart)
            if (hdrEnd < 0) { pos = bytes.length } // truncated: drop tail
            else {
              val headers = parseHeaders(
                new String(bytes, hdrStart, hdrEnd - hdrStart, "UTF-8"))
              val bodyStart = hdrEnd + BlankLine.length
              val clen = headers.get("content-length")
                .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
              val (body, after) = clen match {
                case Some(n) if n >= 0 && bodyStart.toLong + n <= bytes.length =>
                  (new String(bytes, bodyStart, n.toInt, "UTF-8"),
                    bodyStart + n.toInt)
                case _ => // off-spec record: delimiter fallback
                  val nm = byteIndexOf(bytes, Marker, bodyStart)
                  val end = if (nm < 0) bytes.length else nm
                  val raw = new String(bytes, bodyStart, end - bodyStart, "UTF-8")
                  (raw.replaceAll("(?s)\\r\\n\\r\\n\\s*$", ""), end)
              }
              nextRec = WetRecord(path,
                headers.get("warc-type").map(_.trim).getOrElse(""),
                headers.get("warc-target-uri").map(_.trim).orNull,
                body)
              pos = skipWs(bytes, after)
            }
          }
        }
      }
    }

  /** Colon headers, case-insensitive names (RFC-style). */
  private def parseHeaders(block: String): Map[String, String] =
    block.split("\r\n").iterator.flatMap { line =>
      val i = line.indexOf(':')
      if (i <= 0) None
      else Some(line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim)
    }.toMap

  private def skipWs(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length &&
        (b(i) == '\r' || b(i) == '\n' || b(i) == ' ' || b(i) == '\t')) i += 1
    i
  }

  private def startsWith(b: Array[Byte], at: Int, pat: Array[Byte]): Boolean = {
    if (at + pat.length > b.length) return false
    var i = 0
    while (i < pat.length) { if (b(at + i) != pat(i)) return false; i += 1 }
    true
  }

  private def byteIndexOf(b: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = b.length - pat.length
    while (i <= last) {
      if (b(i) == pat(0) && startsWith(b, i, pat)) return i
      i += 1
    }
    -1
  }

  /** Serialize (uri, body) rows into one WET byte stream per
    * partition-collected caller frame — the writer half of the round
    * trip (testing/interchange; production crawls arrive pre-built).
    * Pure column expression: concat of records in input order.
    * Content-Length is the body's OCTET length (ISO 28500 §5),
    * not its character count — non-ASCII bodies frame correctly. */
  def wetRecord(uri: Column, body: Column): Column =
    concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "), uri,
      lit("\r\nContent-Length: "), octet_length(body).cast("string"),
      lit("\r\n\r\n"), body, lit("\r\n\r\n"))
}
