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
 * [[graft.sources.Archives]] decompression) via [[readWet]], and FULL
 * raw-crawl WARC via [[readWarc]] — `response` records are
 * `application/http` messages, so the reader splits the HTTP head at
 * its own blank line, parses the status line and `Content-Type`, and
 * exposes the entity payload as raw OCTETS (a crawled payload is
 * arbitrary binary — PDF, image, gzip — and never survives a string
 * decode). WET bodies decode as UTF-8; Content-Length is counted in
 * octets on both the read and write sides, so non-ASCII and binary
 * payloads round-trip byte-exactly.
 */
object Warc {

  /** One parsed WET record; `uri` is null for `warcinfo` preludes. */
  private[sources] final case class WetRecord(
      path: String, rec_type: String, uri: String, body: String)

  /** One raw WARC record: body is the record block's exact octets
    * (for `response`/`request` records: the full HTTP message).
    * `framed` is false only for off-spec records recovered by
    * delimiter scanning. */
  private[sources] final case class RawRecord(
      path: String, rec_type: String, uri: String, date: String,
      body: Array[Byte], framed: Boolean)

  /** One full-WARC record after HTTP splitting: `http_status` /
    * `http_content_type` are populated for `response` records whose
    * body parses as an HTTP message (payload = entity octets after
    * the HTTP head); any other record carries its raw body as
    * `payload` with the HTTP columns null. `warc_date` is the
    * record's capture time verbatim (ISO 8601 in conformant crawls) —
    * the key for best-capture-per-URL selection. */
  final case class WarcHttpRecord(
      path: String, rec_type: String, uri: Option[String],
      warc_date: Option[String],
      http_status: Option[Int], http_content_type: Option[String],
      payload: Array[Byte])

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

  /**
   * FULL raw-crawl WARC (the other half of Common Crawl: the `.warc`
   * files WET is derived from). One row per record —
   * (path, rec_type, uri, http_status, http_content_type, payload);
   * `response` bodies are split into HTTP head and entity octets,
   * every other record type (warcinfo, request, metadata, …) carries
   * its raw body as `payload` with null HTTP columns. Feed `payload`
   * to [[graft.ops.Multimodal.sniffMime]] / DocumentParser for
   * content extraction — the declared `http_content_type` is the
   * server's claim, the sniff is the bytes' truth.
   */
  def readWarc(spark: SparkSession, path: String): DataFrame =
    parseHttpRecords(spark.read.format("binaryFile").load(path)
      .select(col("path").cast("string"), col("content").cast("binary")))

  /** [[readWarc]] over COMPRESSED crawl files (`.warc.gz`, the other
    * half of how Common Crawl ships): bytes route through the archive
    * expander (magic-byte sniffed; plain files pass through), then
    * the same record parse + HTTP split on the same task. */
  def readWarcArchive(spark: SparkSession, path: String): DataFrame =
    parseHttpRecords(Archives.unpack(
        spark.read.format("binaryFile").load(path),
        col("path"), col("content"))
      .select(col("entry_name").cast("string"),
        col("entry_content").cast("binary")))

  private def parseHttpRecords(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseFileRaw(p, if (bytes == null) Array.emptyByteArray else bytes)
          .map(splitHttp)
      }
      .select(col("path"), col("rec_type"), col("uri"),
        col("warc_date"), col("http_status"), col("http_content_type"),
        col("payload"))
  }

  /** `response` record → HTTP head split at the message's own blank
    * line: status from the `HTTP/x.y NNN …` status line, declared
    * Content-Type header verbatim, payload = the entity octets. A
    * response body with no blank line (truncated capture) degrades to
    * raw-payload with null HTTP columns, never a throw. */
  private[sources] def splitHttp(r: RawRecord): WarcHttpRecord = {
    def raw = WarcHttpRecord(r.path, r.rec_type, Option(r.uri),
      Option(r.date), None, None, r.body)
    if (r.rec_type != "response") return raw
    // Both delimiters searched; the EARLIER match wins. Preferring the
    // spec \r\n\r\n anywhere would mis-split an LF-terminated head
    // whose binary payload happens to contain CRLFCRLF further in —
    // the head ends at the first blank line of either form.
    val iCrlf = byteIndexOf(r.body, BlankLine, 0)
    val iLf = byteIndexOf(r.body, BlankLineLf, 0)
    // a \n\n whose first \n is the tail of a \r\n\r\n is the same
    // blank line, not an earlier one — the CRLF match starts 2 earlier
    val (delim, i) =
      if (iCrlf >= 0 && (iLf < 0 || iCrlf <= iLf)) (BlankLine, iCrlf)
      else if (iLf >= 0) (BlankLineLf, iLf)
      else return raw
    // HTTP head is ASCII by spec; ISO-8859-1 decodes any octet 1:1.
    // Header lines split on \r?\n so CRLF and LF heads parse alike.
    val lines = new String(r.body, 0, i, "ISO-8859-1").split("\r?\n")
    val status = StatusLine.findFirstMatchIn(lines.headOption.getOrElse(""))
      .map(_.group(1).toInt)
    if (status.isEmpty) return raw
    val headers = parseHeaders(lines.drop(1).mkString("\r\n"))
    WarcHttpRecord(r.path, r.rec_type, Option(r.uri), Option(r.date), status,
      headers.get("content-type"),
      java.util.Arrays.copyOfRange(r.body, i + delim.length, r.body.length))
  }

  private val StatusLine = """HTTP/\d\.\d (\d{3}).*""".r

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
  private val BlankLineLf = "\n\n".getBytes("US-ASCII")

  /** WET adapter over [[parseFileRaw]]: bodies decode as UTF-8;
    * delimiter-recovered (off-spec) records drop their trailing
    * record separator, which Content-Length framing never includes. */
  private[sources] def parseFile(
      path: String, bytes: Array[Byte]): Iterator[WetRecord] =
    parseFileRaw(path, bytes).map { r =>
      val raw = new String(r.body, "UTF-8")
      WetRecord(r.path, r.rec_type, r.uri,
        if (r.framed) raw else raw.replaceAll("(?s)\\r\\n\\r\\n\\s*$", ""))
    }

  /** Byte-walk one WARC file into raw records, lazily. Content-Length
    * slices the body when present (mandatory in spec-conformant
    * WARC); delimiter fallback otherwise (`framed = false`).
    * Whitespace between records (the CRLF CRLF trailer plus any
    * writer-introduced separators such as a text sink's per-row
    * newline) is skipped, never attributed to a body. */
  private[sources] def parseFileRaw(
      path: String, bytes: Array[Byte]): Iterator[RawRecord] =
    new Iterator[RawRecord] {
      private var pos = skipWs(bytes, 0)
      private var nextRec: RawRecord = null
      advance()

      override def hasNext: Boolean = nextRec != null
      override def next(): RawRecord = {
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
              val (body, after, framed) = clen match {
                case Some(n) if n >= 0 && bodyStart.toLong + n <= bytes.length =>
                  (java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + n.toInt),
                    bodyStart + n.toInt, true)
                case _ => // off-spec record: delimiter fallback
                  val nm = byteIndexOf(bytes, Marker, bodyStart)
                  val end = if (nm < 0) bytes.length else nm
                  (java.util.Arrays.copyOfRange(bytes, bodyStart, end), end, false)
              }
              nextRec = RawRecord(path,
                headers.get("warc-type").map(_.trim).getOrElse(""),
                headers.get("warc-target-uri").map(_.trim).orNull,
                headers.get("warc-date").map(_.trim).orNull,
                body, framed)
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

  /** Full-WARC `response` record: the body is an `application/http;
    * msgtype=response` message — status line, entity headers, blank
    * line, entity payload — and the record's Content-Length covers
    * that whole message (ISO 28500 §6.3). Both lengths are octet
    * counts, so the framing holds for non-ASCII payloads. */
  def warcResponseRecord(uri: Column, status: Column, reason: Column,
                         contentType: Column, payload: Column,
                         date: Column = lit(null)): Column = {
    val http = concat(
      lit("HTTP/1.1 "), status.cast("string"), lit(" "), reason, lit("\r\n"),
      lit("Content-Type: "), contentType,
      lit("\r\nContent-Length: "), octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload)
    concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
      when(date.isNotNull, concat(lit("\r\nWARC-Date: "), date))
        .otherwise(lit("")),
      lit("\r\nContent-Type: application/http; msgtype=response"),
      lit("\r\nContent-Length: "), octet_length(http).cast("string"),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))
  }

  /** Full-WARC `request` record (the crawler's side of the capture):
    * body is the raw HTTP request message. */
  def warcRequestRecord(uri: Column, requestLine: Column, host: Column): Column = {
    val http = concat(requestLine, lit("\r\nHost: "), host, lit("\r\n\r\n"))
    concat(
      lit("WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: "), uri,
      lit("\r\nContent-Type: application/http; msgtype=request"),
      lit("\r\nContent-Length: "), octet_length(http).cast("string"),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))
  }

  /** `warcinfo` prelude record (crawl metadata, colon fields). */
  def warcinfoRecord(fields: Column): Column =
    concat(
      lit("WARC/1.0\r\nWARC-Type: warcinfo"),
      lit("\r\nContent-Type: application/warc-fields"),
      lit("\r\nContent-Length: "), octet_length(fields).cast("string"),
      lit("\r\n\r\n"), fields, lit("\r\n\r\n"))
}
