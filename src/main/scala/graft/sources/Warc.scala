package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WET/WARC record source — the container format LLM pipelines ingest
 * Common Crawl through (ISO 28500 WARC; WET is its text-conversion
 * profile: one `WARC/1.0` record per document, colon headers, a blank
 * line, then the extracted text). A training-data engine that cannot
 * read WET cannot read the largest public corpus there is.
 *
 * Parsing is pure column expressions over whole files: one
 * `binaryFile` scan → UTF-8 decode → record split on the version
 * marker (map-side explode) → header/body extraction with
 * substring/regexp — no per-record UDF, the whole parse fuses behind
 * the scan. Files are the unit of parallelism (the WARC-standard
 * layout is many ~1 GB files, so a crawl segment spreads across the
 * cluster file-per-task exactly like the reference's file lists).
 *
 * Scope: WET text records (`WARC-Type: conversion` and the `warcinfo`
 * prelude; gzip members are handled upstream by
 * [[graft.sources.Archives]] decompression). Body extraction is
 * delimiter-based (headers end at the first blank line, records are
 * separated by the mandatory CRLF CRLF trailer), which is exact for
 * WET because its payload is text — binary WARC response records
 * would need Content-Length slicing instead.
 */
object Warc {

  /** Read WET files as (path, uri, rec_type, body). `warcinfo`
    * prelude records carry a null URI; filter `rec_type =
    * 'conversion'` for documents. */
  def readWet(spark: SparkSession, path: String): DataFrame =
    parseRecords(spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content").cast("string").as("__txt")))

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
        col("entry_content").cast("string").as("__txt")))

  private def parseRecords(files: DataFrame): DataFrame = {
    files
      .select(col("path"), explode(expr(
        "filter(split(__txt, 'WARC/1\\\\.0\\r\\n'), r -> r <> '')")).as("__rec"))
      .select(col("path"),
        regexp_extract(col("__rec"), "(?m)^WARC-Type:\\s*(\\S+)", 1).as("rec_type"),
        when(col("__rec").rlike("(?m)^WARC-Target-URI:"),
          regexp_extract(col("__rec"), "(?m)^WARC-Target-URI:\\s*(\\S+)", 1))
          .as("uri"),
        // body: after the header-terminating blank line, minus the
        // record-separating CRLF CRLF trailer
        // trailing \s* also eats writer-introduced record separators
        // (e.g. the text sink's per-row newline); WET bodies carry no
        // trailing whitespace of their own (the conversion strips it)
        regexp_replace(
          regexp_extract(col("__rec"), "(?s)\\r\\n\\r\\n(.*)$", 1),
          "(?s)\\r\\n\\r\\n\\s*$", "").as("body"))
  }

  /** Serialize (uri, body) rows into one WET byte stream per
    * partition-collected caller frame — the writer half of the round
    * trip (testing/interchange; production crawls arrive pre-built).
    * Pure column expression: concat of records in input order. */
  def wetRecord(uri: org.apache.spark.sql.Column,
                body: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "), uri,
      lit("\r\nContent-Length: "), length(body).cast("string"),
      lit("\r\n\r\n"), body, lit("\r\n\r\n"))
}
