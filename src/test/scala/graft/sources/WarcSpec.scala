package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("WET round trip: headers, bodies with internal newlines, warcinfo prelude") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wet_").toString
    val wet = "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://a/1\r\n" +
      "Content-Length: 11\r\n\r\nhello\nworld\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://a/2\r\n" +
      "Content-Length: 3\r\n\r\nbye\r\n\r\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f.warc.wet"),
      wet.getBytes("UTF-8"))
    val got = Warc.readWet(spark, dir)
      .select("rec_type", "uri", "body")
      .as[(String, Option[String], String)].collect().toSet
    assert(got === Set(
      ("warcinfo", None, "info"),
      ("conversion", Some("http://a/1"), "hello\nworld"),
      ("conversion", Some("http://a/2"), "bye")))
  }

  test("wetRecord serializes the exact WET layout readWet parses") {
    val df = Seq(("http://x/9", "text body")).toDF("u", "b")
    val rec = df.select(Warc.wetRecord(col("u"), col("b"))).as[String].collect().head
    assert(rec === "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: http://x/9\r\nContent-Length: 9\r\n\r\ntext body\r\n\r\n")
  }

  test("body embedding 'WARC/1.0\\r\\n' at a line start stays ONE record (Content-Length framing)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wet_adv_").toString
    val evil = "a crawled page quoting a record:\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nnot real\r\n\r\nend"
    val wet = "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://a/evil\r\n" +
      s"Content-Length: ${evil.getBytes("UTF-8").length}\r\n\r\n$evil\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://a/next\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "adv.warc.wet"),
      wet.getBytes("UTF-8"))
    val got = Warc.readWet(spark, dir)
      .select("uri", "body").as[(String, String)].collect().toSet
    assert(got === Set(("http://a/evil", evil), ("http://a/next", "ok")))
  }

  test("non-ASCII bodies: Content-Length counts octets on write and slices octets on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wet_utf_").toString
    val body = "héllo wörld — ünïcode"
    val rec = Seq(("http://u/1", body)).toDF("u", "b")
      .select(Warc.wetRecord(col("u"), col("b"))).as[String].collect().head
    assert(rec.contains(s"Content-Length: ${body.getBytes("UTF-8").length}\r\n"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "u.warc.wet"),
      (rec + "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://u/2\r\n" +
        "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes("UTF-8"))
    val got = Warc.readWet(spark, dir)
      .select("uri", "body").as[(String, String)].collect().toSet
    assert(got === Set(("http://u/1", body), ("http://u/2", "ok")))
  }

  test("records without Content-Length fall back to delimiter framing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wet_nolen_").toString
    val wet = "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://n/1\r\n\r\n" +
      "no length here\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://n/2\r\n" +
      "Content-Length: 5\r\n\r\nfive!\r\n\r\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "n.warc.wet"),
      wet.getBytes("UTF-8"))
    val got = Warc.readWet(spark, dir)
      .select("uri", "body").as[(String, String)].collect().toSet
    assert(got === Set(("http://n/1", "no length here"), ("http://n/2", "five!")))
  }

  test("bodies legitimately ending in CRLF pairs survive when length-framed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wet_crlf_").toString
    val body = "text ending in blank lines\r\n\r\n"
    val wet = "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://c/1\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body\r\n\r\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "c.warc.wet"),
      wet.getBytes("UTF-8"))
    val got = Warc.readWet(spark, dir)
      .select("body").as[String].collect().toSeq
    assert(got === Seq(body))
  }

  test("readWarc: response records split into status / content-type / payload; " +
      "request and warcinfo keep raw bodies with null HTTP columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_full_").toString
    val rows = Seq(("http://f/1", 200, "OK", "text/plain", "plain body"),
      ("http://f/2", 404, "Not Found", "text/html", "<html><body>x</body></html>"))
      .toDF("u", "st", "rs", "ct", "pl")
    val recs = rows.select(Warc.warcResponseRecord(col("u"), col("st"),
        col("rs"), col("ct"), col("pl")).as("value"))
      .unionByName(rows.limit(1).select(Warc.warcRequestRecord(col("u"),
        concat(lit("GET /1 HTTP/1.1")), lit("f")).as("value")))
      .unionByName(spark.range(1).select(
        Warc.warcinfoRecord(lit("software: t\r\n")).as("value")))
      .as[String].collect().mkString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f.warc"),
      recs.getBytes("UTF-8"))
    val got = Warc.readWarc(spark, dir)
      .select(col("rec_type"), col("uri"), col("http_status"),
        col("http_content_type"), col("payload").cast("string"))
      .as[(String, Option[String], Option[Int], Option[String], String)]
      .collect().toSet
    assert(got === Set(
      ("response", Some("http://f/1"), Some(200), Some("text/plain"), "plain body"),
      ("response", Some("http://f/2"), Some(404), Some("text/html"),
        "<html><body>x</body></html>"),
      ("request", Some("http://f/1"), None, None,
        "GET /1 HTTP/1.1\r\nHost: f\r\n\r\n"),
      ("warcinfo", None, None, None, "software: t\r\n")))
  }

  test("readWarc: BINARY payload octets survive — NULs, high bytes, embedded " +
      "'WARC/1.0' marker and CRLFCRLF inside a length-framed body") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_bin_").toString
    val payload = Array[Byte](0, 1, -1, -2, 13, 10, 13, 10) ++
      "WARC/1.0\r\nWARC-Type: fake\r\n\r\n".getBytes("US-ASCII") ++
      Array.tabulate(64)(i => (i * 37 % 256).toByte)
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    val head = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://b/1\r\n" +
      s"Content-Length: ${http.getBytes("US-ASCII").length + payload.length}\r\n\r\n"
    val next = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://b/2\r\nContent-Length: 21\r\n\r\n" +
      "HTTP/1.1 200 OK\r\n\r\nok\r\n\r\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.warc"),
      head.getBytes("US-ASCII") ++ http.getBytes("US-ASCII") ++ payload ++
        "\r\n\r\n".getBytes("US-ASCII") ++ next.getBytes("US-ASCII"))
    val got = Warc.readWarc(spark, dir)
      .select(col("uri"), col("http_status"), col("payload"))
      .as[(String, Option[Int], Array[Byte])].collect()
      .map { case (u, st, p) => (u, st, p.toSeq) }.toSet
    assert(got === Set(
      ("http://b/1", Some(200), payload.toSeq),
      ("http://b/2", Some(200), "ok".getBytes("US-ASCII").toSeq)))
  }

  test("readWarc: response body without an HTTP blank line degrades to raw payload") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_trunc_").toString
    val warc = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://t/1\r\nContent-Length: 17\r\n\r\n" +
      "HTTP/1.1 200 OK\r\n" + "\r\n\r\n" // head truncated mid-message
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "t.warc"),
      warc.getBytes("US-ASCII"))
    val got = Warc.readWarc(spark, dir)
      .select(col("http_status"), col("payload").cast("string"))
      .as[(Option[Int], String)].collect().toSeq
    assert(got === Seq((None, "HTTP/1.1 200 OK\r\n")))
  }

  test("splitHttp: LF-only head splits at ITS blank line even when the binary " +
      "payload contains a later CRLFCRLF") {
    val head = "HTTP/1.1 200 OK\nContent-Type: image/x-test\n\n"
    val payload = Array[Byte](1, 2) ++ "\r\n\r\n".getBytes("US-ASCII") ++ Array[Byte](9)
    val rec = Warc.splitHttp(Warc.RawRecord("p", "response", "http://l/1",
      "2024-01-01T00:00:00Z", head.getBytes("US-ASCII") ++ payload, framed = true))
    assert(rec.http_status === Some(200))
    assert(rec.http_content_type === Some("image/x-test"))
    assert(rec.payload === payload)
  }

  test("readWarcArchive parses gzipped FULL WARC with binary-safe payloads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warcgz_").toString
    val payload = Array[Byte](0, -1, 42) ++ "\r\n\r\n".getBytes("US-ASCII")
    val http = "HTTP/1.1 200 OK\r\nContent-Type: image/x-test\r\n\r\n"
      .getBytes("US-ASCII")
    val warc = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://g/1\r\n" +
      s"Content-Length: ${http.length + payload.length}\r\n\r\n")
      .getBytes("US-ASCII") ++ http ++ payload ++
      "\r\n\r\n".getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(warc); gz.close()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "g.warc.gz"),
      bos.toByteArray)
    val got = Warc.readWarcArchive(spark, dir)
      .select(col("uri"), col("http_status"), col("http_content_type"),
        col("payload"))
      .as[(String, Option[Int], Option[String], Array[Byte])].collect()
      .map { case (u, st, ct, p) => (u, st, ct, p.toSeq) }.toSeq
    assert(got === Seq(
      ("http://g/1", Some(200), Some("image/x-test"), payload.toSeq)))
  }

  test("readWetArchive parses gzipped WET files (the Common Crawl shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wetgz_").toString
    val wet = "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://a/7\r\n" +
      "Content-Length: 5\r\n\r\nhello\r\n\r\n"
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(wet.getBytes("UTF-8")); gz.close()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f.warc.wet.gz"),
      bos.toByteArray)
    val got = Warc.readWetArchive(spark, dir)
      .select("uri", "body").as[(String, String)].collect().toSeq
    assert(got === Seq(("http://a/7", "hello")))
  }
}
