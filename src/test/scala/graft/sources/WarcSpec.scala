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
