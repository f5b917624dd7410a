package graft.sources

import graft.TestSpark
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeAvroFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_").toString
    val schema: Schema = SchemaBuilder.record("tweet").fields()
      .requiredLong("id")
      .requiredString("user_screen_name")
      .optionalString("text")
      .name("tags").`type`().array().items().stringType().noDefault()
      .endRecord()
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    writer.create(schema, new java.io.File(s"$dir/part-0.avro"))
    (0 until 25).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong)
      r.put("user_screen_name", s"Nadja$i")
      r.put("text", if (i % 5 == 0) null else s"hello tweet $i")
      val tags = new java.util.ArrayList[String]()
      tags.add(s"t$i"); tags.add("common")
      r.put("tags", tags)
      writer.append(r)
    }
    writer.close()
    dir
  }

  test("S6 Avro container source: schema + values round-trip (MorphlineBasicMiniMRTest shape)") {
    val dir = writeAvroFixture()
    val df = AvroSource.read(spark, dir + "/*.avro")
    assert(df.count() === 25)
    assert(df.schema.fieldNames.toSeq === Seq("id", "user_screen_name", "text", "tags"))
    // per-doc field equality, the reference's own assertion style
    val row = df.filter(col("id") === 7).collect().head
    assert(row.getAs[String]("user_screen_name") === "Nadja7")
    assert(row.getAs[String]("text") === "hello tweet 7")
    assert(row.getAs[Seq[String]]("tags") === Seq("t7", "common"))
    // union-with-null -> null value preserved
    assert(df.filter(col("text").isNull).count() === 5)
    // P1 extractAvroPaths ≙ nested/array projection over the source
    val tagCount = df.select(explode(col("tags")).as("tag"))
      .groupBy("tag").count().filter(col("tag") === "common").collect().head
    assert(tagCount.getAs[Long]("count") === 25)
  }

  test("S6 Avro extended types: enum, map, fixed, nested record") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro2_").toString
    val schemaJson =
      """{"type":"record","name":"rich","fields":[
        | {"name":"id","type":"long"},
        | {"name":"color","type":{"type":"enum","name":"Color","symbols":["RED","BLUE"]}},
        | {"name":"props","type":{"type":"map","values":"int"}},
        | {"name":"digest","type":{"type":"fixed","name":"D4","size":4}},
        | {"name":"inner","type":{"type":"record","name":"Inner","fields":[
        |   {"name":"x","type":"int"},{"name":"y","type":["null","string"]}]}}
        |]}""".stripMargin
    val schema = new Schema.Parser().parse(schemaJson)
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(s"$dir/rich.avro"))
    val r = new GenericData.Record(schema)
    r.put("id", 1L)
    r.put("color", new GenericData.EnumSymbol(schema.getField("color").schema(), "BLUE"))
    val m = new java.util.HashMap[String, Integer](); m.put("a", 7)
    r.put("props", m)
    r.put("digest", new GenericData.Fixed(schema.getField("digest").schema(),
      Array[Byte](1, 2, 3, 4)))
    val inner = new GenericData.Record(schema.getField("inner").schema())
    inner.put("x", 42); inner.put("y", null)
    r.put("inner", inner)
    w.append(r); w.close()

    val df = AvroSource.read(spark, s"$dir/*.avro")
    val row = df.collect().head
    assert(row.getAs[String]("color") === "BLUE")
    assert(row.getAs[Map[String, Int]]("props") === Map("a" -> 7))
    assert(row.getAs[Array[Byte]]("digest").toSeq === Seq[Byte](1, 2, 3, 4))
    val in = row.getAs[org.apache.spark.sql.Row]("inner")
    assert(in.getAs[Int]("x") === 42 && in.isNullAt(in.fieldIndex("y")))
    // P2 extractAvroTree ≙ flattenStructs over the nested record
    val flat = graft.etl.Etl.flattenStructs(df)
    assert(flat.columns.contains("inner_x"))
  }

  test("S11 unpack: zip explodes to one row per inner file") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    for ((n, c) <- Seq("a.txt" -> "alpha", "b/c.txt" -> "beta")) {
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    z.close()
    val df = Seq(("docs.zip", bos.toByteArray)).toDF("name", "content")
    val got = Archives.unpack(df, col("name"), col("content"))
      .select(col("entry_name"), col("entry_content").cast("string"))
      .as[(String, String)].collect().toSet
    assert(got === Set(("a.txt", "alpha"), ("b/c.txt", "beta")))
  }

  test("S11 decompress: gzip (and gzip-of-tar recursion)") {
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write("payload text".getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    val df = Seq(("x.txt.gz", gz)).toDF("name", "content")
    val got = Archives.unpack(df, col("name"), col("content"))
      .select(col("entry_name"), col("entry_content").cast("string"))
      .as[(String, String)].collect().toSet
    assert(got === Set(("x.txt", "payload text")))
  }

  test("S11 decompress: zstd / lz4-frame / framed-snappy (and .tar.zst recursion)") {
    import org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorOutputStream
    import org.apache.commons.compress.compressors.snappy.FramedSnappyCompressorOutputStream
    import org.apache.commons.compress.compressors.zstandard.ZstdCompressorOutputStream
    def compress(mk: java.io.OutputStream => java.io.OutputStream,
                 payload: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = mk(bos)
      out.write(payload); out.close()
      bos.toByteArray
    }
    val text = "modern codec payload".getBytes("UTF-8")
    val tar = {
      val bos = new java.io.ByteArrayOutputStream()
      val t = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(bos)
      val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry("inner/doc.txt")
      e.setSize(text.length)
      t.putArchiveEntry(e); t.write(text); t.closeArchiveEntry(); t.close()
      bos.toByteArray
    }
    val df = Seq(
      ("a.txt.zst", compress(new ZstdCompressorOutputStream(_), text)),
      ("b.txt.lz4", compress(new FramedLZ4CompressorOutputStream(_), text)),
      ("c.txt.sz", compress(new FramedSnappyCompressorOutputStream(_), text)),
      ("d.tar.zst", compress(new ZstdCompressorOutputStream(_), tar))
    ).toDF("name", "content")
    val got = Archives.unpack(df, col("name"), col("content"))
      .select(col("entry_name"), col("entry_content").cast("string"))
      .as[(String, String)].collect().toSet
    assert(got === Set(
      ("a.txt", "modern codec payload"),
      ("b.txt", "modern codec payload"),
      ("c.txt", "modern codec payload"),
      ("inner/doc.txt", "modern codec payload")))
  }

  test("S11 corrupt archive quarantines as raw blob instead of failing the task") {
    val junk = Array[Byte](0x50, 0x4b, 0x03, 0x04, 1, 2, 3) // zip magic, garbage body
    val df = Seq(("bad.zip", junk)).toDF("name", "content")
    val got = Archives.unpack(df, col("name"), col("content")).collect()
    assert(got.length === 1)
    assert(got.head.getAs[String]("entry_name") === "bad.zip")
  }

  test("S9 parse_document: XML text + attributes, plain text, binary stub") {
    val xml = """<doc lang="en"><title>Hi</title><body>There</body></doc>"""
    val df = Seq(
      ("application/xml", xml.getBytes("UTF-8")),
      ("text/plain", "just text".getBytes("UTF-8")),
      ("video/mp4", Array[Byte](1, 2, 3))).toDF("mime", "content")
    val got = DocumentParser.parseDocuments(df, col("mime"), col("content"))
      .select(col("mime"), col("doc.text"), col("doc.metadata")).collect()
    val byMime = got.map(r => r.getString(0) ->
      ((r.getString(1), r.getAs[Map[String, String]](2)))).toMap
    assert(byMime("application/xml")._1 === "HiThere")
    assert(byMime("application/xml")._2("root") === "doc")
    assert(byMime("application/xml")._2("attr_lang") === "en")
    assert(byMime("text/plain")._1 === "just text")
    assert(byMime("video/mp4")._2("length") === "3")
  }

  test("S9 parse_document: HTML strips tags/script, extracts title + entities") {
    val html =
      """<html><head><title>My &amp; Title</title>
        |<meta name="description" content="a page">
        |<style>body { color: red }</style></head>
        |<body><h1>Hello</h1><script>var x = "<nope>";</script>
        |<p>world &#x26; &#38; &lt;tag&gt;</p><!-- comment --></body></html>
        |""".stripMargin
    val doc = DocumentParser.parse("text/html", html.getBytes("UTF-8"))
    assert(doc.text === "My & Title Hello world & & <tag>")
    assert(doc.metadata("title") === "My & Title")
    assert(doc.metadata("description") === "a page")
  }

  test("S9 parse_document: markdown strips syntax, keeps content + title") {
    val md =
      """# My Title
        |
        |Some *bold* and _em_ text with a [link](http://x.y) and
        |![logo](img.png).
        |
        |> quoted line
        |
        |- item one
        |1. numbered
        |
        |```scala
        |val code = 1
        |```
        |""".stripMargin
    val doc = DocumentParser.parse("text/markdown", md.getBytes("UTF-8"))
    assert(doc.metadata("title") === "My Title")
    assert(doc.text === "My Title Some bold and em text with a link and logo. " +
      "quoted line item one numbered val code = 1")
  }

  test("S9 parse_document: malformed entities stay verbatim, doc text survives") {
    val html = "<p>ok &#ffff; and &#x110000; and &unknown; text</p>"
    val doc = DocumentParser.parse("text/html", html.getBytes("UTF-8"))
    assert(!doc.metadata.contains("parse_error"))
    assert(doc.text === "ok &#ffff; and &#x110000; and &unknown; text")
  }

  test("S9 parse_document: JSON text harvest + top-level scalar metadata") {
    val json = """{"id": 7, "title": "Doc", "nested": {"body": "text here"},
                 | "tags": ["a", "b"], "flag": true}""".stripMargin
    val doc = DocumentParser.parse("application/json", json.getBytes("UTF-8"))
    assert(doc.text === "Doc text here a b")
    assert(doc.metadata === Map("id" -> "7", "title" -> "Doc", "flag" -> "true"))
    // malformed JSON falls into the parse_error path, not an exception
    val bad = DocumentParser.parse("application/json", "{nope".getBytes("UTF-8"))
    assert(bad.metadata.contains("parse_error"))
  }

  test("S9 parse_document: RTF strips control words and destination groups") {
    val rtf = "{\\rtf1\\ansi{\\fonttbl{\\f0 Times New Roman;}}{\\colortbl;\\red0\\green0\\blue0;}\n" +
      "{\\*\\generator Acme Writer 1.0;}\n" +
      "\\f0\\fs24 Hello \\b bold\\b0  world.\\par\n" +
      "Caf\\'e9 costs \\u8364?5 {\\pict 0011223344} done.\\par}"
    val doc = DocumentParser.parse("application/rtf", rtf.getBytes("UTF-8"))
    assert(!doc.metadata.contains("parse_error"))
    assert(doc.text === "Hello bold world. Café costs €5 done.")
  }

  test("S9 parseRtf: cp1252 escapes, char control words, unicode fallbacks, escaped braces") {
    // \'93...\'94 are cp1252 smart quotes (NOT C1 controls); \tab must
    // separate words; 荤\'80 is euro + its cp1252 fallback (consumed,
    // not doubled); \{ inside a skipped group must not corrupt depth
    val rtf = "{\\rtf1\\ansi{\\*\\generator Acme \\{beta\\} v1;}" +
      "\\'93quoted\\'94 a\\tab b costs \\u8364\\'80 now\\par}"
    val doc = DocumentParser.parse("application/rtf", rtf.getBytes("UTF-8"))
    assert(doc.text === "“quoted” a b costs € now")
  }

  test("S9 parseRtf: terminates without throwing on 500 adversarial inputs") {
    // the scanner is hand-rolled imperative code — the property that
    // matters is that NO byte soup (truncated escapes, unbalanced
    // braces, backslash at EOF) can hang or kill a task
    val rnd = new scala.util.Random(42)
    val alphabet = "{}\\'u-0123456789abcpar \n\t*;"
    for (_ <- 1 to 500) {
      val s = "{\\rtf1" + Seq.fill(rnd.nextInt(80))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val doc = DocumentParser.parse("application/rtf", s.getBytes("UTF-8"))
      assert(doc.text != null) // reached: parsed or clean parse_error, no hang/throw
    }
  }

  // in-memory zip builder for the Office-container fixtures
  private def zipOf(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (n, c) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private val corePropsXml =
    """<cp:coreProperties
      |  xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties"
      |  xmlns:dc="http://purl.org/dc/elements/1.1/">
      |  <dc:title>My Doc</dc:title><dc:creator>An Author</dc:creator>
      |</cp:coreProperties>""".stripMargin

  test("S9 parse DOCX: w:t runs per paragraph, core properties, zip sniff refinement") {
    val docXml =
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
        |<w:body>
        |  <w:p><w:r><w:t>Hello</w:t></w:r><w:r><w:t xml:space="preserve"> World</w:t></w:r></w:p>
        |  <w:p><w:r><w:t>Second paragraph</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    val docx = zipOf("[Content_Types].xml" -> "<Types/>",
      "word/document.xml" -> docXml, "docProps/core.xml" -> corePropsXml)
    val mime = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
    val doc = DocumentParser.parse(mime, docx)
    assert(!doc.metadata.contains("parse_error"))
    assert(doc.text === "Hello World\nSecond paragraph")
    assert(doc.metadata("title") === "My Doc")
    assert(doc.metadata("creator") === "An Author")
    // the PK-magic path: declared as a bare zip, refined by entry names
    val sniffed = DocumentParser.parse("application/zip", docx)
    assert(sniffed.text === "Hello World\nSecond paragraph")
  }

  test("S9 parse XLSX: shared strings incl. rich-text runs, sheet count") {
    val xlsx = zipOf(
      "xl/workbook.xml" ->
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<sheets><sheet name="a" sheetId="1"/><sheet name="b" sheetId="2"/></sheets>
          |</workbook>""".stripMargin,
      "xl/sharedStrings.xml" ->
        """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<si><t>Revenue</t></si>
          |<si><r><t>Q1 </t></r><r><t>totals</t></r></si>
          |</sst>""".stripMargin)
    val mime = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
    val doc = DocumentParser.parse(mime, xlsx)
    assert(doc.text === "Revenue\nQ1 totals")
    assert(doc.metadata("sheets") === "2")
  }

  test("S9 parse PPTX: a:t runs across slides in order; ODT paragraphs") {
    def slide(t: String) =
      s"""<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
         |  xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
         |<p:cSld><a:p><a:r><a:t>$t</a:t></a:r></a:p></p:cSld></p:sld>""".stripMargin
    val pptx = zipOf("ppt/slides/slide1.xml" -> slide("First slide"),
      "ppt/slides/slide2.xml" -> slide("Second slide"))
    val pmime = "application/vnd.openxmlformats-officedocument.presentationml.presentation"
    val pdoc = DocumentParser.parse(pmime, pptx)
    assert(pdoc.text === "First slide\nSecond slide")
    assert(pdoc.metadata("slides") === "2")

    val odt = zipOf("mimetype" -> "application/vnd.oasis.opendocument.text",
      "content.xml" ->
        """<office:document-content
          |  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
          |  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
          |<office:body><office:text>
          |  <text:p>First paragraph</text:p><text:p>Second</text:p>
          |</office:text></office:body></office:document-content>""".stripMargin)
    val odoc = DocumentParser.parse("application/vnd.oasis.opendocument.text", odt)
    assert(odoc.text === "First paragraph\nSecond")
    // zip sniff: mimetype + content.xml entries identify ODT
    assert(DocumentParser.parse("application/zip", odt).text === "First paragraph\nSecond")
  }

  test("S9 Office containers: corrupt zip and non-office zip degrade cleanly") {
    val junk = Array[Byte](0x50, 0x4b, 0x03, 0x04, 9, 9, 9)
    val mime = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
    val doc = DocumentParser.parse(mime, junk)
    assert(doc.text === "") // parse_error or empty — never a throw
    val plainZip = zipOf("readme.txt" -> "hello")
    val z = DocumentParser.parse("application/zip", plainZip)
    assert(z.text === "" && z.metadata.contains("length"))
  }

  // hand-built minimal PDF (public ISO 32000 structure): one page, one
  // content stream; `filtered` deflates the stream behind /FlateDecode
  private def tinyPdf(content: String, filtered: Boolean,
                      title: Option[String] = None): Array[Byte] = {
    import java.nio.charset.StandardCharsets.ISO_8859_1
    val data =
      if (!filtered) content.getBytes(ISO_8859_1)
      else {
        val d = new java.util.zip.Deflater()
        d.setInput(content.getBytes(ISO_8859_1)); d.finish()
        val buf = new Array[Byte](8192)
        val out = new java.io.ByteArrayOutputStream()
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end(); out.toByteArray
      }
    val filter = if (filtered) "/Filter/FlateDecode" else ""
    val head = ("%PDF-1.4\n" +
      "1 0 obj <</Type/Catalog/Pages 2 0 R>> endobj\n" +
      "2 0 obj <</Type/Pages/Kids[3 0 R]/Count 1>> endobj\n" +
      "3 0 obj <</Type/Page/Parent 2 0 R/Contents 4 0 R>> endobj\n" +
      title.map(t => s"5 0 obj <</Title ($t)>> endobj\n").getOrElse("") +
      s"4 0 obj <</Length ${data.length}$filter>> stream\n").getBytes(ISO_8859_1)
    val tail = "\nendstream endobj\ntrailer <</Root 1 0 R>>\n%%EOF".getBytes(ISO_8859_1)
    head ++ data ++ tail
  }

  test("S9 parsePdf: uncompressed Tj/TJ text, escapes, hex strings, metadata") {
    val cs = "BT /F1 12 Tf 72 720 Td (Hello \\(quoted\\) World) Tj " +
      "0 -14 Td [(Sp) -120 (ark) 8 ( engine)] TJ " +
      "T* <48692100> Tj ET"
    val doc = DocumentParser.parse("application/pdf",
      tinyPdf(cs, filtered = false, title = Some("Test Doc")))
    assert(!doc.metadata.contains("parse_error"))
    assert(doc.text === "Hello (quoted) World\nSpark engine\nHi!")
    assert(doc.metadata("pages") === "1")
    assert(doc.metadata("title") === "Test Doc")
  }

  test("S9 parsePdf: FlateDecode stream inflates and extracts; octal escapes decode") {
    val cs = "BT (caf\\351 \\164ext) Tj ET" // \351 = é (Latin-1), \164 = t
    val doc = DocumentParser.parse("application/pdf", tinyPdf(cs, filtered = true))
    assert(!doc.metadata.contains("parse_error"))
    assert(doc.text === "café text")
  }

  test("S9 parsePdf: encrypted flag, non-PDF rejection, unsupported filters skipped") {
    val enc = "%PDF-1.4\n1 0 obj <</Encrypt 9 0 R>> endobj\n%%EOF".getBytes("ISO-8859-1")
    assert(DocumentParser.parse("application/pdf", enc).metadata("encrypted") === "true")
    val notPdf = "hello".getBytes("UTF-8")
    assert(DocumentParser.parse("application/pdf", notPdf)
      .metadata("parse_error") === "not a PDF")
    // a DCTDecode (JPEG) stream must be skipped, not garbled into text
    val jpeg = "%PDF-1.4\n4 0 obj <</Length 4/Filter/DCTDecode>> stream\nBTxx\nendstream endobj\n%%EOF"
    assert(DocumentParser.parse("application/pdf", jpeg.getBytes("ISO-8859-1")).text === "")
  }

  test("S9 parsePdf: terminates without throwing on 500 adversarial inputs") {
    val rnd = new scala.util.Random(4242)
    val alphabet = "stream endobj ()<>[]\\/%BT Tj TJ 0123456789\n\r"
    for (_ <- 1 to 500) {
      val s = "%PDF-" + Seq.fill(rnd.nextInt(120))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val doc = DocumentParser.parse("application/pdf", s.getBytes("ISO-8859-1"))
      assert(doc.text != null)
    }
    // truncated flate data inside a well-formed shell must not throw or hang
    val good = tinyPdf("BT (x) Tj ET", filtered = true)
    val truncated = good.take(good.length - 40) ++
      "\nendstream endobj\n%%EOF".getBytes("ISO-8859-1")
    assert(DocumentParser.parse("application/pdf", truncated).text != null)
  }

  test("S9 decodeText: UTF-8/UTF-16LE/UTF-16BE BOMs select charset and are stripped") {
    import java.nio.charset.StandardCharsets._
    val s = "héllo"
    val utf8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ s.getBytes(UTF_8)
    val be = Array(0xFE, 0xFF).map(_.toByte) ++ s.getBytes(UTF_16BE)
    val le = Array(0xFF, 0xFE).map(_.toByte) ++ s.getBytes(UTF_16LE)
    assert(DocumentParser.decodeText(utf8) === s)
    assert(DocumentParser.decodeText(be) === s)
    assert(DocumentParser.decodeText(le) === s)
    assert(DocumentParser.decodeText(s.getBytes(UTF_8)) === s)
    // UTF-16 text now parses through the normal text path
    val doc = DocumentParser.parse("text/plain", be)
    assert(doc.text === s)
  }

  // ----- image header metadata (Tika ImageParser behavior: dims
  // from headers, no pixel decode). Fixtures come from the JDK's OWN
  // encoders, so the parsers are checked against real format output,
  // not hand-rolled bytes. -----

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 31 + y * 17) & 0xFF) << 8 | (x & 0xFF) << 16 | (y & 0xFF))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt encoder")
    bos.toByteArray
  }

  test("S9 image metadata: PNG/JPEG/GIF/BMP dimensions from real encoder output") {
    val png = DocumentParser.parse("image/png", imageBytes("png", 320, 200))
    assert(png.text === "")
    assert(png.metadata("width") === "320" && png.metadata("height") === "200")
    assert(png.metadata("bit_depth") === "8")

    val jpg = DocumentParser.parse("image/jpeg", imageBytes("jpg", 64, 48))
    assert(jpg.metadata("width") === "64" && jpg.metadata("height") === "48")
    assert(jpg.metadata("components") === "3")
    assert(jpg.metadata("progressive") === "false")

    val gif = DocumentParser.parse("image/gif", imageBytes("gif", 17, 9))
    assert(gif.metadata("width") === "17" && gif.metadata("height") === "9")
    assert(gif.metadata("version") === "89a")

    val bmp = DocumentParser.parse("image/bmp", imageBytes("bmp", 33, 21))
    assert(bmp.metadata("width") === "33" && bmp.metadata("height") === "21")
    assert(bmp.metadata("top_down") === "false")
  }

  test("S9 PNG tEXt chunks surface as metadata; truncated images degrade cleanly") {
    // splice a tEXt chunk (keyword NUL value; CRC unchecked by the
    // header parser) in front of IEND of a real PNG
    val png = imageBytes("png", 8, 8)
    val iend = {
      val sig = Array[Byte]('I', 'E', 'N', 'D')
      (0 until png.length - 7).find(i =>
        png(i + 4) == sig(0) && png(i + 5) == sig(1) &&
          png(i + 6) == sig(2) && png(i + 7) == sig(3)).get
    }
    val body = "Software graft".getBytes("ISO-8859-1")
    val chunk = java.nio.ByteBuffer.allocate(12 + body.length)
      .putInt(body.length).put("tEXt".getBytes("US-ASCII")).put(body).putInt(0)
    val spliced = png.take(iend) ++ chunk.array() ++ png.drop(iend)
    val parsed = DocumentParser.parse("image/png", spliced)
    assert(parsed.metadata("text_Software") === "graft")
    assert(parsed.metadata("width") === "8")

    // truncation and garbage: parse_error metadata, never a throw
    for (bad <- Seq(png.take(10), Array[Byte](1, 2, 3), Array.empty[Byte]))
      assert(DocumentParser.parse("image/png", bad).metadata.contains("parse_error"))
    assert(DocumentParser.parse("image/jpeg", Array[Byte](-1, -40, 0, 0, 0, 0))
      .metadata.contains("parse_error"))
  }

  test("multimodal decode is REAL for JDK-decodable formats (pixels, not fakes)") {
    import spark.implicits._
    // a solid-red PNG: mean R feature ~1, G/B ~0 — provably from pixels
    val img = new java.awt.image.BufferedImage(40, 30,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 40; y <- 0 until 30) img.setRGB(x, y, 0xFF0000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val assets = Seq(("mem://red.png", bos.toByteArray)).toDF("path", "content")
    val d = graft.ops.Multimodal.decodeImages(spark, assets).collect().head
    assert(d.width === 40 && d.height === 30 && d.channels === 3)
    assert(math.abs(d.features(0) - 1.0f) < 1e-3) // mean R from real pixels
    assert(d.features(1) < 1e-3 && d.features(2) < 1e-3)
    // undecodable bytes still flow (deterministic fake path)
    val junk = Seq(("mem://x.bin", Array.fill[Byte](100)(7))).toDF("path", "content")
    val f = graft.ops.Multimodal.decodeImages(spark, junk).collect().head
    assert(f.features.length === 8)
  }

  test("S9 parseEml: headers, folded subject, quoted-printable body") {
    val eml =
      "From: alice@example.com\r\n" +
        "To: bob@example.com\r\n" +
        "Subject: a folded\r\n subject line\r\n" +
        "Date: Wed, 12 Aug 2026 10:00:00 +0000\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n" +
        "Content-Transfer-Encoding: quoted-printable\r\n" +
        "\r\n" +
        "caf=C3=A9 notes =\r\ncontinue here\r\n"
    val p = DocumentParser.parse("message/rfc822", eml.getBytes("UTF-8"))
    assert(p.metadata("subject") === "a folded subject line")
    assert(p.metadata("from") === "alice@example.com")
    assert(p.text === "café notes continue here")
  }

  test("S9 parseEml multipart: text/plain + text/html parts kept, base64 decoded") {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      "<p>html <b>part</b></p>".getBytes("UTF-8"))
    val eml =
      "Subject: multi\n" +
        "MIME-Version: 1.0\n" +
        "Content-Type: multipart/alternative; boundary=\"XYZ\"\n" +
        "\n" +
        "--XYZ\n" +
        "Content-Type: text/plain\n" +
        "\n" +
        "plain part\n" +
        "--XYZ\n" +
        "Content-Type: text/html\n" +
        "Content-Transfer-Encoding: base64\n" +
        "\n" +
        b64 + "\n" +
        "--XYZ\n" +
        "Content-Type: application/octet-stream\n" +
        "\n" +
        "BINARYJUNK\n" +
        "--XYZ--\n"
    val p = DocumentParser.parse("message/rfc822", eml.getBytes("UTF-8"))
    assert(p.metadata("parts") === "3")
    assert(p.text.contains("plain part"))
    assert(p.text.contains("html part"))
    assert(!p.text.contains("BINARYJUNK"))
  }

  test("S9 parseMbox: splits on From_ envelopes, unquotes mboxrd, counts messages") {
    val mbox =
      "From alice Mon Aug 10 10:00:00 2026\n" +
        "Subject: first\n\nbody one\n>From quoted line\n" +
        "From bob Tue Aug 11 11:00:00 2026\n" +
        "Subject: second\n\nbody two\n"
    val p = DocumentParser.parse("application/mbox", mbox.getBytes("UTF-8"))
    assert(p.metadata("messages") === "2")
    assert(p.metadata("subject_0") === "first")
    assert(p.metadata("subject_1") === "second")
    assert(p.text.contains("body one") && p.text.contains("body two"))
    assert(p.text.contains("From quoted line")) // mboxrd unquote
    val msgs = DocumentParser.mboxMessages(mbox)
    assert(msgs.length === 2)
  }

  test("ORC + text builtin sources round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_").toString
    graft.Tables.region(spark, TestSpark.sf).write.orc(s"$dir/orc")
    assert(spark.read.orc(s"$dir/orc").count() === 5)
    graft.Tables.region(spark, TestSpark.sf).select(col("r_name"))
      .write.text(s"$dir/txt")
    assert(spark.read.textFile(s"$dir/txt").count() === 5)
  }

  test("S7/S8 csv + json builtin sources round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csvjson_").toString
    graft.Tables.nation(spark, TestSpark.sf)
      .write.option("header", "true").csv(s"$dir/csv")
    graft.Tables.nation(spark, TestSpark.sf).write.json(s"$dir/json")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/csv")
    val json = spark.read.json(s"$dir/json")
    assert(csv.count() === 25 && json.count() === 25)
    assert(csv.select("n_name").as[String].collect().toSet ===
      json.select("n_name").as[String].collect().toSet)
  }
}
