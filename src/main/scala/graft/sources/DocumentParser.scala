package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.functions._

/**
 * parse_document (S9): the reference's `solrCell` command wraps ~30
 * Tika parsers (solrCellDocumentTypes.conf:146-210) to turn arbitrary
 * binary documents into text + metadata fields. Tika is out of parity
 * scope (SURVEY.md §7.3) — the reference's own tests only assert on
 * XML/CSV/Avro — so this is the pluggable dispatcher with real
 * XML/plain-text/CSV-ish extraction and a documented pass-through for
 * everything else. Avro containers go through AvroSource (a proper
 * source, not a per-blob parse).
 */
object DocumentParser {

  case class ParsedDoc(text: String, mime: String, metadata: Map[String, String])

  /**
   * BOM-aware text decode (Tika's charset-detection analog, bounded
   * to the deterministic part): UTF-8 / UTF-16LE / UTF-16BE byte-order
   * marks select the charset and are stripped; everything else decodes
   * as UTF-8 (malformed sequences become U+FFFD rather than throwing —
   * crawled bytes are never trusted).
   */
  private[sources] def decodeText(bytes: Array[Byte]): String = {
    import java.nio.charset.StandardCharsets._
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte
        && bytes(2) == 0xBF.toByte)
      new String(bytes, 3, bytes.length - 3, UTF_8)
    else if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      new String(bytes, 2, bytes.length - 2, UTF_16BE)
    else if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      new String(bytes, 2, bytes.length - 2, UTF_16LE)
    else new String(bytes, UTF_8)
  }

  /** Parse one blob by (sniffed or declared) mime type. */
  def parse(mime: String, bytes: Array[Byte]): ParsedDoc = {
    val str = () => decodeText(bytes)
    try {
      mime match {
        case "application/xml" | "text/xml" =>
          val root = scala.xml.XML.loadString(str())
          ParsedDoc(root.text.trim, mime,
            Map("root" -> root.label) ++
              root.attributes.asAttrMap.map { case (k, v) => s"attr_$k" -> v })
        case "text/plain" =>
          ParsedDoc(str(), mime, Map.empty)
        case "text/csv" =>
          val lines = str().split("\n", -1)
          ParsedDoc(str(), mime, Map("columns" -> lines.headOption.getOrElse(""),
            "rows" -> (lines.length - 1).max(0).toString))
        case "text/html" | "application/xhtml+xml" =>
          parseHtml(str(), mime)
        case "text/markdown" =>
          parseMarkdown(str(), mime)
        case "application/json" =>
          parseJson(str(), mime)
        case "application/rtf" | "text/rtf" =>
          parseRtf(str(), mime)
        case "application/pdf" =>
          parsePdf(bytes, mime)
        case "application/vnd.openxmlformats-officedocument.wordprocessingml.document" =>
          parseOoxml(bytes, mime, "word/document.xml", "w")
        case "application/vnd.openxmlformats-officedocument.presentationml.presentation" =>
          parseOoxml(bytes, mime, "ppt/slides/", "a")
        case "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet" =>
          parseXlsx(bytes, mime)
        case "application/vnd.oasis.opendocument.text" =>
          parseOdt(bytes, mime)
        case "application/zip" =>
          // a zip may BE an Office container (they all share the PK
          // magic sniffMime sees) — refine by entry names, Tika-style
          sniffZipDocument(bytes) match {
            case Some(m) => parse(m, bytes)
            case None => ParsedDoc("", mime, Map("length" -> bytes.length.toString))
          }
        case "application/msword" =>
          parseDoc(bytes, mime)
        case "application/vnd.ms-excel" =>
          parseXls(bytes, mime)
        case "application/vnd.ms-powerpoint" =>
          parsePpt(bytes, mime)
        case "application/x-ole2-storage" =>
          // same refinement for the OLE2 magic (doc/xls/ppt all share it)
          sniffOleDocument(bytes) match {
            case Some(m) => parse(m, bytes)
            case None => ParsedDoc("", mime, Map("length" -> bytes.length.toString))
          }
        case "audio/wav" | "audio/x-wav" | "audio/vnd.wave" =>
          parseWav(bytes, mime)
        case "audio/mpeg" | "audio/mp3" => parseMp3(bytes, mime)
        case "audio/flac" | "audio/x-flac" => parseFlac(bytes, mime)
        case "audio/ogg" | "application/ogg" => parseOgg(bytes, mime)
        case "image/png" => parsePng(bytes, mime)
        case "image/jpeg" => parseJpeg(bytes, mime)
        case "image/gif" => parseGif(bytes, mime)
        case "image/bmp" => parseBmp(bytes, mime)
        case "video/mp4" | "video/quicktime" | "audio/mp4" =>
          parseMp4(bytes, mime)
        case "video/x-flv" => parseFlv(bytes, mime)
        case "application/epub+zip" => parseEpub(bytes, mime)
        case "application/rss+xml" | "application/atom+xml" =>
          parseFeed(str(), mime)
        case "application/x-fictionbook+xml" => parseFb2(str(), mime)
        case "image/tiff" => parseTiff(bytes, mime)
        case "image/vnd.adobe.photoshop" => parsePsd(bytes, mime)
        case "audio/midi" | "audio/x-midi" => parseMidi(bytes, mime)
        case "font/ttf" | "font/otf" | "application/x-font-ttf" =>
          parseTtf(bytes, mime)
        case "application/x-executable" | "application/x-sharedlib" |
             "application/x-elf" => parseElf(bytes, mime)
        case "application/x-msdownload" |
             "application/vnd.microsoft.portable-executable" =>
          parsePe(bytes, mime)
        case "application/java-vm" => parseClass(bytes, mime)
        case "message/rfc822" => parseEml(str(), mime)
        case "application/mbox" => parseMbox(str(), mime)
        case _ =>
          // unparsed binary: empty text, length metadata (Tika stub)
          ParsedDoc("", mime, Map("length" -> bytes.length.toString))
      }
    } catch {
      case e: Exception => ParsedDoc("", mime, Map("parse_error" -> e.getMessage))
    }
  }

  /** HTML → text, the dominant training-data parse (Tika's HtmlParser
    * analog, kept dependency-free): drop script/style/comments, strip
    * tags, decode the common entities, collapse whitespace; title and
    * meta-description surface as metadata. */
  private[sources] def parseHtml(html: String, mime: String): ParsedDoc = {
    def grab(re: String) =
      re.r.findFirstMatchIn(html).map(m => decodeEntities(m.group(1)).trim)
    val title = grab("(?is)<title[^>]*>(.*?)</title>")
    val desc = grab(
      "(?is)<meta\\s+[^>]*name=[\"']description[\"'][^>]*content=[\"']([^\"']*)[\"']")
    val text = decodeEntities(
      html.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
        .replaceAll("(?s)<!--.*?-->", " ")
        .replaceAll("(?s)<[^>]+>", " "))
      .replaceAll("\\s+", " ").trim
    ParsedDoc(text, mime,
      Map.empty[String, String] ++ title.map("title" -> _) ++
        desc.map("description" -> _))
  }

  /** Markdown → text: syntax stripped, content kept — the other
    * dominant crawled-corpus format. First heading becomes the title. */
  private[sources] def parseMarkdown(md: String, mime: String): ParsedDoc = {
    val title = "(?m)^#{1,6}\\s+(.+?)\\s*#*\\s*$".r
      .findFirstMatchIn(md).map(_.group(1).trim)
    val text = md
      .replaceAll("(?s)```[a-zA-Z0-9]*\\n?(.*?)```", " $1 ") // keep fenced code body
      .replaceAll("!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")       // image -> alt text
      .replaceAll("\\[([^\\]]+)\\]\\([^)]*\\)", "$1")        // link -> anchor text
      .replaceAll("(?m)^#{1,6}\\s+", "")                     // heading markers
      .replaceAll("(?m)^\\s*>\\s?", "")                      // blockquote markers
      .replaceAll("(?m)^\\s*[-*+]\\s+", "")                  // list bullets
      .replaceAll("(?m)^\\s*\\d+\\.\\s+", "")                // ordered-list numbers
      .replaceAll("(?m)^[-=_*]{3,}\\s*$", " ")               // horizontal rules
      .replaceAll("[*_`~]", "")                              // emphasis/inline-code marks
      .replaceAll("\\s+", " ").trim
    ParsedDoc(text, mime, Map.empty[String, String] ++ title.map("title" -> _))
  }

  private val namedEntities = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  private[sources] def decodeEntities(s: String): String =
    "&(#x?[0-9a-fA-F]+|[a-zA-Z]+);".r.replaceAllIn(s, { m =>
      val body = m.group(1)
      // a malformed entity (`&#ffff;` — hex digits without x, or a
      // code point past 0x10FFFF) stays verbatim rather than throwing:
      // crawled HTML is full of junk and one bad entity must not cost
      // the document (parse()'s catch-all would blank it entirely)
      val out =
        try {
          if (body.startsWith("#x") || body.startsWith("#X"))
            new String(Character.toChars(Integer.parseInt(body.drop(2), 16)))
          else if (body.startsWith("#"))
            new String(Character.toChars(body.drop(1).toInt))
          else namedEntities.getOrElse(body, m.matched)
        } catch { case _: IllegalArgumentException => m.matched }
      scala.util.matching.Regex.quoteReplacement(out)
    })

  // shared, thread-safe after configuration — building a mapper per
  // document is one of Jackson's most expensive operations
  private lazy val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** JSON → text + metadata: text is every string value depth-first
    * (what an indexer wants to search), metadata the top-level scalar
    * fields (what a schema mapper wants to route on). */
  private[sources] def parseJson(json: String, mime: String): ParsedDoc = {
    import scala.jdk.CollectionConverters._
    val root = jsonMapper.readTree(json)
    val texts = Seq.newBuilder[String]
    def walk(n: com.fasterxml.jackson.databind.JsonNode): Unit =
      if (n.isTextual) texts += n.asText
      else if (n.isContainerNode) n.elements().asScala.foreach(walk)
    walk(root)
    val meta =
      if (!root.isObject) Map.empty[String, String]
      else root.properties().asScala.iterator
        .filter(e => e.getValue.isValueNode)
        .map(e => e.getKey -> e.getValue.asText).toMap
    ParsedDoc(texts.result().mkString(" "), mime, meta)
  }

  /** Destination groups whose content is formatting/metadata, not
    * body text — Tika's RTF parser drops these wholesale. */
  private val rtfSkipGroups = Set("fonttbl", "colortbl", "stylesheet",
    "info", "pict", "themedata", "datastore", "header", "footer")

  /** Control words that ARE characters (not formatting): dropped, they
    * fuse the adjacent words ("a\tab b" must not become "ab"). */
  private val rtfCharWords = Map(
    "tab" -> "\t", "emdash" -> "—", "endash" -> "–",
    "lquote" -> "‘", "rquote" -> "’",
    "ldblquote" -> "“", "rdblquote" -> "”",
    "bullet" -> "•", "emspace" -> " ", "enspace" -> " ",
    "cell" -> " ", "row" -> "\n", "sect" -> "\n", "page" -> "\n")

  // \'hh escapes are CODE-PAGE bytes — cp1252 for the \ansi RTF Word
  // writes, where 0x80-0x9F are smart quotes/dashes/euro, NOT the C1
  // control characters a raw toChar cast would produce
  private lazy val cp1252 = java.nio.charset.Charset.forName("windows-1252")
  private def cp1252Char(hh: Int): String =
    new String(Array(hh.toByte), cp1252)

  /**
   * RTF → text (Tika RTFParser analog, dependency-free): brace-aware
   * scan that drops formatting destination groups ({\fonttbl …},
   * {\*\… }), decodes \'hh cp1252 escapes and \u…? Unicode escapes,
   * maps \par/\line to newlines, and strips remaining control words.
   */
  private[sources] def parseRtf(rtf: String, mime: String): ParsedDoc = {
    val out = new StringBuilder
    var i = 0
    val n = rtf.length
    var skipDepth = -1 // brace depth at which a skipped group started
    var depth = 0
    while (i < n) {
      val c = rtf.charAt(i)
      if (c == '{') {
        depth += 1
        // peek: skip-worthy destination? ({\*\anything} or {\fonttbl…})
        if (skipDepth < 0) {
          val rest = rtf.substring(i + 1, math.min(n, i + 24))
          if (rest.startsWith("\\*")) skipDepth = depth
          else if (rest.startsWith("\\")) {
            val word = rest.drop(1).takeWhile(_.isLetter)
            if (rtfSkipGroups.contains(word)) skipDepth = depth
          }
        }
        i += 1
      } else if (c == '}') {
        if (skipDepth == depth) skipDepth = -1
        depth -= 1
        i += 1
      } else if (skipDepth >= 0) {
        // inside a dropped destination group: escapes must still be
        // consumed as units — a raw `\{` half-consumed would let the
        // brace corrupt the depth tracking and swallow body text past
        // the group's real close
        if (c == '\\' && i + 1 < n) i += 2 else i += 1
      } else if (c == '\\') {
        if (i + 1 >= n) i = n
        else rtf.charAt(i + 1) match {
          case '\\' | '{' | '}' => out.append(rtf.charAt(i + 1)); i += 2
          case '~' => out.append(' '); i += 2
          case '\'' if i + 3 < n =>
            // on malformed hex consume only the \' and let the rest
            // re-scan normally (blind i+=4 could eat a brace)
            try { out.append(cp1252Char(Integer.parseInt(rtf.substring(i + 2, i + 4), 16))); i += 4 }
            catch { case _: NumberFormatException => i += 2 }
          case 'u' if i + 2 < n && (rtf.charAt(i + 2) == '-' || rtf.charAt(i + 2).isDigit) =>
            val num = rtf.substring(i + 2).takeWhile(ch => ch == '-' || ch.isDigit)
            try out.append(num.toInt.toChar) catch { case _: Exception => }
            i += 2 + num.length
            // \uN carries a fallback for non-Unicode readers: either a
            // plain char (commonly '?') or an \'hh escape — consume it
            // so it doesn't double into the output (simplified \uc1)
            if (i < n && rtf.charAt(i) == '?') i += 1
            else if (i + 3 < n && rtf.charAt(i) == '\\' && rtf.charAt(i + 1) == '\'') i += 4
          case _ =>
            val word = rtf.substring(i + 1).takeWhile(_.isLetter)
            if (word == "par" || word == "line") out.append('\n')
            else rtfCharWords.get(word).foreach(out.append)
            i += 1 + word.length
            // optional numeric parameter, then one swallowed space
            while (i < n && (rtf.charAt(i) == '-' || rtf.charAt(i).isDigit)) i += 1
            if (i < n && rtf.charAt(i) == ' ') i += 1
        }
      } else {
        if (c != '\r' && c != '\n') out.append(c)
        i += 1
      }
    }
    ParsedDoc(out.toString.replaceAll("\\s+", " ").trim, mime, Map.empty)
  }

  // ----- Office containers (OOXML / ODF are PUBLIC zip-of-XML
  // formats — ECMA-376, OASIS ODF; reference scope: solrCell routes
  // them through Tika's OOXML/ODF parsers, solrCellDocumentTypes
  // .conf:190-210). No new dependency: java.util.zip + scala.xml. -----

  /** Bounded in-memory read of selected zip entries (decompression-
    * bomb posture as Archives: per-entry cap, entry-count cap). */
  private[sources] def zipEntries(bytes: Array[Byte], wanted: String => Boolean,
                                  entryCap: Int = 16 << 20,
                                  maxEntries: Int = 4096): Map[String, Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      var n = 0
      while (e != null && n < maxEntries) {
        n += 1
        if (!e.isDirectory && wanted(e.getName)) {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var k = zin.read(chunk)
          while (k >= 0 && buf.size <= entryCap) {
            buf.write(chunk, 0, k)
            k = zin.read(chunk)
          }
          out += e.getName -> buf.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Entry names only — the cheap container sniff. */
  private def zipEntryNames(bytes: Array[Byte], max: Int = 64): Seq[String] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val names = Seq.newBuilder[String]
    try {
      var e = zin.getNextEntry
      var n = 0
      while (e != null && n < max) { names += e.getName; n += 1; e = zin.getNextEntry }
    } catch { case _: Exception => } // truncated zip: sniff what we saw
    finally zin.close()
    names.result()
  }

  /** Refine application/zip to a concrete Office mime by entry names
    * (what Tika's container detector does). */
  private[sources] def sniffZipDocument(bytes: Array[Byte]): Option[String] = {
    val names = zipEntryNames(bytes).toSet
    if (names.contains("word/document.xml"))
      Some("application/vnd.openxmlformats-officedocument.wordprocessingml.document")
    else if (names.contains("xl/workbook.xml"))
      Some("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet")
    else if (names.exists(_.startsWith("ppt/slides/")))
      Some("application/vnd.openxmlformats-officedocument.presentationml.presentation")
    else if (names.contains("content.xml") && names.contains("mimetype"))
      Some("application/vnd.oasis.opendocument.text")
    else if (names.contains("META-INF/container.xml"))
      Some("application/epub+zip")
    else None
  }

  /** OLE2 container → concrete legacy-Office MIME, refined by the
    * compound file's directory entry names (the same refinement idea
    * as [[sniffZipDocument]]; all OLE2 documents share the D0CF magic). */
  private[sources] def sniffOleDocument(bytes: Array[Byte]): Option[String] = {
    val names = Cfb.entryNames(bytes).map(_.toLowerCase).toSet
    if (names.contains("worddocument")) Some("application/msword")
    else if (names.contains("workbook") || names.contains("book"))
      Some("application/vnd.ms-excel")
    else if (names.contains("powerpoint document"))
      Some("application/vnd.ms-powerpoint")
    else None
  }

  /**
   * Legacy binary Word (.doc, Word 97-2003) text extraction — the
   * [MS-DOC] piece-table path, dependency-free: FIB from the
   * `WordDocument` stream (wIdent 0xA5EC, fWhichTblStm selects
   * `0Table`/`1Table`), CLX located by fcClx/lcbClx (FibRgFcLcb97
   * pair 33), Pcdt → PlcPcd pieces, each run decoded CP1252 when the
   * PCD's fCompressed bit is set or UTF-16LE otherwise, truncated to
   * the main document range (ccpText). Unknown variants — pre-97
   * nFib, missing streams, out-of-range offsets — fall through to the
   * binary pass-through stub rather than guessing (the Tika-subset
   * contract: never throw on crawl input).
   */
  private[sources] def parseDoc(bytes: Array[Byte], mime: String): ParsedDoc = {
    def stub(reason: String) =
      ParsedDoc("", mime, Map("length" -> bytes.length.toString,
        "doc_variant" -> reason))
    val wd = Cfb.stream(bytes, "WordDocument").getOrElse(
      return stub("no WordDocument stream"))
    if (wd.length < 0x0200) return stub("truncated FIB")
    def u16(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def i32(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    if (u16(wd, 0) != 0xA5EC) return stub("bad wIdent")
    val nFib = u16(wd, 2)
    if (nFib < 0x0065) return stub(f"pre-97 nFib 0x$nFib%04X")
    val flags = u16(wd, 0x000A)
    val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
    // walk the variable-length FIB to the FcLcb blob
    val csw = u16(wd, 0x20)
    val lwOff = 0x22 + csw * 2
    if (lwOff + 2 > wd.length) return stub("truncated FIB (rgW)")
    val cslw = u16(wd, lwOff)
    // FibRgLw97: ccpText is the 4th slot (cbMac, reserved1, reserved2, ccpText)
    val ccpText =
      if (cslw >= 4 && lwOff + 2 + 4 * 4 <= wd.length) i32(wd, lwOff + 2 + 3 * 4)
      else -1
    val fcLcbCountOff = lwOff + 2 + cslw * 4
    if (fcLcbCountOff + 2 > wd.length) return stub("truncated FIB (rgLw)")
    val cbRgFcLcb = u16(wd, fcLcbCountOff)
    val blobOff = fcLcbCountOff + 2
    if (cbRgFcLcb < 34 || blobOff + 34 * 8 > wd.length)
      return stub("FIB lacks fcClx")
    val fcClx = i32(wd, blobOff + 33 * 8)
    val lcbClx = i32(wd, blobOff + 33 * 8 + 4)
    if (lcbClx <= 0) return stub("empty piece table")
    val table = Cfb.stream(bytes, tableName).getOrElse(
      return stub(s"no $tableName stream"))
    if (fcClx < 0 || fcClx.toLong + lcbClx > table.length)
      return stub("clx out of range")
    // CLX: RgPrc entries (clxt=1, 2-byte size) precede the Pcdt (clxt=2)
    var p = fcClx
    val clxEnd = fcClx + lcbClx
    while (p < clxEnd && (table(p) & 0xff) == 0x01) {
      if (p + 3 > clxEnd) return stub("malformed clx prc")
      p += 3 + u16(table, p + 1)
    }
    if (p + 5 > clxEnd || (table(p) & 0xff) != 0x02)
      return stub("no pcdt in clx")
    val lcbPlc = i32(table, p + 1)
    val plcOff = p + 5
    if (lcbPlc < 4 + 8 || plcOff + lcbPlc > clxEnd || (lcbPlc - 4) % 12 != 0)
      return stub("malformed plcPcd")
    val nPieces = (lcbPlc - 4) / 12
    val cps = Array.tabulate(nPieces + 1)(i => i32(table, plcOff + i * 4))
    val pcdOff = plcOff + (nPieces + 1) * 4
    val sb = new java.lang.StringBuilder()
    var piece = 0
    while (piece < nPieces) {
      val cpLen = cps(piece + 1) - cps(piece)
      val fcRaw = i32(table, pcdOff + piece * 8 + 2)
      val compressed = (fcRaw & 0x40000000) != 0
      if (cpLen > 0) {
        if (compressed) {
          val off = (fcRaw & 0x3FFFFFFF) / 2
          if (off >= 0 && off.toLong + cpLen <= wd.length)
            sb.append(new String(wd, off, cpLen, "windows-1252"))
          else return stub("piece out of range")
        } else {
          val off = fcRaw & 0x3FFFFFFF
          if (off >= 0 && off.toLong + cpLen * 2 <= wd.length)
            sb.append(new String(wd, off, cpLen * 2, "UTF-16LE"))
          else return stub("piece out of range")
        }
      }
      piece += 1
    }
    // main document range only (headers/footnotes CPs follow ccpText)
    val full = sb.toString
    val main = if (ccpText > 0 && ccpText < full.length)
      full.substring(0, ccpText) else full
    // Word control characters: CR is the paragraph mark; cell/row
    // marks (0x07), page breaks (0x0C), field characters (0x13-0x15),
    // and object anchors (0x01/0x02/0x08) are structure, not text
    val text = main
      .replace('\r', '\n')
      .replace('\u0007', '\n') // cell/row mark
      .replace('\u000C', '\n') // page break
      .replaceAll("[\u0000-\u0006\u0008\u000B\u000E-\u001F]", "")
      .trim
    ParsedDoc(text, mime, Map("n_chars" -> text.length.toString))
  }

  /**
   * Legacy binary Excel (.xls, Excel 97-2003) text — the [MS-XLS]
   * BIFF8 shared-string path, dependency-free: the `Workbook`
   * stream's record walk (u16 type, u16 size frames) collects the SST
   * (0x00FC) with its Continue (0x003C) records; each
   * XLUnicodeRichExtendedString decodes compressed (low-byte, cp1252)
   * or UTF-16LE per its grbit, which the spec re-issues at every
   * Continue boundary that splits character data (header fields and
   * rich-run/ExtRst skips continue byte-exact, WITHOUT a fresh
   * grbit); rich-format runs and ExtRst payloads are skipped, not
   * decoded. Sheet names (BoundSheet8 0x0085) surface as metadata.
   * Output contract matches [[parseXlsx]] (the shared strings,
   * newline-joined — numeric cells are not text in either path).
   * BIFF5 (`Book` stream) and malformed input fall through to the
   * pass-through stub; truncation mid-SST keeps what decoded.
   */
  private[sources] def parseXls(bytes: Array[Byte], mime: String): ParsedDoc = {
    def stub(reason: String) =
      ParsedDoc("", mime, Map("length" -> bytes.length.toString,
        "xls_variant" -> reason))
    val wb = Cfb.stream(bytes, "Workbook").getOrElse(
      return stub(if (Cfb.stream(bytes, "Book").isDefined) "BIFF5 Book stream"
                  else "no Workbook stream"))
    def u16(o: Int) = (wb(o) & 0xff) | ((wb(o + 1) & 0xff) << 8)
    // record walk: SST + its Continues (a non-Continue record ends the
    // run), BoundSheet8 names
    val segB = IndexedSeq.newBuilder[(Int, Int)]
    val sheetB = Seq.newBuilder[String]
    var p = 0
    var inSst = false
    while (p + 4 <= wb.length) {
      val typ = u16(p); val n = u16(p + 2); val o = p + 4
      if (o + n > wb.length) p = wb.length // truncated record: stop
      else {
        typ match {
          case 0x00FC => segB += ((o, n)); inSst = true
          case 0x003C if inSst => segB += ((o, n))
          case 0x0085 => // lbPlyPos(4) grbit(2) cch(1) flags(1) name
            inSst = false
            if (n >= 8) {
              val cch = wb(o + 6) & 0xff
              if ((wb(o + 7) & 1) == 1 && 8 + cch * 2 <= n)
                sheetB += new String(wb, o + 8, cch * 2, "UTF-16LE")
              else if ((wb(o + 7) & 1) == 0 && 8 + cch <= n)
                sheetB += new String(wb, o + 8, cch, "windows-1252")
            }
          case _ => inSst = false
        }
        p = o + n
      }
    }
    val segments = segB.result()
    val sheets = sheetB.result()
    val texts = Seq.newBuilder[String]
    if (segments.nonEmpty) {
      object Eof extends RuntimeException
      // cursor over the SST's segment list: multi-byte header fields
      // and skips cross Continue boundaries transparently; character
      // reads re-read the grbit there ([MS-XLS] 2.5.293)
      class Cur {
        var si = 0; var so = 0
        def rem: Int = segments(si)._2 - so
        private def ensure(): Unit = {
          while (rem <= 0) {
            if (si + 1 >= segments.length) throw Eof
            si += 1; so = 0
          }
        }
        def u8(): Int = {
          ensure(); val v = wb(segments(si)._1 + so) & 0xff; so += 1; v
        }
        def u16c(): Int = u8() | (u8() << 8)
        def i32c(): Int = u16c() | (u16c() << 16)
        def skip(n: Int): Unit = {
          var k = n
          while (k > 0) { ensure(); val t = math.min(k, rem); so += t; k -= t }
        }
        def readChars(cch: Int, grbit: Int, sb: java.lang.StringBuilder): Unit = {
          var left = cch
          var high = grbit & 1
          while (left > 0) {
            if (rem <= 0) high = u8() & 1 // fresh grbit at the boundary
            val width = if (high == 1) 2 else 1
            val take = math.min(left, rem / width)
            if (take <= 0) throw Eof // odd byte under UTF-16: malformed
            val off = segments(si)._1 + so
            sb.append(new String(wb, off, take * width,
              if (high == 1) "UTF-16LE" else "windows-1252"))
            so += take * width; left -= take
          }
        }
      }
      try {
        val cur = new Cur
        cur.i32c() // cstTotal
        val cstUnique = cur.i32c()
        var i = 0
        while (i < cstUnique && i < (1 << 22)) { // bound adversarial counts
          val cch = cur.u16c()
          val flags = cur.u8()
          val cRun = if ((flags & 0x08) != 0) cur.u16c() else 0
          val cbExt = if ((flags & 0x04) != 0) cur.i32c() else 0
          val sb = new java.lang.StringBuilder
          cur.readChars(cch, flags, sb)
          cur.skip(cRun * 4)
          cur.skip(math.max(0, cbExt))
          val t = sb.toString
          if (t.nonEmpty) texts += t
          i += 1
        }
      } catch { case Eof => () } // truncated SST: keep what decoded
    }
    val strings = texts.result()
    ParsedDoc(strings.mkString("\n").trim, mime,
      Map("n_strings" -> strings.length.toString) ++
        (if (sheets.nonEmpty) Map("sheets" -> sheets.mkString(",")) else Map.empty))
  }

  /**
   * Legacy binary PowerPoint (.ppt, 97-2003) text — the [MS-PPT]
   * record tree of the `PowerPoint Document` stream: 8-byte headers
   * (recVerAndInstance u16, recType u16, recLen u32), containers
   * (recVer 0xF) recursed depth-bounded, TextCharsAtom (0x0FA0,
   * UTF-16LE) and TextBytesAtom (0x0FA8, low-byte cp1252 chars)
   * collected in stream order. Scope: the walk visits every persisted
   * edit (a full reader follows the Current User stream to the live
   * edit's persist directory), matching the recall-over-precision
   * posture crawl extraction wants; PPT line separators (CR, VT) map
   * to newlines like the .doc path.
   */
  private[sources] def parsePpt(bytes: Array[Byte], mime: String): ParsedDoc = {
    def stub(reason: String) =
      ParsedDoc("", mime, Map("length" -> bytes.length.toString,
        "ppt_variant" -> reason))
    val pd = Cfb.stream(bytes, "PowerPoint Document").getOrElse(
      return stub("no PowerPoint Document stream"))
    def u16(o: Int) = (pd(o) & 0xff) | ((pd(o + 1) & 0xff) << 8)
    def i32(o: Int) = u16(o) | (u16(o + 2) << 16)
    val texts = Seq.newBuilder[String]
    var atoms = 0
    def walk(from: Int, to: Int, depth: Int): Unit = {
      if (depth > 32) return // adversarial nesting bound
      var p = from
      var ok = true
      while (ok && p + 8 <= to) {
        val ver = u16(p) & 0x000F
        val typ = u16(p + 2)
        val len = i32(p + 4)
        val o = p + 8
        if (len < 0 || o + len > to) ok = false // malformed: stop level
        else {
          if (ver == 0xF) walk(o, o + len, depth + 1)
          else if (typ == 0x0FA0) { // TextCharsAtom
            texts += new String(pd, o, len & ~1, "UTF-16LE"); atoms += 1
          } else if (typ == 0x0FA8) { // TextBytesAtom
            texts += new String(pd, o, len, "windows-1252"); atoms += 1
          }
          p = o + len
        }
      }
    }
    walk(0, pd.length, 0)
    val text = texts.result()
      .map(_.replace('\r', '\n').replace('\u000B', '\n')
        .replaceAll("[\\u0000-\\u0008\\u000E-\\u001F]", ""))
      .map(_.trim).filter(_.nonEmpty)
      .mkString("\n").trim
    ParsedDoc(text, mime, Map("n_text_atoms" -> atoms.toString))
  }

  /** OOXML core properties (docProps/core.xml) — title/creator. */
  private def ooxmlMeta(entries: Map[String, Array[Byte]]): Map[String, String] =
    entries.get("docProps/core.xml").map { b =>
      val root = scala.xml.XML.loadString(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      Map.empty[String, String] ++
        (root \ "title").headOption.map(t => "title" -> t.text).filter(_._2.nonEmpty) ++
        (root \ "creator").headOption.map(c => "creator" -> c.text).filter(_._2.nonEmpty)
    }.getOrElse(Map.empty)

  /**
   * DOCX / PPTX text: every `<w:t>` (word) or `<a:t>` (drawing/slide)
   * run in document order, paragraphs (`<w:p>`/`<a:p>`) separated by
   * newlines. `entryPrefix` selects the content parts (one document
   * part for word, one part per slide for ppt — slides in name order).
   */
  private[sources] def parseOoxml(bytes: Array[Byte], mime: String,
                                  entryPrefix: String, runNs: String): ParsedDoc = {
    val entries = zipEntries(bytes,
      n => n.startsWith(entryPrefix) && n.endsWith(".xml") || n == "docProps/core.xml")
    val parts = entries.keys.filter(_.startsWith(entryPrefix)).toSeq.sorted
    if (parts.isEmpty)
      return ParsedDoc("", mime, Map("parse_error" -> s"no $entryPrefix part"))
    val text = parts.map { part =>
      val root = scala.xml.XML.loadString(
        new String(entries(part), java.nio.charset.StandardCharsets.UTF_8))
      // paragraph nodes -> their text runs joined, one line per para;
      // runs outside any paragraph (defensive) append at the end
      val paras = (root \\ "p").map(p => (p \\ "t").map(_.text).mkString)
      val all = (root \\ "t").map(_.text)
      val inParas = paras.map(_.length).sum
      val lines = if (all.map(_.length).sum > inParas) paras :+ all.mkString(" ") else paras
      lines.filter(_.nonEmpty).mkString("\n")
    }.filter(_.nonEmpty).mkString("\n")
    val meta = ooxmlMeta(entries) ++
      (if (entryPrefix.startsWith("ppt")) Map("slides" -> parts.length.toString)
       else Map.empty)
    ParsedDoc(text.trim, mime, meta)
  }

  /** XLSX text: the shared-strings table (where cell text lives) in
    * order, one line per string; sheet count as metadata. */
  private[sources] def parseXlsx(bytes: Array[Byte], mime: String): ParsedDoc = {
    val entries = zipEntries(bytes,
      n => n == "xl/sharedStrings.xml" || n == "xl/workbook.xml" || n == "docProps/core.xml")
    val text = entries.get("xl/sharedStrings.xml").map { b =>
      val root = scala.xml.XML.loadString(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      // si = one shared string (may be split into rich-text runs)
      (root \ "si").map(si => (si \\ "t").map(_.text).mkString).filter(_.nonEmpty)
        .mkString("\n")
    }.getOrElse("")
    val sheets = entries.get("xl/workbook.xml").map { b =>
      val root = scala.xml.XML.loadString(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      (root \\ "sheet").length
    }.getOrElse(0)
    ParsedDoc(text.trim, mime, ooxmlMeta(entries) + ("sheets" -> sheets.toString))
  }

  /** ODT text: `<text:p>` paragraphs of content.xml. */
  private[sources] def parseOdt(bytes: Array[Byte], mime: String): ParsedDoc = {
    val entries = zipEntries(bytes, _ == "content.xml")
    entries.get("content.xml").map { b =>
      val root = scala.xml.XML.loadString(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      val paras = (root \\ "p").map(_.text).filter(_.nonEmpty)
      ParsedDoc(paras.mkString("\n").trim, mime, Map.empty)
    }.getOrElse(ParsedDoc("", mime, Map("parse_error" -> "no content.xml")))
  }

  // ----- PDF (ISO 32000 subset; reference scope: solrCellDocumentTypes
  // .conf:190-210 routes application/pdf through Tika's PDFParser) -----

  /** Bounded zlib inflate — the FlateDecode filter. The cap is the
    * decompression-bomb guard (same posture as Archives): a stream
    * inflating past it is truncated there, never OOMs the task. */
  private[sources] def inflateBounded(data: Array[Byte], cap: Int = 16 << 20): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      var done = false
      while (!done && out.size <= cap) {
        val k = inf.inflate(buf)
        if (k > 0) out.write(buf, 0, k)
        // finished, truncated input, or a dictionary request (which
        // raw PDF Flate streams never legitimately make) all end the
        // loop — each would otherwise spin at k == 0 forever
        else done = true
        if (inf.finished()) done = true
      }
      out.toByteArray
    } finally inf.end()
  }

  /** PDF literal string `(…)` starting at `start`: handles nested
    * balanced parens, the `\` escapes (incl. up-to-3-digit octal and
    * line continuations). Returns (decoded, index after `)`). */
  private def pdfLiteral(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    var depth = 1
    val n = s.length
    while (i < n && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\r' => i += 2; if (i < n && s.charAt(i) == '\n') i += 1 // continuation
          case '\n' => i += 2                                          // continuation
          case d if d >= '0' && d <= '7' =>
            var j = i + 1; var v = 0
            while (j < n && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            sb.append((v & 0xFF).toChar); i = j
          case other => sb.append(other); i += 2 // spec: drop the backslash
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c); i += 1 }
      else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }

  /** PDF hex string `<…>` starting at `start` (odd final digit pads
    * with 0 per spec). Returns (decoded, index after `>`). */
  private def pdfHex(s: String, start: Int): (String, Int) = {
    val end0 = s.indexOf('>', start + 1)
    val end = if (end0 < 0) s.length else end0
    val hex = s.substring(start + 1, end).filter(c => Character.digit(c, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val sb = new StringBuilder
    var i = 0
    while (i + 1 < padded.length + 1 && i + 2 <= padded.length) {
      sb.append(Integer.parseInt(padded.substring(i, i + 2), 16).toChar)
      i += 2
    }
    (sb.toString, math.min(end + 1, s.length))
  }

  /** Text-showing operators over one decoded content stream: strings
    * accumulate as operands; `Tj`/`'`/`"` show the last string, `TJ`
    * shows every string of its array; `Td`/`TD`/`T*`/`'`/`"` (and ET)
    * are treated as line breaks. Positioning/font semantics beyond
    * that are intentionally out of scope — the extraction target is
    * searchable text, not layout. */
  private[sources] def extractPdfText(cs: String): String = {
    val out = new StringBuilder
    val pending = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val n = cs.length
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out.append('\n')
    while (i < n) {
      val c = cs.charAt(i)
      c match {
        case '(' =>
          val (str, j) = pdfLiteral(cs, i); pending += str; i = j
        case '<' if i + 1 < n && cs.charAt(i + 1) == '<' => i += 2 // dict open
        case '<' =>
          val (str, j) = pdfHex(cs, i); pending += str; i = j
        case '%' => // comment to EOL
          while (i < n && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
        case '/' => // name token
          i += 1
          while (i < n && !" \t\r\n()<>[]{}/%".contains(cs.charAt(i))) i += 1
        case ch if ch.isLetter || ch == '\'' || ch == '"' =>
          val start = i
          while (i < n && (cs.charAt(i).isLetterOrDigit || cs.charAt(i) == '*'
            || cs.charAt(i) == '\'' || cs.charAt(i) == '"')) i += 1
          cs.substring(start, i) match {
            case "Tj" => pending.lastOption.foreach(out.append(_))
            case "TJ" => pending.foreach(out.append(_))
            case "'" | "\"" => newline(); pending.lastOption.foreach(out.append(_))
            case "Td" | "TD" | "T*" => newline()
            case "ET" => newline()
            case _ => // other operator (Tf, Tm, cm, re, …): just clears operands
          }
          pending.clear()
        case _ => i += 1 // numbers, delimiters, whitespace
      }
    }
    out.toString
  }

  // stream boundary scan: the keyword, its EOL, and the matching
  // endstream; the preceding object dictionary tells us the filter
  private val pdfTitleRe =
    """/Title\s*\(""".r

  /**
   * PDF → text (Tika PDFParser analog, dependency-free, public
   * ISO 32000 subset): walks `stream`…`endstream` objects, inflates
   * `/FlateDecode` streams (bounded — bomb-guarded) and takes
   * unfiltered streams raw, then extracts the text-showing operators
   * (Tj / TJ / ' / ") with full PDF string-escape handling. Streams
   * with other filters (DCTDecode images, LZW, …) are skipped.
   * Metadata: `pages` (count of page objects), `title` (Info dict),
   * `encrypted` ("true" → no text: content streams are ciphertext).
   *
   * DIVERGENCE (declared): string bytes are mapped via the font's
   * encoding in a real renderer; without font/CMap resolution they're
   * taken as Latin-1 — exact for the ASCII/WinAnsi simple-font PDFs
   * this targets, garbled for subset-embedded or CID fonts (such docs
   * still parse, term positions just aren't meaningful).
   */
  private[sources] def parsePdf(bytes: Array[Byte], mime: String): ParsedDoc = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF")) return ParsedDoc("", mime, Map("parse_error" -> "not a PDF"))
    if (s.contains("/Encrypt"))
      return ParsedDoc("", mime, Map("encrypted" -> "true"))
    val text = new StringBuilder
    var from = 0
    var guard = 0
    while (from < s.length && guard < 10000) {
      guard += 1
      val k = s.indexOf("stream", from)
      if (k < 0) from = s.length
      else {
        // object dict = text between the enclosing "obj" (or start) and the keyword
        val objAt = s.lastIndexOf(" obj", k)
        val dict = s.substring(math.max(0, math.max(objAt, k - 400)), k)
        var dataStart = k + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val end0 = s.indexOf("endstream", dataStart)
        val end = if (end0 < 0) s.length else end0
        val raw = s.substring(dataStart, end)
          .stripSuffix("\n").stripSuffix("\r")
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        val decoded: Option[String] =
          if (dict.contains("/FlateDecode"))
            try Some(new String(inflateBounded(raw),
              java.nio.charset.StandardCharsets.ISO_8859_1))
            catch { case _: Exception => None } // corrupt deflate: skip stream
          else if (dict.contains("/Filter")) None // unsupported filter
          else Some(new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1))
        decoded.filter(d => d.contains("BT") || d.contains("Tj") || d.contains("TJ"))
          .foreach { d =>
            val t = extractPdfText(d)
            if (t.nonEmpty) { text.append(t); text.append('\n') }
          }
        from = end + "endstream".length
      }
    }
    val pages = """/Type\s*/Page([^s]|$)""".r.findAllMatchIn(s).length
    val title = pdfTitleRe.findFirstMatchIn(s).map { m =>
      pdfLiteral(s, m.end - 1)._1
    }
    ParsedDoc(text.toString.replaceAll("[ \t]+", " ").replaceAll("\\s*\n\\s*", "\n").trim,
      mime,
      Map("pages" -> pages.toString) ++ title.map("title" -> _))
  }

  // ----- email (RFC 5322 .eml + mbox containers — Tika's
  // RFC822Parser / MboxParser scope; the reference routes message/*
  // through Tika the same way, solrCellDocumentTypes.conf). Headers
  // unfold per RFC 5322 §2.2.3; bodies decode quoted-printable and
  // base64 transfer encodings; multipart messages keep their
  // text/plain and text/html parts (html routed through parseHtml). -----

  /** Unfold headers (continuation lines start with WSP) and return
    * (headers, bodyStartIndex) over the raw message lines. */
  private def emailHeaders(lines: Array[String]): (Map[String, String], Int) = {
    val hdrs = Map.newBuilder[String, String]
    var i = 0
    var cur: String = null
    var curVal = new StringBuilder
    def flush(): Unit = if (cur != null) { hdrs += cur.toLowerCase -> curVal.toString.trim; cur = null }
    while (i < lines.length && lines(i).nonEmpty) {
      val l = lines(i)
      if ((l.startsWith(" ") || l.startsWith("\t")) && cur != null) curVal.append(' ').append(l.trim)
      else {
        flush()
        val k = l.indexOf(':')
        if (k > 0) { cur = l.substring(0, k); curVal = new StringBuilder(l.substring(k + 1)) }
      }
      i += 1
    }
    flush()
    (hdrs.result(), math.min(i + 1, lines.length))
  }

  private def decodeQuotedPrintable(s: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    val t = s.replaceAll("=\r?\n", "") // soft line breaks
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '=' && i + 3 <= t.length) {
        try { out.write(Integer.parseInt(t.substring(i + 1, i + 3), 16)); i += 3 }
        catch { case _: NumberFormatException => out.write(c.toInt); i += 1 }
      } else { out.write(c.toInt); i += 1 }
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }

  private def decodeBody(body: String, encoding: String): String =
    encoding.toLowerCase match {
      case e if e.contains("quoted-printable") => decodeQuotedPrintable(body)
      case e if e.contains("base64") =>
        try new String(java.util.Base64.getMimeDecoder.decode(body), StandardCharsets.UTF_8)
        catch { case _: IllegalArgumentException => "" } // corrupt b64 part: drop
      case _ => body
    }

  /** One RFC 5322 message → text + common headers. Multipart bodies
    * keep text/plain (and text/html via parseHtml); other parts and
    * attachments contribute only a count (separateAttachments is the
    * operator for pulling them out). */
  private[sources] def parseEml(raw: String, mime: String): ParsedDoc = {
    val lines = raw.split("\r?\n", -1)
    val (hdrs, bodyAt) = emailHeaders(lines)
    val meta = Map.newBuilder[String, String]
    Seq("subject", "from", "to", "date", "message-id").foreach { h =>
      hdrs.get(h).foreach(v => meta += h.replace("-", "_") -> v)
    }
    val ctype = hdrs.getOrElse("content-type", "text/plain")
    val body = lines.drop(bodyAt).mkString("\n")
    val text =
      if (ctype.contains("multipart/")) {
        val boundary = "boundary=\"?([^\";]+)\"?".r.findFirstMatchIn(ctype).map(_.group(1))
        boundary match {
          case None => body
          case Some(b) =>
            val parts = body.split(java.util.regex.Pattern.quote("--" + b), -1)
              .drop(1).filterNot(p => p.startsWith("--") || p.trim.isEmpty)
            meta += "parts" -> parts.length.toString
            parts.flatMap { p =>
              val plines = p.dropWhile(c => c == '\r' || c == '\n').split("\r?\n", -1)
              val (ph, pbAt) = emailHeaders(plines)
              val pct = ph.getOrElse("content-type", "text/plain")
              val enc = ph.getOrElse("content-transfer-encoding", "7bit")
              val pbody = plines.drop(pbAt).mkString("\n")
              if (pct.contains("text/plain")) Some(decodeBody(pbody, enc).trim)
              else if (pct.contains("text/html"))
                Some(parseHtml(decodeBody(pbody, enc), "text/html").text)
              else None
            }.mkString("\n").trim
        }
      } else decodeBody(body, hdrs.getOrElse("content-transfer-encoding", "7bit")).trim
    ParsedDoc(text, mime, meta.result())
  }

  /** mbox container → one concatenated text with per-message subjects
    * in metadata ("From " separator lines per the mboxrd convention;
    * for one-row-per-message use separateAttachments-style explode on
    * `mboxMessages`). */
  private[sources] def parseMbox(raw: String, mime: String): ParsedDoc = {
    val msgs = mboxMessages(raw)
    val parsed = msgs.map(m => parseEml(m, "message/rfc822"))
    ParsedDoc(parsed.map(_.text).filter(_.nonEmpty).mkString("\n\n"), mime,
      Map("messages" -> msgs.length.toString) ++
        parsed.zipWithIndex.flatMap { case (p, i) =>
          p.metadata.get("subject").map(s => s"subject_$i" -> s)
        })
  }

  /** Split an mbox into raw RFC 5322 messages (the explode hook). */
  private[sources] def mboxMessages(raw: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var started = false
    raw.split("\r?\n", -1).foreach { l =>
      if (l.startsWith("From ")) { // envelope line: message boundary
        if (started && cur.nonEmpty) out += cur.toString
        cur.clear()
        started = true
      } else if (started) {
        // mboxrd unquoting: ">From " at line start was escaped
        cur.append(if (l.startsWith(">") && l.dropWhile(_ == '>').startsWith("From ")) l.drop(1) else l)
        cur.append('\n')
      }
    }
    if (started && cur.nonEmpty) out += cur.toString
    out.result()
  }

  // ----- image metadata (Tika's ImageParser/JpegParser behavior:
  // dimensions + format facts from the HEADER bytes, no pixel decode —
  // reference scope: solrCellDocumentTypes.conf routes image/* through
  // Tika, which indexes exactly this metadata; OCR is out of scope
  // there too). All parsers are bounded scans of untrusted bytes:
  // explicit length checks, no allocation proportional to claimed
  // sizes. -----

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  // ----- audio headers (the S9 family's last gap; public specs:
  // RIFF/WAVE, ID3v2 + MPEG audio framing, FLAC, Ogg). Audio has no
  // text to extract — like the image parsers these emit typed
  // metadata (codec, channels, sample rate, duration) so pipeline
  // stages can filter/route assets without a media library. -----

  /** RIFF/WAVE: fmt chunk (channels/rate/bits), data size → duration,
    * LIST-INFO tags (INAM/IART/ICMT) as title/artist/comment. */
  private[sources] def parseWav(bytes: Array[Byte], mime: String): ParsedDoc = {
    def stub(r: String) =
      ParsedDoc("", mime, Map("length" -> bytes.length.toString,
        "audio_variant" -> r))
    if (bytes.length < 12 ||
        new String(bytes, 0, 4, StandardCharsets.ISO_8859_1) != "RIFF" ||
        new String(bytes, 8, 4, StandardCharsets.ISO_8859_1) != "WAVE")
      return stub("not RIFF/WAVE")
    var meta = Map.empty[String, String]
    var byteRate = 0L
    var dataSize = -1L
    var p = 12L
    while (p + 8 <= bytes.length) {
      val o = p.toInt
      val id = new String(bytes, o, 4, StandardCharsets.ISO_8859_1)
      val sz = le32(bytes, o + 4) & 0xFFFFFFFFL
      val d = o + 8
      id match {
        case "fmt " if d + 16 <= bytes.length =>
          meta ++= Map(
            "channels" -> le16(bytes, d + 2).toString,
            "sample_rate" -> (le32(bytes, d + 4) & 0xFFFFFFFFL).toString,
            "bits_per_sample" -> le16(bytes, d + 14).toString)
          byteRate = le32(bytes, d + 8) & 0xFFFFFFFFL
        case "data" =>
          dataSize = math.min(sz, (bytes.length - d).toLong)
        case "LIST" if d + 4 <= bytes.length &&
            new String(bytes, d, 4, StandardCharsets.ISO_8859_1) == "INFO" =>
          // INFO sub-chunks: (id, size, zero-terminated text)
          var q = d + 4L
          val end = math.min(d + sz, bytes.length.toLong)
          while (q + 8 <= end) {
            val qo = q.toInt
            val sid = new String(bytes, qo, 4, StandardCharsets.ISO_8859_1)
            val ssz = le32(bytes, qo + 4) & 0xFFFFFFFFL
            val take = math.min(ssz, end - qo - 8).toInt
            if (take > 0) {
              val v = new String(bytes, qo + 8, take, StandardCharsets.UTF_8)
                .takeWhile(_ != '\u0000').trim
              sid match {
                case "INAM" if v.nonEmpty => meta += ("title" -> v)
                case "IART" if v.nonEmpty => meta += ("artist" -> v)
                case "ICMT" if v.nonEmpty => meta += ("comment" -> v)
                case _ => ()
              }
            }
            q += 8 + ssz + (ssz & 1)
          }
        case _ => ()
      }
      p += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (dataSize >= 0 && byteRate > 0)
      meta += ("duration_ms" -> (dataSize * 1000 / byteRate).toString)
    ParsedDoc("", mime, meta + ("codec" -> "pcm_wave"))
  }

  /** MP3: ID3v2 text frames (TIT2/TPE1/TALB; v2.3 plain and v2.4
    * syncsafe frame sizes) + the first MPEG-1 Layer III frame header
    * (bitrate/sample-rate indices) → CBR duration estimate. */
  private[sources] def parseMp3(bytes: Array[Byte], mime: String): ParsedDoc = {
    var meta = Map.empty[String, String]
    var audioStart = 0
    if (bytes.length >= 10 &&
        new String(bytes, 0, 3, StandardCharsets.ISO_8859_1) == "ID3") {
      val v = bytes(3) & 0xff // 3 = v2.3, 4 = v2.4
      val tagSize = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      audioStart = math.min(10 + tagSize, bytes.length)
      var p = 10
      var ok = true
      while (ok && p + 10 <= audioStart) {
        val fid = new String(bytes, p, 4, StandardCharsets.ISO_8859_1)
        val fsz =
          if (v >= 4) ((bytes(p + 4) & 0x7f) << 21) | ((bytes(p + 5) & 0x7f) << 14) |
            ((bytes(p + 6) & 0x7f) << 7) | (bytes(p + 7) & 0x7f)
          else ((bytes(p + 4) & 0xff) << 24) | ((bytes(p + 5) & 0xff) << 16) |
            ((bytes(p + 6) & 0xff) << 8) | (bytes(p + 7) & 0xff)
        if (fsz <= 0 || p + 10 + fsz > audioStart ||
            !fid.forall(c => c.isLetterOrDigit)) ok = false
        else {
          if (fid.startsWith("T") && fsz >= 2) {
            val enc = bytes(p + 10) & 0xff
            val raw = java.util.Arrays.copyOfRange(bytes, p + 11, p + 10 + fsz)
            val text = (enc match {
              case 0 => new String(raw, "windows-1252")
              case 1 => new String(raw, StandardCharsets.UTF_16) // BOM-led
              case 2 => new String(raw, StandardCharsets.UTF_16BE)
              case _ => new String(raw, StandardCharsets.UTF_8)
            }).takeWhile(_ != '\u0000').trim
            if (text.nonEmpty) fid match {
              case "TIT2" => meta += ("title" -> text)
              case "TPE1" => meta += ("artist" -> text)
              case "TALB" => meta += ("album" -> text)
              case _ => ()
            }
          }
          p += 10 + fsz
        }
      }
    }
    // first frame sync after the tag
    val bitrates = // MPEG-1 Layer III, kbps ([ISO 11172-3] table)
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val rates = Array(44100, 48000, 32000)
    var f = audioStart
    var found = false
    while (!found && f + 4 <= bytes.length) {
      if ((bytes(f) & 0xff) == 0xFF && (bytes(f + 1) & 0xE0) == 0xE0) {
        val versionBits = (bytes(f + 1) >> 3) & 3 // 3 = MPEG-1
        val layerBits = (bytes(f + 1) >> 1) & 3 // 1 = Layer III
        val brIdx = (bytes(f + 2) >> 4) & 0xF
        val srIdx = (bytes(f + 2) >> 2) & 3
        if (versionBits == 3 && layerBits == 1 && brIdx >= 1 && brIdx <= 14
            && srIdx < 3) {
          val kbps = bitrates(brIdx)
          meta ++= Map("bitrate_kbps" -> kbps.toString,
            "sample_rate" -> rates(srIdx).toString)
          meta += ("duration_ms" ->
            ((bytes.length - audioStart).toLong * 8 / kbps).toString)
          found = true
        }
      }
      if (!found) f += 1
    }
    ParsedDoc("", mime, meta + ("codec" -> "mp3") +
      ("length" -> bytes.length.toString))
  }

  /** FLAC: STREAMINFO (sample rate 20 bits, channels, bps, total
    * samples → exact duration) + VORBIS_COMMENT TITLE/ARTIST. */
  private[sources] def parseFlac(bytes: Array[Byte], mime: String): ParsedDoc = {
    def stub(r: String) =
      ParsedDoc("", mime, Map("length" -> bytes.length.toString,
        "audio_variant" -> r))
    if (bytes.length < 8 ||
        new String(bytes, 0, 4, StandardCharsets.ISO_8859_1) != "fLaC")
      return stub("not fLaC")
    var meta = Map.empty[String, String]
    var p = 4
    var last = false
    while (!last && p + 4 <= bytes.length) {
      last = (bytes(p) & 0x80) != 0
      val typ = bytes(p) & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      val o = p + 4
      if (o + len > bytes.length) last = true
      else {
        if (typ == 0 && len >= 18) { // STREAMINFO
          val rate = ((bytes(o + 10) & 0xff) << 12) |
            ((bytes(o + 11) & 0xff) << 4) | ((bytes(o + 12) & 0xff) >> 4)
          val channels = (((bytes(o + 12) & 0xff) >> 1) & 7) + 1
          val bps = (((bytes(o + 12) & 1) << 4) |
            ((bytes(o + 13) & 0xff) >> 4)) + 1
          val total = ((bytes(o + 13) & 0x0F).toLong << 32) |
            ((bytes(o + 14) & 0xffL) << 24) | ((bytes(o + 15) & 0xffL) << 16) |
            ((bytes(o + 16) & 0xffL) << 8) | (bytes(o + 17) & 0xffL)
          meta ++= Map("sample_rate" -> rate.toString,
            "channels" -> channels.toString,
            "bits_per_sample" -> bps.toString)
          if (rate > 0 && total > 0)
            meta += ("duration_ms" -> (total * 1000 / rate).toString)
        } else if (typ == 4 && len >= 8) { // VORBIS_COMMENT
          val vendorLen = le32(bytes, o)
          var q = o + 4 + math.max(0, vendorLen)
          if (q + 4 <= o + len) {
            val count = le32(bytes, q); q += 4
            var i = 0
            while (i < count && q + 4 <= o + len) {
              val el = le32(bytes, q); q += 4
              if (el > 0 && q + el <= o + len) {
                val kv = new String(bytes, q, el, StandardCharsets.UTF_8)
                val eq = kv.indexOf('=')
                if (eq > 0) kv.substring(0, eq).toUpperCase match {
                  case "TITLE" => meta += ("title" -> kv.substring(eq + 1))
                  case "ARTIST" => meta += ("artist" -> kv.substring(eq + 1))
                  case _ => ()
                }
                q += el
              } else i = count
              i += 1
            }
          }
        }
        p = o + len
      }
    }
    ParsedDoc("", mime, meta + ("codec" -> "flac"))
  }

  /** Ogg: identification header of the first packet — Vorbis
    * (`\x01vorbis`: channels, rate) or Opus (`OpusHead`). */
  private[sources] def parseOgg(bytes: Array[Byte], mime: String): ParsedDoc = {
    val window = math.min(bytes.length, 512)
    val head = new String(bytes, 0, window, StandardCharsets.ISO_8859_1)
    val vorbis = head.indexOf("\u0001vorbis")
    val opus = head.indexOf("OpusHead")
    val meta: Map[String, String] =
      if (vorbis >= 0 && vorbis + 16 <= window)
        Map("codec" -> "vorbis",
          "channels" -> (bytes(vorbis + 11) & 0xff).toString,
          "sample_rate" -> (le32(bytes, vorbis + 12) & 0xFFFFFFFFL).toString)
      else if (opus >= 0 && opus + 16 <= window)
        Map("codec" -> "opus",
          "channels" -> (bytes(opus + 9) & 0xff).toString,
          "sample_rate" -> (le32(bytes, opus + 12) & 0xFFFFFFFFL).toString)
      else Map("audio_variant" -> "unknown ogg codec")
    ParsedDoc("", mime, meta + ("length" -> bytes.length.toString))
  }

  /** MP4/ISO-BMFF (Tika `MP4Parser` analog,
    * solrCellDocumentTypes.conf:256): movie duration, per-track
    * handler/codec/dimensions, sample + keyframe counts — the box
    * walk itself lives in [[IsoBmff]]. */
  private[sources] def parseMp4(bytes: Array[Byte], mime: String): ParsedDoc =
    IsoBmff.parse(bytes) match {
      case None =>
        ParsedDoc("", mime, Map("length" -> bytes.length.toString,
          "video_variant" -> "not ISO-BMFF"))
      case Some(info) =>
        val video = info.tracks.find(_.handler == "vide")
        ParsedDoc("", mime, Map(
          "length" -> bytes.length.toString,
          "brand" -> info.brand,
          "duration_ms" -> info.durationMillis.toString,
          "n_tracks" -> info.tracks.length.toString,
          "codecs" -> info.tracks.map(_.codec).distinct.mkString(","),
          "n_samples" -> info.tracks.map(_.samples.length).sum.toString,
          "n_keyframes" ->
            info.tracks.map(_.samples.count(_.keyframe)).sum.toString) ++
          video.map(v => Map("width" -> v.width.toString,
            "height" -> v.height.toString)).getOrElse(Map.empty))
    }

  /** FLV (Tika `FLVParser` analog, solrCellDocumentTypes.conf:265):
    * duration, tag and keyframe counts via [[Flv]]. */
  private[sources] def parseFlv(bytes: Array[Byte], mime: String): ParsedDoc =
    Flv.parse(bytes) match {
      case None =>
        ParsedDoc("", mime, Map("length" -> bytes.length.toString,
          "video_variant" -> "not FLV"))
      case Some(info) =>
        ParsedDoc("", mime, Map(
          "length" -> bytes.length.toString,
          "flv_version" -> info.version.toString,
          "has_video" -> info.hasVideo.toString,
          "has_audio" -> info.hasAudio.toString,
          "duration_ms" -> info.durationMs.toString,
          "n_tags" -> info.tags.length.toString,
          "n_keyframes" -> info.keyframes.length.toString))
    }

  /** PNG (public spec, RFC 2083/ISO 15948): IHDR dims + bit depth +
    * color type, plus tEXt keyword/value pairs (bounded walk). */
  private[sources] def parsePng(bytes: Array[Byte], mime: String): ParsedDoc = {
    if (bytes.length < 33) return ParsedDoc("", mime, Map("parse_error" -> "truncated png"))
    // signature(8) + IHDR len(4) + "IHDR"(4) -> fields at 16
    val meta = Map.newBuilder[String, String]
    meta += "width" -> be32(bytes, 16).toString
    meta += "height" -> be32(bytes, 20).toString
    meta += "bit_depth" -> (bytes(24) & 0xFF).toString
    meta += "color_type" -> (bytes(25) & 0xFF).toString
    // chunk walk for tEXt (keyword\0value, both Latin-1); bounded
    var i = 8
    var chunks = 0
    while (i + 8 <= bytes.length && chunks < 256) {
      val len = be32(bytes, i)
      val typ = new String(bytes, i + 4, 4, StandardCharsets.US_ASCII)
      if (typ == "tEXt" && len <= 8192 && i + 8 + len <= bytes.length) {
        val body = new String(bytes, i + 8, len.toInt, StandardCharsets.ISO_8859_1)
        val nul = body.indexOf('\u0000')
        if (nul > 0) meta += s"text_${body.substring(0, nul)}" -> body.substring(nul + 1)
      }
      // Long advance: i + 12 + len can exceed Int.MaxValue for a
      // hostile len even when 12 + len alone doesn't
      val next = i.toLong + 12L + len // len + type + data + crc
      if (typ == "IEND" || next > bytes.length) i = bytes.length
      else i = next.toInt
      chunks += 1
    }
    ParsedDoc("", mime, meta.result())
  }

  /** JPEG (ITU T.81): marker walk to the first SOFn frame header for
    * dimensions/components; JFIF density and progressive flag. */
  private[sources] def parseJpeg(bytes: Array[Byte], mime: String): ParsedDoc = {
    val n = bytes.length
    if (n < 4) return ParsedDoc("", mime, Map("parse_error" -> "truncated jpeg"))
    val meta = Map.newBuilder[String, String]
    var i = 2 // past FFD8
    var found = false
    var guard = 0
    while (!found && i + 4 <= n && guard < 1024) {
      guard += 1
      if ((bytes(i) & 0xFF) != 0xFF) i += 1 // resync on garbage
      else {
        val marker = bytes(i + 1) & 0xFF
        if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9) || marker == 0x01 || marker == 0xFF) {
          i += 2 // standalone marker / fill byte
        } else {
          val segLen = be16(bytes, i + 2)
          if (segLen < 2) i = n
          else {
            val isSof = marker >= 0xC0 && marker <= 0xCF &&
              marker != 0xC4 && marker != 0xC8 && marker != 0xCC
            if (isSof && i + 10 <= n) { // reads bytes(i+9)
              meta += "height" -> be16(bytes, i + 5).toString
              meta += "width" -> be16(bytes, i + 7).toString
              meta += "components" -> (bytes(i + 9) & 0xFF).toString
              meta += "progressive" -> (marker == 0xC2).toString
              found = true
            } else if (marker == 0xE0 && i + 16 <= n &&
              new String(bytes, i + 4, 4, StandardCharsets.US_ASCII) == "JFIF") {
              meta += "density_x" -> be16(bytes, i + 12).toString
              meta += "density_y" -> be16(bytes, i + 14).toString
            }
            i += 2 + segLen
          }
        }
      }
    }
    if (!found) meta += "parse_error" -> "no SOF frame"
    ParsedDoc("", mime, meta.result())
  }

  /** GIF87a/89a: little-endian logical-screen dimensions + version. */
  private[sources] def parseGif(bytes: Array[Byte], mime: String): ParsedDoc = {
    if (bytes.length < 10) return ParsedDoc("", mime, Map("parse_error" -> "truncated gif"))
    ParsedDoc("", mime, Map(
      "version" -> new String(bytes, 3, 3, StandardCharsets.US_ASCII),
      "width" -> le16(bytes, 6).toString,
      "height" -> le16(bytes, 8).toString))
  }

  /** BMP (BITMAPINFOHEADER): little-endian dims at 18/22 (height may
    * be negative = top-down; report magnitude + orientation). */
  private[sources] def parseBmp(bytes: Array[Byte], mime: String): ParsedDoc = {
    if (bytes.length < 26) return ParsedDoc("", mime, Map("parse_error" -> "truncated bmp"))
    val w = le32(bytes, 18)
    val h = le32(bytes, 22) // negative = top-down orientation
    ParsedDoc("", mime, Map(
      "width" -> w.toString,
      "height" -> math.abs(h).toString,
      "top_down" -> (h < 0).toString))
  }

  // ----- The remaining declared Tika set (solrCellDocumentTypes
  // .conf:229-268): ebooks and feeds (crawl-real TEXT), plus image/
  // audio/font/executable METADATA parsers. Same discipline as the
  // rest of the file: dependency-free bounded walks, clamped table
  // sizes, malformed input → partial metadata, never a throw. -----

  /** EPUB (Tika `EpubParser`, conf:237) — the dominant ebook format,
    * a zip container: META-INF/container.xml names the OPF package
    * document, the OPF carries Dublin Core metadata plus the spine
    * reading order, and each spine chapter is XHTML that flows
    * through [[parseHtml]]. */
  private[sources] def parseEpub(bytes: Array[Byte], mime: String): ParsedDoc = {
    val entries = zipEntries(bytes, n => n == "META-INF/container.xml" ||
      n.endsWith(".opf") || n.endsWith(".xhtml") || n.endsWith(".html") ||
      n.endsWith(".htm"))
    def xml(name: String): Option[scala.xml.Elem] =
      entries.get(name).flatMap(b =>
        scala.util.Try(scala.xml.XML.loadString(decodeText(b))).toOption)
    val opfPath = xml("META-INF/container.xml")
      .flatMap(c => (c \\ "rootfile").headOption)
      .map(r => (r \@ "full-path"))
      .filter(_.nonEmpty)
      .orElse(entries.keys.find(_.endsWith(".opf")))
    val opf = opfPath.flatMap(xml)
    val opfDir = opfPath.map(p =>
      p.lastIndexOf('/') match { case -1 => ""; case i => p.substring(0, i + 1) })
      .getOrElse("")
    val meta = opf.map { o =>
      Map.empty[String, String] ++
        (o \\ "title").headOption.map(t => "title" -> t.text.trim) ++
        (o \\ "creator").headOption.map(c => "creator" -> c.text.trim) ++
        (o \\ "language").headOption.map(l => "language" -> l.text.trim) ++
        (o \\ "identifier").headOption.map(i => "identifier" -> i.text.trim)
    }.getOrElse(Map.empty)
    // spine order: idrefs → manifest hrefs (relative to the OPF dir)
    val spineHrefs: Seq[String] = opf.map { o =>
      val manifest = (o \\ "item")
        .map(i => (i \@ "id") -> (i \@ "href")).toMap
      (o \\ "itemref").flatMap(r => manifest.get(r \@ "idref"))
        .map(opfDir + _)
    }.getOrElse(Seq.empty)
    val chapterNames =
      if (spineHrefs.nonEmpty) spineHrefs.filter(entries.contains)
      else entries.keys.filter(n => n.endsWith(".xhtml") || n.endsWith(".html"))
        .toSeq.sorted
    val text = chapterNames
      .map(n => parseHtml(decodeText(entries(n)), "text/html").text)
      .filter(_.nonEmpty).mkString(" ")
    ParsedDoc(text, mime, meta + ("n_chapters" -> chapterNames.length.toString))
  }

  /** RSS 2.0 / Atom feeds (Tika `FeedParser`, conf:239): feed title +
    * per-item titles/summaries as the text stream. */
  private[sources] def parseFeed(raw: String, mime: String): ParsedDoc =
    scala.util.Try(scala.xml.XML.loadString(raw)).toOption match {
      case None => ParsedDoc("", mime, Map("parse_error" -> "bad feed xml"))
      case Some(root) =>
        val atom = root.label == "feed"
        val items = if (atom) root \\ "entry" else root \\ "item"
        val feedTitle =
          (if (atom) root \ "title" else root \ "channel" \ "title")
            .headOption.map(_.text.trim).getOrElse("")
        val text = items.map { it =>
          val t = (it \ "title").headOption.map(_.text.trim).getOrElse("")
          val d = (it \ "description").headOption
            .orElse((it \ "summary").headOption)
            .map(_.text.trim).getOrElse("")
          (t + " " + d).trim
        }.filter(_.nonEmpty).mkString(" ")
        ParsedDoc(text, mime, Map(
          "feed_type" -> (if (atom) "atom" else "rss"),
          "title" -> feedTitle,
          "n_items" -> items.length.toString))
    }

  /** FictionBook 2 (Tika `FictionBookParser`, conf:267): XML ebook —
    * title-info metadata + body paragraph text. */
  private[sources] def parseFb2(raw: String, mime: String): ParsedDoc =
    scala.util.Try(scala.xml.XML.loadString(raw)).toOption match {
      case None => ParsedDoc("", mime, Map("parse_error" -> "bad fb2 xml"))
      case Some(root) =>
        val ti = (root \ "description" \ "title-info").headOption
        val title = ti.flatMap(t => (t \ "book-title").headOption)
          .map(_.text.trim)
        val author = ti.flatMap(t => (t \ "author").headOption).map(a =>
          ((a \ "first-name").text.trim + " " + (a \ "last-name").text.trim).trim)
        val text = (root \ "body" \\ "p").map(_.text.trim)
          .filter(_.nonEmpty).mkString(" ")
        ParsedDoc(text, mime, Map.empty[String, String] ++
          title.map("title" -> _) ++ author.map("author" -> _) ++
          ti.flatMap(t => (t \ "lang").headOption).map(l => "language" -> l.text.trim))
    }

  /** TIFF (Tika `TiffParser`, conf:246): endian-tagged IFD walk for
    * width (256) / height (257) / bits-per-sample (258). Entry count
    * clamped to what the buffer holds. */
  private[sources] def parseTiff(bytes: Array[Byte], mime: String): ParsedDoc = {
    if (bytes.length < 8) return ParsedDoc("", mime, Map("parse_error" -> "truncated tiff"))
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    def u16(i: Int): Int = if (le) le16(bytes, i) else be16(bytes, i)
    def u32(i: Int): Long =
      if (le) le32(bytes, i).toLong & 0xFFFFFFFFL else be32(bytes, i)
    if (u16(2) != 42) return ParsedDoc("", mime, Map("parse_error" -> "bad tiff magic"))
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length)
      return ParsedDoc("", mime, Map("parse_error" -> "bad ifd offset"))
    val n = math.min(u16(ifd.toInt), (bytes.length - ifd - 2) / 12).toInt
    var w = 0L; var h = 0L; var bits = 0L
    var i = 0
    while (i < n) {
      val off = ifd.toInt + 2 + i * 12
      val tag = u16(off)
      val typ = u16(off + 2)
      // SHORT values sit in the first two value bytes, LONG in all four
      val v = if (typ == 3) u16(off + 8).toLong else u32(off + 8)
      tag match {
        case 256 => w = v
        case 257 => h = v
        case 258 => bits = v
        case _ =>
      }
      i += 1
    }
    ParsedDoc("", mime, Map("width" -> w.toString, "height" -> h.toString,
      "bits_per_sample" -> bits.toString,
      "byte_order" -> (if (le) "little" else "big")))
  }

  /** Photoshop PSD (Tika `PSDParser`, conf:245): fixed header —
    * channels/height/width/depth/mode. */
  private[sources] def parsePsd(bytes: Array[Byte], mime: String): ParsedDoc = {
    if (bytes.length < 26) return ParsedDoc("", mime, Map("parse_error" -> "truncated psd"))
    ParsedDoc("", mime, Map(
      "channels" -> be16(bytes, 12).toString,
      "height" -> be32(bytes, 14).toString,
      "width" -> be32(bytes, 18).toString,
      "depth" -> be16(bytes, 22).toString,
      "color_mode" -> be16(bytes, 24).toString))
  }

  /** Standard MIDI file (Tika `MidiParser`, conf:234): MThd header —
    * format / track count / division. */
  private[sources] def parseMidi(bytes: Array[Byte], mime: String): ParsedDoc = {
    if (bytes.length < 14) return ParsedDoc("", mime, Map("parse_error" -> "truncated midi"))
    ParsedDoc("", mime, Map(
      "midi_format" -> be16(bytes, 8).toString,
      "n_tracks" -> be16(bytes, 10).toString,
      "division" -> be16(bytes, 12).toString))
  }

  /** TrueType/OpenType (Tika `TrueTypeParser`, conf:241): the `name`
    * table's family (id 1) and full name (id 4) — platform 3 records
    * are UTF-16BE, platform 1 latin-1. */
  private[sources] def parseTtf(bytes: Array[Byte], mime: String): ParsedDoc = {
    if (bytes.length < 12) return ParsedDoc("", mime, Map("parse_error" -> "truncated font"))
    val numTables = math.min(be16(bytes, 4), (bytes.length - 12) / 16)
    var nameOff = -1L; var nameLen = 0L
    var i = 0
    while (i < numTables) {
      val o = 12 + i * 16
      if (new String(bytes, o, 4, "ISO-8859-1") == "name") {
        nameOff = be32(bytes, o + 8); nameLen = be32(bytes, o + 12)
      }
      i += 1
    }
    if (nameOff < 0 || nameOff + 6 > bytes.length)
      return ParsedDoc("", mime, Map("parse_error" -> "no name table"))
    val base = nameOff.toInt
    val count = math.min(be16(bytes, base + 2), (bytes.length - base - 6) / 12)
    val strBase = base + be16(bytes, base + 4)
    var family = ""; var full = ""
    var j = 0
    while (j < count) {
      val r = base + 6 + j * 12
      val platform = be16(bytes, r)
      val nameId = be16(bytes, r + 6)
      val len = be16(bytes, r + 8)
      val off = strBase + be16(bytes, r + 10)
      if ((nameId == 1 || nameId == 4) && off + len <= bytes.length) {
        val s = new String(bytes, off, len,
          if (platform == 3 || platform == 0) "UTF-16BE" else "ISO-8859-1")
        if (nameId == 1 && family.isEmpty) family = s
        if (nameId == 4 && full.isEmpty) full = s
      }
      j += 1
    }
    ParsedDoc("", mime, Map.empty[String, String] ++
      (if (family.nonEmpty) Some("font_family" -> family) else None) ++
      (if (full.nonEmpty) Some("font_name" -> full) else None))
  }

  /** ELF executables/libraries (Tika `ExecutableParser`, conf:238):
    * ident class/endianness + type + machine. */
  private[sources] def parseElf(bytes: Array[Byte], mime: String): ParsedDoc = {
    if (bytes.length < 20) return ParsedDoc("", mime, Map("parse_error" -> "truncated elf"))
    val le = bytes(5) == 1
    def u16(i: Int): Int = if (le) le16(bytes, i) else be16(bytes, i)
    val machine = u16(18) match {
      case 0x03 => "x86"; case 0x28 => "arm"; case 0x3E => "x86-64"
      case 0xB7 => "aarch64"; case 0xF3 => "riscv"; case m => s"0x${m.toHexString}"
    }
    ParsedDoc("", mime, Map(
      "elf_class" -> (if (bytes(4) == 2) "64" else "32"),
      "endianness" -> (if (le) "little" else "big"),
      "elf_type" -> (u16(16) match {
        case 1 => "relocatable"; case 2 => "executable"
        case 3 => "shared"; case 4 => "core"; case t => t.toString
      }),
      "machine" -> machine))
  }

  /** PE executables (the ExecutableParser's Windows half): COFF
    * header machine / section count / link timestamp. */
  private[sources] def parsePe(bytes: Array[Byte], mime: String): ParsedDoc = {
    if (bytes.length < 64) return ParsedDoc("", mime, Map("parse_error" -> "truncated pe"))
    val peOff = le32(bytes, 60)
    if (peOff < 0 || peOff + 24 > bytes.length ||
        !(bytes(peOff) == 'P' && bytes(peOff + 1) == 'E'))
      return ParsedDoc("", mime, Map("pe_variant" -> "MZ only (DOS)"))
    val machine = le16(bytes, peOff + 4) match {
      case 0x014C => "x86"; case 0x8664 => "x86-64"
      case 0xAA64 => "arm64"; case 0x01C4 => "armnt"; case m => s"0x${m.toHexString}"
    }
    ParsedDoc("", mime, Map(
      "machine" -> machine,
      "n_sections" -> le16(bytes, peOff + 6).toString,
      "link_timestamp" -> (le32(bytes, peOff + 8).toLong & 0xFFFFFFFFL).toString))
  }

  /** Java .class (Tika `ClassParser`, conf:229): version + this-class
    * name via a bounded constant-pool walk (tag-sized skips; Long/
    * Double occupy two slots per the JVM spec). */
  private[sources] def parseClass(bytes: Array[Byte], mime: String): ParsedDoc = {
    if (bytes.length < 10) return ParsedDoc("", mime, Map("parse_error" -> "truncated class"))
    val major = be16(bytes, 6)
    val cpCount = be16(bytes, 8)
    val utf8 = scala.collection.mutable.HashMap.empty[Int, String]
    val classRef = scala.collection.mutable.HashMap.empty[Int, Int]
    var pos = 10
    var idx = 1
    var ok = true
    while (idx < cpCount && ok && pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 1 =>
          val len = be16(bytes, pos + 1)
          if (pos + 3 + len <= bytes.length)
            utf8(idx) = new String(bytes, pos + 3, len, "UTF-8")
          pos += 3 + len
        case 7 => classRef(idx) = be16(bytes, pos + 1); pos += 3
        case 8 | 16 | 19 | 20 => pos += 3
        case 15 => pos += 4
        case 3 | 4 | 9 | 10 | 11 | 12 | 17 | 18 => pos += 5
        case 5 | 6 => pos += 9; idx += 1 // two slots
        case _ => ok = false
      }
      idx += 1
    }
    // after the pool: access_flags u16, this_class u16
    val className =
      if (ok && pos + 4 <= bytes.length)
        classRef.get(be16(bytes, pos + 2)).flatMap(utf8.get)
          .map(_.replace('/', '.'))
      else None
    ParsedDoc("", mime, Map(
      "class_major" -> major.toString,
      "java_version" -> math.max(major - 44, 1).toString) ++
      className.map("class_name" -> _))
  }

  private val parseUdf = udf((mime: String, bytes: Array[Byte]) => parse(mime, bytes))

  /** Adds `doc.text` / `doc.mime` / `doc.metadata` from a binary column. */
  def parseDocuments(df: DataFrame, mime: Column, content: Column,
                     out: String = "doc"): DataFrame =
    df.withColumn(out, parseUdf(mime, content))

  /** Extension → mime fallback when magic bytes are inconclusive
    * (reference: custom-mimetypes.xml + detectMimeType). */
  def mimeFromName(name: Column): Column =
    when(name.endsWith(".xml"), "application/xml")
      .when(name.endsWith(".html") || name.endsWith(".htm"), "text/html")
      .when(name.endsWith(".md") || name.endsWith(".markdown"), "text/markdown")
      .when(name.endsWith(".json"), "application/json")
      .when(name.endsWith(".rtf"), "application/rtf")
      .when(name.endsWith(".pdf"), "application/pdf")
      .when(name.endsWith(".docx"),
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document")
      .when(name.endsWith(".xlsx"),
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet")
      .when(name.endsWith(".pptx"),
        "application/vnd.openxmlformats-officedocument.presentationml.presentation")
      .when(name.endsWith(".odt"), "application/vnd.oasis.opendocument.text")
      .when(name.endsWith(".csv") || name.endsWith(".tsv"), "text/csv")
      .when(name.endsWith(".txt") || name.endsWith(".log"), "text/plain")
      .when(name.endsWith(".eml"), "message/rfc822")
      .when(name.endsWith(".mbox"), "application/mbox")
      .when(name.endsWith(".png"), "image/png")
      .when(name.endsWith(".jpg") || name.endsWith(".jpeg"), "image/jpeg")
      .when(name.endsWith(".gif"), "image/gif")
      .when(name.endsWith(".bmp"), "image/bmp")
      .when(name.endsWith(".avro"), "avro/binary")
      .when(name.endsWith(".epub"), "application/epub+zip")
      .when(name.endsWith(".rss"), "application/rss+xml")
      .when(name.endsWith(".atom"), "application/atom+xml")
      .when(name.endsWith(".fb2"), "application/x-fictionbook+xml")
      .when(name.endsWith(".tif") || name.endsWith(".tiff"), "image/tiff")
      .when(name.endsWith(".psd"), "image/vnd.adobe.photoshop")
      .when(name.endsWith(".mid") || name.endsWith(".midi"), "audio/midi")
      .when(name.endsWith(".ttf"), "font/ttf")
      .when(name.endsWith(".otf"), "font/otf")
      .when(name.endsWith(".class"), "application/java-vm")
      .when(name.endsWith(".exe") || name.endsWith(".dll"),
        "application/x-msdownload")
      .when(name.endsWith(".so"), "application/x-sharedlib")
      .otherwise("application/octet-stream")
}
