package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
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
      .when(name.endsWith(".csv") || name.endsWith(".tsv"), "text/csv")
      .when(name.endsWith(".txt") || name.endsWith(".log"), "text/plain")
      .when(name.endsWith(".avro"), "avro/binary")
      .otherwise("application/octet-stream")
}
