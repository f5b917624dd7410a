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

  /** Parse one blob by (sniffed or declared) mime type. */
  def parse(mime: String, bytes: Array[Byte]): ParsedDoc = {
    val str = () => new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
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
        case "application/json" =>
          ParsedDoc(str(), mime, Map.empty)
        case _ =>
          // unparsed binary: empty text, length metadata (Tika stub)
          ParsedDoc("", mime, Map("length" -> bytes.length.toString))
      }
    } catch {
      case e: Exception => ParsedDoc("", mime, Map("parse_error" -> e.getMessage))
    }
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
      .when(name.endsWith(".json"), "application/json")
      .when(name.endsWith(".csv") || name.endsWith(".tsv"), "text/csv")
      .when(name.endsWith(".txt") || name.endsWith(".log"), "text/plain")
      .when(name.endsWith(".avro"), "avro/binary")
      .otherwise("application/octet-stream")
}
