package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/**
 * Interop EXPORT: the engine's rows as Solr XML update messages
 * (`<add><doc><field name="f">v</field>…</doc>…</add>`) — the
 * reference-era wire format every Solr release ingests via `POST
 * /update` (and `bin/post`). The segment store's own binary codec is
 * not Lucene-openable (documented at SegmentIndex.scala:17-20, no
 * Lucene artifact in the offline build), so THIS is the portable
 * hand-off: export a store (or any frame) to update-XML part files
 * and a stock Solr loads them; the HTTP path for the same documents
 * is [[LiveSolrSink]] (JSON).
 *
 * Spark-first: the XML text is BUILT BY CODEGEN'D COLUMNS — per-field
 * escape (amp first, then angle brackets) + concat, arrays as
 * repeated `<field>` elements, nulls omitted — so serialization rides
 * whole-stage codegen like any other projection; file grouping is one
 * round-robin repartition and each task emits a single well-formed
 * `<add>` document.
 */
object SolrExport {

  /** XML-escape a string column (order matters: `&` first). */
  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      c.cast("string"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** One `<field name="...">` element (empty string when null). */
  private def fieldXml(name: String, c: Column): Column = {
    val open = s"""<field name="${name.replace("\"", "")}">"""
    when(c.isNull, lit(""))
      .otherwise(concat(lit(open), esc(c), lit("</field>")))
  }

  /** One `<doc>` element per row: scalar columns one field each,
    * array columns one field PER ELEMENT (Solr multi-value form). */
  def docXmlCol(df: DataFrame): Column = {
    val fields = df.schema.fields.map { f =>
      f.dataType match {
        case ArrayType(_, _) =>
          when(col(f.name).isNull, lit("")).otherwise(
            array_join(transform(col(f.name),
              v => fieldXml(f.name, v)), ""))
        case _ => fieldXml(f.name, col(f.name))
      }
    }
    concat(lit("<doc>") +: fields.toIndexedSeq :+ lit("</doc>"): _*)
  }

  /**
   * Write `df` as `numFiles` update-XML part files (each a complete
   * `<add>` document with an XML declaration) under `path`. Solr-side
   * load is `bin/post -c <collection> path/part-*.xml` or any
   * /update POST per file.
   */
  def writeUpdateXml(df: DataFrame, path: String, numFiles: Int = 1): Unit = {
    import org.apache.spark.sql.Encoders
    df.select(docXmlCol(df).as("x"))
      .repartition(numFiles)
      .mapPartitions { it =>
        val sb = new java.lang.StringBuilder()
        sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<add>\n")
        var any = false
        while (it.hasNext) {
          val r = it.next()
          sb.append(r.getString(0)).append('\n'); any = true
        }
        sb.append("</add>")
        if (any) Iterator(sb.toString) else Iterator.empty
      }(Encoders.STRING)
      .write.mode("overwrite").text(path)
  }
}
