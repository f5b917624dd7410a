package graft.etl

import graft.schema.IndexSchema
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Morphline-config loader: parses the reference's HOCON morphline
 * files (`tutorialReadAvroContainer.conf`, `tokenizeText.conf`, … —
 * the config surface a reference user already owns) and compiles the
 * command chain into a [[Pipeline.Command]], so existing configs keep
 * working against the Spark engine without a rewrite.
 *
 * HOCON subset (what the reference's configs actually use): objects
 * with `:`/`=` separators and newline-or-comma entry breaks, arrays,
 * quoted + triple-quoted + unquoted strings, `#`/`//` comments, and
 * `${VAR}` substitution resolved against the file's root object
 * (SOLR_LOCATOR's usage pattern). Unsupported HOCON (includes, value
 * concatenation, `+=`) fails loudly rather than misparsing.
 *
 * Command vocabulary (reference commands → engine operators; commands
 * the DataFrame model makes structural no-ops — the read* sources,
 * loadSolr — are RECORDED, so callers can wire the right
 * source/sink):
 *   readAvroContainer/readCSV/readLine/readJson  → recorded source
 *   extractAvroPaths { paths }                   → Etl.extractPaths
 *   convertTimestamp { field, inputFormats, … }  → Etl.convertTimestamp
 *   sanitizeUnknownSolrFields { solrLocator }    → schema.sanitize (needs schema arg)
 *   generateUUID { field, preserveExisting }     → Etl.generateUuid
 *   setValues / addValues { field : value }      → Etl.setValue/addValues
 *   tokenizeText { inputField, outputField }     → TextAnalysis.tokenize
 *   logDebug / logInfo / logTrace / logWarn      → no-op (driver-side logging)
 *   loadSolr                                     → recorded sink
 * Anything else → `unsupported` (strict mode throws; lenient records).
 */
object MorphlineConfig {

  final case class Compiled(id: String,
                            command: Pipeline.Command,
                            sources: Seq[String],
                            sinks: Seq[String],
                            unsupported: Seq[String])

  /** Parse `configText` and compile the morphline with `morphlineId`
    * (default: the first). `schema` feeds sanitizeUnknownSolrFields;
    * omitting it while the config uses that command is an error. */
  def compile(configText: String,
              schema: Option[IndexSchema] = None,
              morphlineId: Option[String] = None,
              strict: Boolean = true): Compiled = {
    val root = Hocon.parse(configText)
    val morphlines = root.get("morphlines") match {
      case Some(Hocon.CArr(ms)) if ms.nonEmpty => ms
      case _ => throw new IllegalArgumentException("config has no morphlines[]")
    }
    val chosen = morphlineId match {
      case None => morphlines.head
      case Some(id) => morphlines.find {
        case o: Hocon.CObj => o.str("id").contains(id)
        case _ => false
      }.getOrElse(throw new IllegalArgumentException(s"no morphline with id $id"))
    }
    val obj = chosen match {
      case o: Hocon.CObj => o
      case other => throw new IllegalArgumentException(s"morphline entry is not an object: $other")
    }
    val id = obj.str("id").getOrElse("morphline")
    val commands = obj.get("commands") match {
      case Some(Hocon.CArr(cs)) => cs
      case _ => throw new IllegalArgumentException(s"morphline $id has no commands[]")
    }

    val steps = Vector.newBuilder[Pipeline.Command]
    val sources = Vector.newBuilder[String]
    val sinks = Vector.newBuilder[String]
    val unsupported = Vector.newBuilder[String]

    commands.foreach {
      case cmdObj: Hocon.CObj if cmdObj.entries.size == 1 =>
        val (name, bodyV) = cmdObj.entries.head
        val body = bodyV match {
          case o: Hocon.CObj => o
          case _ => Hocon.CObj(Vector.empty)
        }
        name match {
          case "readAvroContainer" | "readAvroParquetFile" | "readCSV" |
               "readLine" | "readJson" | "readClipboard" =>
            sources += name
          case "loadSolr" | "loadSolrBasic" =>
            sinks += name
          case "logDebug" | "logInfo" | "logTrace" | "logWarn" | "logError" =>
            () // driver-side logging; no record transform
          case "extractAvroPaths" =>
            val paths = body.get("paths") match {
              case Some(p: Hocon.CObj) =>
                // avro path syntax -> Spark nested-column syntax:
                // "/a/b" -> "a.b"; "[]" flatten steps have no Spark
                // analog at the path level (arrays surface as arrays)
                p.entries.map { case (out, v) =>
                  out -> Hocon.asString(v).stripPrefix("/")
                    .replace("[]", "").replace("/", ".")
                }.toMap
              case _ => throw new IllegalArgumentException("extractAvroPaths needs paths{}")
            }
            steps += (df => Etl.extractPaths(df, paths))
          case "convertTimestamp" =>
            val field = body.str("field")
              .getOrElse(throw new IllegalArgumentException("convertTimestamp needs field"))
            val formats = body.strs("inputFormats")
            val out = body.str("outputFormat")
            steps += (df => out match {
              case Some(f) => Etl.convertTimestamp(df, col(field), field, formats, f)
              case None => Etl.convertTimestamp(df, col(field), field, formats)
            })
          case "sanitizeUnknownSolrFields" =>
            val sch = schema.getOrElse(throw new IllegalArgumentException(
              "config uses sanitizeUnknownSolrFields — pass schema=Some(...)"))
            val rename = body.str("renameToPrefix")
            steps += (df => sch.sanitize(df, rename))
          case "generateUUID" =>
            val out = body.str("field").getOrElse("id")
            // Kite's documented default is preserveExisting : true —
            // a config that omits it must NOT clobber existing ids
            val preserve = body.str("preserveExisting").forall(_.toBoolean)
            steps += (df => {
              val from = concat_ws("", df.columns.sorted.map(col).toIndexedSeq: _*)
              val pres = if (preserve && df.columns.contains(out)) Some(col(out)) else None
              Etl.generateUuid(df, out, from, pres)
            })
          case "setValues" =>
            body.entries.foreach { case (field, v) =>
              steps += (df => Etl.setValue(df, field, valueColumn(v)))
            }
          case "addValues" =>
            body.entries.foreach { case (field, v) =>
              steps += (df => Etl.addValues(df, field, arrayColumn(v)))
            }
          case "tokenizeText" =>
            val in = body.str("inputField")
              .getOrElse(throw new IllegalArgumentException("tokenizeText needs inputField"))
            val out = body.str("outputField").getOrElse(in)
            steps += (df => df.withColumn(out, graft.text.TextAnalysis.tokenize(col(in))))
          case other =>
            if (strict) throw new IllegalArgumentException(
              s"unsupported morphline command: $other (use strict=false to record and skip)")
            unsupported += other
        }
      case other =>
        throw new IllegalArgumentException(s"malformed command entry: $other")
    }
    Compiled(id, Pipeline.of(steps.result(): _*), sources.result(),
      sinks.result(), unsupported.result())
  }

  /** Morphline `@{field}` references become column refs; everything
    * else a literal (numbers stay strings — Solr fields are typed by
    * the schema downstream, matching the reference's record model). */
  private def valueColumn(v: Hocon.CVal): Column = v match {
    case Hocon.CArr(xs) => arrayColumn(Hocon.CArr(xs))
    case other =>
      val s = Hocon.asString(other)
      if (s.startsWith("@{") && s.endsWith("}")) col(s.substring(2, s.length - 1))
      else lit(s)
  }

  private def arrayColumn(v: Hocon.CVal): Column = v match {
    case Hocon.CArr(xs) => array(xs.map(valueColumn).toIndexedSeq: _*)
    case single => array(valueColumn(single))
  }

  // ------------------------------------------------------------------
  // Minimal HOCON reader (the subset above). Order-preserving.
  // ------------------------------------------------------------------
  private[etl] object Hocon {
    sealed trait CVal
    final case class CObj(entries: Vector[(String, CVal)]) extends CVal {
      def get(k: String): Option[CVal] = entries.collectFirst { case (`k`, v) => v }
      def str(k: String): Option[String] = get(k).map(asString)
      def strs(k: String): Seq[String] = get(k) match {
        case Some(CArr(xs)) => xs.map(asString)
        case Some(v) => Seq(asString(v))
        case None => Nil
      }
    }
    final case class CArr(items: Vector[CVal]) extends CVal
    final case class CStr(s: String) extends CVal

    def asString(v: CVal): String = v match {
      case CStr(s) => s
      case other => throw new IllegalArgumentException(s"expected string, got $other")
    }

    def parse(text: String): CObj = {
      val p = new P(text)
      val root = p.parseObjBody(topLevel = true)
      p.skipGaps()
      require(p.eof, s"trailing config input at ${p.pos}")
      resolve(root, root).asInstanceOf[CObj]
    }

    /** One-pass ${ref} resolution against the root (reference configs
      * use only root-level refs like ${SOLR_LOCATOR}). */
    private def resolve(v: CVal, root: CObj): CVal = v match {
      case CObj(es) => CObj(es.map { case (k, x) => k -> resolve(x, root) })
      case CArr(xs) => CArr(xs.map(resolve(_, root)))
      case CStr(s) if s.startsWith("${") && s.endsWith("}") =>
        val path = s.substring(2, s.length - 1).split('.')
        // unresolved refs stay literal: the reference injects e.g.
        // SOLR_LOCATOR externally in some test configs, and the
        // commands that consume it (solrLocator) don't read it here
        path.foldLeft(Option(root: CVal)) {
          case (Some(o: CObj), k) => o.get(k)
          case _ => None
        }.getOrElse(CStr(s))
      case other => other
    }

    private final class P(input: String) {
      var pos = 0
      def eof: Boolean = pos >= input.length
      private def peek: Char = input.charAt(pos)

      def skipGaps(): Unit = {
        var go = true
        while (go && !eof) {
          if (peek.isWhitespace) pos += 1
          else if (peek == '#' || (peek == '/' && pos + 1 < input.length &&
            input.charAt(pos + 1) == '/')) {
            while (!eof && peek != '\n') pos += 1
          } else go = false
        }
      }
      /** skip spaces/comments but NOT newlines (entry separators) */
      private def skipInline(): Unit = {
        var go = true
        while (go && !eof) {
          if (peek == ' ' || peek == '\t' || peek == '\r') pos += 1
          else if (peek == '#' || (peek == '/' && pos + 1 < input.length &&
            input.charAt(pos + 1) == '/')) {
            while (!eof && peek != '\n') pos += 1
          } else go = false
        }
      }

      def parseObjBody(topLevel: Boolean): CObj = {
        val entries = Vector.newBuilder[(String, CVal)]
        var done = false
        while (!done) {
          skipGaps()
          if (eof) { require(topLevel, "unterminated object"); done = true }
          else if (peek == '}') { require(!topLevel, "stray }"); pos += 1; done = true }
          else if (peek == ',') pos += 1
          else {
            val key = parseKey()
            skipInline()
            // HOCON allows `key { ... }` with no separator
            if (!eof && (peek == ':' || peek == '=')) { pos += 1; skipInline() }
            val v = parseValue()
            entries += (key -> v)
          }
        }
        CObj(entries.result())
      }

      private def parseKey(): String = {
        skipGaps()
        if (peek == '"') parseQuoted()
        else {
          val sb = new StringBuilder
          while (!eof && !peek.isWhitespace && !":={,".contains(peek)) {
            sb.append(peek); pos += 1
          }
          require(sb.nonEmpty, s"empty key at $pos")
          sb.toString
        }
      }

      def parseValue(): CVal = {
        skipInline()
        require(!eof, "missing value")
        peek match {
          case '{' => pos += 1; parseObjBody(topLevel = false)
          case '[' => parseArr()
          case '"' =>
            if (input.regionMatches(pos, "\"\"\"", 0, 3)) CStr(parseTriple())
            else CStr(parseQuoted())
          case '$' if pos + 1 < input.length && input.charAt(pos + 1) == '{' =>
            // ${ref}: consume through the closing brace (the generic
            // unquoted scan would stop AT '}' and strip it)
            val end = input.indexOf('}', pos)
            require(end >= 0, "unterminated ${ref}")
            val s = input.substring(pos, end + 1)
            pos = end + 1
            CStr(s)
          case _ =>
            // unquoted value: runs to newline/comma/closer/comment
            val sb = new StringBuilder
            while (!eof && !"\n,}]#".contains(peek) &&
              !(peek == '/' && pos + 1 < input.length && input.charAt(pos + 1) == '/')) {
              sb.append(peek); pos += 1
            }
            // zero-width value = a stray closer in value position (e.g.
            // '}' inside an array): consuming nothing here would loop
            // the enclosing array parse forever
            require(sb.nonEmpty,
              s"unexpected '${if (eof) "<eof>" else peek.toString}' in value position at $pos")
            CStr(sb.toString.trim)
        }
      }

      private def parseArr(): CArr = {
        require(peek == '[', "expected [")
        pos += 1
        val items = Vector.newBuilder[CVal]
        var done = false
        while (!done) {
          skipGaps()
          require(!eof, "unterminated array")
          if (peek == ']') { pos += 1; done = true }
          else if (peek == ',') pos += 1
          else items += parseValue()
        }
        CArr(items.result())
      }

      private def parseQuoted(): String = {
        require(peek == '"', "expected quote")
        pos += 1
        val sb = new StringBuilder
        while (!eof && peek != '"') {
          if (peek == '\\' && pos + 1 < input.length) {
            pos += 1
            sb.append(input.charAt(pos) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case c => c
            })
            pos += 1
          } else { sb.append(peek); pos += 1 }
        }
        require(!eof, "unterminated string")
        pos += 1
        sb.toString
      }

      private def parseTriple(): String = {
        pos += 3
        val end = input.indexOf("\"\"\"", pos)
        require(end >= 0, "unterminated triple-quoted string")
        val s = input.substring(pos, end)
        pos = end + 3
        s
      }
    }
  }
}
