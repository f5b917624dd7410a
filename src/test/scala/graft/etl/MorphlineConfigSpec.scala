package graft.etl

import graft.TestSpark
import graft.schema.{IndexField, IndexSchema}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The morphline-config loader: reference-shaped HOCON compiles to the
  * engine's Pipeline and transforms records identically to calling the
  * operators directly. The inline config mirrors
  * tutorialReadAvroContainer.conf (id/commands layout, SOLR_LOCATOR
  * substitution, comment styles). */
class MorphlineConfigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val tutorialShaped = """
    # comment in the reference's style
    SOLR_LOCATOR : {
      collection : collection1
      zkHost : "127.0.0.1:2181/solr"
    }
    morphlines : [
      {
        id : morphline1
        importCommands : ["org.kitesdk.morphline.stdlib.LogDebugBuilder"]
        commands : [
          { readAvroContainer { } }
          {
            extractAvroPaths {
              flatten : false
              paths : {
                id : /id
                text : /text
                created_at : /created_at
              }
            }
          }
          {
            convertTimestamp {
              field : created_at
              inputFormats : ["yyyy-MM-dd'T'HH:mm:ss'Z'", "yyyy-MM-dd"]
              inputTimezone : UTC
            }
          }
          { sanitizeUnknownSolrFields { solrLocator : ${SOLR_LOCATOR} } }
          { logDebug { format : "output record: {}", args : ["@{}"] } }
          { loadSolr { solrLocator : ${SOLR_LOCATOR} } }
        ]
      }
    ]
  """

  private val schema = IndexSchema("id", Seq(
    IndexField("id", StringType, required = true),
    IndexField("text", StringType),
    IndexField("created_at", StringType)))

  test("tutorial-shaped config compiles: sources/sinks recorded, chain transforms") {
    import spark.implicits._
    val c = MorphlineConfig.compile(tutorialShaped, schema = Some(schema))
    assert(c.id === "morphline1")
    assert(c.sources === Seq("readAvroContainer"))
    assert(c.sinks === Seq("loadSolr"))
    assert(c.unsupported.isEmpty)

    val in = Seq(("d1", "hello", "2012-09-06T07:14:34Z", "drop-me"))
      .toDF("id", "text", "created_at", "unknown_field")
    val out = c.command(in)
    // sanitize dropped the unknown column; timestamp went Solr-canonical
    assert(out.columns.toSet === Set("id", "text", "created_at"))
    assert(out.select("created_at").head.getString(0) === "2012-09-06T07:14:34.000Z")
  }

  test("setValues/addValues/generateUUID/tokenizeText compile and run") {
    import spark.implicits._
    val conf = """
      morphlines : [ {
        id : m2
        commands : [
          { setValues { source : "etl", copied : "@{text}" } }
          { addValues { tags : ["a", "b"] } }
          { generateUUID { field : uid } }
          { tokenizeText { inputField : text, outputField : toks } }
        ]
      } ]
    """
    val c = MorphlineConfig.compile(conf)
    val in = Seq(("one two", Seq("x"))).toDF("text", "tags")
    val out = c.command(in)
    val row = out.select("source", "copied", "tags", "uid", "toks").head
    assert(row.getString(0) === "etl")
    assert(row.getString(1) === "one two")              // @{field} reference
    assert(row.getSeq[String](2) === Seq("x", "a", "b")) // append semantics
    assert(row.getString(3).matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    assert(row.getSeq[String](4).nonEmpty)
    // deterministic UUID: same input -> same uid
    assert(c.command(in).select("uid").head.getString(0) === row.getString(3))
  }

  test("generateUUID preserves existing ids by default (Kite's documented default)") {
    import spark.implicits._
    val conf = """
      morphlines : [ { id : m2b, commands : [ { generateUUID { field : uid } } ] } ]
    """
    val c = MorphlineConfig.compile(conf)
    val in = Seq(("keep-me", "text a"), (null, "text b")).toDF("uid", "text")
    val out = c.command(in).select("uid").collect().map(_.getString(0))
    assert(out.contains("keep-me")) // existing id untouched
    assert(out.forall(_ != null))   // null slot filled with a generated id
    // explicit preserveExisting : false DOES regenerate
    val c2 = MorphlineConfig.compile("""
      morphlines : [ { id : m2c, commands : [
        { generateUUID { field : uid, preserveExisting : false } } ] } ]
    """)
    val out2 = c2.command(in).select("uid").collect().map(_.getString(0))
    assert(!out2.contains("keep-me"))
  }

  test("stray closer in value position is a parse error, not an infinite loop") {
    // the fuzz-found case: '}' inside an array is neither a closer nor
    // consumable as an unquoted value — must error, not spin
    assertThrows[IllegalArgumentException](
      MorphlineConfig.compile("morphlines : [ } ]", strict = false))
    assertThrows[IllegalArgumentException](
      MorphlineConfig.compile("a : [}", strict = false))
  }

  test("strict mode refuses unknown commands; lenient records them") {
    val conf = """
      morphlines : [ { id : m3, commands : [ { xmlQueryThing { } } ] } ]
    """
    assertThrows[IllegalArgumentException](MorphlineConfig.compile(conf))
    val c = MorphlineConfig.compile(conf, strict = false)
    assert(c.unsupported === Seq("xmlQueryThing"))
  }

  test("sanitize without a schema is an explicit error; missing morphline id too") {
    val conf = """
      morphlines : [ { id : m4, commands : [ { sanitizeUnknownSolrFields { } } ] } ]
    """
    assertThrows[IllegalArgumentException](MorphlineConfig.compile(conf))
    assertThrows[IllegalArgumentException](
      MorphlineConfig.compile(conf, schema = Some(schema), morphlineId = Some("nope")))
  }

  test("the REAL reference configs parse (tokenizeText.conf, tutorialReadAvroContainer.conf)") {
    // guard: environments without the reference checkout skip silently
    val dir = new java.io.File("/root/reference/morphlines-core/src/test/resources/test-morphlines")
    assume(dir.isDirectory)
    val tutorial = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "tutorialReadAvroContainer.conf").toPath))
    val c = MorphlineConfig.compile(tutorial, schema = Some(schema))
    assert(c.sources === Seq("readAvroContainer"))
    assert(c.sinks === Seq("loadSolr"))

    val tok = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "tokenizeText.conf").toPath))
    // unrelated test config may use commands outside the vocabulary —
    // lenient mode must still parse the HOCON and record them
    val c2 = MorphlineConfig.compile(tok, schema = Some(schema), strict = false)
    assert(c2.id.nonEmpty)
  }
}
