package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class SolrExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("update-XML round-trips: escaping, multi-value arrays, null omission") {
    val df = Seq(
      (1L, "plain", Seq("t1", "t2")),
      (2L, "a & b <tag> \"q\"", Seq.empty[String]),
      (3L, null.asInstanceOf[String], Seq("x&y"))
    ).toDF("id", "body", "tags")
    val out = java.nio.file.Files.createTempDirectory("solr_xml_").toString + "/u"
    SolrExport.writeUpdateXml(df, out, numFiles = 1)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(files.length === 1)
    val xml = scala.xml.XML.loadString(
      new String(java.nio.file.Files.readAllBytes(files.head.toPath), "UTF-8"))
    assert(xml.label === "add")
    val docs = (xml \ "doc").map { d =>
      (d \ "field").map(f => (f \@ "name") -> f.text)
    }
    assert(docs.size === 3)
    val byId = docs.map(fs => fs.toMap.getOrElse("id", "?") -> fs).toMap
    // doc 1: scalar + two multi-value tag fields
    assert(byId("1").count(_._1 == "tags") === 2)
    assert(byId("1").filter(_._1 == "tags").map(_._2) === Seq("t1", "t2"))
    // doc 2: special chars decode back exactly; empty array = no fields
    assert(byId("2").toMap.apply("body") === "a & b <tag> \"q\"")
    assert(!byId("2").exists(_._1 == "tags"))
    // doc 3: null body omitted, escaped array element survives
    assert(!byId("3").exists(_._1 == "body"))
    assert(byId("3").filter(_._1 == "tags").map(_._2) === Seq("x&y"))
  }

  test("multi-file export covers every row exactly once") {
    val df = Tables.part(spark, TestSpark.sf)
      .select(col("p_partkey").as("id"), col("p_name").as("name")).limit(100)
    val out = java.nio.file.Files.createTempDirectory("solr_xml2_").toString + "/u"
    SolrExport.writeUpdateXml(df, out, numFiles = 4)
    val ids = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).flatMap { f =>
        val xml = scala.xml.XML.loadString(
          new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
        (xml \ "doc").map(d =>
          (d \ "field").filter(x => (x \@ "name") == "id").text.toLong)
      }
    assert(ids.sorted.toSeq ===
      df.select("id").as[Long].collect().sorted.toSeq)
  }
}
