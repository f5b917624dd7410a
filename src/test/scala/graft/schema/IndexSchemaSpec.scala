package graft.schema

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class IndexSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a minimal schema.xml in the reference's dialect (written fresh,
  // same shape as map-reduce/src/test/resources/.../schema.xml)
  private val schemaXml =
    """<schema name="test" version="1.6">
      |  <fieldType name="string" class="solr.StrField"/>
      |  <fieldType name="boolean" class="solr.BoolField"/>
      |  <fieldType name="int" class="solr.IntPointField"/>
      |  <fieldType name="long" class="solr.LongPointField"/>
      |  <fieldType name="double" class="solr.DoublePointField"/>
      |  <fieldType name="date" class="solr.DatePointField"/>
      |  <fieldType name="text_en" class="solr.TextField"/>
      |  <field name="id" type="string" indexed="true" stored="true" required="true"/>
      |  <field name="value" type="string" indexed="true" stored="false" docValues="true" required="true"/>
      |  <field name="count" type="int"/>
      |  <field name="when" type="date"/>
      |  <field name="tags" type="string" multiValued="true"/>
      |  <field name="body" type="text_en"/>
      |  <dynamicField name="ignored_*" type="string" indexed="false" stored="false"/>
      |  <uniqueKey>id</uniqueKey>
      |</schema>""".stripMargin

  test("fromSolrXml: types, flags, multiValued, dynamic patterns, uniqueKey") {
    val s = IndexSchema.fromSolrXml(schemaXml)
    assert(s.uniqueKey === "id")
    val byName = s.fields.map(f => f.name -> f).toMap
    assert(byName("id").required && byName("id").dataType === StringType)
    assert(!byName("value").stored && byName("value").docValues)
    assert(byName("count").dataType === IntegerType)
    assert(byName("when").dataType === TimestampType)
    assert(byName("tags").multiValued)
    assert(byName("tags").sparkType === ArrayType(StringType))
    assert(s.accepts("ignored_anything"))
    assert(!s.accepts("random_field"))
    // structType carries the flags as metadata
    val f = s.structType.fields.find(_.name == "value").get
    assert(f.metadata.getBoolean("docValues"))
    assert(!f.nullable) // required
  }

  test("no uniqueKey -> rejected (SolrLocator semantics)") {
    intercept[IllegalArgumentException](
      IndexSchema.fromSolrXml("<schema><field name='a' type='string'/></schema>"))
  }

  test("sanitize against an xml-parsed schema drops unknown columns") {
    val s = IndexSchema.fromSolrXml(schemaXml)
    val df = Seq(("1", "v", "junk")).toDF("id", "value", "first_name")
    val out = s.sanitize(df)
    assert(out.columns.toSeq === Seq("id", "value"))
    val quarantined = s.sanitize(df, renamePrefix = Some("ignored_"))
    assert(quarantined.columns.toSeq === Seq("id", "value", "ignored_first_name"))
  }

  test("enforceCardinality: single-valued arrays reduced, collisions error") {
    val s = IndexSchema.fromSolrXml(schemaXml)
    val ok = Seq(("1", Seq("only"), Seq("t1", "t2"))).toDF("id", "value", "tags")
    val got = s.enforceCardinality(ok).collect().head
    assert(got.getAs[String]("value") === "only")       // reduced to head
    assert(got.getAs[Seq[String]]("tags") === Seq("t1", "t2")) // multiValued kept
    val bad = Seq(("1", Seq("a", "b"), Seq("t"))).toDF("id", "value", "tags")
    val e = intercept[Exception](s.enforceCardinality(bad).collect())
    assert(e.getMessage.contains("multiple values") ||
      e.getCause != null && e.getCause.getMessage.contains("multiple values"))
  }
}
