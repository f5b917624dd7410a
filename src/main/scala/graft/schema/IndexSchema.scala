package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The Solr schema.xml model reduced to what the engine needs
 * (SURVEY.md §1.2): typed fields with
 * indexed/stored/required/multiValued flags, a mandatory unique key
 * (SolrLocator.java:177-184 validates it), and `ignored_*`-style
 * dynamic-field patterns. Carried as a StructType whose fields hold the
 * flags in Metadata — broadcast-friendly, no conf-dir zip to ship
 * (contrast SolrOutputFormat.java:163-201).
 */
final case class IndexField(
    name: String,
    dataType: DataType,
    multiValued: Boolean = false,
    required: Boolean = false,
    indexed: Boolean = true,
    stored: Boolean = true,
    docValues: Boolean = false) {
  def sparkType: DataType = if (multiValued) ArrayType(dataType) else dataType
  def toStructField: StructField = StructField(
    name, sparkType, nullable = !required,
    new MetadataBuilder()
      .putBoolean("indexed", indexed).putBoolean("stored", stored)
      .putBoolean("multiValued", multiValued).putBoolean("docValues", docValues)
      .build())
}

final case class IndexSchema(
    uniqueKey: String,
    fields: Seq[IndexField],
    dynamicFieldPatterns: Seq[String] = Seq("ignored_*")) {

  require(fields.exists(_.name == uniqueKey),
    s"uniqueKey '$uniqueKey' is not a declared field") // SolrLocator.java:177-184 semantics

  def structType: StructType = StructType(fields.map(_.toStructField))
  private val names = fields.map(_.name).toSet
  private val patterns = dynamicFieldPatterns.map(p =>
    java.util.regex.Pattern.compile(p.replace("*", ".*")))

  def accepts(field: String): Boolean =
    names.contains(field) || patterns.exists(_.matcher(field).matches())

  /**
   * sanitizeUnknownSolrFields (SanitizeUnknownSolrFieldsBuilder.java:
   * 79-93): drop every column not in the schema; with `renamePrefix`
   * set, quarantine them as `prefix + name` instead (they then have to
   * match a dynamic-field pattern like `ignored_*`).
   */
  def sanitize(df: DataFrame, renamePrefix: Option[String] = None): DataFrame = {
    val cols = df.schema.fieldNames.flatMap { n =>
      if (accepts(n)) Some(col(n))
      else renamePrefix.collect {
        case p if accepts(p + n) => col(n).as(p + n)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /**
   * Load-time validation, MorphlineMapper.java:125-131 parity: every
   * doc must carry the unique key. Returns the offending rows (empty =
   * valid); `strict` throws like the reference.
   */
  def missingKey(df: DataFrame): DataFrame = df.filter(col(uniqueKey).isNull)

  /**
   * Eager driver-side check: runs a full scan NOW. Useful as a
   * standalone pre-flight; build pipelines should use [[requireKey]]
   * instead, which enforces the same invariant inside the build job
   * itself at zero extra passes.
   */
  def validate(df: DataFrame, strict: Boolean = true): DataFrame = {
    if (strict && missingKey(df).limit(1).collect().nonEmpty)
      throw new IllegalArgumentException(
        s"Missing unique key field '$uniqueKey' (reference rejects such docs)")
    df
  }

  /**
   * In-job missing-key guard: replaces the key column with a
   * `raise_error` on null, so the FIRST build action that touches an
   * invalid row fails the job — same invariant as [[validate]] without
   * the extra driver-blocking scan (the reference likewise rejects
   * per-record inside the mapper, MorphlineMapper.java:125-131, not in
   * a separate pass).
   */
  def requireKey(df: DataFrame): DataFrame = {
    val keyType = df.schema(uniqueKey).dataType
    df.withColumn(uniqueKey,
      when(col(uniqueKey).isNull, raise_error(
        lit(s"Missing unique key field '$uniqueKey' (reference rejects such docs)"))
        .cast(keyType))
        .otherwise(col(uniqueKey)))
  }

  /**
   * Enforce single-valuedness: Solr rejects multiple values on a
   * non-multiValued field (the Record model is list-valued by default,
   * SURVEY.md §7.3). Array-typed columns for single-valued fields are
   * reduced to their head, erroring (null) on collisions per
   * `strict`.
   */
  def enforceCardinality(df: DataFrame): DataFrame = {
    val byName = fields.map(f => f.name -> f).toMap
    val cols = df.schema.fields.map { sf =>
      byName.get(sf.name) match {
        case Some(f) if !f.multiValued && sf.dataType.isInstanceOf[ArrayType] =>
          when(size(col(sf.name)) > 1,
            raise_error(lit(s"multiple values for single-valued field ${sf.name}")))
            .otherwise(element_at(col(sf.name), 1)).as(sf.name)
        case _ => col(sf.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}

object IndexSchema {

  /** Solr fieldType class → Catalyst type (SURVEY.md §1.2 table). */
  private def classToType(cls: String, typeName: String): DataType = cls match {
    case c if c.contains("StrField") => StringType
    case c if c.contains("BoolField") => BooleanType
    case c if c.contains("BinaryField") => BinaryType
    case c if c.contains("IntPointField") || c.contains("TrieIntField") => IntegerType
    case c if c.contains("FloatPointField") || c.contains("TrieFloatField") => FloatType
    case c if c.contains("LongPointField") || c.contains("TrieLongField") => LongType
    case c if c.contains("DoublePointField") || c.contains("TrieDoubleField") => DoubleType
    case c if c.contains("DatePointField") || c.contains("TrieDateField") => TimestampType
    case c if c.contains("TextField") => StringType // analyzed text
    case _ => StringType
  }

  /**
   * Parse a Solr-style schema.xml (the reference's external schema
   * carrier, loaded via IndexSchema/SolrLocator — SolrLocator.java:
   * 114-175, uniqueKey validation :177-184). Supports <fieldType>,
   * <field> with indexed/stored/required/multiValued/docValues flags,
   * <dynamicField> patterns and <uniqueKey>.
   */
  def fromSolrXml(xml: String): IndexSchema = {
    val root = scala.xml.XML.loadString(xml)
    def attr(n: scala.xml.Node, a: String, dflt: Boolean): Boolean =
      n.attribute(a).map(_.text.trim.equalsIgnoreCase("true")).getOrElse(dflt)
    val typeClasses = (root \\ "fieldType" ++ root \\ "fieldtype").map(t =>
      (t \@ "name") -> (t \@ "class")).toMap
    val fields = (root \\ "field").map { f =>
      val tpe = f \@ "type"
      IndexField(
        name = f \@ "name",
        dataType = classToType(typeClasses.getOrElse(tpe, ""), tpe),
        multiValued = attr(f, "multiValued", dflt = false),
        required = attr(f, "required", dflt = false),
        indexed = attr(f, "indexed", dflt = true),
        stored = attr(f, "stored", dflt = true),
        docValues = attr(f, "docValues", dflt = false))
    }
    val dynamic = (root \\ "dynamicField").map(_ \@ "name")
    val key = (root \\ "uniqueKey").text.trim
    require(key.nonEmpty, "schema.xml has no <uniqueKey> (reference requires one)")
    IndexSchema(key, fields,
      if (dynamic.nonEmpty) dynamic else Seq("ignored_*"))
  }
}
