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

  def validate(df: DataFrame, strict: Boolean = true): DataFrame = {
    if (strict && missingKey(df).limit(1).collect().nonEmpty)
      throw new IllegalArgumentException(
        s"Missing unique key field '$uniqueKey' (reference rejects such docs)")
    df
  }
}
