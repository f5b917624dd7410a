package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * The morphline command-chain surface (SURVEY.md §2.9): a morphline is
 * an ordered list of record commands compiled once and pushed records
 * row-at-a-time (reference CommandBuilder SPI, LoadSolrBuilder.java:
 * 40-52). Here a "command" is `DataFrame => DataFrame` and a pipeline
 * is function composition — the whole chain collapses into ONE
 * Catalyst plan, so a 15-command morphline still executes as a single
 * whole-stage-codegen'd projection instead of 15 interpreter hops.
 *
 * Custom commands = any Scala function; this replaces the reference's
 * reflection-loaded `importCommands` plug-in discovery
 * (tutorialReadAvroContainer.conf:46-52).
 */
object Pipeline {
  type Command = DataFrame => DataFrame

  /** Compose commands left-to-right (morphline chain order). */
  def of(commands: Command*): Command =
    df => commands.foldLeft(df)((d, c) => c(d))

  def run(df: DataFrame, commands: Command*): DataFrame = of(commands: _*)(df)

  // named command constructors mirroring the morphline vocabulary
  def setValues(field: String, value: Column): Command = Etl.setValue(_, field, value)
  def addValues(field: String, values: Column): Command = Etl.addValues(_, field, values)
  def extractPaths(paths: Map[String, String]): Command = Etl.extractPaths(_, paths)
  def convertTimestamp(in: Column, out: String, formats: Seq[String]): Command =
    Etl.convertTimestamp(_, in, out, formats)
  def generateUuid(out: String, from: Column): Command = Etl.generateUuid(_, out, from)
  def sanitizeToSchema(schema: graft.schema.IndexSchema,
                       renamePrefix: Option[String] = None): Command =
    schema.sanitize(_, renamePrefix)
  def tokenizeText(in: Column, out: String): Command =
    _.withColumn(out, graft.text.TextAnalysis.tokenize(in))

  /**
   * Dry-run sink (S15, DryRunDocumentLoader.java:32-35 +
   * MapReduceIndexerTool.java:1109-1120): execute the pipeline
   * in-process and print the first docs instead of writing an index.
   */
  def dryRun(df: DataFrame, commands: Command*)(implicit n: Int = 20): Unit =
    of(commands: _*)(df).show(n, truncate = false)
}
