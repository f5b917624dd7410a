package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Input enumeration sources (S1/S2/S3): the reference walks input
 * trees into a one-URI-per-line manifest, skipping `.`/`_`-prefixed
 * hidden files (MapReduceIndexerTool.java:892-959, filter at 904-909),
 * optionally reading `--input-list` manifests incl. stdin
 * (:914-934), then NLine-splits the manifest across mappers
 * (:648-683).
 *
 * Spark-native: `binaryFile` already skips `_`/`.` files and handles
 * split planning by bytes (no manual NLine math — S3 is subsumed by
 * `maxPartitionBytes`); the manifest path keeps the reference's
 * "catalog is a file list" contract.
 */
object BinaryFiles {

  /** S1: recursive tree scan (hidden-file filter is Spark's default). */
  def readTree(spark: SparkSession, root: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(root)

  /** S2: newline-delimited URI manifest (blank lines and `#` comments
    * ignored). The list itself is driver-side, as in the reference. */
  def readManifest(spark: SparkSession, manifest: String): DataFrame = {
    val paths = spark.read.textFile(manifest).collect()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    require(paths.nonEmpty, s"manifest $manifest lists no files")
    spark.read.format("binaryFile").load(paths.toIndexedSeq: _*)
  }

  /** S4 FilenameInputFormat analog: just the paths as a DataFrame. */
  def pathsOf(df: DataFrame): DataFrame = df.select("path")
}
