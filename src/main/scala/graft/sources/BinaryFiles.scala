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

  /**
   * S2 at unbounded scale: the manifest NEVER materializes on the
   * driver — paths stay a DataFrame, repartition spreads them across
   * the cluster, and each task opens its own files through the Hadoop
   * FS (fresh per-task `Configuration`; default-FS/credential-file
   * setups resolve identically in executors). This is the flow for a
   * 100M-file manifest where [[readManifest]]'s driver-side
   * `collect()` (reference-parity: MapReduceIndexerTool.java:892-959
   * holds the list in the submitter JVM too) would exhaust driver
   * memory. Schema matches `binaryFile` (path, length, content);
   * `maxBytes` caps a single file read (oversize files are truncated
   * and flagged rather than OOMing the task).
   */
  def readManifestDistributed(spark: SparkSession, manifest: String,
                              partitions: Int = 0,
                              maxBytes: Int = 64 << 20): DataFrame = {
    import org.apache.spark.sql.functions.col
    val n = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism
    val paths = spark.read.textFile(manifest)
      .map(_.trim)(org.apache.spark.sql.Encoders.STRING)
      .filter((l: String) => l.nonEmpty && !l.startsWith("#"))
      .repartition(n)
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.BINARY,
      org.apache.spark.sql.Encoders.scalaBoolean)
    paths.mapPartitions { it =>
      // per-task FS handle, reused across this partition's files
      val conf = new org.apache.hadoop.conf.Configuration()
      it.map { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(conf)
        val status = fs.getFileStatus(path)
        val len = status.getLen
        val take = math.min(len, maxBytes.toLong).toInt
        val buf = new Array[Byte](take)
        val in = fs.open(path)
        try in.readFully(0, buf) finally in.close()
        (p, len, buf, len > maxBytes)
      }
    }(enc).toDF("path", "length", "content", "truncated")
      .filter(col("path").isNotNull)
  }
}
