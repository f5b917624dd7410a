package graft.index

import graft.route.HashRangeRouter
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/**
 * The shard store: the Spark-native re-expression of the reference's
 * index-build dataflow (SolrRecordWriter + TreeMerge, SURVEY.md §2.7/
 * §2.8). One Lucene directory per reducer (`<out>/part-NNNNN/data/
 * index`, SolrRecordWriter.java:129) becomes a Parquet table
 * hash-partitioned by the Solr-compatible shard id.
 *
 * Scale design: the reference needs `reducers = shards * fanout^N`
 * micro shards plus a log_F mtree-merge job chain
 * (MapReduceIndexerTool.java:765-815) purely because a Lucene index
 * merge is single-threaded per target. With a columnar shard store the
 * WHOLE merge phase collapses into the one shuffle Spark already does
 * for `repartition(shards)` — map-side the rows stream straight to
 * their final shard, no intermediate micro-shard materialization, no
 * merge jobs. `sortWithinPartitions(id desc)` reproduces the index
 * sort the merge applies (solrconfig_merge.xml:6-12 `sort: id desc`
 * via SortingMergePolicyFactory, TreeMergeOutputFormat.java:248-260).
 */
object ShardIndex {

  /**
   * Build the shard store: route every doc to its Solr-compatible
   * shard, sort within shards by id desc (O4 parity), write one dir
   * per shard (`shard=NNNNN`). `microShards` > 0 reproduces the
   * reference's micro-shard layout (reducers knob) for tests; at scale
   * leave 0 = write final shards directly.
   */
  def write(df: DataFrame, idCol: String, out: String, shards: Int,
            microShards: Int = 0, filesPerShard: Int = 1,
            dedupOrder: Option[Column] = None,
            rejectConflicts: Boolean = false,
            overwrite: Boolean = false,
            router: Option[HashRangeRouter] = None): DataFrame = {
    router.foreach(r => require(r.numShards == shards,
      s"router has ${r.numShards} shards, write called with $shards"))
    // A COMMITTED store at `out` is never overwritten by default: the
    // in-job guards (requireKey / rejectConflicts) fail MID-write, and
    // Spark's overwrite mode deletes the target before tasks run — a
    // failed rebuild would destroy the serving store and leave
    // nothing. Same stance as the reference's FileOutputFormat, which
    // refuses an existing output dir outright; pass overwrite=true to
    // knowingly replace. (A dir without the commit marker is a dead
    // partial build — reclaimed silently.)
    if (!overwrite && commitMeta(out, hadoopConf(df.sparkSession)).isDefined)
      throw new IllegalStateException(
        s"shard store already committed at $out; pass overwrite=true to replace")
    val splits = math.max(1, if (microShards > 0) microShards / shards else filesPerShard)
    val routed = routedForWrite(df, idCol, shards, splits, dedupOrder,
      rejectConflicts, router)
    routed
      .sortWithinPartitions(col("shard"), col(idCol).desc)
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    writeCommitMeta(out, shards, idCol, hadoopConf(df.sparkSession))
    routed
  }

  /**
   * The routed (and optionally deduped) frame `write` materializes —
   * exposed so plan tests can assert the single-shuffle property.
   *
   * Parallelism inside a shard: one task per shard would bottleneck a
   * 100 TB build (a shard can be terabytes), so the exchange key is
   * the micro-shard index — filesPerShard write tasks per shard, each
   * emitting one file into the shard dir. Size filesPerShard ≈
   * shardBytes / targetFileBytes on a cluster.
   *
   * `dedupOrder` fuses retain-most-recent dedup INTO the route
   * exchange: a doc's (micro-)shard is a pure function of its id, so
   * after the route repartition every id's rows are co-located, and a
   * window over (__ms, id) is satisfied by the existing
   * HashPartitioning(__ms) — Catalyst inserts a partition-local sort,
   * NOT a second exchange. The reference pays the same insight in
   * reverse: its dedup rides the one MR shuffle that also routes
   * (the reducer keys are the routed doc ids). A separate
   * Dedup.retainMostRecent call before write costs one full extra
   * shuffle of the corpus at 100 TB.
   */
  private[graft] def routedForWrite(df: DataFrame, idCol: String, shards: Int,
                                    splits: Int,
                                    dedupOrder: Option[Column],
                                    rejectConflicts: Boolean = false,
                                    routerOpt: Option[HashRangeRouter] = None,
                                    keepMs: Boolean = false)
      : DataFrame = {
    // injected router = X1 live-collection alignment (ClusterState
    // .routerFor over the collection's state.json, or fromRanges);
    // default = synthesized uniform ranges, the reference's ZK-free
    // X2 behavior
    val router = routerOpt.getOrElse(HashRangeRouter(shards))
    // shard index falls out of the micro-shard arithmetically
    // (microShard = shard * splits + offset), so the routing hash runs
    // ONCE per row
    val routed = df
      .withColumn("__ms", router.microShardCol(col(idCol), shards * splits))
      .withColumn("shard",
        format_string("%05d", (col("__ms") / splits).cast("int")))
      .repartition(shards * splits, col("__ms"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__ms"), col(idCol))
    val deduped = dedupOrder match {
      case Some(ts) =>
        // same survivor semantics as Dedup.retainMostRecent
        // (desc_nulls_last): groups are identical because equal ids
        // share a micro shard
        routed.withColumn("__rn", row_number().over(w.orderBy(ts.desc_nulls_last)))
          .filter(col("__rn") === 1).drop("__rn")
      case None if rejectConflicts =>
        // RejectingUpdateConflictResolver semantics riding the same
        // exchange: a colliding key fails the build job itself instead
        // of a separate driver-blocking conflict pre-scan
        // (Dedup.rejectOnConflict remains the eager standalone form)
        val keyType = df.schema(idCol).dataType
        routed.withColumn("__cnt", count(lit(1)).over(w))
          .withColumn(idCol,
            when(col("__cnt") > 1, raise_error(concat(
              lit("duplicate unique key: "), col(idCol).cast("string")))
              .cast(keyType))
              .otherwise(col(idCol)))
          .drop("__cnt")
      case None => routed
    }
    // keepMs: the segment sink (SegmentShardSink) names its per-task
    // index dirs by the micro-shard value, so it needs the column
    if (keepMs) deduped else deduped.drop("__ms")
  }

  /** The Hadoop conf to resolve store paths with: the active session's
    * (carries s3a/hdfs credentials and filesystem settings) when one
    * exists, else defaults. Everything metadata-side goes through
    * org.apache.hadoop.fs so the store works on any cluster filesystem
    * the reference does (it runs entirely over HDFS,
    * SolrRecordWriter.java:129). */
  private[graft] def hadoopConf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration
  private[graft] def activeHadoopConf(): Configuration =
    SparkSession.getActiveSession.map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /**
   * M3 commit metadata analog (SolrIndexWriter.setCommitData,
   * TreeMergeOutputFormat.java:221-223): a store-level marker so a
   * consumer can validate layout (shards, key column, writer version)
   * before serving it. Written through the store path's own FileSystem
   * so `hdfs://`/`s3a://` stores work, not just local dirs.
   */
  private def writeCommitMeta(out: String, shards: Int, idCol: String,
                              conf: Configuration): Unit =
    putCommitMeta(out,
      s"""{"graft_commit":1,"shards":$shards,"id_column":"$idCol"}""", conf)

  /** The one place marker bytes hit the FileSystem — writeCommitMeta
    * formats fresh metadata, optimize() forwards the source's. */
  private def putCommitMeta(out: String, meta: String,
                            conf: Configuration): Unit = {
    val p = new Path(out, "_graft_commit.json")
    val fs = p.getFileSystem(conf)
    val os = fs.create(p, true)
    try os.write(meta.getBytes(StandardCharsets.UTF_8)) finally os.close()
  }


  /** Store statistics: rows, files and bytes per shard — the ops view
    * for spotting skewed shards and compaction debt. File listing goes
    * through the store's FileSystem (cluster-storage-safe). */
  def stats(spark: SparkSession, store: String): DataFrame = {
    import spark.implicits._
    val rows = spark.read.parquet(store)
      .groupBy(col("shard")).agg(count(lit(1)).as("rows"))
    val root = new Path(store)
    val fs = root.getFileSystem(hadoopConf(spark))
    val files = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .map { d =>
        val parts = fs.listStatus(d.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
        (d.getPath.getName.stripPrefix("shard="),
          parts.length, parts.map(_.getLen).sum)
      }.toSeq.toDF("shard", "files", "bytes")
    rows.join(files, Seq("shard")).orderBy(col("shard"))
  }

  def commitMeta(store: String,
                 conf: Configuration = activeHadoopConf()): Option[String] = {
    val p = new Path(store, "_graft_commit.json")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0, buf) finally in.close()
      Some(new String(buf, StandardCharsets.UTF_8))
    }
  }

  /** Read the shard store back (shard is a partition column). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /**
   * Bucketed variant: persist the docs bucketed BY THE KEY so
   * key-equi-joins and key aggregations against the table need no
   * exchange at all (Spark reads bucket files as pre-shuffled input).
   * This is the co-located-join lever for repeated 100 TB joins — pay
   * the shuffle once at write, never again. Requires a table catalog
   * (saveAsTable), so it complements — not replaces — the
   * directory-addressed shard store.
   */
  def writeBucketed(df: DataFrame, idCol: String, table: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, idCol)
      .sortBy(idCol)
      .format("parquet")
      .saveAsTable(table)

  /**
   * M2 segment-optimize analog (`--max-segments` forceMerge,
   * MapReduceIndexerTool.java:317-331; BatchWriter.java:203-218):
   * rewrite the store with each shard compacted to one file — fewer
   * splits to open at query time, the same latency trade the reference
   * documents. `repartition(col("shard"))` puts each shard's rows in
   * one task, and the partitionBy writer emits one file per shard.
   */
  def optimize(spark: SparkSession, path: String, out: String,
               overwrite: Boolean = false): Unit = {
    // same clobber guard as write(): refuse a committed target by
    // default, and carry the source's commit metadata forward so the
    // compacted store serves exactly like the original
    if (!overwrite && commitMeta(out, hadoopConf(spark)).isDefined)
      throw new IllegalStateException(
        s"shard store already committed at $out; pass overwrite=true to replace")
    // the shard partition column reads back type-INFERRED (int) —
    // re-pad it so the compacted dirs keep write()'s shard=NNNNN
    // naming (GoLive.shardDirs maps shards to targets POSITIONALLY
    // after an alphanumeric-safe sort; unpadded shard=10 would sort
    // before shard=2 and go-live every shard >= 10 to the wrong core)
    val src = spark.read.parquet(path)
      .withColumn("shard", format_string("%05d", col("shard").cast("int")))
    // re-establish write()'s within-shard id-desc index sort (O4
    // parity — the reference's forceMerge keeps SortingMergePolicy
    // order) using the id column recorded in the source's marker; the
    // marker is read ONCE and the same bytes forwarded (one metadata
    // round-trip on object stores, no read-vs-forward race)
    val meta = commitMeta(path, hadoopConf(spark))
    val idCol = meta.flatMap(
      """"id_column"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(_)).map(_.group(1))
    val ordered = idCol match {
      case Some(id) => src.repartition(col("shard"))
        .sortWithinPartitions(col("shard"), col(id).desc)
      case None => src.repartition(col("shard"))
        .sortWithinPartitions(col("shard"))
    }
    ordered.write.mode("overwrite").partitionBy("shard").parquet(out)
    meta.foreach(putCommitMeta(out, _, hadoopConf(spark)))
  }

  /**
   * M1 mtree-merge equivalent: re-shard a store built with
   * `microShards` reducers down to `shards` final shards. The
   * reference needs ceil(log_fanout(reducers/shards)) mapper-only jobs
   * because a Lucene `addIndexes` merge is single-threaded per target
   * (MapReduceIndexerTool.java:765-815, TreeMergeOutputFormat.java:
   * 118-234); with a columnar store the whole tree collapses into ONE
   * shuffle — rows stream from micro-shard files straight to their
   * final shard writer, no intermediate materialization.
   */
  def mergeShards(spark: SparkSession, inStore: String, out: String,
                  idCol: String, shards: Int): DataFrame = {
    val df = spark.read.parquet(inStore).drop("shard")
    write(df, idCol, out, shards)
  }

  /** The reference's merge-planning invariant, kept as a helper for
    * sizing micro-shard builds: iterations = log_fanout(reducers/
    * shards), requiring reducers = shards * fanout^N
    * (MapReduceIndexerTool.java:846-890). */
  def mtreeIterations(reducers: Int, shards: Int, fanout: Int): Int = {
    require(fanout >= 2, s"fanout must be >= 2: $fanout")
    require(reducers >= shards && reducers % shards == 0,
      s"reducers ($reducers) must be a positive multiple of shards ($shards)")
    var n = 0
    var r = reducers
    while (r > shards) {
      require(r % fanout == 0, s"reducers=$reducers not shards*fanout^N")
      r /= fanout
      n += 1
    }
    n
  }

  // ---- the query surface that makes shards "queryable" (the
  // reference verifies builds by querying them back:
  // SolrIndexDriverTest.java:54-61 MatchAllDocsQuery;
  // MorphlineGoLiveMiniMRTest.java:388-489 term + id queries) ----

  /** `*:*` count, total and per shard. */
  def matchAllCounts(store: DataFrame): DataFrame =
    store.groupBy(col("shard")).agg(count(lit(1)).as("cnt")).orderBy(col("shard"))

  /** Term query: exact field match (filter pushed to parquet scan). */
  def termQuery(store: DataFrame, field: String, value: Any): DataFrame =
    store.filter(col(field) === lit(value))

  /** Per-id lookup — only the owning shard's directory is scanned when
    * the caller routes first (partition pruning on `shard`). */
  def byId(store: DataFrame, idCol: String, id: String, shards: Int): DataFrame = {
    val router = HashRangeRouter(shards)
    store.filter(col("shard") === f"${router.shardOfId(id)}%05d" && col(idCol) === id)
  }
}
