package graft.index

import org.apache.spark.sql.SparkSession

/**
 * Go-live deploy sink (S14): the reference merges each built shard
 * into a live SolrCloud via HTTP MERGEINDEXES + a cluster commit, from
 * a driver-side thread pool (GoLive.java:46-168). That is an external
 * side effect, kept out of the engine's correctness surface behind
 * this trait (SURVEY.md §7.1.7) — a production impl would issue the
 * HTTP calls; tests and offline runs use the recording no-op.
 */
trait GoLive {
  /** Deploy each (shardIndex, shardDir) to its target; then commit. */
  def goLive(shards: Seq[(Int, String)], targets: Seq[String]): Unit
}

/** Records calls instead of talking to a cluster. */
final class RecordingGoLive extends GoLive {
  val merged = scala.collection.mutable.ArrayBuffer[(Int, String, String)]()
  @volatile var committed = false
  override def goLive(shards: Seq[(Int, String)], targets: Seq[String]): Unit = {
    require(targets.nonEmpty, "no go-live targets")
    // positional zip of shard dirs with shard URLs — the reference's
    // buildShardUrls contract (MapReduceIndexerTool.java:518-537)
    shards.foreach { case (i, dir) => merged += ((i, dir, targets(i % targets.size))) }
    committed = true
  }
}

/**
 * A WORKING go-live for segment stores: what Solr does server-side on
 * the reference's `CoreAdminRequest.MergeIndexes` + `commit()` calls
 * (GoLive.java:83-96,131-152) — merge each built shard's index into
 * the corresponding live serving index and publish a new commit — but
 * against [[SegmentIndex]] directories instead of a remote core, so
 * the whole deploy path is testable offline. The merge is the logical
 * `addIndexes` (segment-file copy): go-live cost is metadata + copy,
 * never a doc rewrite, same as the reference's live merge. The
 * HTTP/SolrCloud transport variant remains out of scope (S16).
 */
final class SegmentStoreGoLive(
    conf: org.apache.hadoop.conf.Configuration = ShardIndex.activeHadoopConf())
    extends GoLive {
  override def goLive(shards: Seq[(Int, String)], targets: Seq[String]): Unit = {
    require(targets.nonEmpty, "no go-live targets")
    shards.foreach { case (i, dir) =>
      val t = new org.apache.hadoop.fs.Path(targets(i % targets.size))
      val w = new SegmentIndex.Writer(t.getFileSystem(conf), t)
      w.addIndexes(Seq(new org.apache.hadoop.fs.Path(dir)))
      w.commit()
    }
  }
}

object GoLive {
  /** List a shard store's (index, dir) pairs in shard order, through
    * the store path's own FileSystem — a store on `hdfs://`/`s3a://`
    * lists the same way a local one does (the reference go-lives
    * straight from HDFS job output, GoLive.java:46-72).
    *
    * Entries are FileSystem-QUALIFIED URIs (`file:/...`, `hdfs://...`),
    * not bare local paths: resolve them with `new org.apache.hadoop.fs.
    * Path(entry)`, never `new java.io.File(entry)`. */
  def shardDirs(store: String,
                conf: org.apache.hadoop.conf.Configuration =
                  ShardIndex.activeHadoopConf()): Seq[(Int, String)] = {
    val root = new org.apache.hadoop.fs.Path(store)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .sortBy(_.getPath.getName)
      .zipWithIndex
      .map { case (s, i) => (i, s.getPath.toString) }.toSeq
  }

  /** The same listing for a SEGMENT store (part-NNNNN/data/index
    * layout, SegmentShardSink) — the dirs SegmentStoreGoLive deploys. */
  def segmentShardDirs(store: String,
                       conf: org.apache.hadoop.conf.Configuration =
                         ShardIndex.activeHadoopConf()): Seq[(Int, String)] = {
    val root = new org.apache.hadoop.fs.Path(store)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.matches("part-\\d+"))
      .sortBy(_.getPath.getName)
      .zipWithIndex
      .map { case (s, i) => (i, new org.apache.hadoop.fs.Path(s.getPath, "data/index").toString) }
      .toSeq
  }
}
