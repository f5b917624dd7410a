package graft.index

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/**
 * Index snapshot/restore — the Solr replication-handler surface
 * (`/replication?command=backup` → `snapshot.<name>` directory,
 * `command=restore` back into a live core; reference context: the
 * go-live cluster a MapReduceIndexerTool build feeds is backed up
 * exactly this way). A segment store is a directory tree of immutable
 * part dirs plus one marker file, so a snapshot is a recursive copy
 * with ONE ordering rule: the marker copies LAST. Every reader (DSv2
 * source, search, upsert) starts by reading the marker, so a
 * half-copied snapshot is recognizably incomplete the same way the
 * reference's missing-commit-metadata build is — no torn reads, no
 * lock files.
 *
 * Everything goes through the Hadoop FileSystem API: the same code
 * snapshots a local dir, HDFS, or an object store, driver-side only
 * (the data files never pass through Spark — a snapshot is metadata
 * motion from the cluster's point of view).
 */
object Backup {

  private val Marker = "_graft_segment_commit.json"

  /** Snapshot `store` into `destDir/snapshot.<name>`. Fails if the
    * snapshot already exists (Solr's behavior — backups are
    * immutable once taken). Returns the snapshot path. */
  def backup(spark: SparkSession, store: String, destDir: String,
             name: String): String = {
    val conf = ShardIndex.hadoopConf(spark)
    val src = new Path(store)
    val fs = src.getFileSystem(conf)
    require(fs.exists(new Path(src, Marker)),
      s"not a segment store (no $Marker): $store")
    val snap = new Path(destDir, s"snapshot.$name")
    val dfs = snap.getFileSystem(conf)
    require(!dfs.exists(snap), s"snapshot already exists: $snap")
    dfs.mkdirs(snap)
    val children = fs.listStatus(src).sortBy(_.getPath.getName)
    val (markers, parts) = children.partition(_.getPath.getName == Marker)
    for (st <- parts)
      FileUtil.copy(fs, st.getPath, dfs, new Path(snap, st.getPath.getName),
        false, conf)
    for (st <- markers) // marker LAST — the completion gate
      FileUtil.copy(fs, st.getPath, dfs, new Path(snap, st.getPath.getName),
        false, conf)
    snap.toString
  }

  /** Restore a snapshot into `dest` (which must not already be a
    * store — restore replaces a core, it does not merge). The same
    * marker-last ordering makes a torn restore unreadable rather
    * than silently partial. */
  def restore(spark: SparkSession, snapshot: String, dest: String): Unit = {
    val conf = ShardIndex.hadoopConf(spark)
    val src = new Path(snapshot)
    val fs = src.getFileSystem(conf)
    require(fs.exists(new Path(src, Marker)),
      s"not a complete snapshot (no $Marker): $snapshot")
    val out = new Path(dest)
    val dfs = out.getFileSystem(conf)
    require(!dfs.exists(new Path(out, Marker)),
      s"destination is already a store: $dest")
    dfs.mkdirs(out)
    val children = fs.listStatus(src).sortBy(_.getPath.getName)
    val (markers, parts) = children.partition(_.getPath.getName == Marker)
    for (st <- parts)
      FileUtil.copy(fs, st.getPath, dfs, new Path(out, st.getPath.getName),
        false, conf)
    for (st <- markers)
      FileUtil.copy(fs, st.getPath, dfs, new Path(out, st.getPath.getName),
        false, conf)
  }

  /** `/replication?command=details` analog: list snapshots under a
    * backup directory as (name, files, bytes). */
  def listBackups(spark: SparkSession, destDir: String): Seq[(String, Long, Long)] = {
    val conf = ShardIndex.hadoopConf(spark)
    val dir = new Path(destDir)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("snapshot."))
      .sortBy(_.getPath.getName)
      .map { st =>
        val sum = fs.getContentSummary(st.getPath)
        (st.getPath.getName.stripPrefix("snapshot."),
          sum.getFileCount, sum.getLength)
      }
  }
}
