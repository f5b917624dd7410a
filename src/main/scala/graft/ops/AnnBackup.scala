package graft.ops

import org.apache.spark.sql.SparkSession

/**
 * CONSISTENT ONLINE BACKUP of a mutating ANN store (round 17 — the
 * `index/Backup` Solr-/replication story brought to the vector
 * tiers, built ON the pin machinery): a pin IS a backup manifest —
 * the recorded file lists name an immutable read set (appends are
 * unlisted new files, rewrites defer while the pin lives), the
 * quantizers are write-once per generation, and the pin's tombstone
 * snapshot is the delete state. So backup = PIN → copy exactly the
 * manifest (listed data files, quantizer dirs, marker, tombstone
 * snapshot) → RELEASE. Concurrent adds/removes during the copy
 * cannot tear it, and the destination is a complete, independently
 * SERVING AND MUTABLE store (generation-0 layout) answering
 * bit-for-bit the pin-time answers — Lucene's snapshot-based backup
 * shape (`SnapshotDeletionPolicy` + copy-the-commit-point).
 *
 * Scope: the cells/codes-layout tiers — IVF, IVF-PQ (+refine
 * sidecar), SQ8, binary IVF, MRL — whose pins are file-list
 * snapshots. (The HNSW tier's pin is a generation CEILING over
 * whole immutable generation dirs; its backup is a plain recursive
 * copy of dirs ≤ the ceiling — no manifest machinery needed — and
 * stays out of scope here.) The destination is a NEW store identity:
 * streamed-batch replay markers deliberately do not copy (a replayed
 * batch id belongs to the source's stream history, not the
 * backup's).
 */
object AnnBackup {

  private val QuantizerDirs = Seq("centroids", "scalar", "codebooks")
  private val Markers = Seq("_ivf_marker.json", "_ivfpq_marker.json",
    "_sq8_marker.json", "_bqivf_marker.json", "_mrl_marker.json")

  /** Pin the store, copy the pin manifest to `dest`, release.
    * Returns the number of data files copied. `dest` must not
    * exist. */
  def backup(spark: SparkSession, store: String, dest: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(conf)
    require(!fs.exists(new org.apache.hadoop.fs.Path(dest)),
      s"backup destination $dest already exists")
    // tier-dispatched pin (the marker probes — IVF/IVF-PQ share the
    // cells layout and IvfIndex.pinGeneration)
    val tok =
      if (Sq8Index.isSq8Store(spark, store))
        Sq8Index.pinGeneration(spark, store)
      else if (MrlIndex.isMrlStore(spark, store))
        MrlIndex.pinGeneration(spark, store)
      else if (BinaryQuant.isBinaryIvfStore(spark, store))
        BinaryQuant.pinIvfGeneration(spark, store)
      else IvfIndex.pinGeneration(spark, store)
    try copyPinned(spark, store, tok, dest)
    finally IvfIndex.releaseGeneration(spark, store, tok)
  }

  /** The copy body: everything the pin addresses, nothing else. */
  private def copyPinned(spark: SparkSession, store: String, tok: Int,
                         dest: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(conf)
    val root = IvfIndex.pinnedRootOf(store, tok)
    def cp(src: String, dst: String): Unit = {
      val s = new org.apache.hadoop.fs.Path(src)
      val d = new org.apache.hadoop.fs.Path(dst)
      fs.mkdirs(d.getParent)
      require(org.apache.hadoop.fs.FileUtil.copy(fs, s, fs, d, false, conf),
        s"backup copy failed: $src")
    }
    // quantizers (write-once per generation) + the tier marker —
    // markers live at the generation root for the IVF/IVF-PQ family,
    // at the store top for the flat-layout tiers; check both
    (QuantizerDirs.map(q => s"$root/$q") ++
      Markers.flatMap(m => Seq(s"$root/$m", s"$store/$m")).distinct)
      .foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        if (fs.exists(hp)) {
          val dst = s"$dest/${hp.getName}"
          if (!fs.exists(new org.apache.hadoop.fs.Path(dst))) cp(p, dst)
        }
      }
    // the pin's tombstone snapshot becomes the backup's live deletes
    val pinDeletes = new org.apache.hadoop.fs.Path(s"$store/.pin_$tok/deletes")
    if (fs.exists(pinDeletes)) cp(pinDeletes.toString, s"$dest/deletes")
    // the pinned data files, subdir by subdir (the manifest lists)
    var copied = 0
    val pinDir = new org.apache.hadoop.fs.Path(s"$store/.pin_$tok")
    fs.listStatus(pinDir).filter(_.isFile).foreach { st =>
      val listName = st.getPath.getName
      if (listName == "files" || listName.startsWith("files_")) {
        val sub = if (listName == "files") "cells"
          else listName.stripPrefix("files_")
        graft.util.FsIo.readSmallFile(conf, st.getPath.toString)
          .split("\n").filter(_.nonEmpty).foreach { rel =>
            cp(s"$root/$sub/$rel", s"$dest/$sub/$rel")
            copied += 1
          }
      }
    }
    copied
  }
}
