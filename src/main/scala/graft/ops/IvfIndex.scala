package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PERSISTED IVF (inverted-file) ANN index — the build/load split over
 * [[Similarity.ivfTopK]]'s batch form: that operator (re)trains
 * centroids and re-assigns the whole corpus on every call, which is
 * right for a one-shot batch query but wrong for a 100 TB corpus
 * serving many query batches. Here the index is built ONCE:
 *
 *  - `centroids/` — the trained k-means centroid matrix (tiny,
 *    driver-loadable; the same ordered-sample md5-seeded Lloyd
 *    training as the batch operator, so answers are bit-identical);
 *  - `cells/` — the corpus assignments written `partitionBy(cell)`:
 *    one parquet directory per inverted list, each row carrying the
 *    vector and its precomputed norm;
 *  - `_ivf_marker.json` — dim/nlist/seed/column config.
 *
 * A query batch probes its `nprobe` nearest cells and reads ONLY
 * those cells' directories — the probed cell set is collected from
 * the (broadcast-small by contract) query side and pushed as a
 * partition filter, so scan I/O is ∝ probed mass, not corpus size
 * (`IvfIndexSpec` asserts the partition pruning on the plan).
 * Incremental adds assign against the FROZEN centroids and append to
 * the touched cell partitions only — the standard IVF contract (the
 * coarse quantizer is fixed after training; FAISS's `add` does the
 * same), so existing cell contents and query answers for old vectors
 * never change.
 */
object IvfIndex {

  private def markerPath(out: String) = s"$out/_ivf_marker.json"

  final case class Marker(dim: Int, eff: Int, seed: Long,
                          idCol: String, vecCol: String)

  /** Train on the corpus (ordered sample, md5-seeded Lloyd — identical
    * to the batch operator's training) and persist centroids + cell
    * assignments. `nlist ≈ sqrt(corpus rows)` is the classical sizing;
    * cells/ becomes one directory per inverted list. */
  def build(corpus: DataFrame, out: String, dim: Int,
            nlist: Int = 16, sampleSize: Int = 2048, seed: Long = 42L,
            idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    val centroids = Similarity.trainCentroids(corpus, nlist, sampleSize, seed,
      idCol, vecCol)
    val (_, nearest) = Similarity.cellFns(centroids, dim)
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("i", "c").coalesce(1)
      .write.mode("overwrite").parquet(s"$out/centroids")
    corpus.select(col(idCol).as("corpus_id"),
        col(vecCol).cast("array<double>").as("cvec"))
      .withColumn("cnorm", Similarity.norm(col("cvec")))
      .withColumn("cell", nearest(col("cvec")))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$out/cells")
    val m = s"""{"dim":$dim,"eff":${centroids.length},"seed":$seed,""" +
      s""""idCol":"$idCol","vecCol":"$vecCol"}"""
    val p = new org.apache.hadoop.fs.Path(markerPath(out))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(m.getBytes("UTF-8")) finally os.close()
  }

  private[ops] def readMarker(spark: SparkSession, out: String): Marker = {
    val p = new org.apache.hadoop.fs.Path(markerPath(out))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    val txt = new String(buf, "UTF-8")
    def num(k: String) = s""""$k":(-?\\d+)""".r.findFirstMatchIn(txt).get.group(1)
    def str(k: String) = (s""""$k":"([^"]*)"""").r.findFirstMatchIn(txt).get.group(1)
    Marker(num("dim").toInt, num("eff").toInt, num("seed").toLong,
      str("idCol"), str("vecCol"))
  }

  private def loadCentroids(spark: SparkSession, out: String): Array[Array[Double]] =
    spark.read.parquet(s"$out/centroids")
      .orderBy("i").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("c")).toArray)

  /**
   * Query the persisted index: identical semantics (and bit-identical
   * cosines) to [[Similarity.ivfTopK]] with the same build
   * parameters, but the corpus is never scanned — only the probed
   * cells' partitions are read, and no training runs. Queries must be
   * broadcast-small (the same contract as the batch operator); their
   * probed cell set is collected to drive partition pruning.
   */
  def query(spark: SparkSession, out: String, queries: DataFrame, k: Int,
            nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = readMarker(spark, out)
    val (dists, _) = Similarity.cellFns(loadCentroids(spark, out), m.dim)
    val q0 = queries.select(col(m.idCol).as("query_id"),
        col(m.vecCol).cast("array<double>").as("qvec"))
      .withColumn("qnorm", Similarity.norm(col("qvec")))
    val q = q0.withColumn("cell",
      explode(Similarity.probeCells(dists(col("qvec")), m.eff, nprobe)))
    // probed cells -> partition-pruning literals (bounded: |Q|·nprobe)
    val probed = q.select(col("cell")).distinct().collect().map(_.getInt(0))
    val cells = spark.read.parquet(s"$out/cells")
      .filter(col("cell").isin(probed.map(Int.box).toIndexedSeq: _*))
    val scored = cells.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", Similarity.dot(col("qvec"), col("cvec")) /
        (col("qnorm") * col("cnorm")))
      .select(col("query_id"), col("corpus_id"), col("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Incremental add: assign `vectors` against the FROZEN centroids
    * and append to the touched cell partitions — existing cells'
    * files never rewrite (dynamic partition append), the classical
    * IVF add contract. Periodic retrain is a rebuild, by design.
    * After the append, any cell whose small-file pile exceeds
    * `maxFilesPerCell` is folded (see [[compact]]) — the same
    * counter-force the segment store's tiered merge applies, so a
    * continuous ingest converges to O(bytes/targetFileBytes) files
    * per cell instead of O(adds). */
  def add(spark: SparkSession, out: String, vectors: DataFrame,
          maxFilesPerCell: Int = 8): Unit = {
    val m = readMarker(spark, out)
    val (_, nearest) = Similarity.cellFns(loadCentroids(spark, out), m.dim)
    vectors.select(col(m.idCol).as("corpus_id"),
        col(m.vecCol).cast("array<double>").as("cvec"))
      .withColumn("cnorm", Similarity.norm(col("cvec")))
      .withColumn("cell", nearest(col("cvec")))
      .write.mode("append").partitionBy("cell").parquet(s"$out/cells")
    compact(spark, out, maxFilesPerCell)
  }

  /** Fold over-budget cell partitions: each cell whose parquet file
    * count exceeds `maxFilesPerCell` is rewritten to
    * ceil(bytes / targetFileBytes) files (≥1) — contents unchanged,
    * queries and their plans unaffected (the cell dir keeps its name;
    * only the files inside collapse). Cells under budget are never
    * touched, so steady-state compaction I/O is ∝ recently-grown
    * cells, not index size. Same single-writer discipline as the
    * segment store: do not compact a store while a query batch reads
    * it. Returns the number of cells folded. */
  def compact(spark: SparkSession, out: String, maxFilesPerCell: Int = 8,
              targetFileBytes: Long = 256L << 20): Int = {
    val root = new org.apache.hadoop.fs.Path(s"$out/cells")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    var folded = 0
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .foreach { d =>
        val dataFiles = fs.listStatus(d.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        if (dataFiles.length > maxFilesPerCell) {
          val bytes = dataFiles.map(_.getLen).sum
          val target = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
          val tmp = new org.apache.hadoop.fs.Path(
            s"$out/.compact_tmp_${d.getPath.getName}")
          spark.read.parquet(d.getPath.toString).coalesce(target)
            .write.mode("overwrite").parquet(tmp.toString)
          // the rewrite materialized fully above — swap files in place
          dataFiles.foreach(f => fs.delete(f.getPath, false))
          fs.listStatus(tmp)
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
            .zipWithIndex.foreach { case (f, i) =>
              fs.rename(f.getPath,
                new org.apache.hadoop.fs.Path(d.getPath, f"compacted-$i%05d.parquet"))
            }
          fs.delete(tmp, true)
          folded += 1
        }
      }
    folded
  }
}
