package graft.index

import org.apache.spark.sql.functions._

/**
 * Stored-field codec diagnostic: builds the q88-shaped segment index
 * (lineitem id/returnflag/shipdate docs) under each codec — v4 LZ4
 * block-compressed (the default), v2 deflate blocks, v1 plain — and
 * prints per-file byte totals AND single-writer docs/s, so both the
 * codec's on-disk saving and its write-throughput cost are measured,
 * not claimed. Results recorded in docs/SCALING.md ("stored-field
 * compression" / "writer throughput").
 *
 * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
 *   sbt "runMain graft.index.StoreStats"`
 */
object StoreStats {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(8)
    val rows = spark.read.parquet(s"$d/lineitem.parquet")
      .withColumn("id", concat(col("l_orderkey"), lit("#"), col("l_linenumber")))
      .select(col("id"), col("l_returnflag"), col("l_shipdate").cast("string"))
      .collect()
    val conf = spark.sparkContext.hadoopConfiguration
    def sized(p: java.io.File, ext: String): Long =
      if (p.isFile) { if (p.getName.endsWith(ext)) p.length else 0L }
      else if (p.isDirectory) p.listFiles.map(sized(_, ext)).sum
      else 0L
    // (label, compress, storedMagic — ignored when compress = false)
    val codecs = Seq(
      ("v4-lz4", true, SegmentIndex.FLD_MAGIC4),
      ("v2-deflate", true, SegmentIndex.FLD_MAGIC2),
      ("v1-plain", false, SegmentIndex.FLD_MAGIC4))
    // two passes: the first warms JIT/page cache, the second is the
    // reported one — single-writer docs/s is the 100 TB ingest gate
    (1 to 2).foreach { pass =>
      codecs.foreach { case (label, compress, magic) =>
        val out = java.nio.file.Files
          .createTempDirectory(s"graft_storestats_").toString
        val w = SegmentIndex.writer(out, conf, Set.empty, compress)
        w.storedCodecMagic = magic
        val t0 = System.nanoTime()
        rows.foreach { r =>
          w.addDocument(Seq("id" -> r.getString(0),
            "l_returnflag" -> r.getString(1), "l_shipdate" -> r.getString(2)))
        }
        w.commit()
        val secs = (System.nanoTime() - t0) / 1e9
        if (pass == 2) {
          val root = new java.io.File(out)
          println(s"""{"codec":"$label","docs":${rows.length},""" +
            s""""fld":${sized(root, ".fld")},"fdx":${sized(root, ".fdx")},""" +
            s""""trm":${sized(root, ".trm")},"total":${sized(root, "")},""" +
            s""""secs":${f"$secs%.2f"},"docs_per_s":${(rows.length / secs).toInt}}""")
        }
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      }
    }
    spark.stop()
  }
}
