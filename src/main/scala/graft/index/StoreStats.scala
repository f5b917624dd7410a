package graft.index

import org.apache.spark.sql.functions._

/**
 * Stored-field codec + writer-phase diagnostic. Two fixtures:
 *
 *  - the q88-shaped segment index (lineitem id/returnflag/shipdate
 *    docs, non-analyzed) under each codec — v4 LZ4 block-compressed
 *    (the default), v2 deflate blocks, v1 plain — printing per-file
 *    byte totals AND single-writer docs/s, so both the codec's
 *    on-disk saving and its write-throughput cost are measured, not
 *    claimed;
 *  - the docs_text shape (documents with an ANALYZED body), which
 *    additionally pays tokenization, positions, norms and the
 *    SORTED_SET `.dvm` column — the corpus-ingest shape.
 *
 * Each line carries the [[SegmentIndex.WritePhases]] breakdown
 * (stored / docLoop / vocabSort / trm / dv, percent of segment-write
 * time) so the next writer optimization starts from a profile, not a
 * guess. Results recorded in docs/SCALING.md ("stored-field
 * compression" / "writer throughput" / "writer phase profile").
 *
 * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
 *   sbt "runMain graft.index.StoreStats"`
 */
object StoreStats {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(8)
    val conf = spark.sparkContext.hadoopConfiguration
    def sized(p: java.io.File, ext: String): Long =
      if (p.isFile) { if (p.getName.endsWith(ext)) p.length else 0L }
      else if (p.isDirectory) p.listFiles.map(sized(_, ext)).sum
      else 0L
    def phaseJson(): String = {
      val t = SegmentIndex.WritePhases.table
      val total = math.max(t.map(_._2).sum, 1L)
      t.map { case (k, v) => s""""$k":${v * 100 / total}""" }.mkString("{", ",", "}")
    }
    // per-doc Seq construction stays INSIDE the timed loop (the r10
    // methodology — numbers comparable across rounds), and only one
    // fixture's Row array is live at a time (heap pressure skews the
    // writer measurement otherwise)
    def run(label: String, rows: Array[org.apache.spark.sql.Row],
            mk: org.apache.spark.sql.Row => Seq[(String, String)],
            analyzed: Set[String], compress: Boolean, magic: Int,
            report: Boolean): Unit = {
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_storestats_").toString
      val w = SegmentIndex.writer(out, conf, analyzed, compress)
      w.storedCodecMagic = magic
      SegmentIndex.WritePhases.reset()
      val t0 = System.nanoTime()
      rows.foreach(r => w.addDocument(mk(r)))
      w.commit()
      val secs = (System.nanoTime() - t0) / 1e9
      if (report) {
        val root = new java.io.File(out)
        println(s"""{"codec":"$label","docs":${rows.length},""" +
          s""""fld":${sized(root, ".fld")},"fdx":${sized(root, ".fdx")},""" +
          s""""trm":${sized(root, ".trm")},"dvm":${sized(root, ".dvm")},""" +
          s""""total":${sized(root, "")},""" +
          s""""secs":${f"$secs%.2f"},"docs_per_s":${(rows.length / secs).toInt},""" +
          s""""phases_pct":${phaseJson()}}""")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }

    val liMk: org.apache.spark.sql.Row => Seq[(String, String)] =
      r => Seq("id" -> r.getString(0),
        "l_returnflag" -> r.getString(1), "l_shipdate" -> r.getString(2))
    // corpus shape: analyzed body + lang/source fields; the body is
    // the store's .dvm-heaviest plausible field
    val docMk: org.apache.spark.sql.Row => Seq[(String, String)] =
      r => Seq("id" -> r.getString(0), "body" -> r.getString(1),
        "lang" -> r.getString(2), "source" -> r.getString(3))

    // two passes: the first warms JIT/page cache, the second is the
    // reported one — single-writer docs/s is the 100 TB ingest gate
    val liRows = spark.read.parquet(s"$d/lineitem.parquet")
      .withColumn("id", concat(col("l_orderkey"), lit("#"), col("l_linenumber")))
      .select(col("id"), col("l_returnflag"), col("l_shipdate").cast("string"))
      .collect()
    (1 to 2).foreach { pass =>
      Seq(
        ("v4-lz4", true, SegmentIndex.FLD_MAGIC4),
        ("v2-deflate", true, SegmentIndex.FLD_MAGIC2),
        ("v1-plain", false, SegmentIndex.FLD_MAGIC4)
      ).foreach { case (label, compress, magic) =>
        run(label, liRows, liMk, Set.empty, compress, magic, report = pass == 2)
      }
    }
    val docRows = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id").cast("string"), col("text"), col("lang"), col("source"))
      .collect()
    (1 to 2).foreach { pass =>
      run("v4-lz4-analyzed", docRows, docMk, Set("body"), compress = true,
        SegmentIndex.FLD_MAGIC4, report = pass == 2)
    }
    spark.stop()
  }
}
