package graft.index

import org.apache.spark.sql.functions._

/**
 * Read-path diagnostic for the COLUMNAR docValues retrieval: one wide
 * store (the full `part` row — 9 columns), then each scan shape timed
 * under both row paths (`.option("columnar", "off")` forces the
 * stored-doc path; default is the gate-decided columnar path):
 *
 *  - `export2`: MatchAll, 2-column projection — the narrow-export
 *    shape the columnar path exists for (stored path decompresses and
 *    parses all 9 fields of every doc; columnar reads two `.dvd`
 *    columns);
 *  - `export_all`: MatchAll, all columns — columnar's worst case
 *    (every column read anyway, dict indirection on top);
 *  - `point`: a selective term query — must ride the stored per-hit
 *    seeks under the 1/32 selectivity gate, so both labels should
 *    read the same.
 *
 * Three passes per shape, best-of reported (page cache + JIT warm).
 * Results recorded in docs/SCALING.md §"columnar docValues retrieval".
 *
 * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
 *   sbt "runMain graft.index.ScanStats"`
 */
object ScanStats {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val out = java.nio.file.Files.createTempDirectory("graft_scanstats_").toString
    // corpus shape: the stored row is dominated by the analyzed text
    // column — the exact store where a metadata projection should not
    // pay for decompressing document bodies
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text"),
        col("lang"), col("source"), col("n_chars").cast("string").as("n_chars"))
    SegmentShardSink.write(docs, "id", out, shards = 4,
      analyzedFields = Set("text"))

    def timed(label: String, mk: Boolean => org.apache.spark.sql.DataFrame): Unit = {
      val best = Array(true, false).map { on =>
        on -> (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          mk(on).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
      }.toMap
      println(f"""{"shape":"$label","columnar_s":${best(true)}%.3f,""" +
        f""""stored_s":${best(false)}%.3f,""" +
        f""""speedup":${best(false) / best(true)}%.2f}""")
    }

    def open(on: Boolean) = {
      val r = spark.read.format("graft-index")
      (if (on) r else r.option("columnar", "off")).load(out)
    }
    timed("export2", on => open(on).select("id", "lang"))
    timed("export_all", on => open(on))
    timed("filtered2", on => open(on).filter(col("lang") === "de")
      .select("id", "n_chars"))
    // the scale argument is BYTES READ: a narrow export reads the
    // projected fields' .dvd columns instead of every stored block —
    // wall-clock parity on page-cached local NVMe understates what
    // this saves against remote object storage
    def sized(p: java.io.File, ext: String): Long =
      if (p.isFile) { if (p.getName.endsWith(ext)) p.length else 0L }
      else if (p.isDirectory) p.listFiles.map(sized(_, ext)).sum
      else 0L
    val root = new java.io.File(out)
    println(s"""{"bytes":{"fld":${sized(root, ".fld")},""" +
      s""""dvd":${sized(root, ".dvd")},"dvm":${sized(root, ".dvm")},""" +
      s""""trm":${sized(root, ".trm")}}}""")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    spark.stop()
  }
}
