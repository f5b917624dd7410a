package graft.index

import org.apache.spark.sql.functions._

/**
 * Stored-field codec size diagnostic: builds the q88-shaped segment
 * index (lineitem id/returnflag/shipdate docs) twice — v2
 * block-compressed (the default) and v1 plain — and prints per-file
 * byte totals, so the codec's on-disk saving is measured, not
 * claimed. Results recorded in docs/SCALING.md ("stored-field
 * compression").
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
    Seq(true, false).foreach { compress =>
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_storestats_$compress").toString
      val w = SegmentIndex.writer(out, conf, Set.empty, compress)
      rows.foreach { r =>
        w.addDocument(Seq("id" -> r.getString(0),
          "l_returnflag" -> r.getString(1), "l_shipdate" -> r.getString(2)))
      }
      w.commit()
      val root = new java.io.File(out)
      println(s"""{"codec":"${if (compress) "v2-deflate" else "v1-plain"}",""" +
        s""""docs":${rows.length},"fld":${sized(root, ".fld")},""" +
        s""""fdx":${sized(root, ".fdx")},"trm":${sized(root, ".trm")},""" +
        s""""total":${sized(root, "")}}""")
    }
    spark.stop()
  }
}
