package graft

import org.apache.spark.sql.SparkSession

/** Throwaway one-query runner — NEVER COMMIT. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("scratch").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SCRATCH_SF", "/root/testdata/sf0.01")
    val outDir = sys.env.getOrElse("SCRATCH_OUT", "/tmp/scratch_out")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sf)
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"=== $name rows=${spark.read.parquet(s"$outDir/$name.parquet").count()} " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      SparkEntry.oracleSql.get(name).foreach { sql =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$name.sql"),
          sql.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
