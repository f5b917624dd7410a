package graft

import java.nio.file.{Files, Paths}

/** Dev tool for the optimization rounds: captures
  * `explain("formatted")` for the named queries into
  * `plans/<round>/<query>_<tag>.txt` so plan-shape claims
  * (Exchange count, join strategy, PushedFilters/ReadSchema) are
  * reviewable without running Spark.
  *
  * Usage: runMain graft.PlanDump <round> <tag> q272,q323,...
  * Data dir comes from SPARK_GRAFT_SF_DIR (default sf0.1 — the bench
  * scale, so captured plans match the measured ones).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(round, tag, csv) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val wanted = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(s"plans/$round")
    Files.createDirectories(outDir)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.contains(n.takeWhile(_ != '_')) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val short = name.takeWhile(_ != '_')
          Files.writeString(outDir.resolve(s"${short}_$tag.txt"),
            s"== $name ($tag, $sfDir) ==\n$plan")
          println(s"[plandump] wrote $short" + s"_$tag.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    spark.stop()
  }
}
