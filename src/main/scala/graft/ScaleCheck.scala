package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * 1000×-data scaling evidence beyond the driver's sf0.1: synthesizes a
 * 10×-sf0.1 corpus ("sf1-synth") for the tables the worst-scaling
 * queries touch and times those queries against it.
 *
 * Synthesis keeps the workload SHAPE honest at 10× the rows:
 *  - `lineitem`: 10 key-offset copies (l_orderkey += i·10⁹) so the
 *    build key (orderkey#linenumber) stays unique — replicating keys
 *    verbatim would let dedup collapse the copies and understate work;
 *  - `documents`: 10 key-offset copies, each with ~30% of its tokens
 *    deterministically rewritten (hash(token, copy) mod 100 < 30 →
 *    suffixed variant), so exact-dedup AND near-dup queries see 10×
 *    genuinely distinct docs — pairwise Jaccard between copies lands
 *    ≈0.5, below the 0.8-class near-dup thresholds (a bare suffix
 *    token would leave Jaccard ≈1 and make minhash queries measure
 *    collapsing 10-way clusters, not a bigger diverse corpus);
 *  - remaining tables are carried over unchanged (the measured queries
 *    do not read them).
 *
 * Usage: `sbt "runMain graft.ScaleCheck"` — prints one JSON line per
 * scale (sf0.1 and sf1-synth) for the measured query set; results are
 * recorded in docs/SCALING.md.
 */
object ScaleCheck {
  private val Measured =
    Seq("q07_convert_timestamp", "q10_tokenize_tf", "q18_langid",
      "q21_dedup_exact", "q23_simhash", "q49_build_index",
      "q54_drop_near_dups", "q74_bm25", "q78_corpus_pipeline",
      "q144_substring_dedup", "q146_bpe_pairs", "q147_bigram_rarity",
      "q154_corpus_audit",
      // round-8 corpus-heavy additions: gram-model joins, pair
      // explosion, source-set expansion, classifier train+score
      "q233_seed_classifier", "q242_stupid_backoff",
      "q244_source_overlap", "q247_skipgram_pairs")

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = "/tmp/graft_sf1synth"
    val spark = GraftSession.local(32)
    synthesize(spark, src, out)
    // same warm-up as Bench so first-query numbers are comparable
    spark.range(1000000L).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    Seq("sf0.1" -> src, "sf1-synth" -> out).foreach { case (label, dir) =>
      val times = Measured.map { q =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
        spark.sharedState.cacheManager.clearCache()
        q.takeWhile(_ != '_') -> (System.nanoTime() - t0) / 1e9
      }
      val qs = times.map { case (q, t) => s""""$q":${math.round(t * 100) / 100.0}""" }
        .mkString("{", ",", "}")
      println(s"""{"scale":"$label","queries":$qs}""")
    }
    spark.stop()
  }

  private def synthesize(spark: SparkSession, src: String, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // v2: token-perturbed copies (marker renamed so a stale /tmp synth
    // from the suffix-only version is regenerated, not reused)
    val done = new org.apache.hadoop.fs.Path(out, "_SYNTH_DONE_v2")
    if (fs.exists(done)) return
    def copies(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until 10).map(i => f(df, i)).reduce(_ unionAll _)

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    copies(li, (d, i) => d.withColumn("l_orderkey",
        col("l_orderkey") + lit(i.toLong * 1000000000L)))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    copies(docs, (d, i) => d
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000000L))
        .withColumn("text",
          if (i == 0) col("text")
          else array_join(
            transform(split(col("text"), " "), t =>
              when(pmod(hash(t, lit(i)), lit(100)) < 30, concat(t, lit("v"), lit(i)))
                .otherwise(t)),
            " ")))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "events", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    fs.create(done, true).close()
  }
}
