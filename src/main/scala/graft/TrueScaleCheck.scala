package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * TRUE sf1 validation (vs [[ScaleCheck]]'s sf1-synth key-offset
 * copies): regenerates every table at 10× sf0.1 row counts from the
 * SAME distributions the driver's testdata exhibits — independent
 * fresh rows, not perturbed copies — so join fan-outs, group
 * cardinalities, text diversity, and dedup collision rates all scale
 * the way real data would, instead of inheriting copy structure.
 *
 * Measured distributions replicated (profiled from
 * /root/testdata/sf0.1): lineitem 1–7 lines/order (avg ≈4), flags
 * A/N/R × F/O uniform, shipdate 1995–2001; orders F/O/P and the five
 * TPC-H priorities uniform; documents 10–100 tokens over the 31-word
 * vocabulary with en≈2× the other four langs, 20 sources, ~0.16%
 * planted exact-duplicate texts; events one month at 10× density with
 * 10× users; embeddings 64-dim label-clustered floats, 10 labels.
 * Everything is hash-seeded column expressions over `spark.range` —
 * fully distributed, deterministic across runs and layouts, no
 * driver-side materialization.
 *
 * Usage: `sbt "runMain graft.TrueScaleCheck"` — generates
 * /tmp/graft_sf1_true once (marker-guarded), then times the ~20 most
 * expensive queries on sf0.1 and sf1-true in one session and prints
 * one JSON line per scale. Results: docs/SCALING.md §"true sf1".
 */
object TrueScaleCheck {

  /** The measured set: bench's most expensive queries plus the
    * corpus-heavy ScaleCheck carryovers — every family whose 10×
    * behavior the synth table already claims a number for — plus the
    * r10/r11 write-path additions (tiered merge flow, persisted IVF,
    * the .dvm-served facet family). */
  private val Measured = Seq(
    "q213_shortest_path", "q272_shortest_path_expr", "q78_corpus_pipeline",
    "q161_bpe_encode", "q184_dsir_select", "q242_stupid_backoff",
    "q244_source_overlap", "q250_optimistic_upsert", "q147_bigram_rarity",
    "q77_dedup_clusters", "q21_dedup_exact", "q49_build_index",
    "q88_segment_store", "q54_drop_near_dups", "q74_bm25",
    "q144_substring_dedup", "q154_corpus_audit",
    "q233_seed_classifier", "q247_skipgram_pairs",
    "q286_tiered_merge", "q287_ivf_persisted", "q139_token_facet",
    "q263_stream_windows", "q268_stream_dedup_ingest",
    // round-12 families: the PQ code store, its delete path, and the
    // SQL-surface term pushdowns (q289 is part_mv's owner, so its
    // presence warms q296's store; q139 already owns q299's)
    "q294_ivfpq_persisted", "q297_ivfpq_delete", "q289_index_multivalued",
    "q296_index_array_filter", "q299_index_analyzed_filter",
    // round-13 completions (r12 verdict #6): persisted two-stage refine
    // serving (now id-pushed), streaming ANN ingest, the raw-vector IVF
    // delete path, the OR / NOT pushdown shapes, and the analyzed
    // multivalued pushdown (q304 owns part_mvana)
    "q302_ivfpq_refine_persisted", "q300_stream_ann_ingest",
    "q298_ivf_delete", "q301_index_array_or", "q303_index_array_not",
    "q304_index_analyzed_array", "q305_ivfpq_refine_stored",
    "q306_ann_recall_eval", "q307_ivf_filtered", "q308_ann_drift",
    // round-14 families: drift-triggered retrain (generation swap),
    // the unigram seed shuffle (the only distributed unigram stage),
    // and the HNSW tier — build+floor gate, filtered search, and the
    // full add/delete/purge lifecycle store
    "q309_ann_retrain", "q310_unigram_seed", "q313_hnsw_recall_gate",
    "q314_hnsw_filtered", "q315_hnsw_lifecycle",
    "q316_unigram_mstep_dist", "q317_binary_ann",
    "q318_binary_ann_persisted",
    // round-15 families (r14 verdict #7 + #2 acceptance): the {!knn}
    // store dispatch, the bucketed binary IVF (probe-pruned — its row
    // is the "scan term dropped vs q317/q318" evidence), the streamed
    // HNSW delta store, and the tier-arbitration harness
    "q319_knn_hnsw_store", "q321_binary_ivf", "q322_hnsw_stream_delta",
    "q323_ann_tier_arbitration", "q324_hnsw_serving",
    // round-16 families: the composed hybrid request (BM25 + {!knn} +
    // RRF), trained-centroid SemDeDup, byte-level BPE, the SQ8 tier
    // (q330 owns sq8_index), and the MaxSim late-interaction re-rank
    "q327_hybrid_search", "q328_semantic_dedup_trained",
    "q329_bytelevel_bpe", "q330_sq8_ann", "q331_colbert_maxsim",
    "q332_ann_pinned_query", "q333_hnsw_pinned_query",
    "q335_matryoshka_ann",
    // round-17 families: the store-served MRL tier (q337 owns
    // mrl_index — its row is the "probe-pruned vs q335's designed-
    // linear scan" evidence), the SQ8 drift probe and pinned read,
    // the batched hybrid request, byte-fallback encode, and the
    // token-level ColBERT store (q341 owns colbert_tokens)
    "q336_sq8_drift", "q337_mrl_persisted", "q338_sq8_pinned_query",
    "q339_hybrid_batch", "q340_unigram_bytefallback",
    "q341_colbert_token_store", "q342_mrl_pinned_query",
    "q343_mmr_diversify", "q344_ann_backup",
    "q345_lsh_incremental", "q346_knn_any_tier").distinct

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1_true")
    val spark = GraftSession.local(32)
    generate(spark, out)
    spark.range(1000000L).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def release(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    Seq("sf0.1" -> src, "sf1-true" -> out).foreach { case (label, dir) =>
      // SETUP column (Bench's setup/sweep split, r11 watch item): the
      // one-time store builds run first and report separately, so the
      // 10×-data ratios below are STEADY-STATE query cost — a
      // build-inclusive number muddies the scale signal with one-shot
      // construction that a real deployment amortizes across runs.
      val setup = SparkEntry.storeWarmupQueries
        .filter(q => only.forall(_.contains(q.takeWhile(_ != '_'))))
        .filter(Measured.contains) // owners the measured set re-queries
        .map { q =>
          val t0 = System.nanoTime()
          try SparkEntry.queries(q)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[sf1] setup $q failed: ${e.getMessage}") }
          release()
          q.takeWhile(_ != '_') -> (System.nanoTime() - t0) / 1e9
        }
      val times = Measured
        .filter(q => only.forall(_.contains(q.takeWhile(_ != '_'))))
        .map { q =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          release()
          q.takeWhile(_ != '_') -> (System.nanoTime() - t0) / 1e9
        }
      def js(ts: Seq[(String, Double)]) = ts
        .map { case (q, t) => s""""$q":${math.round(t * 100) / 100.0}""" }
        .mkString("{", ",", "}")
      println(s"""{"scale":"$label","setup":${js(setup.filter(_._2 >= 0.5))},"queries":${js(times)}}""")
    }
    spark.stop()
  }

  // hash-seeded uniforms: deterministic, splittable, expression-only
  private def u(c: Column, salt: Int): Column =
    pmod(hash(c, lit(salt)), lit(1000000)).cast("double") / 1000000.0
  private def ui(c: Column, salt: Int, n: Int): Column =
    pmod(hash(c, lit(salt)), lit(n))
  private def pick(c: Column, salt: Int, vals: String*): Column =
    element_at(array(vals.map(lit): _*), (ui(c, salt, vals.length) + 1).cast("int"))

  private val Vocab = Seq("spark", "window", "merge", "table", "column",
    "vector", "stream", "value", "data", "small", "join", "filter", "big",
    "group", "hash", "customer", "sort", "order", "slow", "line", "part",
    "fast", "the", "row", "agg", "key", "query", "a", "scan", "batch", "dup")

  /** All ten tables at 10× sf0.1 cardinality, fresh rows. Each table
    * lands as a SINGLE FILE named `X.parquet` — the driver's testdata
    * layout — not a Spark directory: the streaming queries pin the
    * file stream with `pathGlobFilter=events.parquet`, which matches
    * leaf FILES, so a directory-shaped table silently streams zero
    * rows (caught in round 11: q263 "ran" 18× faster on 10× data).
    * Single files cost nothing at read time (row-group splitting
    * keeps scans parallel); generation stays distributed — only the
    * final exchange funnels to one writer task. */
  def generate(spark: SparkSession, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done = new org.apache.hadoop.fs.Path(out, "_TRUE_SF1_DONE_v3")
    if (fs.exists(done)) return

    // single-file writer: distributed generation, one final exchange,
    // rename the lone part file to the driver's `X.parquet` layout.
    // Row groups are capped at 4 MB: the driver's sf0.1 files are
    // single-row-group (fine at that size), but a single 100 MB row
    // group at sf1 would pin every SCAN stage to one task and the 10×
    // table would measure the input layout, not the engine — 4 MB
    // groups let Spark split the file so scan parallelism tracks data
    // growth, the layout any real corpus write produces.
    def save(df: DataFrame, name: String): Unit = {
      val tmp = new org.apache.hadoop.fs.Path(out, s".tmp_$name")
      df.repartition(1).write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file generated for $name"))
      val dest = new org.apache.hadoop.fs.Path(out, s"$name.parquet")
      fs.delete(dest, true)
      fs.rename(part, dest)
      fs.delete(tmp, true)
    }

    val nOrders = 1500000L
    val nCust = 150000L
    val nSupp = 10000L
    val nPart = 200000L
    val nEvents = 1000000L
    val nDocs = 50000L
    val nEmb = 20000L

    def range(n: Long, parts: Int = 32): DataFrame =
      spark.range(0, n, 1, parts).toDF("id")

    // region / nation: fixed dimensions, driver layout
    save(spark.range(5).select(col("id").cast("int").as("r_regionkey"),
        concat(lit("REGION_"), col("id")).as("r_name")), "region")
    save(spark.range(25).select(col("id").cast("int").as("n_nationkey"),
        concat(lit("NATION_"), col("id")).as("n_name"),
        pmod(col("id"), lit(5)).cast("int").as("n_regionkey")), "nation")

    range(nCust, 8).select(col("id").as("c_custkey"),
        format_string("Customer#%09d", col("id")).as("c_name"),
        ui(col("id"), 21, 25).cast("int").as("c_nationkey"),
        round(lit(-1000.0) + u(col("id"), 22) * 11000.0, 2).as("c_acctbal"),
        pick(col("id"), 23, "AUTOMOBILE", "BUILDING", "FURNITURE",
          "HOUSEHOLD", "MACHINERY").as("c_mktsegment"))
      .transform { df => save(df, "customer"); df }

    range(nSupp, 4).select(col("id").as("s_suppkey"),
        format_string("Supplier#%09d", col("id")).as("s_name"),
        ui(col("id"), 31, 25).cast("int").as("s_nationkey"),
        round(lit(-1000.0) + u(col("id"), 32) * 11000.0, 2).as("s_acctbal"))
      .transform { df => save(df, "supplier"); df }

    range(nPart, 8).select(col("id").as("p_partkey"),
        concat(pick(col("id"), 41, "large", "hot", "blue", "old", "cold",
            "dark", "light", "new", "red", "green"), lit(" "),
          pick(col("id"), 42, "ring", "bolt", "plate", "screw", "washer",
            "gear", "cog", "pin")).as("p_name"),
        concat(lit("Brand#"), (ui(col("id"), 43, 25) + 1)).as("p_brand"),
        pick(col("id"), 44, "LARGE", "ECONOMY", "SMALL", "STANDARD",
          "MEDIUM", "PROMO").as("p_type"),
        (ui(col("id"), 45, 50) + 1).cast("int").as("p_size"),
        round(lit(900.0) + u(col("id"), 46) * 1100.0, 2).as("p_retailprice"))
      .transform { df => save(df, "part"); df }

    // orders: 1995-01-01 + 0..2400 days
    range(nOrders).select(col("id").as("o_orderkey"),
        ui(col("id"), 51, nCust.toInt).as("o_custkey"),
        pick(col("id"), 52, "F", "O", "P").as("o_orderstatus"),
        round(lit(1000.0) + u(col("id"), 53) * 499000.0, 2).as("o_totalprice"),
        (lit(788918400L) + ui(col("id"), 54, 2400) * 86400L)
          .cast("timestamp").as("o_orderdate"),
        pick(col("id"), 55, "1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW").as("o_orderpriority"))
      .transform { df => save(df, "orders"); df }

    // lineitem: 1..7 lines per order (avg 4 → ~6M rows); fresh values
    // per (orderkey, linenumber) pair
    val li = range(nOrders)
      .select(col("id").as("l_orderkey"),
        explode(sequence(lit(1), (ui(col("id"), 61, 7) + 1).cast("int")))
          .as("l_linenumber"))
    val lk = hash(col("l_orderkey"), col("l_linenumber"))
    li.select(col("l_orderkey"),
        pmod(hash(lk, lit(62)), lit(nPart.toInt)).cast("bigint").as("l_partkey"),
        pmod(hash(lk, lit(63)), lit(nSupp.toInt)).cast("bigint").as("l_suppkey"),
        col("l_linenumber"),
        (pmod(hash(lk, lit(64)), lit(50)) + 1).cast("double").as("l_quantity"),
        round(lit(900.0) + (pmod(hash(lk, lit(65)), lit(1000000))
          .cast("double") / 1000000.0) * 104100.0, 2).as("l_extendedprice"),
        (pmod(hash(lk, lit(66)), lit(11)).cast("double") / 100.0).as("l_discount"),
        (pmod(hash(lk, lit(67)), lit(9)).cast("double") / 100.0).as("l_tax"),
        element_at(array(lit("A"), lit("N"), lit("R")),
          (pmod(hash(lk, lit(68)), lit(3)) + 1).cast("int")).as("l_returnflag"),
        element_at(array(lit("F"), lit("O")),
          (pmod(hash(lk, lit(69)), lit(2)) + 1).cast("int")).as("l_linestatus"),
        (lit(789004800L) + pmod(hash(lk, lit(70)), lit(2498)) * 86400L)
          .cast("timestamp").as("l_shipdate"))
      .transform { df => save(df, "lineitem"); df }

    // events: the same one-month window at 10× density and 10× users
    range(nEvents).select(col("id").as("event_id"),
        timestamp_micros(lit(1704067200000000L) +
          (u(col("id"), 71) * 2591940.0 * 1e6).cast("long")).as("ts"),
        ui(col("id"), 72, 15000).cast("bigint").as("user_id"),
        pick(col("id"), 73, "click", "error", "purchase", "signup", "view")
          .as("event_type"),
        round(u(col("id"), 74) * 560.0, 2).as("value"),
        format_string("{\"k\": %d}", ui(col("id"), 75, 100)).as("props"))
      .transform { df => save(df, "events"); df }

    // documents: 10..100 tokens over the 31-word vocabulary; en ≈ 2×
    // each other lang; src0..src19; last 0.16% duplicate earlier texts
    // exactly (the planted-dup rate the driver data carries)
    val vocabArr = array(Vocab.map(lit): _*)
    val srcId = col("id") // text seed: duplicates borrow the source row's seed
    val dupOf = when(col("id") >= nDocs - 80, col("id") - (nDocs - 80))
      .otherwise(col("id"))
    val ntok = (pmod(hash(dupOf, lit(81)), lit(91)) + 10).cast("int")
    val text = concat_ws(" ", transform(sequence(lit(0), ntok - 1),
      p => element_at(vocabArr,
        (pmod(hash(dupOf, p, lit(82)), lit(Vocab.length)) + 1).cast("int"))))
    range(nDocs, 8).select(col("id").as("doc_id"),
        text.as("text"),
        element_at(array(lit("en"), lit("en"), lit("de"), lit("es"),
            lit("fr"), lit("zh")),
          (ui(srcId, 83, 6) + 1).cast("int")).as("lang"),
        concat(lit("src"), ui(srcId, 84, 20)).as("source"),
        length(text).cast("bigint").as("n_chars"))
      .transform { df => save(df, "documents"); df }

    // embeddings: label-clustered 64-dim floats — center(label, dim)
    // ±0.3 plus per-vector noise ±0.15, the sf0.1 value envelope
    range(nEmb, 8).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d => (
          (pmod(hash(pmod(col("id"), lit(10)), d, lit(91)), lit(1000))
            .cast("double") / 1000.0 - 0.5) * 0.6 +
          (pmod(hash(col("id"), d, lit(92)), lit(1000))
            .cast("double") / 1000.0 - 0.5) * 0.3
        ).cast("float")).as("embedding"),
        pmod(col("id"), lit(10)).cast("int").as("label"))
      .transform { df => save(df, "embeddings"); df }

    fs.create(done, true).close()
  }
}
