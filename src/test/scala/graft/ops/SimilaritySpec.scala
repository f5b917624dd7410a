package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("brute-force cosine top-k on the embeddings table: sane and self-consistent") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
    val got = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 4)
    val rows = got.collect()
    assert(rows.length === 12) // 3 queries * 4 neighbors
    // cosine within [-1, 1]; ranks descending in cosine per query
    rows.foreach(r => assert(math.abs(r.getAs[Double]("cosine")) <= 1.0 + 1e-9))
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      val cosines = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cosines === cosines.sorted.reverse)
    }
  }

  test("hyperplane signature expression matches the composable formulation") {
    val dim = 8; val numBits = 5; val seed = 42L
    // the composable form the expression replaced: literal plane
    // arrays, array_dot per bit, sign -> bit value, summed
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(numBits, dim)(rnd.nextGaussian())
    val composable = (0 until numBits).map { i =>
      val plane = array(planes(i).map(v => lit(v)): _*)
      when(graft.functions.ArrayDotProduct.array_dot(
          col("v").cast("array<double>"), plane) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val vecs = Seq.tabulate(20)(i =>
      (i.toLong, Array.tabulate(dim)(j => math.sin(i * 31 + j).toFloat)))
      .toDF("vec_id", "v")
    val rows = vecs.select(
      Similarity.hyperplaneSignature(col("v"), dim, numBits, seed).as("expr_sig"),
      composable.as("comp_sig")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // dim mismatch -> signature 0, matching the composable fallthrough
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "v")
      .select(Similarity.hyperplaneSignature(col("v"), dim, numBits, seed))
      .as[Long].collect().head
    assert(bad === 0L)
  }

  test("centroid neg-cosines expression matches the composable formulation") {
    val dim = 6; val nlist = 3
    val cents = Array(
      Array(1.0, 0.5, -0.25, 2.0, 0.0, 1.5),
      Array(-1.0, 1.0, 0.75, 0.5, 2.5, -0.5),
      Array(0.25, -2.0, 1.0, 1.0, 0.5, 0.75))
    val composable = array(cents.map { c =>
      -Similarity.cosine(col("v").cast("array<double>"),
        array(c.map(lit).toIndexedSeq: _*))
    }.toIndexedSeq: _*)
    val fused = graft.functions.CentroidNegCosines.centroid_neg_cosines(
      col("v").cast("array<double>"), cents.flatten.toIndexedSeq, nlist, dim)
    val rows = Seq.tabulate(10)(i =>
      (i.toLong, Array.tabulate(dim)(j => math.cos(i * 17 + j).toFloat)))
      .toDF("vec_id", "v")
      .select(fused.as("f"), composable.as("c")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Double](0) === r.getSeq[Double](1)) // bit-identical
    }
  }

  test("an exact duplicate vector is the top-1 neighbor with cosine ~1") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
    val clone = emb.filter(col("vec_id") === 0).withColumn("vec_id", lit(99999L))
    val corpus = emb.unionByName(clone)
    val top = Similarity.bruteForceTopK(corpus, emb.filter(col("vec_id") === 0), k = 1)
      .collect().head
    assert(top.getAs[Long]("corpus_id") === 99999L)
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("IVF ANN recall@5 vs brute force; probing more cells helps") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    def recallAt(nprobe: Int): Double = {
      val approx = Similarity.ivfTopK(emb, queries, k = 5, dim = 64, nprobe = nprobe)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val r8 = recallAt(8)
    assert(r8 >= 0.4, s"recall@nprobe=8 = $r8")
    assert(recallAt(16) === 1.0) // probing every cell == exact
  }

  test("embedding near-dup pairs: symmetric-free (a<b), thresholded") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
    val pairs = Similarity.nearDupPairsExact(emb, 0.4).collect()
    assert(pairs.length === 66) // counted offline on the sf0.001 table
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cosine") >= 0.4)
    }
  }

  test("embedding self-dedup (shuffle LSH path): drops planted clones, never over-drops") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
    val clones = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 100000L)
    val corpus = emb.unionByName(clones)
    val kept = Similarity.dropNearDuplicatesByEmbedding(corpus, 0.999, dim = 64)
      .select("vec_id").as[Long].collect().toSet
    // identical vectors collide in every LSH table, so each planted
    // clone (the larger id of its pair) is guaranteed dropped
    assert((100000L until 100005L).forall(id => !kept.contains(id)), kept.toSeq.sorted.takeRight(10))
    assert((0L until 5L).forall(kept.contains))
    // LSH candidates are a subset of all pairs at the same threshold,
    // so everything the EXACT dedup keeps the LSH dedup keeps too
    val exactLosers = Similarity.nearDupPairsExact(corpus, 0.999)
      .select(col("id_b")).as[Long].collect().toSet
    val keptExact = corpus.select("vec_id").as[Long].collect().toSet -- exactLosers
    assert(keptExact.subsetOf(kept))
  }

  test("lshSelfPairs: shuffle-only plan, no broadcast of the corpus (100 TB shape)") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // with auto-broadcast off, any BroadcastExchange left in the plan
      // could only come from an explicit broadcast() hint — the exact
      // thing this path exists to avoid
      val p = Similarity.lshSelfPairs(emb, dim = 64)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastExchange"), p.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("LSH ANN recall@5 >= 0.5 vs brute force on the embeddings table") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, k = 5, dim = 64)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("int8 quantization: |error| <= scale/2 per element; zero vector safe") {
    val df = Seq(
      (1L, Seq(0.5, -1.0, 0.25, 0.127)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0))
    ).toDF("vec_id", "v")
      .withColumn("scale", Similarity.int8Scale(col("v")))
      .withColumn("q", Similarity.quantizeInt8(col("v"), col("scale")))
    val rows = df.collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    val scale = r1.getDouble(2)
    val v = r1.getSeq[Double](1)
    val q = r1.getSeq[Int](3)
    assert(scale === 1.0 / 127)
    v.zip(q).foreach { case (x, qi) =>
      assert(math.abs(x - qi * scale) <= scale / 2 + 1e-12)
      assert(qi >= -127 && qi <= 127)
    }
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getDouble(2) === 0.0)
    assert(r2.getSeq[Int](3) === Seq(0, 0, 0, 0))
  }

  test("two-stage ANN == brute force when the shortlist covers the corpus") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
    val n = emb.count().toInt
    val exact = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 5)
      .select("query_id", "rank", "corpus_id").as[(Long, Int, Long)].collect().toSet
    val staged = Similarity.twoStageTopK(emb, emb.filter(col("vec_id") < 3),
        coarseDims = 16, shortlist = n, k = 5)
      .select("query_id", "rank", "corpus_id").as[(Long, Int, Long)].collect().toSet
    assert(staged === exact)
  }

  test("two-stage ANN: coarse stage beats a random shortlist by far") {
    // the synthetic embeddings are isotropic — no matryoshka head-energy
    // concentration — so 16/64 dims carry ~25% of the signal and recall
    // is information-bounded. A random 40-of-500 shortlist gives 8%
    // expected recall; the coarse stage must do several times better.
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
    val exact = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val staged = Similarity.twoStageTopK(emb, emb.filter(col("vec_id") < 5),
        coarseDims = 16, shortlist = 40, k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect staged).size.toDouble / exact.size
    assert(recall >= 0.25, s"recall=$recall (random baseline 0.08)")
  }

  test("semanticDedup: duplicate pair in one bucket marks the higher id") {
    import spark.implicits._
    // v1 ~ v2 (cos ~ 1, same sign bucket), v3 orthogonal-ish sign flip
    val df = Seq(
      (1L, Seq(1.0f, 1.0f, 0.5f, 0.1f, 0.2f, 0.3f, 0.1f, 0.4f)),
      (2L, Seq(0.9f, 1.1f, 0.5f, 0.1f, 0.2f, 0.3f, 0.1f, 0.4f)),
      (3L, Seq(-1.0f, 1.0f, -0.5f, 0.1f, 0.2f, 0.3f, 0.1f, 0.4f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(df, threshold = 0.9, bits = 8)
      .orderBy("vec_id")
      .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toSeq
    assert(got === Seq((1L, false), (2L, true), (3L, false)))
  }

  test("semanticDedup: near-identical vectors in DIFFERENT buckets both survive (the recall trade)") {
    import spark.implicits._
    // sign of dim 1 differs -> different buckets despite cos ~ 1
    val df = Seq(
      (1L, Seq(0.001f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f)),
      (2L, Seq(-0.001f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(df, threshold = 0.5, bits = 8)
      .select("is_dup").as[Boolean].collect().toSeq
    assert(got === Seq(false, false))
  }

  test("semanticDedupIvf: identical vectors share a trained cell; higher ids marked") {
    import spark.implicits._
    val v1 = (1 to 8).map(_.toFloat)
    val v2 = (1 to 8).map(i => -i.toFloat)
    val df = (Seq((1L, v1), (2L, v1), (3L, v2)) ++
      (10L to 29L).map(i => (i, (1 to 8).map(j => ((i * 7 + j) % 11).toFloat - 5f))))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDedupIvf(df, threshold = 0.999, dim = 8, nlist = 4)
      .filter(col("vec_id") <= 3).orderBy("vec_id")
      .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toSeq
    // 1 and 2 are identical -> same nearest centroid, 2 marked; 3 is
    // the antipode -> never cos >= 0.999 with anything
    assert(got === Seq((1L, false), (2L, true), (3L, false)))
  }

  test("semanticDedup: keep-lowest-id representative never marked, max over priors reported") {
    import spark.implicits._
    val v = Seq(1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f)
    val df = Seq((10L, v), (20L, v), (30L, v)).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(df, threshold = 0.99, bits = 8)
      .orderBy("vec_id")
      .select("vec_id", "is_dup", "max_prior_cos_r")
      .as[(Long, Boolean, Option[Double])].collect().toSeq
    assert(got === Seq(
      (10L, false, None), (20L, true, Some(1.0)), (30L, true, Some(1.0))))
  }

  test("trained centroids find the near-dup pair axis-sign buckets " +
      "SPLIT: a tight cluster straddling a sign boundary lands in one " +
      "k-means cell (the data-adaptive win SemDeDup's published form " +
      "buys)") {
    import spark.implicits._
    // cluster A straddles dim-1's sign (cos(1,2) ~ 0.99997); cluster B
    // sits far away so k=2 Lloyd separates A from B, never A itself
    val df = Seq(
      (1L, Seq(0.01, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)),
      (2L, Seq(-0.01, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)),
      (3L, Seq(5.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0)),
      (4L, Seq(5.5, -1.1, -1.1, -1.1, -1.1, -1.1, -1.1, -1.1))
    ).toDF("vec_id", "embedding")
    // the sign stand-in splits the pair across buckets — both survive
    val sign = Similarity.semanticDedup(df, threshold = 0.95, bits = 4)
      .filter(col("vec_id") <= 2).orderBy("vec_id")
      .select("is_dup").as[Boolean].collect().toSeq
    assert(sign === Seq(false, false),
      "axis-sign buckets unexpectedly co-bucketed the straddling pair")
    // trained cells keep the cluster together — id 2 marks as the dup
    val trained = Similarity.semanticDedupIvf(df, threshold = 0.95,
        dim = 8, nlist = 2, sampleSize = 4)
      .orderBy("vec_id")
      .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toSeq
    assert(trained === Seq((1L, false), (2L, true), (3L, false), (4L, true)))
  }

  test("matryoshka two-stage: a corpus-covering rerank is EXACT vs " +
      "brute force (prefix stage only reorders candidates), k rows " +
      "per query, and prefix recall holds at the operating point") {
    val base = graft.Tables.embeddings(spark, graft.TestSpark.sf)
      .filter(col("vec_id") < 200)
    val queries = base.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sorted.toSeq
    val exact = rows(Similarity.bruteForceTopK(base, queries, 5))
    assert(rows(Similarity.matryoshkaTopK(base, queries, k = 5,
      rerank = 300, prefixDim = 16)) === exact,
      "corpus-covering rerank must equal brute force")
    // the operating point: quarter-dim candidates, 32 re-ranked
    val approx = Similarity.matryoshkaTopK(base, queries, k = 5,
        rerank = 32, prefixDim = 16)
      .select("query_id", "corpus_id")
    val recall = RankingEval.annRecallAtK(
        Similarity.bruteForceTopK(base, queries, 5)
          .select("query_id", "corpus_id"), approx, 5)
      .agg(expr("sum(recall_milli) div count(1)")).head.getLong(0)
    assert(recall >= 600L, s"prefix-stage recall $recall under the floor")
  }

  test("matryoshka zero-prefix guard: a corpus row whose first " +
      "prefixDim dims are all zero must not seize candidate slots " +
      "(NaN sorts above every real double in Spark)") {
    import spark.implicits._
    // 4-dim vectors, prefixDim 2; id 9's prefix is all-zero
    val corpus = Seq(
      (1L, Seq(1.0, 0.1, 0.0, 0.0)), (2L, Seq(0.9, 0.2, 0.1, 0.0)),
      (3L, Seq(0.8, 0.3, 0.0, 0.1)), (9L, Seq(0.0, 0.0, 5.0, 5.0)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(1.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    // rerank 2: only 2 candidate slots — a NaN pcos on id 9 would
    // have taken one and pushed a real neighbor out
    val got = Similarity.matryoshkaTopK(corpus, queries, k = 2,
        rerank = 2, prefixDim = 2)
      .select("corpus_id").as[Long].collect().toSet
    assert(!got.contains(9L), "zero-prefix row seized a candidate slot")
    assert(got === Set(1L, 2L))
  }
}
