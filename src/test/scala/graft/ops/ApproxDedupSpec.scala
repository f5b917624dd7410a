package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ApproxDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))

  private lazy val corpus = {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"),
      (2L, "completely different content about distributed query engines and columnar storage formats"),
      (3L, "yet another unrelated document discussing streaming watermarks and stateful aggregation")
    )
    val nearDup = (101L,
      "the quick brown fox jumps over the lazy dog and runs far away into the woods today")
    (base :+ nearDup).toDF("doc_id", "text")
  }

  test("minhash LSH finds the planted near-duplicate pair, not unrelated pairs") {
    val pairs = ApproxDedup.minHashCandidates(corpus, col("doc_id"), toks)
      .filter(col("est_jaccard") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 101L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("est_jaccard is 1.0 for identical docs") {
    val dup = corpus.union(corpus.withColumn("doc_id", col("doc_id") + 1000))
    val got = ApproxDedup.minHashCandidates(dup, col("doc_id"), toks)
      .filter(col("id_b") === col("id_a") + 1000)
      .select("est_jaccard").as[Double].collect()
    assert(got.nonEmpty && got.forall(_ === 1.0))
  }

  test("dropNearDuplicates keeps the smaller id of a near-dup pair") {
    val kept = ApproxDedup.dropNearDuplicates(corpus, col("doc_id"), toks, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L))
  }

  test("degenerate-bucket guard: a bucket past maxBucket contributes no pairs") {
    import org.apache.spark.sql.functions._
    // 40 byte-identical docs -> every band bucket holds all 40; with
    // maxBucket=10 the n^2 pair explosion is skipped entirely (exact
    // dedup is the documented path for clones), while a small planted
    // near-dup pair in its own buckets still surfaces
    val clones = (1 to 40).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog every single day"))
    val pair = Seq(
      (100L, "completely different text about distributed query engines and shuffles"),
      (101L, "completely different text about distributed query engines and shuffles extra"))
    val df = (clones ++ pair).toDF("doc_id", "text")
    val capped = ApproxDedup.minHashCandidates(df, col("doc_id"), toks, maxBucket = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((100L, 101L)))          // real near-dup found
    assert(!capped.exists(p => p._1 <= 40L))       // clone pairs skipped
    val uncapped = ApproxDedup.minHashCandidates(df, col("doc_id"), toks)
      .filter(col("id_a") <= 40).count()
    assert(uncapped === 40L * 39 / 2)              // default cap leaves them
  }

  test("exact jaccard: identical=1, disjoint=0") {
    val sh = corpus.select(col("doc_id"), ApproxDedup.shingles(toks).as("sh"))
    val self = sh.as("a").join(sh.as("b"), col("a.doc_id") === col("b.doc_id"))
      .select(ApproxDedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .as[Double].collect()
    assert(self.forall(_ === 1.0))
    val cross = sh.as("a").join(sh.as("b"),
        col("a.doc_id") === 2L && col("b.doc_id") === 3L)
      .select(ApproxDedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .as[Double].collect().head
    assert(cross === 0.0)
  }

  test("simhash: near-dups at small hamming distance, unrelated docs far") {
    val sims = corpus.select(col("doc_id"), ApproxDedup.simHash32(toks).as("sh"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(101L)) <= 6)
    assert(ham(sims(1L), sims(2L)) > 6)
  }

  test("jaccard matches the composable formulation") {
    def composable(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val da = array_distinct(a)
      val db = array_distinct(b)
      val inter = size(array_intersect(da, db)).cast("double")
      inter / (size(da) + size(db) - inter).cast("double")
    }
    val cases = Seq(
      (Seq("a b c", "b c d", "c d e"), Seq("b c d", "c d e", "x y z")),
      (Seq("a", "a", "b"), Seq("b", "b", "c")),   // dup inputs pre-distinct
      (Seq("only"), Seq("only")),                 // identical singletons
      (Seq("x"), Seq("y")))                       // disjoint
    val df = cases.toDF("a", "b")
    val rows = df.select(
      ApproxDedup.jaccard(col("a"), col("b")).as("fused"),
      composable(col("a"), col("b")).as("comp")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("string shingles match the composable formulation") {
    val w = 3
    def composable(tokens: org.apache.spark.sql.Column) = {
      val n = size(tokens)
      when(n < w, array(concat_ws(" ", tokens)))
        .otherwise(transform(sequence(lit(0), n - w),
          i => concat_ws(" ", slice(tokens, i + lit(1), lit(w)))))
    }
    val cases = Seq(
      Seq("the", "quick", "brown", "fox", "jumps"),
      Seq("one", "two"),   // n < w whole-array shingle
      Seq("solo"),
      Seq.empty[String])   // empty -> [""] both ways
    val df = cases.map(Tuple1(_)).toDF("toks")
    val rows = df.select(
      ApproxDedup.shingles(col("toks"), w).as("fused"),
      composable(col("toks")).as("comp")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("poly shingle hashes match the composable formulation") {
    val w = 3
    val p = 2147483647L
    // the composable form the fused kernel replaced
    def composable(th: org.apache.spark.sql.Column) = {
      val n = size(th)
      def step(acc: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column) =
        pmod(acc * 1000003L + h, lit(p))
      when(n < w, array(aggregate(th, lit(1L), step)))
        .otherwise(transform(sequence(lit(0), n - w),
          i => (0 until w).foldLeft(lit(1L): org.apache.spark.sql.Column)(
            (acc, j) => step(acc, element_at(th, i + lit(j + 1))))))
    }
    val cases = Seq(
      Seq(42L, -17L, 123456789L, 7L, -99L, 3L), // negatives exercise pmod
      Seq(1L, 2L),                              // n < w whole-array mix
      Seq(5L))
    val df = cases.map(Tuple1(_)).toDF("th")
    val rows = df.select(
      ApproxDedup.shingleHashesFromTokenHashes(col("th"), w).as("fused"),
      composable(col("th")).as("comp")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("fused kernels: null elements and non-nullable children are safe") {
    // poly shingles: a null token hash nulls exactly the windows
    // covering it (never silently mixes garbage)
    val sh = Seq(Tuple1(Seq[java.lang.Long](1L, null, 3L, 4L, 5L)))
      .toDF("th")
      .select(ApproxDedup.shingleHashesFromTokenHashes(col("th"), 3))
      .collect().head.getSeq[Any](0)
    assert(sh.length === 3)
    assert(sh(0) == null && sh(1) == null) // windows covering the null
    assert(sh(2) != null)
    // minhash over a null-element array -> NULL signature
    val row = Seq(Tuple1(Seq[java.lang.Long](1L, null)))
      .toDF("hs").select(ApproxDedup.minHashSignature(col("hs")).as("sig"))
      .collect().head
    assert(row.isNullAt(0))
    // non-nullable children (array literals) must still codegen: the
    // expressions declare nullable=true themselves
    val lit1 = spark.range(1).select(
      ApproxDedup.minHashSignature(array(lit(7L), lit(9L))).as("sig"),
      graft.functions.CentroidNegCosines.centroid_neg_cosines(
        array(lit(1.0), lit(0.0)), Seq(1.0, 0.0, 0.0, 1.0), 2, 2).as("cc"))
      .collect().head
    assert(!lit1.isNullAt(0) && !lit1.isNullAt(1))
  }

  test("minhash signature matches independent driver-side computation") {
    val hashes = Seq(42L, -17L, 123456789L, 7L)
    val p = 2147483647L
    // regenerate the same (a, b) params the production path uses
    val rnd = new scala.util.Random(42)
    val params = Seq.fill(32)((1 + rnd.nextInt(Int.MaxValue - 1)).toLong ->
      rnd.nextInt(Int.MaxValue).toLong)
    val expected = params.map { case (a, b) =>
      hashes.map(h => ((h % p) * a + b) % p).min.toInt
    }
    val got = Seq(Tuple1(hashes)).toDF("hs")
      .select(ApproxDedup.minHashSignature(col("hs")))
      .as[Seq[Int]].collect().head
    assert(got === expected)
  }

  test("simhash: column value matches independent driver-side computation") {
    val tokens = Seq("the", "quick", "brown", "fox", "the")
    // reference math: per token murmur, bit i votes +1/-1, sign -> bit
    val expected = {
      val votes = new Array[Int](32)
      tokens.foreach { t =>
        val h = graft.route.SolrHash.hashString(t)
        (0 until 32).foreach { i =>
          votes(i) += (if (((h >> i) & 1) == 1) 1 else -1)
        }
      }
      (0 until 32).map(i => if (votes(i) > 0) 1L << i else 0L).sum
    }
    val got = Seq(tokens).toDF("toks")
      .select(ApproxDedup.simHash32(col("toks"))).as[Long].collect().head
    assert(got === expected)
  }

  test("hamming column expression matches bitCount") {
    val got = Seq((0x0fL, 0x00L)).toDF("a", "b")
      .select(ApproxDedup.hamming(col("a"), col("b"))).as[Long].collect().head
    assert(got === 4)
  }

  test("delta near-dedup drops batch docs that near-duplicate the corpus only") {
    import spark.implicits._
    val mk = (i: Long) =>
      s"document number $i carries some shared vocabulary plus unique token u$i and more filler words"
    val corpus = (1L to 20L).map(i => (i, mk(i))).toDF("doc_id", "text")
    val toks = expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
    val sigs = ApproxDedup.signatureTable(corpus, col("doc_id"), toks)
    val batch = (Seq(
      (101L, mk(5) + " extra"),          // near-dup of corpus doc 5
      (102L, mk(7)),                     // exact text of corpus doc 7
      (103L, "an entirely different new document about query engines and joins"),
      (104L, mk(103) + " nothing like corpus")) // unique id text
      ).toDF("doc_id", "text")
    val kept = ApproxDedup.dropNearDuplicatesAgainst(
        batch, col("doc_id"), toks, sigs, threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(103L, 104L))
  }

  test("delta near-dedup leaves within-batch duplicates for the batch pass") {
    import spark.implicits._
    val corpus = Seq((1L, "completely unrelated corpus document text here"))
      .toDF("doc_id", "text")
    val toks = expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
    val sigs = ApproxDedup.signatureTable(corpus, col("doc_id"), toks)
    val dup = "the same new document repeated twice inside one batch arrival"
    val batch = Seq((10L, dup), (11L, dup)).toDF("doc_id", "text")
    val kept = ApproxDedup.dropNearDuplicatesAgainst(
        batch, col("doc_id"), toks, sigs, threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(10L, 11L)) // both survive the DELTA pass by contract
  }
}
