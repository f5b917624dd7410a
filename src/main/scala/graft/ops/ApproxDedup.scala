package graft.ops

import graft.util.Checkpoints.CutOps
import graft.route.SolrHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Near-duplicate detection for training-data pipelines: MinHash+LSH,
 * SimHash, and n-gram Jaccard, built scale-first:
 *
 *  - signatures are computed map-side as pure column expressions
 *    (higher-order functions over token arrays — codegen'd, no UDFs);
 *  - candidate generation is an equi-join on LSH band keys (a hash
 *    shuffle on small keys, never an O(n²) cross join);
 *  - verification runs only on candidate pairs.
 *
 * At 100 TB the only all-to-all movement is the band-key shuffle whose
 * payload is (band_key, doc_id, signature) — a few hundred bytes/doc —
 * while document bodies stay columnar in place.
 *
 * The token hash reuses graft's Solr murmur3 (SolrHash) so signatures
 * are deterministic across runs/engines.
 */
object ApproxDedup {

  /** `w`-shingles (word n-grams) of a token array — fused kernel
    * (graft.functions.StringShingles), replacing the interpreted
    * per-window concat_ws(slice) lambda with one codegen'd pass;
    * identical strings (parity-tested). */
  def shingles(tokens: Column, w: Int = 3): Column =
    graft.functions.StringShingles.string_shingles(tokens, w)

  private def hashCol(c: Column): Column = {
    import graft.route.GraftColumns
    GraftColumns.of(graft.route.SolrMurmurHash(GraftColumns.expr(c)))
  }

  /** Murmur-hash every shingle once (array<long>) — the ONLY place the
    * string hash runs; all minhash functions derive from this array. */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => hashCol(s).cast("long"))

  /** Murmur-hash each TOKEN once (array<long>). */
  def tokenHashes(tokens: Column): Column =
    transform(tokens, t => hashCol(t).cast("long"))

  /**
   * Shingle hashes from PRE-HASHED tokens (an attribute column, not an
   * expression tree — see the lambda-recompute trap in minHashCandidates):
   * the w token hashes of each window combine arithmetically
   * (polynomial rolling mix), so no shingle string is ever built and
   * no murmur runs per window — string hashing is O(tokens), shingling
   * is pure integer work. Same near-dup behavior as string shingles
   * (both are exact-match fingerprints of the w-gram).
   */
  def shingleHashesFromTokenHashes(tokenHashCol: Column, w: Int = 3): Column =
    // fused kernel (graft.functions.PolyShingleHashes): one codegen'd
    // pass replacing the interpreted per-window foldLeft of element_at
    // reads + pmod steps — identical values (see kernel parity notes)
    graft.functions.PolyShingleHashes.poly_shingles(tokenHashCol, w)

  private[graft] def hashParams(numHashes: Int, seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((1 + rnd.nextInt(Int.MaxValue - 1)).toLong ->
      rnd.nextInt(Int.MaxValue).toLong)
  }

  /**
   * MinHash signature via the standard universal-hash family
   * h_i(x) = (a_i*x + b_i) mod p (p = 2^31 - 1), i < numHashes, over a
   * PRE-HASHED shingle array (shingleHashes): each of the numHashes
   * passes is then pure integer arithmetic over the array — the
   * expensive string murmur runs once per shingle, not numHashes
   * times. Returns array<int> of length numHashes.
   */
  def minHashSignature(hashedShingles: Column, numHashes: Int = 32, seed: Int = 42): Column = {
    // fused single-pass kernel (graft.functions.MinHashSignatureExpr):
    // the per-function aggregate form traversed the array numHashes
    // times in interpreted lambdas; this walks it once in codegen,
    // same values (see the expression's parity notes + spec)
    val params = hashParams(numHashes, seed)
    graft.functions.MinHashSignatureExpr.minhash_sig(
      hashedShingles, params.map(_._1), params.map(_._2))
  }

  /**
   * LSH banding: split the signature into `bands` bands of `rowsPerBand`
   * and emit one (band_id, band_key) per band. Docs sharing any band
   * key are near-dup candidates.
   */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        hashCol(concat_ws("_", slice(signature, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)))).as("key")))

  /**
   * End-to-end MinHash LSH near-dup candidate pairs over (id, tokens):
   * signature → bands → self-join on (band, key) → distinct pairs with
   * estimated Jaccard (signature agreement). Keeps `id < id2` to halve
   * the pair space.
   *
   * RECALL CAVEAT — `maxBucket`: LSH buckets holding more than
   * `maxBucket` docs are dropped entirely (no pairs emitted for
   * them). Such buckets only arise from near-identical clone swarms,
   * which an EXACT fingerprint dedup collapses linearly — so the cap
   * loses nothing WHEN an exact-dedup pass also runs (CorpusPipeline's
   * default ordering). Calling this standalone with no exact dedup
   * upstream means members of an over-cap bucket are never reported as
   * candidates; pass `maxBucket = Int.MaxValue` to disable the guard
   * (and accept the n²/2 pair cost per giant bucket).
   */
  def minHashCandidates(df: DataFrame, id: Column, tokens: Column,
                        numHashes: Int = 32, bands: Int = 8,
                        maxBucket: Int = 10000): DataFrame =
    minHashCandidatesWithSig(df, id, tokens, numHashes, bands, maxBucket)._1

  /** [[minHashCandidates]] plus the PERSISTED signature frame backing
    * it, so a consumer that materializes the candidates can
    * `unpersist` the signatures instead of leaking them for the
    * session's lifetime ([[dropNearDuplicates]] does exactly that). */
  private[graft] def minHashCandidatesWithSig(
      df: DataFrame, id: Column, tokens: Column,
      numHashes: Int = 32, bands: Int = 8,
      maxBucket: Int = 10000): (DataFrame, DataFrame) = {
    val rows = bandRows(numHashes, bands)
    // signatures are tiny (numHashes ints per doc): persist them so the
    // LSH self-join below reads them twice instead of recomputing the
    // tokenize→shingle→hash pipeline on both sides (the staging
    // discipline itself lives in signatureTable — ONE definition).
    val sig = signatureTable(df, id, tokens, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val allBanded = sig.select(col("id"), col("sig"),
      explode(lshBands(col("sig"), bands, rows)).as("b"))
      .select(col("id"), col("sig"), col("b.band"), col("b.key"))
    // degenerate-bucket guard: a bucket of n (near-)identical docs
    // contributes n²/2 candidate pairs — one boilerplate page crawled
    // 100k times would put 5e9 pairs through ONE join key. Buckets
    // past `maxBucket` are dropped: their members are exact/near-exact
    // clones that the EXACT dedup pass (fingerprint groupBy — linear)
    // collapses, so skipping their quadratic LSH pairs loses nothing.
    // The size check is a COUNT window over (band, key) — the
    // self-join's own partitioning, so Catalyst plans one exchange
    // that both the window and the join reuse; the earlier
    // groupBy+filter-join form shuffled a second aggregate alongside
    // the self-join and cost q54 ~50% extra wall-clock at sf0.1.
    val banded = allBanded
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
    // estimate BEFORE dedup so the distinct hashes three scalars per
    // pair instead of two 32-int signature arrays (pairs colliding in
    // several bands carry identical sigs, hence identical estimates)
    // agreement count fused (graft.functions.ArrayEqCount) — this runs
    // once per CANDIDATE PAIR, the join's hottest row count; the
    // division keeps the composable form's exact float op
    val pairs = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        (graft.functions.ArrayEqCount.array_eq_count(col("l.sig"), col("r.sig"))
          .cast("double") / lit(numHashes.toDouble))
          .as("est_jaccard"))
      .distinct()
    (pairs, sig)
  }

  /**
   * Exact n-gram Jaccard similarity for candidate pairs (the verify
   * step after LSH, or standalone for small corpora): |A∩B| / |A∪B|
   * over distinct shingles.
   */
  def jaccard(shinglesA: Column, shinglesB: Column): Column =
    // fused kernel (graft.functions.JaccardSimilarity): hash-set
    // intersection instead of three allocated intermediate arrays per
    // pair; identical values (integer cardinalities, same division) —
    // parity-tested and oracle-verified (q24/q56 hash-match)
    graft.functions.JaccardSimilarity.jaccard_sim(shinglesA, shinglesB)

  /**
   * SimHash (64→32-bit variant): per token hash, each bit votes +1/-1
   * weighted by term frequency; the sign vector is the fingerprint.
   * Near-dups differ in few bits (hamming distance). Pure column
   * expressions, SINGLE pass: one aggregate carries all 32 bit
   * counters (zip_with against a mask array), so each token is hashed
   * and visited once — the naive per-bit formulation (32 aggregates,
   * each re-evaluating the token-hash transform) does 32× the work.
   */
  def simHash32(tokens: Column): Column = {
    val masks = array((0 until 32).map(i => lit(1 << i)): _*)
    val bitVals = array((0 until 32).map(i => lit(1L << i)): _*)
    val votes = aggregate(
      transform(tokens, t => hashCol(t)),
      array((0 until 32).map(_ => lit(0)): _*),
      (acc, h) => zip_with(acc, masks,
        (a, m) => a + when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, bitVals, (v, b) => when(v > 0, b).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc + b)
  }

  /**
   * The (id, sig) MinHash signature table of a corpus — the
   * INCREMENTAL-DEDUP STATE (L117): compute once over the existing
   * corpus, persist as a table, and every new batch deduplicates
   * against it via [[dropNearDuplicatesAgainst]] without the corpus
   * ever reshuffling its documents (signatures are numHashes ints per
   * doc — the only thing that moves). Store it bucketed by band key
   * to eliminate even the signature shuffle per batch.
   */
  /** Banding arithmetic, VALIDATED: bands must tile numHashes exactly.
    * `numHashes / bands == 0` would band nothing (every doc in one
    * bucket per band -> near-dedup silently finds zero duplicates),
    * and a remainder would silently ignore trailing signature
    * positions. */
  private[graft] def bandRows(numHashes: Int, bands: Int): Int = {
    require(bands >= 1 && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) exactly")
    numHashes / bands
  }

  def signatureTable(df: DataFrame, id: Column, tokens: Column,
                     numHashes: Int = 32): DataFrame =
    df.select(id.as("id"), tokenHashes(tokens).as("__th"))
      .select(col("id"), shingleHashesFromTokenHashes(col("__th")).as("hs"))
      .select(col("id"), minHashSignature(col("hs"), numHashes).as("sig"))

  /**
   * Delta near-dedup: drop NEW docs that near-duplicate the existing
   * corpus (its [[signatureTable]]) — the growing-corpus shape where
   * re-running corpus-wide dedup per batch would be quadratic over
   * the pipeline's lifetime. Banded equi-join of the batch's
   * signatures against the corpus's (band-key shuffle ∝ corpus
   * SIGNATURES + batch, never document bodies), est-Jaccard verify at
   * `threshold`, anti-join of the loser set. The degenerate-bucket cap
   * applies to the corpus side (the side that can carry a crawled
   * clone swarm). Within-batch duplicates are NOT touched — compose
   * with [[dropNearDuplicates]] for the batch-internal pass.
   */
  def dropNearDuplicatesAgainst(newDocs: DataFrame, id: Column, tokens: Column,
                                corpusSigs: DataFrame, threshold: Double = 0.8,
                                numHashes: Int = 32, bands: Int = 8,
                                maxBucket: Int = 10000): DataFrame = {
    val rows = bandRows(numHashes, bands)
    def banded(sigs: DataFrame): DataFrame =
      sigs.select(col("id"), col("sig"),
          explode(lshBands(col("sig"), bands, rows)).as("b"))
        .select(col("id"), col("sig"), col("b.band"), col("b.key"))
    val corpusBanded = banded(corpusSigs)
      .withColumn("__bn",
        count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
      .toDF("cid", "csig", "band", "key")
    // newSigs feeds exactly one consumer (the banded join) — no cache;
    // the loser set is localCheckpoint'ed: materialized AND truncated,
    // and its blocks are GC-reclaimed once the returned frame dies,
    // instead of sitting in executor storage for the session's
    // lifetime (this is the per-ingest-batch API — a persist here
    // leaks one loser frame per batch)
    val newSigs = signatureTable(newDocs, id, tokens, numHashes)
    val losers = banded(newSigs).join(corpusBanded, Seq("band", "key"))
      .filter(
        graft.functions.ArrayEqCount.array_eq_count(col("sig"), col("csig"))
          .cast("double") / lit(numHashes.toDouble) >= threshold)
      .select(col("id").as("__loser")).distinct()
      .cutLineage(true)
    newDocs.join(losers, id === col("__loser"), "left_anti")
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * Near-dup grouping: connected components are overkill for dedup —
   * the standard trick is "keep the min id per band bucket cluster",
   * iterated once: a doc is dropped if any candidate pair names it as
   * the larger id with similarity >= threshold.
   *
   * RECALL CAVEAT — `maxBucket` (see [[minHashCandidates]]): docs in
   * an LSH bucket larger than `maxBucket` generate no candidate pairs,
   * so a >maxBucket swarm of near-identical-but-not-byte-identical
   * docs is KEPT in full by this standalone call. Run an exact
   * fingerprint dedup first (as CorpusPipeline does), or pass
   * `maxBucket = Int.MaxValue` to trade the quadratic pair cost for
   * full recall.
   */
  def dropNearDuplicates(df: DataFrame, id: Column, tokens: Column,
                         threshold: Double = 0.8, numHashes: Int = 32,
                         bands: Int = 8, maxBucket: Int = 10000): DataFrame = {
    val (cand, sig) = minHashCandidatesWithSig(df, id, tokens, numHashes, bands, maxBucket)
    // localCheckpoint: materializes the (small) loser set so the sig
    // cache can be released, AND the checkpoint blocks are themselves
    // GC-reclaimed when the returned frame dies — a persist here would
    // outlive the call for the session's lifetime
    val losers = cand
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_b").as("__loser")).distinct()
      .cutLineage(true)
    sig.unpersist()
    df.join(losers, id === col("__loser"), "left_anti")
  }
}
