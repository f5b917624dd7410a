package graft.text

import graft.util.Checkpoints.CutOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text analysis: the reference's `tokenizeText` analyzer command plus
 * the text-pipeline operators a training-data engine needs (language
 * ID, quality scoring, token counting, fingerprinting). All are pure
 * column expressions over built-in functions — whole-stage codegen'd,
 * no UDFs, no per-row interpreter (contrast the reference's
 * row-at-a-time Lucene analyzer chain, TokenizeTextBuilder.java:83-105).
 */
object TextAnalysis {

  /**
   * Lucene's English stopword set (StandardAnalyzer.ENGLISH_STOP_WORDS_SET,
   * public Lucene source) — what the reference's `text_en` field type
   * removes.
   */
  val EnglishStopwords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /**
   * tokenizeText (TokenizeTextBuilder.java:83-105), `text_en` behavior
   * per the reference's own golden test (SolrMorphlineTest.java:52-68):
   * "Hello World!\nFoo@Bar.com #%()123" → [hello, world, foo, bar.com, 123].
   * Rules: lowercase; split on anything that is not [a-z0-9] except
   * dots and apostrophes BETWEEN alphanumerics (StandardTokenizer
   * keeps interior dots and apostrophes, splits at '@'); strip
   * possessive 's (EnglishPossessiveFilter: "john's" -> "john",
   * "don't" stays whole); drop stopwords.
   */
  def tokenize(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = regexp_extract_all(
      lower(text), lit("[a-z0-9]+(?:['.][a-z0-9]+)*"), lit(0))
    // possessive strip + stopword removal fused into one pass
    // (graft.functions.TokenCleanup) — the per-token regexp_replace +
    // isin chain ran interpreted per element; values identical
    // (parity-tested, q10 oracle hash-matches)
    graft.functions.TokenCleanup.token_cleanup(toks, stopwords)
  }

  /** Plain whitespace token count — the cheap "how long is this doc". */
  def whitespaceTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count estimate: alnum runs + punctuation marks
    * each count; long words count ~len/4 pieces (byte-pair intuition). */
  def subwordCountEstimate(text: Column): Column = {
    val words = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    val punct = length(regexp_replace(text, "[a-zA-Z0-9\\s]+", ""))
    // fused Σ max(1, ceil(len/4.0)) — same double division as the
    // composable `/ lit(4)` fold (Spark Divide is always double)
    graft.functions.SubwordEstSum.subword_est_sum(words) + punct
  }

  /**
   * n-gram heuristic language ID: score = stopword hits per language,
   * highest score wins (ties by fixed precedence en>de>fr>es). The
   * word lists are tiny public stopword heads; the operator shape (N
   * parallel scores + argmax, one projection) is what matters at scale.
   */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "ich", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"),
    "es" -> Seq("el", "los", "las", "es", "no", "una", "por", "con", "para", "como"))

  def langScores(tokens: Column): Map[String, Column] =
    // fused set-membership count (graft.functions.ArrayInSetCount) —
    // same value as size(array_intersect(tokens, lit array))
    LangMarkers.map { case (lang, words) =>
      lang -> graft.functions.ArrayInSetCount.in_set_count(tokens, words)
    }

  def languageId(text: Column): Column = {
    val toks = regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))
    val s = langScores(toks)
    val (en, de, fr, es) = (s("en"), s("de"), s("fr"), s("es"))
    // NULL text is explicitly "und" — without the guard, NULL scores
    // make every when-condition NULL and the chain silently falls
    // through to the LAST language (and the historical non-ANSI
    // size(null) = -1 arm gave yet another answer)
    when(text.isNull, lit("und"))
      .when(greatest(en, de, fr, es) === 0, lit("und"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /**
   * Quality scoring (Gopher/C4-style cheap signals): char length, word
   * count, mean word length, punctuation ratio, stopword ratio, and a
   * composite keep/drop flag. All exact-arithmetic column expressions
   * so the DuckDB oracle reproduces them bit-for-bit.
   */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    val nTokens = size(toks)
    val nChars = length(text)
    val nPunct = length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
    val nStop = graft.functions.ArrayInSetCount.in_set_count(toks, EnglishStopwords)
    val meanWordLen = when(nTokens > 0,
      graft.functions.ArrayStrLenSum.str_len_sum(toks)
        .cast("double") / nTokens.cast("double"))
      .otherwise(lit(0.0))
    val punctRatio = when(nChars > 0, nPunct.cast("double") / nChars.cast("double")).otherwise(lit(0.0))
    val stopRatio = when(nTokens > 0, nStop.cast("double") / nTokens.cast("double")).otherwise(lit(0.0))
    val keep = nTokens >= 5 && meanWordLen >= 2.0 && meanWordLen <= 12.0 && punctRatio <= 0.3
    Seq("n_tokens" -> nTokens, "mean_word_len" -> meanWordLen,
      "punct_ratio" -> punctRatio, "stopword_distinct" -> nStop,
      "stopword_ratio" -> stopRatio, "keep" -> keep)
  }

  /**
   * Document fingerprint: normalized-content hash for exact/near-exact
   * dedup at scale (whitespace-collapse + lowercase then md5 — the
   * stable 128-bit id; a rolling/shingled variant lives in
   * ApproxDedup.shingles).
   */
  /**
   * Corpus unigram RARITY scoring — the quality-filter family's
   * "statistical outlier" signal (docs whose tokens are improbable
   * under the corpus unigram model: gibberish, boilerplate soup,
   * wrong-language residue). A true LM perplexity needs `ln`, whose
   * last-ulp behavior varies across libm implementations and would
   * make the score unverifiable bit-for-bit; the add-one-smoothed
   * INVERSE-PROBABILITY MILLI-RATIO `((T + V) * 1000) div (c(t) + 1)`
   * is monotone in the same surprise and stays in exact integer
   * space (T = corpus tokens, V = vocabulary, c = token count).
   *
   * Output per doc: token count, summed rarity (exact BIGINT), and
   * the mean rarity per token (one exact-int division at the end).
   *
   * Scale shape: one token explode feeds BOTH the corpus counts and
   * the per-doc join (Spark reuses the exchange); the 1-row totals
   * frame broadcasts onto the vocabulary; the cost join shuffles on
   * the token key (vocabulary vs occurrences — AQE broadcasts the
   * cost side when it fits); the final per-doc aggregate partial-
   * aggregates map-side. Nothing is driver-collected.
   */
  def unigramRarity(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // tokenize ONCE into an array-per-doc frame, materialized lazily
    // for the query's duration: the vocabulary counts (behind the
    // mint barrier, which blocks exchange reuse) and the per-doc
    // scoring join both explode from it instead of re-running the
    // regex tokenization over the corpus (r17 optimization). LAZY
    // localCheckpoint, NOT persist — persist registers the subtree
    // in the session CacheManager where identical subtrees of
    // UNRELATED queries would substitute it and lose their own scan
    // pushdown; the RDD-backed checkpoint stays query-local. The
    // bench/Verify harness unpersists checkpoint RDDs between
    // queries.
    val base = docs.select(col(idCol), expr(
      s"filter(split(lower(`$textCol`), '[^a-z0-9]+'), x -> x <> '')").as("__l"))
      .cutLineage(false)
    val toks = base.select(col(idCol), explode(col("__l")).as("__t"))
    val counts = toks.groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    // corpus totals as an unpartitioned window over the VOCABULARY
    // frame (not a corpus re-scan, and not a crossJoin back onto the
    // frame's own aggregate — a self-join Spark cannot disambiguate);
    // single-partition is fine at |vocabulary| rows, same shape as
    // SegmentSearch.percentiles
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    // positional toDF between the window projection and the cost
    // arithmetic: Spark 4's resolver reports a spurious self-conflict
    // on `__t` when a select references columns across this window —
    // positional renaming mints unambiguous attributes without
    // resolving names at all
    val costs0 = counts
      .select(col("__t"), col("__c"),
        sum(col("__c")).over(w).as("__T"), count(lit(1)).over(w).as("__V"))
      .toDF("__ct", "__kc", "__kT", "__kV")
      .selectExpr("__ct", "((__kT + __kV) * 1000L) div (__kc + 1) AS __cost")
    // the cost frame still descends from `toks`, so joining it back is
    // a self-join; the RDD round-trip mints fresh attribute ids (the
    // SegmentSearch.rangeFacet barrier trick)
    val costs = docs.sparkSession.createDataFrame(costs0.rdd, costs0.schema)
    toks.join(costs, col("__t") === col("__ct")).drop("__ct")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__cost")).as("rarity_sum"))
      .withColumn("avg_rarity",
        col("rarity_sum").cast("double") / col("n_tokens"))
  }

  /**
   * Bigram-LM rarity (L109) — [[unigramRarity]]'s conditional-
   * probability sibling: per-doc surprise under the corpus bigram
   * model P(cur|prev) = (c(prev,cur)+1) / (c(prev)+V), scored in the
   * same BIT-STABLE integer milli-ratio space (the add-one-smoothed
   * inverse conditional probability ((c(prev)+V)*1000) div
   * (c(prev,cur)+1) is monotone in the same surprise; no libm, no
   * float accumulation). High avg = improbable token transitions —
   * the perplexity-style fluency filter of a training pipeline,
   * without the engine-dependent ln().
   *
   * Shape: bigrams form map-side (zip_with over the token array — no
   * window, no per-doc shuffle); one aggregation on the pair key and
   * one on the token key build the model; the cost join shuffles on
   * the pair key; the per-doc aggregate partial-aggregates map-side.
   * Docs with < 2 tokens have no bigrams and drop out (both engines).
   */
  def bigramRarity(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame = {
    // materialized once for the query's duration: `base` feeds the
    // unigram counts, the bigram-count model AND the final per-doc
    // join, and the mint barrier below blocks exchange reuse between
    // them — this cuts three regex tokenization passes over the
    // corpus to one (r17 optimization; array-per-doc form). LAZY
    // localCheckpoint, not persist, so no CacheManager registration
    // can rewrite unrelated queries' plans (see unigramRarity).
    val base = docs.select(col(idCol), expr(
      s"filter(split(lower(`$textCol`), '[^a-z0-9]+'), x -> x <> '')").as("__l"))
      .cutLineage(false)
    val toks = base.select(explode(col("__l")).as("__t"))
    val uni = toks.groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    val big = base.filter(size(col("__l")) >= 2).select(col(idCol),
        explode(zip_with(
          slice(col("__l"), lit(1), size(col("__l")) - 1),
          slice(col("__l"), lit(2), size(col("__l")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("__p"))
      .select(col(idCol), col("__p.a").as("__a"), col("__p.b").as("__b"))
    val bc = big.groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__cb"))
    // V as an unpartitioned window over the VOCABULARY frame (bounded
    // by |vocabulary|, the unigramRarity discipline), then positional
    // toDF + RDD round-trip to mint fresh attributes for the self-join
    // back onto `big` (same lineage)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val uniV = uni
      .select(col("__t"), col("__c"), count(lit(1)).over(w).as("__V"))
      .toDF("__ut", "__uc", "__uV")
    val costs0 = bc.join(uniV, col("__a") === col("__ut"))
      .selectExpr("__a AS __ca", "__b AS __cb2",
        "((__uc + __uV) * 1000L) div (__cb + 1) AS __cost")
    val costs = docs.sparkSession.createDataFrame(costs0.rdd, costs0.schema)
    big.join(costs, col("__a") === col("__ca") && col("__b") === col("__cb2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__cost")).as("bigram_cost_sum"))
      .withColumn("avg_bigram_cost",
        col("bigram_cost_sum").cast("double") / col("n_bigrams"))
  }

  /** Unicode text canonicalization (L121 corpus hygiene): NFC
    * normalization (composed forms — decomposed "é" == composed "é"
    * BEFORE fingerprints), C0/C1 control characters stripped (except
    * \t\n\r), whitespace runs collapsed, ends trimmed. Run ahead of
    * dedup so byte-level variants of identical text collapse. */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        graft.functions.UnicodeNormalize.unicode_normalize(text, "NFC"),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]", ""),
      "\\s+", " "))

  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Term frequency over a tokenized corpus: explode + count — the
    * inverted-index-ish view of the shard store. */
  def termFrequencies(tokens: Column): Column = explode(tokens)

  /**
   * Repetition signals (Gopher §A1.1-style): the fraction of
   * duplicated words / 2-grams / 3-grams in a document. Boilerplate
   * and spam repeat themselves; high dup fractions are a standard
   * drop criterion in pre-training filters.
   *
   * `tokens` should be a STAGED column (an attribute, not an
   * expression tree) — the n-gram lambdas read it per element.
   * Fraction = 1 - distinct/total as double (0.0 for empty docs);
   * n-grams come from `ApproxDedup.shingles`, whose "< k tokens"
   * fallback (one whole-doc shingle) also yields 0.0 — consistent.
   */
  def repetitionColumns(tokens: Column): Seq[(String, Column)] = {
    def dupFrac(grams: Column): Column = {
      val n = size(grams)
      // (total - distinct)/total with the subtraction on INTEGERS so
      // the only rounding is the final division (bit-equal in DuckDB)
      when(n > 0,
        (n - size(array_distinct(grams))).cast("double") / n.cast("double"))
        .otherwise(lit(0.0))
    }
    Seq(
      "dup_word_frac" -> dupFrac(tokens),
      "dup_2gram_frac" -> dupFrac(graft.ops.ApproxDedup.shingles(tokens, 2)),
      "dup_3gram_frac" -> dupFrac(graft.ops.ApproxDedup.shingles(tokens, 3)))
  }

  /**
   * Winnowing fingerprints (Schleimer/Wilkerson/Aiken): slide a window
   * of `w` over the k-gram shingle hashes, keep each window's minimum,
   * dedup. Guarantees a shared fingerprint for any match of length >=
   * w+k-1 — the standard plagiarism/near-dup signature that, unlike
   * one md5 per doc, localizes partial overlap.
   *
   * Takes the PRE-HASHED shingle array (`ApproxDedup.shingleHashes(
   * ApproxDedup.shingles(tokens, k))` staged as its own column): an
   * expression tree embedded here would be re-evaluated inside the
   * per-window lambda — O(windows × shingles) murmur calls per doc —
   * while an attribute reference is read once per row.
   */
  def winnowingFingerprints(hashedShingles: Column, w: Int = 4): Column =
    // fused kernel (graft.functions.WinnowMinima): one codegen'd pass
    // computing window minima + inline distinct, replacing the
    // interpreted per-window least(element_at...) lambda — same values
    graft.functions.WinnowMinima.winnow_minima(hashedShingles, w)

  /**
   * Gopher §A1.1's OTHER repetition family — [[repetitionColumns]]
   * measures how many grams are duplicated; this measures how much of
   * the document the single MOST FREQUENT n-gram covers: char_frac =
   * count(top gram) · chars(top gram) / chars(all tokens joined) —
   * integer counts, one final division. A spam page that repeats one
   * slogan scores near 1.0 even when its gram-diversity looks fine.
   *
   * Output per doc: (id, top_gram, gram_count, total_chars,
   * top_gram_char_frac). The top gram per doc is chosen by
   * (count desc, gram asc) — a deterministic total order. Shape: one
   * (doc, gram) aggregation, then the per-doc argmax window riding
   * the SAME (partial) partitioning. Docs shorter than n tokens fall
   * back to the whole-doc shingle (fraction 1.0) — consistent with
   * `ApproxDedup.shingles`.
   */
  def topNgramCharFraction(docs: org.apache.spark.sql.DataFrame, idCol: String,
                           textCol: String, n: Int = 2): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col(idCol), expr(
      s"filter(split(lower(`$textCol`), '[^a-z0-9]+'), x -> x <> '')").as("__l"))
      .withColumn("__chars",
        length(concat_ws(" ", col("__l"))).cast("long"))
      .filter(col("__chars") > 0)
    val grams = base.select(col(idCol), col("__chars"),
      explode(graft.ops.ApproxDedup.shingles(col("__l"), n)).as("__g"))
    val counts = grams.groupBy(col(idCol), col("__chars"), col("__g"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__c").desc, col("__g").asc)
    counts.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col("__g").as("top_gram"), col("__c").as("gram_count"),
        col("__chars").as("total_chars"),
        ((col("__c") * length(col("__g")).cast("long")).cast("double")
          / col("__chars").cast("double")).as("top_gram_char_frac"))
  }

  /**
   * Gopher §A1.1 duplicate-LINE signals over a per-doc lines array
   * (Rae et al. 2021: "duplicate line fraction" and "duplicate line
   * character fraction"). Occurrences beyond a line's first count as
   * duplicates; character mass follows the same rule, so a page whose
   * footer repeats 50× scores ~1.0 on both.
   *
   * Pure per-row array expressions (nested lambda: the inner filter
   * captures the outer distinct element) — shuffle-free, all counting
   * in integers with one final division per signal.
   */
  def duplicateLineColumns(lines: Column): Seq[(String, Column)] = {
    val n = size(lines)
    val dupCount = (n - size(array_distinct(lines))).cast("long")
    val totalChars = aggregate(lines, lit(0L), (acc, x) => acc + length(x))
    // Σ over DISTINCT lines of (occurrences - 1) · length
    val dupChars = aggregate(
      transform(array_distinct(lines),
        x => (size(filter(lines, y => y === x)) - 1).cast("long") * length(x)),
      lit(0L), (acc, v) => acc + v)
    Seq(
      "dup_line_frac" ->
        when(n > 0, dupCount.cast("double") / n.cast("double")).otherwise(lit(0.0)),
      "dup_line_char_frac" ->
        when(totalChars > 0, dupChars.cast("double") / totalChars.cast("double"))
          .otherwise(lit(0.0)))
  }

  /**
   * Gopher §A1.1 duplicated-n-gram coverage: the fraction of token
   * positions inside at least one n-gram occurring 2+ times in the
   * doc (span union — overlaps count once). The fused kernel
   * ([[graft.functions.DupNgramCovered]]) does the whole computation
   * in one per-row pass: no (doc, gram) shuffle, O(tokens) per doc —
   * the shape that survives 10k-token documents at corpus scale.
   */
  def dupNgramCoverage(tokens: Column, n: Int): Column = {
    val covered = graft.functions.DupNgramCovered.dup_ngram_covered(tokens, n)
    when(size(tokens) > 0,
      covered.cast("double") / size(tokens).cast("double")).otherwise(lit(0.0))
  }

  /**
   * Lexical diversity: per-row type/token ratio in integer milli
   * space (n_types·1000 div n_tokens — TTR, the vocabulary-richness
   * signal next to the repetition family: low TTR = template/spam
   * text even when no single n-gram repeats enough to trip the
   * Gopher rules). Shuffle-free per-row expressions: the type count
   * is array_distinct on the already-materialized token array, so
   * the whole column fuses into whatever scan or shuffle follows.
   * Returns (n_tokens, n_types, ttr_milli) columns keyed by name.
   */
  /**
   * Structural fingerprint — template detection by SHAPE, not words:
   * md5 over the sequence of token LENGTHS. Two docs generated from
   * the same template (form letters, generated listings, boilerplate
   * with slotted-in names) share the shape even when every slot
   * differs, which content fingerprints and even MinHash miss when
   * the slot density is high. Shuffle-free per-row kernel; group on
   * the output to find template clusters.
   */
  def structureFingerprint(tokens: Column): Column =
    md5(array_join(transform(tokens, t => length(t).cast("string")), ","))

  def lexicalDiversityColumns(tokens: Column): Seq[(String, Column)] = {
    val nTok = size(tokens).cast("long")
    val nTyp = size(array_distinct(tokens)).cast("long")
    Seq(
      "n_tokens" -> nTok,
      "n_types" -> nTyp,
      // floor(double) is exact here: n_types*1000 ≪ 2^53, so the
      // double quotient's floor equals integer div on both engines
      "ttr_milli" -> when(nTok > 0, floor(nTyp * 1000L / nTok).cast("long"))
        .otherwise(lit(0L)))
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2020): score
   * every doc under the corpus LM ([[unigramRarity]]'s bit-stable
   * integer milli surprise — the no-libm perplexity surrogate), then
   * split each LANGUAGE into equal head/middle/tail thirds by score
   * (head = most fluent). CCNet keeps head+middle for pretraining;
   * the bucket boundary is a per-language rank, not a global one, so
   * minority languages are not judged by the majority language's LM
   * scale.
   *
   * Shape: the rarity aggregation's shuffles (token key, doc key) +
   * one window on the language key — partitions are languages, the
   * same bound as every stratified op here. The tercile is exact
   * integer rank math ((rank-1)·3 div n), deterministic under the
   * (score, id) total order, so the assignment replays in any
   * engine.
   */
  def perplexityBuckets(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String, langCol: String): org.apache.spark.sql.DataFrame = {
    // integer div (not `/` — double at rarity_sum·1000 magnitudes
    // would shave low bits above 2^53)
    val scored = unigramRarity(docs, idCol, textCol)
      .withColumn("score_milli", expr("(rarity_sum * 1000L) div n_tokens"))
      .select(col(idCol).as("__sid"), col("score_milli"))
    val withLang = docs.select(col(idCol), col(langCol))
      .join(scored, col(idCol) === col("__sid")).drop("__sid")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol)).orderBy(col("score_milli"), col(idCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(langCol))
    withLang
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("ppl_bucket",
        when((col("__rn") - 1) * 3 < col("__n"), "head")
          .when((col("__rn") - 1) * 3 < col("__n") * 2, "middle")
          .otherwise("tail"))
      .drop("__rn", "__n")
  }

  /**
   * Stupid Backoff trigram LM scoring (Brants et al. 2007 — the
   * "count-based LM at web scale" design this engine's whole L-series
   * follows: no discounting, no normalization, just counts and a
   * fixed backoff penalty α=0.4, which at corpus scale matches
   * Kneser-Ney quality at a fraction of the cost). Per scored
   * position (3rd token onward):
   *
   *   S(c|a,b) = c(abc)·1000 div c(ab)          if the trigram is seen
   *            = 400·S(c|b) div 1000            else if bigram (b,c) seen
   *            = 160·(c(c)·1000 div T) div 1000 else (α² unigram)
   *
   * all in the L-series bit-stable integer milli space (no libm, no
   * float accumulation — the DuckDB oracle replays it value-for-
   * value). High per-doc mean = predictable text; the fluency filter
   * with real context, where [[unigramRarity]] only sees token
   * frequency and [[bigramRarity]] one token of context.
   *
   * The model trains on `modelDocs` and scores `docs` — distinct
   * frames, because a model trained on the scored corpus itself never
   * backs off (every occurring trigram is its own evidence); the
   * usual deployment scores candidate text against a trusted-corpus
   * LM (the CCNet/ccnet-style "target-domain perplexity" filter).
   *
   * Shape at scale: count tables are single aggregations on the gram
   * keys (map-side partial); trigram occurrences LEFT-join the three
   * models on their gram keys (AQE broadcasts model sides that fit;
   * at web scale these are the shuffles any distributed LM pays);
   * the per-doc aggregate partial-aggregates map-side. Docs with
   * fewer than 3 tokens have no scored positions and drop out.
   */
  def stupidBackoffScore(docs: org.apache.spark.sql.DataFrame,
                         modelDocs: org.apache.spark.sql.DataFrame,
                         idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    def tokenized(df: org.apache.spark.sql.DataFrame) =
      df.select(col(idCol), expr(
        s"filter(split(lower(`$textCol`), '[^a-z0-9]+'), x -> x <> '')").as("__l"))
    val base = tokenized(docs)
    // materialize the tokenized MODEL frame once for the query's
    // duration: the three gram tables (c3/c2/c1) each descend from it
    // through their own shuffle, and the mint barrier below blocks
    // exchange reuse, so without this the model corpus re-tokenizes
    // once per table (r17 optimization, guide §1.2 "don't compute
    // things you throw away"; array-per-doc form, far smaller than
    // the exploded token stream). LAZY localCheckpoint, not persist,
    // so no CacheManager registration can rewrite unrelated queries'
    // plans (see unigramRarity).
    val mbase = tokenized(modelDocs).cutLineage(false)
    val toks = mbase.select(explode(col("__l")).as("__t"))
    // trigram occurrences (id, a, b, c) of the SCORED corpus
    val tri = base.filter(size(col("__l")) >= 3).select(col(idCol),
        explode(expr(
          """transform(sequence(1, size(__l) - 2),
            | i -> struct(__l[i-1] AS a, __l[i] AS b, __l[i+1] AS c))""".stripMargin))
          .as("__g"))
      .select(col(idCol), col("__g.a").as("__a"), col("__g.b").as("__b"),
        col("__g.c").as("__c"))
    // model-side gram tables
    val mtri = mbase.filter(size(col("__l")) >= 3).select(
        explode(expr(
          """transform(sequence(1, size(__l) - 2),
            | i -> struct(__l[i-1] AS a, __l[i] AS b, __l[i+1] AS c))""".stripMargin))
          .as("__g"))
      .select(col("__g.a").as("__a"), col("__g.b").as("__b"), col("__g.c").as("__c"))
    val bi = mbase.filter(size(col("__l")) >= 2).select(
        explode(expr(
          """transform(sequence(1, size(__l) - 1),
            | i -> struct(__l[i-1] AS a, __l[i] AS b))""".stripMargin)).as("__p"))
      .select(col("__p.a").as("__ba"), col("__p.b").as("__bb"))
    // model tables — each takes the RDD round-trip to mint fresh
    // attribute ids for the join back onto the same-lineage
    // occurrence frame (the unigramRarity discipline)
    def mint(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
    val c3 = mint(mtri.groupBy(col("__a"), col("__b"), col("__c"))
      .agg(count(lit(1)).as("__c3"))
      .toDF("__3a", "__3b", "__3c", "__c3"))
    val c2 = mint(bi.groupBy(col("__ba"), col("__bb"))
      .agg(count(lit(1)).as("__c2"))
      .toDF("__2a", "__2b", "__c2"))
    val c1 = mint(toks.groupBy(col("__t")).agg(count(lit(1)).as("__c1"))
      .toDF("__1t", "__c1"))
    // corpus total as a broadcast one-row frame (NOT via the c-unigram
    // join — an OOV continuation token would null it out of the
    // fallback's denominator)
    val tot = mint(c1.agg(sum(col("__c1")).as("__T")))
    val c2ab = c2.toDF("__pa", "__pb", "__cab")
    tri
      .join(c3, col("__a") === col("__3a") && col("__b") === col("__3b") &&
        col("__c") === col("__3c"), "left")
      .join(c2ab, col("__a") === col("__pa") && col("__b") === col("__pb"), "left")
      .join(c2, col("__b") === col("__2a") && col("__c") === col("__2b"), "left")
      .join(c1.select(col("__1t").as("__bt"), col("__c1").as("__cb")),
        col("__b") === col("__bt"), "left")
      .join(c1.select(col("__1t").as("__ct"), col("__c1").as("__cc")),
        col("__c") === col("__ct"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("__s",
        when(col("__c3").isNotNull, expr("(__c3 * 1000L) div __cab"))
          .when(col("__c2").isNotNull,
            expr("(400L * ((__c2 * 1000L) div __cb)) div 1000L"))
          .otherwise(expr("(160L * ((coalesce(__cc, 0L) * 1000L) div __T)) div 1000L")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_scored"), sum(col("__s")).as("sb_sum"))
      .withColumn("avg_sb", col("sb_sum").cast("double") / col("n_scored"))
  }
}
