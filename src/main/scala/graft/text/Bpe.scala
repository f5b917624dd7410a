package graft.text

import graft.util.Checkpoints.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed BPE (byte-pair-encoding) merge learning — the tokenizer-
 * training operator of an LLM data pipeline (Sennrich et al. 2016).
 * L108 of the extension set; the reference engine has no counterpart.
 *
 * Classical BPE trains on the WORD-FREQUENCY table, not the corpus:
 * the corpus-scale work is exactly one tokenize+count shuffle
 * ([[wordFrequencies]]); every merge round after that runs over the
 * distinct-word table (orders of magnitude smaller — ~10-100M rows at
 * 100 TB of text), so the sequential merge loop is cheap where it
 * must be sequential.
 *
 * Per round: adjacent-symbol pair counts (map-side explode of the
 * symbol arrays + one aggregation on the pair key), the argmax pair
 * (count desc, then lexicographic (a,b) — a total order, so the
 * learned merge table is deterministic), then a map-side left-to-right
 * non-overlapping merge fold over each word's symbols.
 * `localCheckpoint` after each round cuts the per-round lineage
 * growth (the Clustering.connectedComponents discipline).
 *
 * No end-of-word marker is appended (a production tokenizer adds one
 * symbol per word boundary; the merge math is unchanged).
 *
 * Round-1 pair counts are plain SQL — q146 oracles the top-20 against
 * DuckDB; the multi-round loop is unit-tested against an independent
 * single-machine reference implementation.
 */
object Bpe {

  /** (word, freq) from lowercased alnum tokenization — the only
    * corpus-scale pass (one shuffle on the word key). */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(expr(
        s"filter(split(lower(`$textCol`), '[^a-z0-9]+'), x -> x <> '')")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Character symbols of a word (regex-split keeps a trailing empty
    * string under limit -1 — filtered). */
  def charSymbols(word: Column): Column =
    filter(split(word, ""), x => x =!= lit(""))

  /** Adjacent-pair counts over a (syms: array<string>, freq) word
    * table: (a, b, cnt) summed with the word frequency as weight. */
  def pairCounts(words: DataFrame): DataFrame =
    words.select(col("freq"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Left-to-right non-overlapping merge of adjacent (a, b) into the
    * concatenated symbol — "aaa" under (a,a) becomes ["aa","a"], the
    * BPE apply rule. Pure map-side fold. */
  def mergeAdjacent(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) => {
      val last = element_at(acc, -1)
      when(size(acc) > 0 && last === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s)))
    })

  /** One learned merge: rank (1-based), the pair, its count when
    * chosen. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /**
   * Learn `numMerges` BPE merges from the corpus.
   *
   * Stage split (the HF-tokenizers trainer shape): the CORPUS-scale
   * work is exactly one distributed tokenize+count shuffle
   * ([[wordFrequencies]]); the merge loop then runs IN-MEMORY over the
   * collected word-frequency table — bounded by `maxWords` (top
   * frequencies, deterministic (freq desc, word) cut; the cap is the
   * standard trainer contract and the same bounded-collect class as
   * the k-means sample). The former per-round Spark-job loop
   * ([[learnBySparkRounds]], kept as the parity reference) costs two
   * jobs per merge — fine for tens of merges, absurd for a 50k-merge
   * production vocabulary (100k jobs of pure scheduling overhead); the
   * in-memory loop is incremental (only words CONTAINING the chosen
   * pair recount) with a lazy max-heap argmax, the textbook
   * implementation, and produces the IDENTICAL merge table
   * (count desc, then lexicographic (a, b) — BpeSpec pins three-way
   * parity with the Spark-round loop and an independent reference).
   * Stops early when no adjacent pair remains.
   */
  def learn(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 1 << 20): Seq[Merge] = {
    require(numMerges >= 1)
    // collect one row past the cap: when it arrives, the corpus
    // exceeds maxWords and the merge table may diverge from the
    // full-table trainer (learnBySparkRounds) — say so instead of
    // truncating silently (the tail carries the LOWEST frequencies,
    // so early merges are stable; late low-count merges can differ)
    val rows = wordFrequencies(docs, textCol)
      .orderBy(col("freq").desc, col("word")).limit(maxWords + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (rows.length > maxWords)
      Console.err.println(s"[graft.Bpe] word-frequency table exceeds " +
        s"maxWords=$maxWords — training on the top $maxWords by " +
        "(freq desc, word); merges may diverge from the full-corpus " +
        "trainer. Raise maxWords to silence.")
    learnInMemory(rows.take(maxWords), numMerges)
  }

  /** The in-memory merge loop over a (word, freq) table — exact
    * [[learnBySparkRounds]] semantics (all adjacent positions count,
    * overlap included; argmax by (cnt desc, a, b); left-to-right
    * non-overlapping apply). Incremental: per round, only the words
    * holding the chosen pair update their pair counts; stale heap
    * entries re-validate against the count map on pop. */
  private[text] def learnInMemory(freqs: Array[(String, Long)],
                                  numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val syms: Array[mutable.ArrayBuffer[String]] =
      freqs.map { case (w, _) => mutable.ArrayBuffer(w.map(_.toString): _*) }
    val freq: Array[Long] = freqs.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    // occurrence index: HashSet (NOT BitSet — a BitSet sizes to its
    // max element, so one rare pair in a late word would allocate
    // maxIdx/8 bytes; total HashSet membership is Σ word lengths)
    val occurs = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def addPairs(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val n = counts.getOrElse(p, 0L) + sign * freq(i)
        if (n == 0L) counts.remove(p) else counts.update(p, n)
        if (sign > 0) occurs.getOrElseUpdate(p, mutable.HashSet.empty) += i
        j += 1
      }
    }
    syms.indices.foreach(addPairs(_, 1L))
    // lazy max-heap: entries are (cnt, a, b) snapshots; an entry whose
    // cnt no longer matches the live count map is stale and skipped
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = y._2.compareTo(x._2) // smaller pair = higher priority
          if (a != 0) a else y._3.compareTo(x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    counts.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }
    def applyMergeToWord(i: Int, a: String, b: String): Unit = {
      val s = syms(i)
      // cheap containment check first: occurs can hold stale indices
      var has = false
      var j = 0
      while (!has && j < s.length - 1) {
        if (s(j) == a && s(j + 1) == b) has = true
        j += 1
      }
      if (has) {
        // every pair whose count this call changes is adjacent in the
        // OLD list (decrements) or the NEW list (increments) — both
        // sides must re-enter the heap with their live counts, or a
        // decreased-but-live pair would carry only stale (skipped)
        // entries and never be chosen again
        val touched = mutable.HashSet.empty[(String, String)]
        var t = 0
        while (t < s.length - 1) { touched += ((s(t), s(t + 1))); t += 1 }
        addPairs(i, -1L)
        val out = mutable.ArrayBuffer.empty[String]
        var k = 0
        while (k < s.length) {
          if (k + 1 < s.length && s(k) == a && s(k + 1) == b) {
            out += (a + b); k += 2
          } else { out += s(k); k += 1 }
        }
        syms(i) = out
        addPairs(i, 1L)
        t = 0
        while (t < out.length - 1) { touched += ((out(t), out(t + 1))); t += 1 }
        touched.foreach { p =>
          counts.get(p).foreach(c => heap.enqueue((c, p._1, p._2)))
        }
      }
    }
    val merges = mutable.ArrayBuffer.empty[Merge]
    var round = 1
    var done = false
    while (round <= numMerges && !done) {
      // pop to the first LIVE entry (count matches the map)
      var top: Option[(Long, String, String)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val e = heap.dequeue()
        if (counts.getOrElse((e._2, e._3), 0L) == e._1) top = Some(e)
      }
      top match {
        case None => done = true
        case Some((c, a, b)) =>
          merges += Merge(round, a, b, c)
          val affected = occurs.getOrElse((a, b), mutable.BitSet.empty)
          occurs.remove((a, b))
          affected.foreach(applyMergeToWord(_, a, b))
          round += 1
      }
    }
    merges.toSeq
  }

  /** The original per-round distributed loop (two Spark jobs per
    * merge: pair-count argmax + merge fold). Kept as [[learn]]'s
    * parity reference — identical output, but the job-per-round shape
    * does not survive production merge counts. */
  private[text] def learnBySparkRounds(docs: DataFrame, textCol: String,
                                       numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1)
    var words = wordFrequencies(docs, textCol)
      .select(charSymbols(col("word")).as("syms"), col("freq"))
      .cutLineage()
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var round = 1
    var exhausted = false
    while (round <= numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(round, a, b, c)
        val next = words
          .select(mergeAdjacent(col("syms"), a, b).as("syms"), col("freq"))
          .cutLineage()
        words.unpersist()
        words = next
        round += 1
      }
    }
    words.unpersist()
    out.toSeq
  }

  /** Apply an ordered merge list to one word's symbols (chained
    * folds — test/demo scale; [[encode]] is the production path and
    * this form is its parity reference). */
  def applyMerges(syms: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(syms)((c, m) => mergeAdjacent(c, m.left, m.right))

  /** PRODUCTION encoding: one fused kernel pass per word with the
    * merge table as a shared reference object
    * (graft.functions.BpeEncode) — the chained-fold form compiles one
    * interpreted aggregate() per merge and stops being viable around
    * tens of merges, let alone a 50k-merge vocabulary. Output is
    * identical for tables produced by [[learn]] (a learned pair's
    * symbols always pre-date pairs built from them, so min-rank
    * iteration and rank-order application agree — BpeSpec pins the
    * parity). */
  def encode(syms: Column, merges: Seq[Merge]): Column =
    graft.functions.BpeEncode.bpe_encode(syms,
      merges.sortBy(_.rank).map(m => (m.left, m.right)))

  // ----- BYTE-LEVEL form (GPT-2 / HF ByteLevel — round 16) ----------

  /** GPT-2 pretokenizer chunks of a text column — the byte-level
    * trainer/encoder's corpus-scale split (Java regex; Spark's
    * regexp_extract_all runs Java regex, so the pattern's lookahead
    * works where RE2 would refuse it). */
  def byteLevelChunks(text: Column): Column =
    regexp_extract_all(text, lit(ByteLevel.Gpt2Pattern), lit(0))

  /** Learn byte-level BPE merges — the PRODUCTION GPT-2 training
    * form: the corpus-scale work is ONE pretokenize+count shuffle
    * (chunk frequencies, the classical word-frequency table with
    * GPT-2's chunks as the words), the byte-level alphabet map is
    * applied DRIVER-side to the vocabulary-sized table (the map is a
    * bijection, so counting raw chunks first is exact), and the merge
    * loop is [[learnInMemory]] — merges are over alphabet CHARS, i.e.
    * bytes, so the table covers arbitrary input with no unk. */
  def learnByteLevel(docs: DataFrame, textCol: String, numMerges: Int,
                     maxWords: Int = 1 << 20): Seq[Merge] = {
    require(numMerges >= 1)
    val rows = docs.select(explode(byteLevelChunks(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(maxWords + 1)
      .collect().map(r => (ByteLevel.encode(r.getString(0)), r.getLong(1)))
    if (rows.length > maxWords)
      Console.err.println(s"[graft.Bpe] byte-level chunk table exceeds " +
        s"maxWords=$maxWords — training on the top $maxWords; merges may " +
        "diverge from the full-corpus trainer. Raise maxWords to silence.")
    learnInMemory(rows.take(maxWords), numMerges)
  }

  /** PRODUCTION byte-level encoding of a TEXT column: pretokenize
    * (GPT-2 regex), map each chunk through the byte alphabet (fused
    * codegen kernel), run the BPE kernel per chunk, concatenate —
    * array<string> tokens whose concatenation [[decodeByteLevel]]
    * inverts EXACTLY (merges never cross chunk boundaries, and the
    * chunks partition the text). */
  def encodeByteLevel(text: Column, merges: Seq[Merge]): Column = {
    val pairs = merges.sortBy(_.rank).map(m => (m.left, m.right))
    flatten(transform(byteLevelChunks(text), chunk =>
      graft.functions.BpeEncode.bpe_encode(
        filter(split(
          graft.functions.ByteLevelCodec.byte_level_encode(chunk), ""),
          x => x =!= lit("")),
        pairs)))
  }

  /** ids→text DECODE for byte-level tokens: concatenate and invert
    * the byte alphabet — exact for any encoder output (spec-fuzzed
    * over arbitrary unicode). `tokens` is an array<string> column. */
  def decodeByteLevel(tokens: Column): Column =
    graft.functions.ByteLevelCodec.byte_level_decode(
      concat_ws("", tokens))

  /** Decode for the WORD-BOUNDARY model ([[learn]]/[[encode]]):
    * pieces of one word concatenate back to the word. The word-level
    * trainer tokenizes on `[^a-z0-9]+`, so the separators themselves
    * were never captured — whole-TEXT reconstruction is the
    * byte-level form's contract ([[decodeByteLevel]]); this one
    * restores words, the declared lossy half. */
  def decodeWord(tokens: Column): Column = concat_ws("", tokens)
}
