package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unigram-LM (SentencePiece) tokenizer training — the OTHER tokenizer
 * modern stacks train (T5/Gemma/LLaMA-family via SentencePiece train
 * unigram as often as BPE; Kudo 2018). Sits on the exact substrate
 * [[Bpe]] established: the corpus-scale work is ONE tokenize+count
 * shuffle ([[Bpe.wordFrequencies]]); seeding, EM and pruning run over
 * the collected word-frequency table (the HF/SentencePiece trainer
 * shape — the table is ~10-100M rows at 100 TB of text, the cap makes
 * it driver-bounded like the k-means sample).
 *
 * Protocol (deterministic end to end):
 *
 *  - SEED ([[seedVocab]] / [[seedInMemory]]): all substrings up to
 *    `maxPieceLen` of the word table, counted freq-weighted; keep the
 *    top `seedSize` by (cnt desc, piece asc) UNION every single
 *    character (coverage — a vocabulary that cannot spell a word
 *    breaks Viterbi). SentencePiece seeds from suffix-array frequent
 *    substrings; the count-ranked cut is the same idea without the
 *    ESA machinery.
 *  - SCORES: piece log-probabilities in INTEGER MILLI space —
 *    `floor(ln(cnt / total) * 1000 + 0.5)` (floor(x+0.5) has identical
 *    semantics in the JVM and DuckDB where round() differs on negative
 *    halves) — so Viterbi sums are exact integer comparisons, bit-
 *    stable across engines (the q142/q147 discipline).
 *  - E-STEP ([[viterbi]]): per word, the max-score segmentation under
 *    the current scores; ties broken by the lexicographically smallest
 *    segmentation string (space-joined). The tie-break is prefix-
 *    composable — two segmentations of the same prefix contain the
 *    same non-space characters, so neither can be a string-prefix of
 *    the other and appending a common suffix preserves order — which
 *    makes the DP argmax equal the global argmax (fuzz-locked against
 *    a full enumeration in UnigramSpec).
 *  - M-STEP: expected piece counts (freq-weighted Viterbi uses);
 *    single characters floor at count 1 (never starve coverage).
 *  - PRUNE ([[learnInMemory]]): after each EM round drop the
 *    lowest-expected-count quarter of the multi-char pieces until
 *    `vocabSize` remains (SentencePiece prunes by likelihood loss;
 *    expected-count pruning is the standard simplification, and the
 *    determinism contract — (cnt asc, piece desc) drop order — is
 *    what the oracle discipline needs).
 *
 * Oracles: q310 replays the seed vocabulary in DuckDB; q311 replays
 * the first E-step by ENUMERATING every segmentation of the top words
 * in a recursive CTE and taking the same (score desc, seg asc) argmax
 * — two independent implementations of the DP contract; q312 replays
 * the M-step re-estimate over those segmentations.
 */
object Unigram {

  /** Freq-weighted counts of all substrings up to `maxPieceLen` —
    * distributed (one explode + one aggregation over the word table). */
  def substringCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), s ->
           |  transform(sequence(s, least(length(word), s + ${maxPieceLen - 1})),
           |    e -> substring(word, s, e - s + 1))))""".stripMargin))
        .as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** Seed vocabulary: top `seedSize` substrings by (cnt desc, piece)
    * UNION all single characters (with their counts) — the coverage
    * guarantee. Distributed form of [[seedInMemory]] (q310 oracle). */
  def seedVocab(words: DataFrame, seedSize: Int,
                maxPieceLen: Int = 4): DataFrame = {
    val subs = substringCounts(words, maxPieceLen)
    subs.orderBy(col("cnt").desc, col("piece")).limit(seedSize)
      .unionByName(subs.filter(length(col("piece")) === 1))
      .distinct()
  }

  /** Piece log-prob in integer milli space. floor(x + 0.5), NOT
    * round(): Math.round and DuckDB round() disagree on negative .5
    * halves (toward +inf vs away from zero); floor(x+0.5) is identical
    * everywhere. */
  def scoreMilli(cnt: Long, total: Long): Long =
    math.floor(math.log(cnt.toDouble / total.toDouble) * 1000 + 0.5).toLong

  private def withScores(vocab: Seq[(String, Long)]): Map[String, Long] = {
    val total = vocab.iterator.map(_._2).sum
    vocab.iterator.map { case (p, c) => p -> scoreMilli(c, total) }.toMap
  }

  /** In-memory seed over the collected word table — exact
    * [[seedVocab]] semantics. */
  def seedInMemory(freqs: Seq[(String, Long)], seedSize: Int,
                   maxPieceLen: Int = 4): Seq[(String, Long)] = {
    val cnt = scala.collection.mutable.HashMap.empty[String, Long]
    freqs.foreach { case (w, f) =>
      var s = 0
      while (s < w.length) {
        var e = s + 1
        val lim = math.min(w.length, s + maxPieceLen)
        while (e <= lim) {
          val p = w.substring(s, e)
          cnt.update(p, cnt.getOrElse(p, 0L) + f)
          e += 1
        }
        s += 1
      }
    }
    val all = cnt.toSeq
    val top = all.sortBy { case (p, c) => (-c, p) }.take(seedSize)
    (top ++ all.filter(_._1.length == 1)).distinct
      .sortBy { case (p, c) => (-c, p) }
  }

  /** Viterbi argmax segmentation: Some((milliScore, pieces)) or None
    * when the vocabulary cannot spell the word. Ties break by the
    * lexicographically smallest space-joined segmentation string. */
  def viterbi(word: String, scores: Map[String, Long],
              maxPieceLen: Int = 4): Option[(Long, Vector[String])] = {
    val n = word.length
    // dp(i) = best (score, segString) over segmentations of word[0,i)
    val dp = new Array[(Long, String)](n + 1)
    dp(0) = (0L, "")
    var i = 1
    while (i <= n) {
      var best: (Long, String) = null
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (dp(j) != null) {
          val piece = word.substring(j, i)
          scores.get(piece) match {
            case Some(sc) =>
              val (ps, pseg) = dp(j)
              val seg = if (pseg.isEmpty) piece else pseg + " " + piece
              val s = ps + sc
              if (best == null || s > best._1 ||
                  (s == best._1 && seg < best._2)) best = (s, seg)
            case None =>
          }
        }
        j += 1
      }
      dp(i) = best
      i += 1
    }
    Option(dp(n)).map { case (s, seg) => (s, seg.split(" ").toVector) }
  }

  /** One E-step: freq-weighted expected piece counts over the words'
    * Viterbi segmentations. Unsegmentable words contribute nothing
    * (cannot happen while the char floor holds). */
  def eStepCounts(freqs: Seq[(String, Long)], scores: Map[String, Long],
                  maxPieceLen: Int = 4): Map[String, Long] = {
    val out = scala.collection.mutable.HashMap.empty[String, Long]
    freqs.foreach { case (w, f) =>
      viterbi(w, scores, maxPieceLen).foreach { case (_, pieces) =>
        pieces.foreach(p => out.update(p, out.getOrElse(p, 0L) + f))
      }
    }
    out.toMap
  }

  /** The learned vocabulary: (piece, expectedCount, scoreMilli). */
  final case class Entry(piece: String, cnt: Long, scoreMilli: Long)

  /** EM + prune loop over the collected word table ([[Bpe
    * .learnInMemory]]'s contract at the unigram tier): `emIters`
    * E/M rounds, then drop the lowest-expected-count quarter of the
    * multi-char pieces ((cnt asc, piece desc) order — deterministic),
    * repeat until at most `vocabSize` pieces remain, finish with one
    * EM round so counts/scores describe the final vocabulary. Single
    * characters are never pruned and never drop below count 1. */
  def learnInMemory(freqs: Seq[(String, Long)], vocabSize: Int,
                    seedSize: Int = 1 << 12, maxPieceLen: Int = 4,
                    emIters: Int = 2): Seq[Entry] =
    emPruneLoop(seedInMemory(freqs, seedSize, maxPieceLen), vocabSize,
      emIters, scores => eStepCounts(freqs, scores, maxPieceLen))

  /** The shared EM + prune protocol: `eStep` maps the current scores
    * to expected piece counts — in-memory over a collected table
    * ([[learnInMemory]]) or as a Spark job over the distributed word
    * table ([[learnDistributed]]). Because the DP per word is the
    * same function and counts are exact Long sums (order-free), the
    * two paths are BIT-IDENTICAL (spec-locked). */
  private def emPruneLoop(seed: Seq[(String, Long)], vocabSize: Int,
      emIters: Int,
      eStep: Map[String, Long] => Map[String, Long]): Seq[Entry] = {
    require(vocabSize >= 1)
    var vocab: Seq[(String, Long)] = seed
    def em(v: Seq[(String, Long)]): Seq[(String, Long)] = {
      val counts = eStep(withScores(v))
      v.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        if (p.length == 1) Some(p -> math.max(c, 1L)) // coverage floor
        else if (c > 0) Some(p -> c)
        else None
      }
    }
    var guard = 0
    while (vocab.size > vocabSize && guard < 64) {
      (0 until emIters).foreach(_ => vocab = em(vocab))
      if (vocab.size > vocabSize) {
        val multi = vocab.filter(_._1.length > 1)
        val chars = vocab.filter(_._1.length == 1)
        val overBudget = vocab.size - vocabSize
        val drop = math.max(1, math.min(overBudget, multi.size / 4))
        val kept = multi.sortBy { case (p, c) => (-c, p) }
          .dropRight(math.min(drop, multi.size))
        vocab = kept ++ chars
      }
      guard += 1
    }
    vocab = em(vocab)
    val total = vocab.iterator.map(_._2).sum
    vocab.map { case (p, c) => Entry(p, c, scoreMilli(c, total)) }
      .sortBy(e => (-e.cnt, e.piece))
  }

  /** One DISTRIBUTED E-step: broadcast the (vocab-bounded) scores,
    * Viterbi every word where it sits, aggregate freq-weighted piece
    * counts — the word table never collects, and the result is
    * vocab-bounded. */
  def eStepCountsDistributed(words: DataFrame, scores: Map[String, Long],
                             maxPieceLen: Int = 4): Map[String, Long] = {
    val spark = words.sparkSession
    import spark.implicits._
    val scB = spark.sparkContext.broadcast(scores)
    val mpl = maxPieceLen
    words.select(col("word"), col("freq")).as[(String, Long)]
      .mapPartitions { it =>
        val sc = scB.value
        it.flatMap { case (w, f) =>
          viterbi(w, sc, mpl).iterator
            .flatMap(_._2.iterator.map(p => (p, f)))
        }
      }
      .toDF("piece", "cnt").groupBy("piece").agg(sum("cnt").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Corpus-scale learn with NO word-table cap: the table stays a
    * DataFrame end to end — seeding is the distributed [[seedVocab]],
    * each EM round is one broadcast-scores Spark job, and only
    * vocab-bounded frames ever collect. Bit-identical to
    * [[learnInMemory]] over the same (full) table; use this when the
    * word table exceeds [[learn]]'s `maxWords` cap — the 100 TB web
    * corpus case, where the capped path WARNS and diverges. Job count
    * is `emIters × prune-rounds + 1` (prune rounds shrink the
    * vocabulary geometrically — ~5-10 rounds for typical budgets). */
  def learnDistributed(docs: DataFrame, textCol: String, vocabSize: Int,
                       seedSize: Int = 1 << 12, maxPieceLen: Int = 4,
                       emIters: Int = 2): Seq[Entry] = {
    val words = Bpe.wordFrequencies(docs, textCol)
      .select(col("word"), col("freq")).persist()
    try {
      val seed = seedVocab(words, seedSize, maxPieceLen)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        .sortBy { case (p, c) => (-c, p) }
      emPruneLoop(seed, vocabSize, emIters,
        scores => eStepCountsDistributed(words, scores, maxPieceLen))
    } finally { words.unpersist(); () }
  }

  /** Corpus-facing learn: ONE distributed tokenize+count shuffle, then
    * the in-memory EM/prune loop over the capped collected table (the
    * [[Bpe.learn]] stage split; same truncation warning contract). */
  def learn(docs: DataFrame, textCol: String, vocabSize: Int,
            seedSize: Int = 1 << 12, maxPieceLen: Int = 4,
            emIters: Int = 2, maxWords: Int = 1 << 20): Seq[Entry] = {
    val rows = Bpe.wordFrequencies(docs, textCol)
      .orderBy(col("freq").desc, col("word")).limit(maxWords + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (rows.length > maxWords)
      Console.err.println(s"[graft.Unigram] word-frequency table exceeds " +
        s"maxWords=$maxWords — training on the top $maxWords by " +
        "(freq desc, word); the vocabulary may diverge from a " +
        "full-corpus train. Raise maxWords to silence.")
    learnInMemory(rows.take(maxWords).toSeq, vocabSize, seedSize,
      maxPieceLen, emIters)
  }

  /** Tokenize one word with a learned vocabulary (Viterbi under the
    * final scores) — the encode half, [[Bpe.applyMerges]]'s analog. */
  def encode(word: String, vocab: Seq[Entry],
             maxPieceLen: Int = 4): Vector[String] =
    viterbi(word, vocab.iterator.map(e => e.piece -> e.scoreMilli).toMap,
      maxPieceLen).map(_._2).getOrElse(Vector(word))

  /** DECODE (the encode half's inverse, round 16): a Viterbi
    * segmentation PARTITIONS the word and the unk fallback is the
    * whole word itself, so concatenation restores the input exactly —
    * `decode(encode(w)) == w` for every word (spec-locked). */
  def decode(pieces: Seq[String]): String = pieces.mkString

  // ----- BYTE FALLBACK (round 17 — SentencePiece `byte_fallback=
  // ----- true`, the LLaMA-family production form: 256 `<0xNN>`
  // ----- pieces guarantee NO unk ever) ------------------------------

  /** The 256 byte pieces `<0x00>`..`<0xFF>` (SentencePiece's exact
    * rendering — uppercase hex, the LLaMA vocab tail). */
  val ByteFallbackPieces: IndexedSeq[String] =
    (0 until 256).map(b => f"<0x$b%02X>")
  private val ByteFallbackSet: Set[String] = ByteFallbackPieces.toSet
  private val BytePieceRe = "^<0x([0-9A-F]{2})>$".r

  /** Append the byte pieces to a learned vocabulary, scored strictly
    * BELOW every real piece (min − 1000 milli — deterministic, and
    * exported/imported like any other score): a path through a byte
    * arc is then dominated whenever any vocab piece covers the same
    * character, so fallback fires EXACTLY on uncovered characters. */
  def withByteFallback(vocab: Seq[Entry]): Seq[Entry] = {
    val real = vocab.filterNot(e => ByteFallbackSet(e.piece))
    require(real.nonEmpty, "cannot byte-fallback an empty vocabulary")
    val bs = real.iterator.map(_.scoreMilli).min - 1000L
    real ++ ByteFallbackPieces.map(p => Entry(p, 0L, bs))
  }

  /** Does a vocabulary carry the complete byte-fallback tail? */
  def hasByteFallback(vocab: Seq[Entry]): Boolean =
    ByteFallbackSet.subsetOf(vocab.iterator.map(_.piece).toSet)

  /** Byte-fallback encode — [[viterbi]]'s lattice plus one fallback
    * arc per CODEPOINT (its UTF-8 bytes as `<0xNN>` pieces, scored
    * per byte; surrogate pairs fall back whole — splitting one would
    * emit bytes no decode can restore). Total: byte arcs chain
    * through any input, so this NEVER returns the unk whole-word
    * fallback — the SentencePiece `byte_fallback` contract.
    * `decodeByteFallback(encodeByteFallback(w)) == w` for every
    * well-formed string (fuzz-locked in UnigramProps). */
  def encodeByteFallback(word: String, vocab: Seq[Entry],
                         maxPieceLen: Int = 4): Vector[String] = {
    val (bytes, real) = vocab.partition(e => ByteFallbackSet(e.piece))
    val bs =
      if (bytes.nonEmpty) bytes.iterator.map(_.scoreMilli).min
      else real.iterator.map(_.scoreMilli).min - 1000L
    val scores = real.iterator.map(e => e.piece -> e.scoreMilli).toMap
    val n = word.length
    if (n == 0) return Vector.empty
    val dp = new Array[(Long, String)](n + 1)
    dp(0) = (0L, "")
    var i = 1
    while (i <= n) {
      var best: (Long, String) = null
      def offer(s: Long, seg: String): Unit =
        if (best == null || s > best._1 ||
            (s == best._1 && seg < best._2)) best = (s, seg)
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (dp(j) != null) {
          val piece = word.substring(j, i)
          scores.get(piece) match {
            case Some(sc) =>
              val (ps, pseg) = dp(j)
              offer(ps + sc,
                if (pseg.isEmpty) piece else pseg + " " + piece)
            case None =>
          }
        }
        j += 1
      }
      // the fallback arc for the codepoint ENDING at i: a surrogate
      // pair spans two chars; a high surrogate followed by its low
      // half contributes no arc at i (the pair's arc ends at i+1);
      // lone surrogates degrade to UTF-8's replacement deterministically
      val c = word.charAt(i - 1)
      val pairEndsLater = Character.isHighSurrogate(c) && i < n &&
        Character.isLowSurrogate(word.charAt(i))
      if (!pairEndsLater) {
        val start =
          if (Character.isLowSurrogate(c) && i >= 2 &&
              Character.isHighSurrogate(word.charAt(i - 2))) i - 2
          else i - 1
        if (dp(start) != null) {
          val bs8 = word.substring(start, i).getBytes("UTF-8")
          val arc = bs8.iterator.map(b => f"<0x${b & 0xff}%02X>")
            .mkString(" ")
          val (ps, pseg) = dp(start)
          offer(ps + bs8.length * bs,
            if (pseg.isEmpty) arc else pseg + " " + arc)
        }
      }
      dp(i) = best
      i += 1
    }
    dp(n)._2.split(" ").toVector
  }

  /** Byte-fallback decode: runs of `<0xNN>` pieces collect into one
    * byte buffer and decode as UTF-8 at the run boundary; every other
    * piece concatenates as-is ([[decode]]). */
  def decodeByteFallback(pieces: Seq[String]): String = {
    val sb = new StringBuilder
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def flush(): Unit = if (buf.nonEmpty) {
      sb.append(new String(buf.toArray, "UTF-8")); buf.clear()
    }
    pieces.foreach {
      case BytePieceRe(hex) => buf += Integer.parseInt(hex, 16).toByte
      case p => flush(); sb.append(p)
    }
    flush()
    sb.toString
  }
}
