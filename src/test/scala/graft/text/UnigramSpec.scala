package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM trainer: the DP argmax must equal a full enumeration
  * (score AND tie-broken segmentation), the E-step must equal a naive
  * recount, and the learn loop must be deterministic and bounded. */
object UnigramProps extends Properties("unigram-lm") {

  private val wordGen = for {
    len <- Gen.choose(1, 8)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString
  private val corpusGen: Gen[Seq[(String, Long)]] = for {
    nw <- Gen.choose(1, 12)
    ws <- Gen.listOfN(nw, wordGen)
    fs <- Gen.listOfN(nw, Gen.choose(1L, 9L))
  } yield ws.zip(fs).groupBy(_._1).view
    .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)

  private def scoresOf(seed: Seq[(String, Long)]): Map[String, Long] = {
    val total = seed.iterator.map(_._2).sum
    seed.iterator.map { case (p, c) => p -> Unigram.scoreMilli(c, total) }.toMap
  }

  /** Exponential reference: ALL segmentations, argmax by
    * (score desc, space-joined seg asc). */
  private def naiveBest(word: String, scores: Map[String, Long],
                        maxPieceLen: Int): Option[(Long, String)] = {
    def segs(i: Int): Seq[(Long, List[String])] =
      if (i == word.length) Seq((0L, Nil))
      else (1 to math.min(maxPieceLen, word.length - i)).flatMap { l =>
        val p = word.substring(i, i + l)
        scores.get(p).toSeq.flatMap(sc =>
          segs(i + l).map { case (s, rest) => (s + sc, p :: rest) })
      }
    val all = segs(0).map { case (s, ps) => (s, ps.mkString(" ")) }
    if (all.isEmpty) None
    else Some(all.minBy { case (s, seg) => (-s, seg) })
  }

  property("viterbi == full enumeration (score and tie-broken seg)") =
    forAll(corpusGen, Gen.choose(2, 24)) { (corpus, seedSize) =>
      val scores = scoresOf(Unigram.seedInMemory(corpus, seedSize, 3))
      corpus.forall { case (w, _) =>
        val dp = Unigram.viterbi(w, scores, 3)
          .map { case (s, v) => (s, v.mkString(" ")) }
        dp == naiveBest(w, scores, 3)
      }
    }

  property("eStep == naive recount over enumerated argmax segs") =
    forAll(corpusGen) { corpus =>
      val scores = scoresOf(Unigram.seedInMemory(corpus, 16, 3))
      val naive = scala.collection.mutable.HashMap.empty[String, Long]
      corpus.foreach { case (w, f) =>
        naiveBest(w, scores, 3).foreach { case (_, seg) =>
          seg.split(" ").foreach(p =>
            naive.update(p, naive.getOrElse(p, 0L) + f))
        }
      }
      Unigram.eStepCounts(corpus, scores, 3) == naive.toMap
    }

  property("learn: deterministic, char-coverage kept, encode spells " +
      "every word back, vocab within budget") =
    forAll(corpusGen) { corpus =>
      val chars = corpus.flatMap(_._1.toSet).map(_.toString).toSet
      val budget = chars.size + 4
      val a = Unigram.learnInMemory(corpus, budget, seedSize = 24,
        maxPieceLen = 3)
      val b = Unigram.learnInMemory(corpus, budget, seedSize = 24,
        maxPieceLen = 3)
      val pieces = a.map(_.piece).toSet
      ((a == b) :| "nondeterministic learn") &&
        (chars.subsetOf(pieces) :| s"chars pruned: ${chars diff pieces}") &&
        ((a.count(_.piece.length > 1) <= budget) :| "vocab over budget") &&
        (corpus.forall { case (w, _) =>
          Unigram.encode(w, a, 3).mkString("") == w
        } :| "encode does not spell a word back")
    }

  // byte-fallback words: WHOLE codepoints (the ByteLevelProps
  // discipline — char sampling would emit unpaired surrogates with no
  // UTF-8 round trip)
  private val anyWordGen: Gen[String] = Gen.nonEmptyListOf(Gen.frequency(
    5 -> Gen.oneOf("a", "b", "c"),
    2 -> Gen.oneOf("x", "7", "!", " "),
    1 -> Gen.choose(0x80, 0x2fff).map(_.toChar.toString),
    1 -> Gen.oneOf("中", "é", "🎉", "😀"))).map(_.mkString)

  property("byte fallback: decode(encode(w)) == w for ARBITRARY " +
      "unicode under an a-b-c-trained vocab (no unk, ever), and " +
      "encode == plain viterbi when the word is fully covered") =
    forAll(corpusGen, anyWordGen) { (corpus, w) =>
      val vb = Unigram.withByteFallback(
        Unigram.learnInMemory(corpus, 8, seedSize = 16, maxPieceLen = 3))
      val pieces = Unigram.encodeByteFallback(w, vb, 3)
      val rt = Unigram.decodeByteFallback(pieces)
      val covered = corpus.flatMap(_._1.toSet).toSet
      val plainAgrees = !w.forall(covered.contains) || {
        Unigram.viterbi(w,
          vb.filterNot(e => e.piece.startsWith("<0x"))
            .map(e => e.piece -> e.scoreMilli).toMap, 3)
          .exists(_._2 == pieces)
      }
      ((rt == w) :| s"round trip broke: '$w' -> $pieces -> '$rt'") &&
        (plainAgrees :| s"fallback arcs leaked into a covered word: $pieces") &&
        (Unigram.hasByteFallback(vb) :| "vocab lost its byte tail")
    }

  property("added tokens never split and pass through encode " +
      "verbatim; segment() partitions the input; longest token wins " +
      "at equal start") =
    forAll(Gen.listOf(Gen.oneOf("a", "b", "ab", "ba")).map(_.mkString)) { s =>
      val added = Seq("<s>", "</s>", "<s>>")
      val text = s"<s>$s</s>${s}<s>><s>"
      val segs = AddedTokens.segment(text, added)
      val enc = AddedTokens.encode(text, added, run => Seq(run))
      ((segs.map(_.fold(identity, identity)).mkString == text) :|
        "segment does not partition") &&
        ((enc.mkString == text) :| "encode broke the surface form") &&
        ((segs.count(_ == Right("<s>>")) == 1) :|
          s"longest-first precedence broke: $segs") &&
        (segs.forall {
          case Left(run) => added.forall(t => !run.contains(t))
          case Right(t) => added.contains(t)
        } :| "an added token survived inside a plain run")
    }
}

/** Distributed seed == in-memory seed over the same word table. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("seedVocab (distributed) == seedInMemory over the same table") {
    import spark.implicits._
    val words = Seq(("banana", 3L), ("bandana", 2L), ("nab", 5L),
      ("an", 7L), ("b7b", 1L)).toDF("word", "freq")
    val dist = Unigram.seedVocab(words, seedSize = 10, maxPieceLen = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, c) => (-c, p) }.toSeq
    val mem = Unigram.seedInMemory(
      Seq(("banana", 3L), ("bandana", 2L), ("nab", 5L), ("an", 7L),
        ("b7b", 1L)), seedSize = 10, maxPieceLen = 3)
    assert(dist === mem)
  }

  test("learnDistributed == learn (capped path) when the cap does not " +
      "bind, and == learnInMemory over the FULL table when it does") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    // cap slack: identical vocabularies, Entry for Entry
    val dist = Unigram.learnDistributed(docs, "text", vocabSize = 40,
      seedSize = 256, maxPieceLen = 3)
    val capped = Unigram.learn(docs, "text", vocabSize = 40,
      seedSize = 256, maxPieceLen = 3)
    assert(dist === capped)
    // cap binds: the capped path trains on a truncated table and
    // diverges from the full-table train; the distributed path does
    // not — it equals learnInMemory over the COMPLETE word table
    val full = graft.text.Bpe.wordFrequencies(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(full.size > 20, "fixture too small for a binding cap")
    val mem = Unigram.learnInMemory(full, vocabSize = 40,
      seedSize = 256, maxPieceLen = 3)
    assert(dist === mem)
    val truncated = Unigram.learn(docs, "text", vocabSize = 40,
      seedSize = 256, maxPieceLen = 3, maxWords = 15)
    assert(truncated !== mem,
      "a binding cap should diverge (otherwise this control is dead)")
  }

  test("trained vocabulary favors frequent multi-char pieces") {
    import spark.implicits._
    val docs = Seq.fill(40)("the cat sat on the mat").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val vocab = Unigram.learn(docs, "text", vocabSize = 12,
      seedSize = 64, maxPieceLen = 3)
    val pieces = vocab.map(_.piece).toSet
    // 'the' is the most frequent trigram-able word: it must survive as
    // one piece, and encode as itself
    assert(pieces.contains("the"))
    assert(Unigram.encode("the", vocab, 3) === Vector("the"))
  }
}
