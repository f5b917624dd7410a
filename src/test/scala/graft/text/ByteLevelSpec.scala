package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level BPE (GPT-2 form): hand-computed merge learning, the
  * Spark column pipeline's exact decode round trip, and tokenizer
  * interop carrying the ByteLevel pretokenizer. */
class ByteLevelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("learnByteLevel learns the hand-computed merges: space-prefixed " +
      "chunks count separately from word-initial ones and merges run " +
      "over alphabet chars") {
    import spark.implicits._
    val docs = Seq((0L, "aa aa aa")).toDF("doc_id", "text")
    // chunks: "aa" (freq 1), " aa" -> "Ġaa" (freq 2)
    // pairs: (a,a) weight 3; merge 1 = (a,a). Then "Ġaa" -> [Ġ, aa]
    // gives (Ġ,aa) weight 2; merge 2 = (Ġ,aa).
    val merges = Bpe.learnByteLevel(docs, "text", numMerges = 2)
    assert(merges === Seq(
      Bpe.Merge(1, "a", "a", 3L), Bpe.Merge(2, "Ġ", "aa", 2L)))
  }

  test("encodeByteLevel ∘ decodeByteLevel is the identity on nasty " +
      "unicode text, and tokens never cross chunk boundaries") {
    import spark.implicits._
    val texts = Seq(
      "hello  world",            // double space: '\\s+(?!\\S)' chunk
      " leading and trailing ",
      "tabs\tand\nnewlines",
      "¡unicode! Ωé 中文 🎉😀",
      "don't stop — it's fine",
      "digits 12345 mixed a1b2",
      "")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.learnByteLevel(
      Seq((0L, "hello world stop fine and")).toDF("doc_id", "text"),
      "text", numMerges = 8)
    val got = docs.select(col("doc_id"),
        Bpe.decodeByteLevel(Bpe.encodeByteLevel(col("text"), merges))
          .as("back"))
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(got === texts, "byte-level decode(encode(x)) != x")
    // chunk-boundary discipline: every token decodes to a substring
    // that never spans a letter-space-letter boundary mid-token
    val toks = docs.filter(col("doc_id") === 0)
      .select(explode(Bpe.encodeByteLevel(col("text"), merges)))
      .collect().map(_.getString(0)).toSeq
    assert(toks.nonEmpty)
    assert(toks.forall(t => !t.contains(" ")),
      "raw space inside a token — the alphabet map leaked")
  }

  test("export→import parity CARRIES the pretokenizer: the full " +
      "tokenizer.json round-trips merges bit-for-bit, preTokenizer " +
      "reads ByteLevel, and the imported table encodes identically") {
    import spark.implicits._
    val docs = Seq((0L, "the cat sat on the mat the cat"),
      (1L, "a byte level merge table the cat")).toDF("doc_id", "text")
    val merges = Bpe.learnByteLevel(docs, "text", numMerges = 12)
    val full = TokenizerExport.tokenizerJson(
      TokenizerExport.bpeModelJson(merges), byteLevel = true)
    assert(TokenizerImport.preTokenizer(full) === Some("ByteLevel"))
    val imported = TokenizerImport.bpeMerges(full)
    assert(imported.map(m => (m.rank, m.left, m.right)) ===
      merges.map(m => (m.rank, m.left, m.right)))
    val a = docs.select(
        Bpe.encodeByteLevel(col("text"), merges).as("t"))
      .collect().map(_.getSeq[String](0)).toSeq
    val b = docs.select(
        Bpe.encodeByteLevel(col("text"), imported).as("t"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(a === b, "imported table diverged from the trained one")
    // the word-boundary wrapper carries NO pretokenizer
    assert(TokenizerImport.preTokenizer(TokenizerExport.tokenizerJson(
      TokenizerExport.bpeModelJson(merges), byteLevel = false)).isEmpty)
  }

  test("Unigram decode inverts encode for every word (segmentations " +
      "partition; unk falls back to the whole word)") {
    import spark.implicits._
    val docs = Seq((0L, "banana bandana cabana banana")).toDF("doc_id", "text")
    val vocab = Unigram.learn(docs, "text", vocabSize = 12)
    Seq("banana", "cabana", "unknownword", "x").foreach { w =>
      assert(Unigram.decode(Unigram.encode(w, vocab)) === w, s"word $w")
    }
    // the word-boundary BPE decode restores words the same way (BPE
    // merges partition the word's chars)
    val merges = Bpe.learn(docs, "text", numMerges = 5)
    val back = Seq("banana", "cabana", "zzz").toDF("w")
      .select(col("w"), Bpe.decodeWord(
        Bpe.encode(Bpe.charSymbols(col("w")), merges)).as("back"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    back.foreach { case (w, b) => assert(b === w, s"word $w") }
  }
}
