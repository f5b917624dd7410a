package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer interop round-trip: export → import must reproduce the
  * model tables bit-for-bit, and the encode kernels must produce
  * identical output under the imported tables — on both model types
  * and on both accepted serializations. */
class TokenizerImportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    Seq.fill(30)("the cat sat on the mat with another cat").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("BPE: export -> import reproduces (rank, left, right) exactly " +
      "and the fused encode kernel is bit-identical under the " +
      "imported table; the pair-array merge form also loads") {
    val merges = Bpe.learn(corpus, "text", numMerges = 10)
    val json = TokenizerExport.bpeModelJson(merges)
    val imported = TokenizerImport.bpeMerges(json)
    assert(imported.map(m => (m.rank, m.left, m.right)) ===
      merges.sortBy(_.rank).map(m => (m.rank, m.left, m.right)))
    // encode parity on the corpus words
    import spark.implicits._
    val words = Bpe.wordFrequencies(corpus, "text").select("word")
    def enc(ms: Seq[Bpe.Merge]) = words
      .select(col("word"), Bpe.encode(split(col("word"), ""), ms).as("toks"))
      .collect().map(r => (r.getString(0),
        r.getSeq[String](1).mkString("|"))).sorted.toSeq
    assert(enc(imported) === enc(merges))
    // tokenizers >= 0.20: merges serialized as two-element arrays,
    // wrapped in a full tokenizer.json with a model key
    val pairJson = "{\"version\":\"1.0\",\"model\":{\"type\":\"BPE\"," +
      "\"vocab\":{},\"merges\":[" +
      merges.sortBy(_.rank)
        .map(m => s"""["${m.left}","${m.right}"]""").mkString(",") +
      "]}}"
    val fromPairs = TokenizerImport.bpeMerges(pairJson)
    assert(fromPairs.map(m => (m.rank, m.left, m.right)) ===
      imported.map(m => (m.rank, m.left, m.right)))
  }

  test("Unigram: export -> import reproduces (piece, scoreMilli) " +
      "exactly (unk dropped at unk_id), and Viterbi segmentation is " +
      "identical under the imported vocabulary") {
    val vocab = Unigram.learn(corpus, "text", vocabSize = 15,
      seedSize = 64, maxPieceLen = 3)
    val json = TokenizerExport.unigramModelJson(vocab)
    val imported = TokenizerImport.unigramVocab(json)
    assert(imported.map(e => (e.piece, e.scoreMilli)) ===
      vocab.map(e => (e.piece, e.scoreMilli)))
    Seq("another", "cat", "mat", "the", "with").foreach { w =>
      assert(Unigram.encode(w, imported, maxPieceLen = 3) ===
        Unigram.encode(w, vocab, maxPieceLen = 3),
        s"segmentation drift on '$w'")
    }
  }

  test("file round-trip through the Hadoop FS and the full " +
      "tokenizer.json wrapper; wrong-type imports refuse") {
    val merges = Bpe.learn(corpus, "text", numMerges = 5)
    val dir = java.nio.file.Files.createTempDirectory("tokimp_").toString
    val p = s"$dir/tokenizer.json"
    TokenizerExport.write(spark, p,
      s"""{"version":"1.0","model":${TokenizerExport.bpeModelJson(merges)}}""")
    val imported = TokenizerImport.bpeMerges(TokenizerImport.read(spark, p))
    assert(imported.map(m => (m.left, m.right)) ===
      merges.sortBy(_.rank).map(m => (m.left, m.right)))
    intercept[IllegalArgumentException](
      TokenizerImport.unigramVocab(TokenizerImport.read(spark, p)))
    intercept[IllegalArgumentException](
      TokenizerImport.bpeMerges("""{"no_type":true}"""))
    // "no unk token" serializes as unk_id: null — must NOT be read as
    // id 0 (which would silently drop the first real piece)
    val noUnk = TokenizerImport.unigramVocab(
      """{"type":"Unigram","unk_id":null,"vocab":[["a",-1.0],["b",-2.5]]}""")
    assert(noUnk.map(e => (e.piece, e.scoreMilli)) ===
      Seq(("a", -1000L), ("b", -2500L)))
  }

  test("byte_fallback + added_tokens survive export -> import: the " +
      "flag round-trips, the <0xNN> tail round-trips with its " +
      "below-minimum score, added tokens come back in order and " +
      "protect encode identically") {
    val vocab = Unigram.withByteFallback(Unigram.learn(corpus, "text",
      vocabSize = 15, seedSize = 64, maxPieceLen = 3))
    val added = Seq("<s>", "</s>", "<pad>")
    val json = TokenizerExport.tokenizerJson(
      TokenizerExport.unigramModelJson(vocab, byteFallback = true),
      byteLevel = false, added, addedIdBase = vocab.size + 1)
    assert(TokenizerImport.byteFallback(json))
    assert(TokenizerImport.addedTokens(json) === added)
    assert(!TokenizerImport.byteFallback(
      TokenizerExport.unigramModelJson(vocab.take(5))))
    assert(TokenizerImport.addedTokens(
      """{"version":"1.0","model":{"type":"Unigram","vocab":[]}}""") === Nil)
    val imported = TokenizerImport.unigramVocab(json)
    assert(imported.map(e => (e.piece, e.scoreMilli)) ===
      vocab.map(e => (e.piece, e.scoreMilli)))
    assert(Unigram.hasByteFallback(imported))
    // the whole protected-encode path under the IMPORTED file: added
    // tokens atomic, OOV chars as byte pieces, round trip exact
    val text = "<s>the caté</s>"
    def enc(v: Seq[Unigram.Entry]) = AddedTokens.encode(text,
      TokenizerImport.addedTokens(json),
      run => run.split(" ").toSeq.filter(_.nonEmpty)
        .flatMap(w => Unigram.encodeByteFallback(w, v, 3)))
    assert(enc(imported) === enc(vocab))
    val pieces = enc(imported)
    assert(pieces.head === "<s>" && pieces.last === "</s>",
      s"added tokens split: $pieces")
    assert(pieces.exists(_.matches("<0x[0-9A-F]{2}>")),
      s"é did not byte-fall back: $pieces")
  }
}
