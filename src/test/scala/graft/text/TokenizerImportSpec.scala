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
}
