package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** tokenizer.json interop: the emitted model objects must be valid
  * JSON (parsed back through Spark's from_json, not string-eyeballed)
  * with the HF id/order conventions intact. */
class TokenizerExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    Seq.fill(30)("the cat sat on the mat with another cat").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("BPE model json round-trips: merge order preserved, ids follow " +
      "specials -> alphabet -> merges") {
    val merges = Bpe.learn(corpus, "text", numMerges = 10)
    assert(merges.nonEmpty)
    val json = TokenizerExport.bpeModelJson(merges)
    val f = java.nio.file.Files.createTempDirectory("tokexp_").toString +
      "/tokenizer_model.json"
    TokenizerExport.write(spark, f, json)
    val onDisk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f)), "UTF-8")
    assert(onDisk === json)
    val sch = StructType(Seq(
      StructField("type", StringType), StructField("unk_token", StringType),
      StructField("vocab", MapType(StringType, LongType)),
      StructField("merges", ArrayType(StringType))))
    val r = spark.range(1)
      .select(from_json(lit(onDisk), sch).as("m")).select("m.*").head
    assert(r.getString(0) === "BPE")
    assert(r.getString(1) === "<unk>")
    val vocab = r.getAs[Map[String, Long]]("vocab")
    val ms = r.getAs[scala.collection.Seq[String]]("merges")
    val ordered = merges.sortBy(_.rank)
    assert(ms.toSeq === ordered.map(m => s"${m.left} ${m.right}"))
    val alpha = TokenizerExport.bpeAlphabet(ordered)
    assert(vocab("<unk>") === 0L)
    // alphabet ids contiguous after unk, in sorted order
    alpha.zipWithIndex.foreach { case (a, i) =>
      assert(vocab(a) === (1L + i), s"alphabet id drift at '$a'")
    }
    // each merge's joined symbol follows, in rank order
    ordered.zipWithIndex.foreach { case (m, i) =>
      assert(vocab(m.left + m.right) === (1L + alpha.size + i))
    }
    assert(vocab.size === 1 + alpha.size + ordered.size)
    // ids are a contiguous 0..N-1 range (loadable as an embedding row
    // index, the property the training stack needs)
    assert(vocab.values.toSeq.sorted === (0L until vocab.size).toSeq)
  }

  test("Unigram model json round-trips: unk first at id 0, trainer " +
      "order kept, milli scores rendered exactly") {
    val vocab = Unigram.learn(corpus, "text", vocabSize = 15,
      seedSize = 64, maxPieceLen = 3)
    assert(vocab.nonEmpty)
    val json = TokenizerExport.unigramModelJson(vocab)
    val sch = StructType(Seq(
      StructField("type", StringType), StructField("unk_id", LongType),
      StructField("vocab", ArrayType(ArrayType(StringType)))))
    val r = spark.range(1)
      .select(from_json(lit(json), sch).as("m")).select("m.*").head
    assert(r.getString(0) === "Unigram")
    assert(r.getLong(1) === 0L)
    val rows = r.getAs[scala.collection.Seq[scala.collection.Seq[String]]]("vocab")
    // unk carries the SentencePiece convention: min piece score minus
    // a penalty — strictly below every trained piece, never 0.0
    assert(rows.head.head === "<unk>")
    val minScore = vocab.iterator.map(_.scoreMilli).min / 1000.0
    assert(rows.head(1).toDouble === minScore - 10.0)
    assert(rows.tail.forall(row => rows.head(1).toDouble < row(1).toDouble))
    rows.tail.zip(vocab).foreach { case (row, e) =>
      assert(row(0) === e.piece)
      assert(row(1).toDouble === e.scoreMilli / 1000.0,
        s"score drift for '${e.piece}'")
    }
  }
}
