package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FIM: deterministic coin + cut points, lossless segment algebra. */
class FimTransformSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = (0L until 200L)
    .map(i => (i, s"doc $i " + ("abcdefghij" * 5))).toDF("id", "text")

  test("psm docs reassemble to the original text (split is lossless)") {
    val got = FimTransform.fimSplit(docs, col("id"), col("text"), rate = 0.5)
      .select("id", "text", "mode", "fim_text")
      .as[(Long, String, String, String)].collect()
    assert(got.exists(_._3 == "psm") && got.exists(_._3 == "plain"))
    got.foreach { case (_, orig, mode, fim) =>
      if (mode == "plain") assert(fim === orig)
      else {
        // <PRE>p<SUF>s<MID>m with p+m+s == orig
        val m = "(?s)<PRE>(.*)<SUF>(.*)<MID>(.*)".r
        fim match {
          case m(p, s, mid) => assert(p + mid + s === orig)
          case _ => fail(s"bad PSM shape: $fim")
        }
      }
    }
  }

  test("transform is a pure function of (salt, id): stable across runs") {
    def modes() = FimTransform.fimSplit(docs, col("id"), col("text"))
      .select("id", "mode").as[(Long, String)].collect().toMap
    assert(modes() === modes())
    // a different salt re-flips coins somewhere
    val other = FimTransform.fimSplit(docs, col("id"), col("text"), salt = "x")
      .select("id", "mode").as[(Long, String)].collect().toMap
    assert(other !== modes())
  }

  test("rate 0 passes everything through; rate 1 transforms everything") {
    val all = FimTransform.fimSplit(docs, col("id"), col("text"), rate = 1.0)
      .select("mode").distinct().as[String].collect().toSeq
    assert(all === Seq("psm"))
    val none = FimTransform.fimSplit(docs, col("id"), col("text"), rate = 0.0)
      .select("mode").distinct().as[String].collect().toSeq
    assert(none === Seq("plain"))
  }

  test("spanCorrupt: corrupted + target reassemble the original") {
    val got = FimTransform.spanCorrupt(docs, col("id"), col("text"), spanFrac = 0.2)
      .select("text", "corrupted", "target")
      .as[(String, String, String)].collect()
    got.filter(_._1.nonEmpty).foreach { case (text, corr, tgt) =>
      val span = tgt.stripPrefix("<extra_id_0>").stripSuffix("<extra_id_1>")
      assert(corr.replace("<extra_id_0>", span) === text,
        s"reassembly failed for '$text'")
      assert(span.length === math.max(1, text.length / 5))
    }
    // determinism
    val again = FimTransform.spanCorrupt(docs, col("id"), col("text"), spanFrac = 0.2)
      .select("corrupted").as[String].collect().toSeq
    assert(again === got.map(_._2).toSeq)
  }
}
