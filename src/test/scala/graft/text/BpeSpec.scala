package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Fuzz the in-memory incremental trainer (lazy max-heap, incremental
  * pair maintenance) against a naive recount-per-round reference. The
  * tiny alphabet forces heavy count TIES (the heap ordering's hard
  * case) and cascading merges (merged symbols re-merging — the
  * incremental bookkeeping's hard case). Pure in-memory, no Spark. */
object BpeLearnProps extends Properties("bpe-learn") {

  private def naive(words: Seq[(String, Long)], n: Int): Seq[(String, String, Long)] = {
    var syms: Vector[(Vector[String], Long)] =
      words.toVector.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var continue = true
    while (continue && out.size < n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((s, f) <- syms; i <- 0 until s.length - 1) counts((s(i), s(i + 1))) += f
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), cc) => (-cc, x, y) }
        out += ((a, b, c))
        syms = syms.map { case (s, f) =>
          val m = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { m += (a + b); i += 2 }
            else { m += s(i); i += 1 }
          }
          (m.toVector, f)
        }
      }
    }
    out.toSeq
  }

  private val wordGen = for {
    len <- Gen.choose(1, 7)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString
  private val corpusGen = for {
    nw <- Gen.choose(1, 14)
    ws <- Gen.listOfN(nw, wordGen)
    fs <- Gen.listOfN(nw, Gen.choose(1L, 5L))
  } yield ws.zip(fs).groupBy(_._1).view
    .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)

  property("incremental heap trainer == naive recount reference") =
    forAll(corpusGen, Gen.choose(1, 25)) { (corpus, n) =>
      Bpe.learnInMemory(corpus.toArray, n)
        .map(m => (m.left, m.right, m.pairCount)) == naive(corpus, n)
    }
}

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent single-machine BPE reference (textbook form) the
    * distributed loop must reproduce exactly. */
  private def refBpe(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var syms: Vector[(Vector[String], Long)] =
      words.toVector.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var continue = true
    while (continue && out.size < n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((s, f) <- syms; i <- 0 until s.length - 1) counts((s(i), s(i + 1))) += f
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        syms = syms.map { case (s, f) => (mergeRef(s, a, b), f) }
      }
    }
    out.toSeq
  }

  private def mergeRef(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toVector
  }

  private def freqsOf(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.toLowerCase.split("[^a-z0-9]+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("learn matches the single-machine reference over a mixed corpus") {
    val docs = Seq(
      "low lower lowest low low",
      "new newer newest new news",
      "widest wide wider new low")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = Bpe.learn(df, "text", numMerges = 8).map(m => (m.left, m.right, m.pairCount))
    val want = refBpe(freqsOf(docs), 8)
    assert(got === want)
  }

  test("merge loop handles the aaa overlap rule (left-to-right, non-overlapping)") {
    val df = Seq((1L, "aaa aaa")).toDF("id", "text")
    val got = Bpe.learn(df, "text", numMerges = 2).map(m => (m.left, m.right, m.pairCount))
    // round 1: (a,a) count 4 (two per word, non-overlap irrelevant for
    // counting adjacency: positions (0,1),(1,2) -> 2 per word);
    // after merge "aaa" -> ["aa","a"]; round 2: (aa,a) count 2
    assert(got === refBpe(freqsOf(Seq("aaa aaa")), 2))
    assert(got.head._1 === "a" && got.head._2 === "a")
    assert(got(1) === ("aa", "a", 2L))
  }

  test("learn stops early when no pairs remain") {
    val df = Seq((1L, "a b c a b")).toDF("id", "text")
    // single-char words only -> zero adjacent pairs -> no merges
    assert(Bpe.learn(df, "text", numMerges = 3) === Seq.empty)
  }

  test("three-way parity: in-memory learn == Spark-round loop == " +
      "reference, deep into the merge sequence (randomized corpus)") {
    // seeded corpus with repeated stems so merges cascade (merged
    // symbols re-merge) — the shape that exercises the incremental
    // count maintenance and the lazy heap's stale-entry handling
    val rnd = new scala.util.Random(20260815L)
    val stems = Seq("inter", "nation", "al", "iz", "ation", "re", "con",
      "struct", "ed", "ing", "s", "un", "der")
    val docs = (0 until 60).map { i =>
      (i.toLong, (0 until 8).map(_ =>
        (0 until 1 + rnd.nextInt(3)).map(_ => stems(rnd.nextInt(stems.length)))
          .mkString).mkString(" "))
    }
    val df = docs.toDF("id", "text")
    val n = 40
    val fast = Bpe.learn(df, "text", n).map(m => (m.left, m.right, m.pairCount))
    val slow = Bpe.learnBySparkRounds(df, "text", n)
      .map(m => (m.left, m.right, m.pairCount))
    val ref = refBpe(freqsOf(docs.map(_._2)), n)
    assert(fast === ref)
    assert(slow === ref)
  }

  test("maxWords cap is a deterministic (freq desc, word) cut") {
    // cap to the 2 most frequent words: merges must come from those
    // words' pairs only
    val df = Seq((1L, "aaaa aaaa aaaa bbb bbb zz")).toDF("id", "text")
    val capped = Bpe.learn(df, "text", numMerges = 2, maxWords = 2)
    // aaaa (freq 3) and bbb (freq 2) survive the cut; zz drops
    assert(capped.map(m => (m.left, m.right)) === Seq("a" -> "a", "b" -> "b"))
    assert(capped.head.pairCount === 9L) // 3 adjacencies x freq 3
  }

  test("fused encoder matches the chained-fold reference over a learned table") {
    val corpus = Seq(
      (1L, "low lower lowest low low slow slower glow"),
      (2L, "new newer newest news knew renew"),
      (3L, "wide wider widest widen sideways"))
    val df = corpus.toDF("id", "text")
    val merges = Bpe.learn(df, "text", numMerges = 12)
    assert(merges.nonEmpty)
    val words = Bpe.wordFrequencies(df, "text")
      .select(col("word"), Bpe.charSymbols(col("word")).as("syms"))
      .withColumn("fused", Bpe.encode(col("syms"), merges))
      .withColumn("chained", Bpe.applyMerges(col("syms"), merges))
    val rows = words.select("word", "fused", "chained")
      .as[(String, Seq[String], Seq[String])].collect()
    rows.foreach { case (w, f, c) => assert(f === c, s"word '$w'") }
    // and on unseen words
    val unseen = Seq(Tuple1("lowlands"), Tuple1("newton"), Tuple1("z"))
      .toDF("w")
      .select(
        Bpe.encode(Bpe.charSymbols(col("w")), merges).as("fused"),
        Bpe.applyMerges(Bpe.charSymbols(col("w")), merges).as("chained"))
      .as[(Seq[String], Seq[String])].collect()
    unseen.foreach { case (f, c) => assert(f === c) }
  }

  test("applyMerges re-segments a word with the learned table") {
    val df = Seq((1L, "low low lower")).toDF("id", "text")
    val merges = Bpe.learn(df, "text", numMerges = 2)
    val seg = Seq(Tuple1("lowest")).toDF("w")
      .select(Bpe.applyMerges(Bpe.charSymbols(col("w")), merges).as("syms"))
      .as[Seq[String]].head()
    // merges learned on "low": (l,o) then (lo,w) -> "lowest" segments
    // as [low, e, s, t]
    assert(merges.map(m => (m.left, m.right)) === Seq("l" -> "o", "lo" -> "w"))
    assert(seg === Seq("low", "e", "s", "t"))
  }
}
