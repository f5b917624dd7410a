package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/**
 * Property tests over the pure kernels backing the fused expressions
 * (docs/KERNELS.md), each checked against an obviously-correct Scala
 * reference implementation on arbitrary inputs — no Spark session
 * needed, so these run as plain JVM properties.
 */
object KernelProps extends Properties("kernels") {

  private val P = 2147483647L
  private val longArrays = Gen.listOf(Gen.chooseNum(Long.MinValue / 4, Long.MaxValue / 4))
  private val smallW = Gen.chooseNum(2, 5)

  private def pmod(x: Long): Long = { val r = x % P; if (r < 0) r + P else r }

  property("poly shingles == reference sliding fold") =
    forAll(longArrays, smallW) { (xs, w) =>
      val got = PolyShingleKernel
        .compute(new GenericArrayData(xs.toArray), w).toLongArray.toSeq
      val exp =
        if (xs.length < w) Seq(xs.foldLeft(1L)((acc, h) => pmod(acc * 1000003L + h)))
        else xs.sliding(w).map(_.foldLeft(1L)((acc, h) => pmod(acc * 1000003L + h))).toSeq
      got == exp
    }

  property("winnow minima == reference sliding-min + ordered distinct") =
    forAll(longArrays.suchThat(_.nonEmpty), smallW) { (xs, w) =>
      val got = WinnowKernel
        .compute(new GenericArrayData(xs.toArray), w).toLongArray.toSeq
      val mins = if (xs.length <= w) Seq(xs.min) else xs.sliding(w).map(_.min).toSeq
      got == mins.distinct
    }

  property("jaccard == reference set arithmetic") =
    forAll(Gen.listOf(Gen.alphaNumStr), Gen.listOf(Gen.alphaNumStr)) { (a, b) =>
      val toArr = (s: Seq[String]) =>
        new GenericArrayData(s.map(UTF8String.fromString).toArray[Any])
      val got = JaccardKernel.compute(toArr(a), toArr(b))
      val (sa, sb) = (a.toSet, b.toSet)
      val inter = (sa & sb).size
      val union = sa.size + sb.size - inter
      // both empty -> 0/0: kernel yields NaN, reference guard mirrors it
      if (union == 0) got.isNaN
      else got == inter.toDouble / union.toDouble
    }

  property("string shingles == reference windows") =
    forAll(Gen.listOf(Gen.alphaNumStr), smallW) { (toks, w) =>
      val got = StringShingleKernel
        .compute(new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any]), w)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val exp =
        if (toks.length < w) Seq(toks.mkString(" "))
        else toks.sliding(w).map(_.mkString(" ")).toSeq
      got == exp
    }

  property("array eq count == reference position-wise agreement") =
    forAll(Gen.listOf(Gen.chooseNum(-100, 100)), Gen.listOf(Gen.chooseNum(-100, 100))) {
      (a, b) =>
        val got = ArrayEqCount.compute(
          new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
        got == a.zip(b).count { case (x, y) => x == y }
    }

  private val tokenLists = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr, Gen.oneOf("the", "and", "der", "le", "el", "of")))

  property("in-set count == reference distinct-intersection size") =
    forAll(tokenLists) { toks =>
      val set = Seq("the", "and", "der", "le", "el")
      val hs = new java.util.HashSet[UTF8String]()
      set.foreach(w => hs.add(UTF8String.fromString(w)))
      val got = TextKernels.inSetCount(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any]), hs)
      got == (toks.toSet & set.toSet).size
    }

  property("str len sum == reference Σ length (code points)") =
    forAll(Gen.listOf(Gen.asciiPrintableStr)) { toks =>
      val got = TextKernels.lenSum(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any]))
      got == toks.map(_.length).sum
    }

  property("subword sum == reference Σ max(1, ceil(len/4.0))") =
    forAll(Gen.listOf(Gen.alphaNumStr)) { toks =>
      val got = TextKernels.subwordSum(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any]))
      got == toks.map(t => math.max(1, math.ceil(t.length / 4.0).toInt)).sum
    }

  property("token cleanup == reference possessive strip + stopword filter") =
    forAll(Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.alphaNumStr.map(_ + "'s"), Gen.oneOf("the", "and", "of")))) { toks =>
      val stop = Seq("the", "and", "of")
      val hs = new java.util.HashSet[UTF8String]()
      stop.foreach(w => hs.add(UTF8String.fromString(w)))
      val got = TokenCleanup.compute(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any]), hs)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val exp = toks.map(t => if (t.endsWith("'s")) t.dropRight(2) else t)
        .filterNot(stop.contains)
      got == exp
    }

  property("span cut == reference coverage-set filter") =
    forAll(
      Gen.listOf(Gen.alphaNumStr),
      Gen.listOf(Gen.chooseNum(0, 60)),
      Gen.chooseNum(1, 6)) { (toks, rawStarts, k) =>
      val starts = rawStarts.filter(_ < toks.length).distinct.sorted
      val row = SpanCutKernel.compute(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any]),
        new GenericArrayData(starts.toArray), k)
      val covered = starts.flatMap(s => s until math.min(s + k, toks.length)).toSet
      val expKept = toks.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      row.getInt(0) == toks.length - expKept.length &&
        row.getUTF8String(1).toString == expKept.mkString(" ")
    }

  property("bpe encode == reference min-rank merge loop") =
    forAll(
      Gen.listOf(Gen.oneOf("a", "b", "c", "d")),
      Gen.listOf(Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.oneOf("a", "b", "c", "d")))) {
      (syms, rawMerges) =>
        val merges = rawMerges.distinct.toArray
        val table = BpeEncodeKernel.buildTable(merges)
        val got = BpeEncodeKernel.compute(
          new GenericArrayData(syms.map(UTF8String.fromString).toArray[Any]), table)
          .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
        // reference: repeatedly merge the lowest-rank present pair
        val rank = merges.zipWithIndex.toMap
        var cur = syms.toVector
        var go = cur.length > 1
        while (go) {
          val present = cur.indices.dropRight(1)
            .flatMap(i => rank.get((cur(i), cur(i + 1))))
          if (present.isEmpty) go = false
          else {
            val (a, b) = merges(present.min)
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < cur.length) {
              if (i + 1 < cur.length && cur(i) == a && cur(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += cur(i); i += 1 }
            }
            cur = out.toVector
            go = cur.length > 1
          }
        }
        got == cur
    }

  property("minhash signature == reference min over universal hashes") =
    forAll(longArrays.suchThat(_.nonEmpty)) { xs =>
      val as = Seq(3L, 7L, 11L)
      val bs = Seq(1L, 5L, 13L)
      val got = MinHashSignatureExpr(
        org.apache.spark.sql.catalyst.expressions.Literal(1), as, bs)
        .nullSafeEval(new GenericArrayData(xs.toArray))
        .asInstanceOf[GenericArrayData].toIntArray.toSeq
      val exp = as.zip(bs).map { case (a, b) =>
        xs.map(h => ((h % P) * a + b) % P).min.toInt
      }
      got == exp
    }

  property("dup-ngram coverage == reference count + span union") = {
    // tiny alphabet so repeated n-grams actually occur
    val toks = Gen.listOf(Gen.oneOf("a", "b", "c"))
    val ns = Gen.chooseNum(2, 4)
    forAll(toks, ns) { (xs, n) =>
      val got = TextKernels.dupNgramCovered(
        new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any]), n)
      val exp =
        if (xs.length < n) 0
        else {
          val grams = xs.sliding(n).map(_.mkString(" ")).toVector
          val counts = grams.groupBy(identity).map { case (k, v) => k -> v.size }
          grams.zipWithIndex.collect {
            case (g, i) if counts(g) >= 2 => i until (i + n)
          }.flatten.toSet.size
        }
      got == exp
    }
  }
}
