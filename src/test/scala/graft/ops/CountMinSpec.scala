package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kernel: estimates never under-count (the no-false-negative guarantee)") {
    val (d, w) = CountMin.optimalParams(0.01, 0.01)
    val grid = new Array[Long](d * w)
    val truth = scala.collection.mutable.Map.empty[String, Long]
    val rnd = new scala.util.Random(7)
    (0 until 20000).foreach { _ =>
      val item = s"tok-${rnd.nextInt(500)}"
      CountMinKernel.add(grid, d, w, item.getBytes("UTF-8"))
      truth(item) = truth.getOrElse(item, 0L) + 1
    }
    truth.foreach { case (item, t) =>
      val est = CountMinKernel.estimate(grid, d, w, item.getBytes("UTF-8"))
      assert(est >= t, s"$item under-counted: $est < $t")
      assert(est <= t + (0.01 * 20000).toLong + 1,
        s"$item over-counted past the epsilon bound: $est vs $t")
    }
  }

  test("merge is cell-wise add: split-stream sketch equals one-stream sketch") {
    val (d, w) = CountMin.optimalParams(0.01, 0.01)
    val whole = new Array[Long](d * w)
    val a = new Array[Long](d * w); val b = new Array[Long](d * w)
    (0 until 1000).foreach { i =>
      val key = s"k${i % 37}".getBytes("UTF-8")
      CountMinKernel.add(whole, d, w, key)
      CountMinKernel.add(if (i % 2 == 0) a else b, d, w, key)
    }
    CountMinKernel.merge(a, b)
    assert(a.toSeq === whole.toSeq)
  }

  test("heavyHitters is exact: zipfian stream, phi separates head from tail") {
    // item i appears 1000/i times: items 1-9 clear the 2% support of
    // N = 1000 * H(50) ≈ 4499, tail items don't
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    val df = rows.toDF("tok")
    val got = CountMin.heavyHitters(df, "tok", phi = 0.02, epsilon = 0.005)
      .as[(String, Long)].collect().toSeq
    val n = rows.size
    val threshold = math.ceil(0.02 * n).toLong
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= threshold).toSeq
      .sortBy { case (k, c) => (-c, k) }
    assert(got === want)
    assert(got.nonEmpty && got.size < 15)
  }

  test("sketch totalAdds equals the stream length") {
    val items = spark.range(0, 5000)
      .select(concat(lit("t"), col("id") % 100).as("s")).as[String]
    val sk = CountMin.buildSketch(items, epsilon = 0.01)
    assert(sk.totalAdds === 5000L)
    assert(sk.estimate("t5") >= 50L)
  }
}
