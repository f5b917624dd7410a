package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join == plain join on a skewed key distribution") {
    import spark.implicits._
    // pathological skew: 90% of the fact rows share one key
    val large = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong % 25 else 7L, i))
      .toDF("k", "v")
    val small = (0L until 25L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Joins.saltedJoin(large, small, "k", saltBuckets = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.size === 5000) // every fact row joined exactly once
  }

  test("asofJoin: latest right row at-or-before each left ts, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 300L),
      (4L, 20L, 150L), (5L, 30L, 500L))
      .toDF("event_id", "k", "t")
    val right = Seq(
      (10L, 100L, "r@100"), (10L, 200L, "r@200"), (10L, 250L, "r@250"),
      (20L, 160L, "r@160"))
      .toDF("k", "t", "payload")
    val got = Joins.asofJoin(left, right, "k", "t", "t", Seq("payload"))
      .orderBy("event_id")
      .select("event_id", "payload").as[(Long, Option[String])].collect().toSeq
    assert(got === Seq(
      1L -> Some("r@100"),  // equal ts matches (inclusive)
      2L -> Some("r@200"),  // latest of 100/200 wins
      3L -> Some("r@250"),
      4L -> None,           // right row is LATER -> no match
      5L -> None))          // key absent on the right
  }

  test("asofJoin: inputs carrying reserved working names fail fast") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "k", "__t")
    val right = Seq((10L, 100L, "p")).toDF("k", "t", "payload")
    val e = intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right, "k", "__t", "t", Seq("payload"))
    }
    assert(e.getMessage.contains("__t"))
  }

  test("asofJoin: a matched right row with NULL payload is a match, not a skip") {
    import spark.implicits._
    val left = Seq((1L, 10L, 150L)).toDF("event_id", "k", "t")
    val right = Seq((10L, 50L, Some("old")), (10L, 100L, Option.empty[String]))
      .toDF("k", "t", "payload")
    val got = Joins.asofJoin(left, right, "k", "t", "t", Seq("payload"))
      .select("event_id", "payload").as[(Long, Option[String])].collect().toSeq
    // the t=100 row is the as-of match; its payload is null — carrying
    // 'old' forward would resurrect a stale value
    assert(got === Seq(1L -> None))
  }

  test("asofJoin == naive per-row max-prior lookup on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = (1 to 400).map(i => (i.toLong, (i % 13).toLong, rnd.nextInt(1000).toLong))
      .toDF("event_id", "k", "t")
    val right = (1 to 200).map(i => ((i % 13).toLong, rnd.nextInt(1000).toLong * 10 + (i % 13), s"p$i"))
      .toDF("k", "t", "payload")
    // (k, t) unique on the right by construction (t encodes k in the low digit)
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("payload"), col("r.t")).as("payload"))
      .select("event_id", "payload")
      .as[(Long, Option[String])].collect().toMap
    val got = Joins.asofJoin(left, right, "k", "t", "t", Seq("payload"))
      .select("event_id", "payload").as[(Long, Option[String])].collect().toMap
    assert(got === naive)
  }

  test("rangeJoinBinned == naive BETWEEN join; intervals may span bins") {
    import spark.implicits._
    val points = (0L to 500L by 7L).map(p => (p, s"pt$p")).toDF("p", "tag")
    val intervals = Seq(
      (1L, 0L, 99L),     // within one bin
      (2L, 95L, 310L),   // spans 4 bins
      (3L, 200L, 200L),  // degenerate single point
      (4L, 480L, 600L))  // past the data edge
      .toDF("iv", "s", "e")
    val naive = points.join(intervals, col("p") >= col("s") && col("p") <= col("e"))
      .select("iv", "p").as[(Long, Long)].collect().toSet
    val got = Joins.rangeJoinBinned(points, "p", intervals, "s", "e", binSize = 100)
      .select("iv", "p").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got.nonEmpty)
    // no duplicates: binning must not double-count a matching pair
    val gotList = Joins.rangeJoinBinned(points, "p", intervals, "s", "e", binSize = 100)
      .select("iv", "p").as[(Long, Long)].collect().toSeq
    assert(gotList.size === gotList.toSet.size)
  }

  test("shard store stats: rows/files/bytes per shard") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stats_").toString
    val docs = Tables.lineitem(spark, TestSpark.sf).limit(2000)
      .withColumn("id", concat(col("l_orderkey"), lit("#"), col("l_linenumber")))
    graft.index.ShardIndex.write(docs, "id", dir, shards = 2)
    val st = graft.index.ShardIndex.stats(spark, dir).collect()
    assert(st.length === 2)
    assert(st.map(_.getAs[Long]("rows")).sum === 2000)
    st.foreach { r =>
      assert(r.getAs[Int]("files") >= 1)
      assert(r.getAs[Long]("bytes") > 0)
    }
  }
}
