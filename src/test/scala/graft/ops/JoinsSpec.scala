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
