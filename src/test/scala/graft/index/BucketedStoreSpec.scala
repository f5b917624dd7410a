package graft.index

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // the catalog is fresh per JVM but the warehouse dir persists —
    // remove the stale location too
    val loc = java.nio.file.Paths.get("spark-warehouse", name)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("bucketed store: key agg and key join plan with NO shuffle exchange") {
    dropTable("graft_orders_bucketed")
    dropTable("graft_li_bucketed")
    val docs = Tables.orders(spark, TestSpark.sf)
    ShardIndex.writeBucketed(docs, "o_orderkey", "graft_orders_bucketed", 8)
    val bucketed = spark.table("graft_orders_bucketed")

    // aggregation on the bucket key: bucket layout replaces the shuffle
    val aggPlan = bucketed.groupBy(col("o_orderkey")).agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"), aggPlan.take(1500))

    ShardIndex.writeBucketed(
      Tables.lineitem(spark, TestSpark.sf)
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("qty")),
      "l_orderkey", "graft_li_bucketed", 8)
    val li = spark.table("graft_li_bucketed")

    // force the sort-merge path (small test tables would broadcast) to
    // show the co-located join: bucket-to-bucket, no shuffle exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = bucketed.join(li, col("o_orderkey") === col("l_orderkey"))
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(joinPlan.contains("SortMergeJoin"), joinPlan.take(2000))
      assert(!joinPlan.contains("Exchange hashpartitioning"), joinPlan.take(2000))
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
