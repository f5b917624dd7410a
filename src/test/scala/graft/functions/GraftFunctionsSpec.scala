package graft.functions

import graft.TestSpark
import graft.route.{HashRangeRouter, SolrHash}
import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("custom expressions callable from SQL text") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT solr_hash('doc1') AS h, solr_shard('doc1', 16) AS s,
        |       array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       jaccard_sim(array('a', 'b', 'c'), array('b', 'c', 'd')) AS j
      """.stripMargin).collect().head
    assert(row.getAs[Int]("h") === SolrHash.hashString("doc1"))
    assert(row.getAs[Int]("s") === HashRangeRouter(16).shardOfId("doc1"))
    assert(row.getAs[Double]("d") === 11.0)
    assert(row.getAs[Double]("j") === 0.5)
  }

  test("SQL routing distributes a generated id range like the driver-side router") {
    GraftFunctions.register(spark)
    val counts = spark.sql(
      """SELECT solr_shard(CAST(id AS STRING), 4) AS shard, count(*) AS n
        |FROM range(0, 10000) GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(counts.length === 4)
    assert(counts.map(_.getAs[Long]("n")).sum === 10000)
  }
}
