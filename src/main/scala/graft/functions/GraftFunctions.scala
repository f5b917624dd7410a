package graft.functions

import graft.route.{HashRangeRouter, SolrMurmurHash, SolrShardRoute}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/**
 * SQL registration for graft's custom expressions, so `spark.sql`
 * text queries can use them alongside the DataFrame API:
 *
 *   SELECT solr_hash(id), solr_shard(id, 16), array_dot(a, b) ...
 */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("solr_hash",
      (args: Seq[Expression]) => SolrMurmurHash(args.head), "scala_udf")
    registry.createOrReplaceTempFunction("solr_shard",
      (args: Seq[Expression]) => args match {
        case Seq(id, Literal(shards: Int, _)) =>
          SolrShardRoute(id, HashRangeRouter(shards), 1)
        case _ => throw new IllegalArgumentException(
          "usage: solr_shard(idColumn, <literal shard count>)")
      }, "scala_udf")
    registry.createOrReplaceTempFunction("array_dot",
      (args: Seq[Expression]) => ArrayDotProduct(args(0), args(1)), "scala_udf")
    registry.createOrReplaceTempFunction("jaccard_sim",
      (args: Seq[Expression]) => JaccardSimilarity(args(0), args(1)), "scala_udf")
  }
}
