package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract spec: the driver's expectations over SparkEntry. */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry (flagship) returns shard counts; total == distinct doc ids") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length === 4)
    // entry dedups by id (retain-most-recent), so the store holds one
    // row per distinct id — the synthetic lineitem has colliding
    // (orderkey, linenumber) pairs, which is exactly what dedup is for
    val distinctIds = Tables.lineitem(spark, TestSpark.sf)
      .select(concat(col("l_orderkey"), lit("#"), col("l_linenumber")))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("cnt")).sum === distinctIds)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query runs at sf0.001 and returns rows") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, TestSpark.sf).count()
        if (n > 0) None else Some(s"$name: 0 rows")
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("oracle SQL strings reference an existing table or the sf dir") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = sql.toLowerCase
      // {sf_dir} oracles (q34) address the raw data files directly via
      // read_blob; Verify substitutes the absolute path at dump time
      assert(tables.exists(t => lower.contains(t)) || lower.contains("{sf_dir}"),
        s"$name oracle references no table")
    }
  }
}
