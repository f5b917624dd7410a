package graft.functions

import graft.TestSpark
import graft.functions.ArrayDotProduct.array_dot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ArrayDotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("array_dot == aggregate(zip_with) bit-for-bit (fold-order parity)") {
    val df = graft.Tables.embeddings(spark, TestSpark.sf)
      .select(col("embedding").cast("array<double>").as("v"))
      .limit(100)
    val pairs = df.as("a").crossJoin(df.as("b")).limit(2000)
      .select(
        array_dot(col("a.v"), col("b.v")).as("fused"),
        aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("composed"))
    // bitwise equality, not tolerance — the whole point
    assert(pairs.filter(col("fused") =!= col("composed")).count() === 0)
  }

  test("null inputs, null elements and length mismatch all yield NULL (zip_with parity)") {
    // null input array
    assert(spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS a, array(1.0d, 2.0d) AS b")
      .select(array_dot(col("a"), col("b")).as("d")).collect().head.isNullAt(0))
    // empty arrays: empty sum = 0.0
    val empty = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
      .select(array_dot(col("a"), col("b"))).as[Double].collect().head
    assert(empty === 0.0)
    // length mismatch: zip_with pads with NULL -> NULL (was min-length)
    assert(Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
      .select(array_dot(col("a"), col("b"))).collect().head.isNullAt(0))
    // null element on either side -> NULL
    assert(spark.sql("SELECT array(1.0d, CAST(NULL AS DOUBLE)) AS a, array(1.0d, 2.0d) AS b")
      .select(array_dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("SQL typing: int arrays cast implicitly, non-numeric types fail analysis") {
    graft.functions.GraftFunctions.register(spark)
    // integer literals upcast to double — same answer as the double form
    val d = spark.sql("SELECT array_dot(array(1, 2), array(3, 4)) AS d")
      .as[Double].collect().head
    assert(d === 11.0)
    // strings are not castable to array<double>: clean analysis error,
    // not a runtime ClassCastException over garbage bytes
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT array_dot(array('x'), array('y'))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array_dot") ||
      e.getMessage.toLowerCase.contains("data type mismatch"), e.getMessage)
  }

  test("interpreted eval matches codegen") {
    val e = ArrayDotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.5, -2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2.0, 0.5, 1.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) === (1.5 * 2.0 + -2.0 * 0.5 + 3.0 * 1.0))
  }
}
