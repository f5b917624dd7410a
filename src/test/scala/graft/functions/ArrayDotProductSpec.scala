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

  test("null inputs, empty and length-mismatched arrays") {
    val got = spark.sql(
      """SELECT
        | CAST(NULL AS ARRAY<DOUBLE>) AS a, array(1.0d, 2.0d) AS b
      """.stripMargin)
      .select(array_dot(col("a"), col("b")).as("d"))
      .collect().head
    assert(got.isNullAt(0))
    val vals = Seq(
      (Seq.empty[Double], Seq.empty[Double], 0.0),
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0), 14.0) // min-length semantics
    )
    vals.foreach { case (a, b, expect) =>
      val d = Seq((a, b)).toDF("a", "b")
        .select(array_dot(col("a"), col("b"))).as[Double].collect().head
      assert(d === expect, s"$a . $b")
    }
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
