package graft.search

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionQuerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq((1L, 10.0, 4L), (2L, -2.5, 9L)).toDF("id", "x", "n")

  private def eval(fq: String): Map[Long, Double] =
    df.withColumn("v", FunctionQuery.compile(fq, df.schema))
      .select("id", "v").as[(Long, Double)].collect().toMap

  test("arithmetic, nesting, literals, field refs") {
    assert(eval("sum(x, 1, product(n, 2))") === Map(1L -> 19.0, 2L -> 16.5))
    assert(eval("div(sub(x, n), 2)") === Map(1L -> 3.0, 2L -> -5.75))
    assert(eval("max(abs(x), sqrt(n))") === Map(1L -> 10.0, 2L -> 3.0))
    assert(eval("linear(n, 3, -1)") === Map(1L -> 11.0, 2L -> 26.0))
    assert(eval("recip(n, 1, 1000, 1000)") ===
      Map(1L -> 1000.0 / 1004.0, 2L -> 1000.0 / 1009.0))
    assert(eval("if(sub(n, 4), x, 42)") === Map(1L -> 42.0, 2L -> -2.5))
  }

  test("unknown field and trailing garbage are rejected") {
    val e1 = intercept[IllegalArgumentException] {
      FunctionQuery.compile("sum(nope, 1)", df.schema)
    }
    assert(e1.getMessage.contains("unknown field"))
    val e2 = intercept[IllegalArgumentException] {
      FunctionQuery.compile("sum(x, 1)) extra", df.schema)
    }
    assert(e2.getMessage.contains("trailing"))
  }

  test("strdist: edit similarity over string fields and literals") {
    val sdf = Seq((1L, "spark"), (2L, "spork"), (3L, "query"), (4L, ""))
      .toDF("id", "s")
    val got = sdf.withColumn("v",
        FunctionQuery.compile("""strdist(s, "spark")""", sdf.schema))
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(got(1L) === 1.0)
    assert(got(2L) === 1.0 - 1.0 / 5.0)
    assert(got(3L) === 1.0 - 4.0 / 5.0) // query/spark share the 'r'
    assert(got(4L) === 0.0) // "" vs "spark": lev 5 / max 5
    // both-empty edge returns 1.0 (identical)
    val both = sdf.withColumn("v",
        FunctionQuery.compile("""strdist(s, "")""", sdf.schema))
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(both(4L) === 1.0)
  }

  test("termfreq()/exists(): analyzed-token counts and null probes") {
    import spark.implicits._
    val df = Seq((1L, "Spark and spark, SPARK!", 10L),
                 (2L, "no match here", 20L),
                 (3L, null.asInstanceOf[String], 30L)).toDF("id", "text", "n")
    val tf = df.withColumn("v",
        FunctionQuery.compile("termfreq(text,'spark')", df.schema))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toMap
    assert(tf(1L) === 3.0) // case-folded, punctuation-split
    assert(tf(2L) === 0.0)
    val ex = df.withColumn("v",
        FunctionQuery.compile("exists(text)", df.schema))
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(ex === Map(1L -> 1.0, 2L -> 1.0, 3L -> 0.0))
    // composes inside the numeric function space
    val c = df.withColumn("v", FunctionQuery.compile(
        "sum(product(termfreq(text,'spark'),2),1)", df.schema))
      .filter(col("id") === 1).select("v").as[Double].collect().head
    assert(c === 7.0)
  }

  test("{!frange}: bounds, inclusivity flags, open ends") {
    import spark.implicits._
    val df = Seq((1L, 0.0), (2L, 500.0), (3L, 1500.0), (4L, 4500.0))
      .toDF("id", "x")
    def ids(q: String): Seq[Long] =
      df.filter(FunctionQuery.frange(q, df.schema))
        .select("id").as[Long].collect().sorted.toSeq
    // recip(x,1,500,500) = 500/(x+500): 1.0, 0.5, 0.25, 0.1
    assert(ids("{!frange l=0.25 u=0.5}recip(x,1,500,500)") === Seq(2L, 3L))
    assert(ids("{!frange l=0.25 u=0.5 incu=false}recip(x,1,500,500)") === Seq(3L))
    assert(ids("{!frange l=0.25 u=0.5 incl=false}recip(x,1,500,500)") === Seq(2L))
    assert(ids("{!frange u=0.25}recip(x,1,500,500)") === Seq(3L, 4L))
    assert(ids("{!frange l=0.5}recip(x,1,500,500)") === Seq(1L, 2L))
    intercept[RuntimeException](FunctionQuery.frange("x:[1 TO 2]", df.schema))
  }

  test("map(): range collapse with and without the default arg") {
    val df = Seq((1L, 100L), (2L, 500L)).toDF("id", "n")
    val got = df.select(col("id"),
        graft.Graft.functionQuery("map(n,0,299,0,1)", df).as("m5"),
        graft.Graft.functionQuery("map(n,0,299,0)", df).as("m4"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((0.0, 0.0)))
    assert(got(2L) === ((1.0, 500.0))) // 4-arg form falls back to the value
  }
}
