package graft.search

import java.time.Instant
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Solr date math: resolution against a fixed anchor, and the range
  * integration in the query-string compiler over a timestamp column. */
class DateMathSpec extends AnyFunSuite {
  private val now = Instant.parse("2024-02-15T12:34:56.789Z")

  private def r(e: String): String = DateMath.resolve(e, now).toString

  test("NOW and truncation units") {
    assert(r("NOW") === "2024-02-15T12:34:56.789Z")
    assert(r("NOW/SECOND") === "2024-02-15T12:34:56Z")
    assert(r("NOW/MINUTE") === "2024-02-15T12:34:00Z")
    assert(r("NOW/HOUR") === "2024-02-15T12:00:00Z")
    assert(r("NOW/DAY") === "2024-02-15T00:00:00Z")
    assert(r("NOW/MONTH") === "2024-02-01T00:00:00Z")
    assert(r("NOW/YEAR") === "2024-01-01T00:00:00Z")
  }

  test("add/subtract with plural and singular units, left-to-right chains") {
    assert(r("NOW-7DAYS") === "2024-02-08T12:34:56.789Z")
    assert(r("NOW+1DAY") === "2024-02-16T12:34:56.789Z")
    assert(r("NOW-1MONTH/DAY") === "2024-01-15T00:00:00Z")
    assert(r("NOW/DAY+6HOURS") === "2024-02-15T06:00:00Z")
    assert(r("NOW-90MINUTES/HOUR") === "2024-02-15T11:00:00Z")
    assert(r("NOW+500MILLIS") === "2024-02-15T12:34:57.289Z")
  }

  test("explicit ISO anchor with op chain") {
    assert(r("2024-01-15T10:30:00Z/MONTH") === "2024-01-01T00:00:00Z")
    assert(r("2024-01-15T10:30:00Z+2DAYS/DAY") === "2024-01-17T00:00:00Z")
  }

  test("month arithmetic clamps day-of-month like java.time (Solr Calendar ditto)") {
    assert(DateMath.resolve("NOW+1MONTH", Instant.parse("2024-01-31T00:00:00Z")).toString
      === "2024-02-29T00:00:00Z")
  }

  test("malformed input rejected") {
    intercept[IllegalArgumentException](r("NOW-DAYS"))      // missing count
    intercept[IllegalArgumentException](r("NOW/FORTNIGHT")) // unknown unit
    intercept[IllegalArgumentException](r("YESTERDAY"))     // no anchor
    intercept[IllegalArgumentException](r("NOW~1DAY"))      // bad op
  }

  test("looksLikeDateMath: NOW forms and ISO+ops yes, plain literals no") {
    assert(DateMath.looksLikeDateMath("NOW"))
    assert(DateMath.looksLikeDateMath("NOW-7DAYS/DAY"))
    assert(DateMath.looksLikeDateMath("2024-01-15T10:30:00Z+2DAYS"))
    assert(!DateMath.looksLikeDateMath("2024-01-15T10:30:00Z")) // plain instant
    assert(!DateMath.looksLikeDateMath("2024-01-15"))
    assert(!DateMath.looksLikeDateMath("alpha"))
  }

  test("query-string range bounds resolve date math against the passed anchor") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-02-10 08:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-02-15 06:00:00")),
      (4L, java.sql.Timestamp.valueOf("2024-02-15 13:00:00"))
    ).toDF("id", "ts")
    def ids(q: String): Seq[Long] =
      df.filter(SolrQueryString.compile(q, df.schema, "id", now = Some(now)))
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    // [NOW-10DAYS/DAY TO NOW] = [2024-02-05T00:00, 2024-02-15T12:34:56.789]
    assert(ids("ts:[NOW-10DAYS/DAY TO NOW]") === Seq(2L, 3L))
    assert(ids("ts:[NOW/DAY TO NOW+1DAY/DAY]") === Seq(3L, 4L))
    // without now= the same query is a hard error, not wall-clock
    intercept[IllegalArgumentException] {
      SolrQueryString.compile("ts:[NOW-1DAY TO NOW]", df.schema, "id")
    }
  }
}
