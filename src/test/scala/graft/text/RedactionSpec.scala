package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RedactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Redaction.redactPii(col("t")).as("r"))
      .as[String].collect().head

  test("redacts emails, IPs, SSNs and phone numbers with typed tags") {
    assert(redact("mail bob.smith+x@sub.example.org now") === "mail <EMAIL> now")
    assert(redact("from 192.168.0.1 port 80") === "from <IP> port 80")
    assert(redact("ssn is 123-45-6789.") === "ssn is <SSN>.")
    assert(redact("call 555-867-5309 or 555.867.5309") === "call <PHONE> or <PHONE>")
  }

  test("replaces every occurrence, not just the first") {
    assert(redact("a@b.com c@d.net") === "<EMAIL> <EMAIL>")
  }

  test("email rule wins over IP for dotted-quad hosts (order contract)") {
    assert(redact("u@10.0.0.1.example.com") === "<EMAIL>")
  }

  test("SSN (3-2-4) and phone (3-3-4) shapes do not cross-match") {
    assert(redact("123-45-6789") === "<SSN>")
    assert(redact("123-456-7890") === "<PHONE>")
  }

  test("does not fire inside longer digit runs (word boundaries)") {
    assert(redact("id 1234-45-67890 stays") === "id 1234-45-67890 stays")
  }

  test("piiCounts counts per type over the original text") {
    val row = Seq("a@b.com and 10.0.0.1 and 10.0.0.2 ssn 123-45-6789")
      .toDF("t")
      .select(Redaction.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getLong(0) === 1L) // email
    assert(row.getLong(1) === 2L) // ip
    assert(row.getLong(2) === 1L) // ssn
    assert(row.getLong(3) === 0L) // phone
  }
}
