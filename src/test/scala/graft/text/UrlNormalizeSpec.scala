package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(s: String): String =
    Seq(s).toDF("u").select(UrlNormalize.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().head

  test("lowercases scheme and host but not the path") {
    assert(canon("HTTP://EXAMPLE.COM/Path/File") === "http://example.com/Path/File")
  }

  test("strips www., default ports, fragments, trailing slash") {
    assert(canon("https://www.example.com:443/a/") === "https://example.com/a")
    assert(canon("http://example.com:80") === "http://example.com")
    assert(canon("http://example.com/a#section-2") === "http://example.com/a")
  }

  test("keeps non-default ports and non-www subdomains") {
    assert(canon("http://example.com:8080/a") === "http://example.com:8080/a")
    assert(canon("http://api.example.com/a") === "http://api.example.com/a")
  }

  test("port defaults are PER SCHEME: https:80 and http:443 are real ports") {
    assert(canon("https://e.com:80/a") === "https://e.com:80/a")
    assert(canon("http://e.com:443/a") === "http://e.com:443/a")
  }

  test("strips tracking params, keeps the rest of the query") {
    assert(canon("http://e.com/p?utm_source=x&id=7&utm_medium=y") === "http://e.com/p?id=7")
    assert(canon("http://e.com/p?utm_source=x") === "http://e.com/p")
    assert(canon("http://e.com/p?id=7&fbclid=abc") === "http://e.com/p?id=7")
  }

  test("ADJACENT tracking params all go; params merely containing a tracking name survive") {
    assert(canon("http://e.com/p?utm_a=1&utm_b=2&id=3") === "http://e.com/p?id=3")
    assert(canon("http://e.com/p?utm_a=1&fbclid=x&gclid=y") === "http://e.com/p")
    // a different param whose NAME contains a tracking suffix is untouched
    assert(canon("http://e.com/p?myfbclid=1&id=2") === "http://e.com/p?myfbclid=1&id=2")
    // tracking-lookalike path segments are untouched (no ? or & before them)
    assert(canon("http://e.com/utm_campaign=x/page") === "http://e.com/utm_campaign=x/page")
  }

  test("double trailing slash canonicalizes same as single (idempotence)") {
    assert(canon("http://e.com/a//") === "http://e.com/a")
    assert(canon(canon("http://e.com/a//")) === canon("http://e.com/a//"))
  }

  test("the full noise stack collapses equivalent spellings to one key") {
    val variants = Seq(
      "HTTP://WWW.E.COM:80/a/?utm_source=f#x",
      "http://e.com/a/?utm_campaign=c",
      "http://www.e.com/a",
      "http://E.com:80/a/")
    val canons = variants.map(canon).distinct
    assert(canons === Seq("http://e.com/a"))
  }

  test("schemeless input passes through the lowercase step unchanged") {
    assert(canon("not a url") === "not a url")
  }

  test("host: lowercased authority, port stripped, '' for non-URLs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq(
      "HTTP://Ads.Example.COM:8080/x?q=1",
      "https://example.com/",
      "no scheme here")
      .toDF("u").select(UrlNormalize.host(col("u"))).as[String].collect().toSeq
    assert(got === Seq("ads.example.com", "example.com", ""))
  }

  test("blockedHost: exact domain and subdomains block, lookalikes don't") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val block = Seq("example.com", "Tracker.ORG")
    val cases = Seq(
      "http://example.com/a" -> true,        // exact
      "http://ads.example.com/a" -> true,    // subdomain
      "http://deep.ads.example.com" -> true, // deeper subdomain
      "http://notexample.com/a" -> false,    // suffix but not dot-anchored
      "http://example.com.evil.net" -> false,// blocked name as SUBSTRING
      "http://sub.tracker.org/x" -> true,    // case-folded entry
      "plain text" -> false)
    val got = cases.map(_._1).toDF("u")
      .select(UrlNormalize.blockedHost(col("u"), block)).as[Boolean].collect().toSeq
    assert(got === cases.map(_._2))
  }
}
