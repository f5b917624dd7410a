package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Batch property tests for the text scrubbing operators: hundreds of
 * seeded-random adversarial inputs checked in ONE Spark job per law
 * (a per-case session round-trip would dominate the suite's runtime).
 *
 * The law that matters for both operators is IDEMPOTENCE: pipelines
 * re-run over partially-processed corpora (retries, incremental
 * crawls), so canonicalize(canonicalize(u)) must equal
 * canonicalize(u) and redact(redact(t)) must equal redact(t) — a
 * canonicalizer that keeps stripping, or a redactor whose own tags
 * re-trigger a pattern, silently corrupts data on the second pass.
 */
class TextPropsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  private def randomUrl(): String = {
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val scheme = pick(Seq("http", "HTTP", "https", "HTTPS", "hTtP"))
    val www = pick(Seq("", "www.", "WWW."))
    val host = pick(Seq("example.com", "Sub.Example.COM", "a-b.org", "x.io"))
    val port = pick(Seq("", ":80", ":443", ":8080"))
    val path = pick(Seq("", "/", "/A/b", "/Path/To/Page/", "/p.html", "/a//",
      "/utm_campaign=x/page"))
    val query = pick(Seq("", "?id=3", "?utm_source=x", "?utm_source=x&id=3",
      "?id=3&utm_medium=m&z=9", "?fbclid=abc", "?gclid=1&utm_campaign=c",
      "?utm_a=1&utm_b=2&id=3", "?myfbclid=1&id=2", "?utm_a=1&id=2&utm_b=3"))
    val frag = pick(Seq("", "#top", "#Sec2"))
    s"$scheme://$www$host$port$path$query$frag"
  }

  private def randomPiiText(): String = {
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val bits = Seq.fill(6)(pick(Seq(
      "plain words here", s"u${rnd.nextInt(99)}@ex${rnd.nextInt(9)}.com",
      s"10.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}",
      s"${100 + rnd.nextInt(900)}-${10 + rnd.nextInt(90)}-${1000 + rnd.nextInt(9000)}",
      s"${100 + rnd.nextInt(900)}-${100 + rnd.nextInt(900)}-${1000 + rnd.nextInt(9000)}",
      "v1.2.3 build", "a@b", "999.999.999.999")))
    bits.mkString(" ")
  }

  test("canonicalizeUrl is idempotent over 500 adversarial URLs") {
    val urls = Seq.fill(500)(randomUrl()).toDF("u")
    val bad = urls
      .withColumn("c1", UrlNormalize.canonicalizeUrl(col("u")))
      .withColumn("c2", UrlNormalize.canonicalizeUrl(col("c1")))
      .filter(col("c1") =!= col("c2"))
      .select("u", "c1", "c2").collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("redactPii is idempotent over 500 PII-laced texts") {
    val texts = Seq.fill(500)(randomPiiText()).toDF("t")
    val bad = texts
      .withColumn("r1", Redaction.redactPii(col("t")))
      .withColumn("r2", Redaction.redactPii(col("r1")))
      .filter(col("r1") =!= col("r2"))
      .select("t", "r1", "r2").collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("redacted output never contains a residual full PII match") {
    val texts = Seq.fill(500)(randomPiiText()).toDF("t")
    val counts = Redaction.piiCounts(Redaction.redactPii(col("t")))
      .map { case (n, c) => sum(c).as(n) }
    val row = texts.agg(counts.head, counts.tail: _*).collect().head
    (0 until row.length).foreach(i => assert(row.getLong(i) === 0L, s"pattern $i refired"))
  }

  test("chunking at stride == chunkSize reconstructs every token exactly once") {
    val docs = (1 to 50).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(s"w${rnd.nextInt(20)}"))).toDF("id", "toks")
    val chunks = graft.ops.Chunking.chunkTokens(docs, col("id"), col("toks"), 7, 7)
    val rebuilt = chunks.filter(col("chunk_text") =!= "")
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ", flatten(sort_array(collect_list(
        struct(col("chunk_start"), split(col("chunk_text"), " ")))).getField("col2"))).as("round_trip"))
    val orig = docs.select(col("id").as("doc_id"), concat_ws(" ", col("toks")).as("orig"))
    val bad = rebuilt.join(orig, "doc_id")
      .filter(col("round_trip") =!= col("orig")).collect()
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }
}
