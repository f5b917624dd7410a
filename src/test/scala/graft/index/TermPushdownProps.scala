package graft.index

import graft.TestSpark
import graft.functions.TermMatch.graft_term_match
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

/**
 * End-to-end property fuzz of the term-pushdown GRAMMAR
 * ([[TermFilterPushdown]] → `termFilter` option → the scan builder's
 * parser → posting lookups): random boolean trees over every leaf
 * class the rule and the DSv2 pushdown handle — verbatim-array term,
 * analyzed-scalar term, analyzed-array term, scalar equality, prefix,
 * numeric range — with terms that deliberately contain the option
 * grammar's own delimiters (',' '|' '!' ':'), URL-encoding hazards
 * ('%', spaces, '+'-adjacent text), case folds, unicode, zero-token
 * values and absent terms.
 *
 * Every generated tree is evaluated THREE ways and must agree on the
 * row set:
 *
 *  1. the GraftExtensions session (rule fires, terms push);
 *  2. the same session with the rule EXCLUDED via
 *     `spark.sql.optimizer.excludedRules` — the extension-free plan
 *     over the same store (the rule's own contract: "sessions without
 *     GraftExtensions get the same rows");
 *  3. plain Spark over the ORIGINAL DataFrame (ground truth; the
 *     store's surfacing contract applied — a doc with no stored
 *     values for a field reads NULL, not an empty array).
 *
 * This is the r12 ADVICE-high failure class (a pushed scan narrowing
 * below the residual's match set) generalized from hand-picked
 * examples to ≥100 random grammars per run.
 */
object TermPushdownProps extends Properties("term-pushdown-grammar") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(110)

  private lazy val spark = TestSpark.spark

  private val ExcludedRuleConf = "spark.sql.optimizer.excludedRules"
  private val RuleName = "graft.index.TermFilterPushdown"

  // stored values stress the grammar: option delimiters, percent signs
  // (URL-encoding), multi-token analyzed values, unicode, zero-token
  private val storedVocab = Vector("red", "blue", "a|b", "c,d", "x!y",
    "100%", "nlp-tools", "Spark SCALES", "grün:ok", "one two", "!!!",
    "plain")
  // query terms add case folds, single tokens of multi-token values,
  // absent terms and the empty string
  private val queryTerms = storedVocab ++ Vector("Red", "spark", "scales",
    "nlp", "tools", "grün", "ok", "absent", "a", "", "one")

  /** (ground-truth frame, store path) — one store for the whole run. */
  private lazy val (truth, idxPath) = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    def pick() = storedVocab(rnd.nextInt(storedVocab.size))
    val rows = (0 until 48).map { i =>
      val vtags = Seq.fill(rnd.nextInt(4))(pick())
      val atags = Seq.fill(rnd.nextInt(4))(pick())
      val atext = if (rnd.nextInt(6) == 0) null else pick()
      val sv = if (rnd.nextInt(8) == 0) null else pick()
      (i.toString, vtags, atext, atags, sv, rnd.nextInt(100).toLong)
    }
    val df = rows.toDF("id", "vtags", "atext", "atags", "sv", "n")
    val out = java.nio.file.Files.createTempDirectory("graft_fuzz_").toString
    SegmentShardSink.write(df, "id", out, shards = 2,
      analyzedFields = Set("atext", "atags"))
    val t = df
      .withColumn("vtags",
        when(size(col("vtags")) === 0, lit(null)).otherwise(col("vtags")))
      .withColumn("atags",
        when(size(col("atags")) === 0, lit(null)).otherwise(col("atags")))
      .cache()
    t.count()
    (t, out)
  }

  private def arr: DataFrame = spark.read.format("graft-index")
    .option("multivalued", "array").load(idxPath)

  // ---- predicate AST --------------------------------------------------
  sealed trait P
  private final case class AC(t: String) extends P // verbatim array term
  private final case class TM(t: String) extends P // analyzed scalar term
  private final case class EX(t: String) extends P // analyzed array term
  private final case class EQ(t: String) extends P // scalar equality
  private final case class PR(t: String) extends P // prefix
  private final case class NR(lo: Long, hi: Long) extends P // numeric range
  private final case class Nt(p: P) extends P
  private final case class Ad(a: P, b: P) extends P
  private final case class Orr(a: P, b: P) extends P

  private def toCol(p: P): Column = p match {
    case AC(t) => array_contains(col("vtags"), t)
    case TM(t) => graft_term_match(col("atext"), lit(t))
    case EX(t) => exists(col("atags"), x => graft_term_match(x, lit(t)))
    case EQ(t) => col("sv") === t
    case PR(t) => col("sv").startsWith(t)
    case NR(lo, hi) => col("n") >= lo && col("n") < hi
    case Nt(x) => !toCol(x)
    case Ad(a, b) => toCol(a) && toCol(b)
    case Orr(a, b) => toCol(a) || toCol(b)
  }

  private val genTerm: Gen[String] = Gen.oneOf(queryTerms)
  private val genLeaf: Gen[P] = Gen.oneOf(
    genTerm.map(AC), genTerm.map(TM), genTerm.map(EX), genTerm.map(EQ),
    Gen.oneOf("r", "a", "nlp", "Sp", "x", "grün").map(PR),
    for { a <- Gen.choose(0L, 100L); b <- Gen.choose(0L, 100L) }
      yield NR(math.min(a, b), math.max(a, b)))
  private def genTree(depth: Int): Gen[P] =
    if (depth == 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      2 -> Gen.lzy(genTree(depth - 1).map(Nt)),
      3 -> Gen.lzy(for { a <- genTree(depth - 1); b <- genTree(depth - 1) }
        yield Ad(a, b)),
      3 -> Gen.lzy(for { a <- genTree(depth - 1); b <- genTree(depth - 1) }
        yield Orr(a, b)))

  private def ids(df: DataFrame, p: P): Set[String] =
    df.filter(toCol(p)).select("id").collect().map(_.getString(0)).toSet

  private def idsExcluded(p: P): Set[String] =
    try {
      spark.conf.set(ExcludedRuleConf, RuleName)
      ids(arr, p)
    } finally spark.conf.unset(ExcludedRuleConf)

  // canary: the exclusion mechanism really disables the rule — without
  // it the comparison below would be vacuously pushed-vs-pushed
  property("excludedRules canary actually unplugs the rule") = {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scanDesc(df: DataFrame): String =
      df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b.scan.description()
      }.getOrElse("")
    val q = arr.filter(array_contains(col("vtags"), "red"))
    val on = scanDesc(q)
    val off = try {
      spark.conf.set(ExcludedRuleConf, RuleName)
      scanDesc(arr.filter(array_contains(col("vtags"), "red")))
    } finally spark.conf.unset(ExcludedRuleConf)
    (on.contains("pushedTerm=vtags:red") :| s"rule did not fire: $on") &&
      (!off.contains("pushedTerm=vtags:red") :| s"exclusion ineffective: $off")
  }

  property("pushed == rule-excluded == ground truth over random trees") =
    forAll(genTree(3)) { p =>
      val pushed = ids(arr, p)
      val excluded = idsExcluded(p)
      val expected = ids(truth, p)
      ((pushed == excluded) :|
        s"pushed ${pushed.size} != excluded ${excluded.size} for $p " +
          s"(diff ${(pushed diff excluded) ++ (excluded diff pushed)})") &&
        ((pushed == expected) :|
          s"pushed ${pushed.size} != truth ${expected.size} for $p " +
            s"(diff ${(pushed diff expected) ++ (expected diff pushed)})")
    }
}
