package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = (1 to 300).map(i => (i.toLong, "g" + (i % 3))).toDF("id", "g")

  test("quotaSample: exactly k rows per group") {
    val got = Sampling.quotaSample(docs, col("g"), col("id"), k = 7)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(got === Map("g0" -> 7L, "g1" -> 7L, "g2" -> 7L))
  }

  test("quotaSample: deterministic across runs") {
    def ids = Sampling.quotaSample(docs, col("g"), col("id"), k = 5)
      .select("id").as[Long].collect().toSet
    assert(ids === ids)
  }

  test("quotaSample: k >= group size keeps the whole group") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    assert(Sampling.quotaSample(tiny, col("g"), col("id"), k = 10).count() === 3)
  }

  test("quotaSample: stable under growth — kept set only shrinks by hash order") {
    // a sampled id stays sampled unless a new id hashes before it
    val small = Sampling.quotaSample(docs.filter(col("id") <= 150), col("g"), col("id"), 5)
      .select("id").as[Long].collect().toSet
    val bigTop = Sampling.quotaSample(docs, col("g"), col("id"), 5)
      .select("id").as[Long].collect().toSet
    // every survivor of the big corpus that existed in the small corpus
    // must have been sampled there too (its rank can only improve)
    assert(bigTop.filter(_ <= 150).subsetOf(small))
  }

  test("temperatureRates: alpha=0.5 flattens toward small groups, expected mass = target") {
    // groups: a=800, b=100, c=100 (T=1000)
    val df = (1L to 800L).map(i => ("a", i)) ++
      (801L to 900L).map(i => ("b", i)) ++ (901L to 1000L).map(i => ("c", i))
    val rates = Sampling.temperatureRates(df.toDF("g", "id"), col("g"),
        alpha = 0.5, targetFraction = 0.5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // factor_g = 1/sqrt(share): a ~ 1.118, b = c ~ 3.162
    // denom = 800*1.118 + 100*3.162 + 100*3.162 ~ 1526.9; C = 500/1526.9
    val fa = 1.0 / math.sqrt(0.8); val fb = 1.0 / math.sqrt(0.1)
    val denom = 800 * fa + 100 * fb + 100 * fb
    assert(math.abs(rates("a")._2 - 500.0 / denom * fa) < 1e-12)
    // the small groups' raw rate (1.036) clamps at 1.0 — they are
    // kept whole; the clamp means realized mass lands slightly under
    // the 500 target (the standard behavior: alpha-flattening cannot
    // upsample past "keep everything" without replication)
    assert(rates("b")._2 === 1.0)
    assert(rates("c")._2 === 1.0)
    val mass = rates.values.map { case (n, r) => n * r }.sum
    assert(math.abs(mass - (800 * 500.0 / denom * fa + 200.0)) < 1e-9)
    // alpha=0.5 upsamples the small groups relative to their share
    assert(rates("b")._2 > rates("a")._2)
  }

  test("temperatureSample keeps a deterministic subset near the expected size") {
    val df = ((1L to 800L).map(i => ("a", i)) ++
      (801L to 1000L).map(i => ("b", i))).toDF("g", "id")
    val kept = Sampling.temperatureSample(df, col("g"), col("id"),
      alpha = 0.5, targetFraction = 0.5).select("id").as[Long].collect().toSet
    val again = Sampling.temperatureSample(df, col("g"), col("id"),
      alpha = 0.5, targetFraction = 0.5).select("id").as[Long].collect().toSet
    assert(kept === again) // pure function of the key
    assert(kept.size > 350 && kept.size < 650) // ~500 expected
  }

  test("mixtureWeights: shares sum to 1, weights invert the share ratio") {
    val df = Seq(("a", 100L), ("a", 100L), ("b", 200L), ("c", 600L))
      .toDF("g", "cost")
    val byG = Sampling.mixtureWeights(df, col("g"), col("cost"))
      .select("g", "group_cost", "share", "weight")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byG("a")._1 === 200L)
    assert(math.abs(byG.values.map(_._2).sum - 1.0) < 1e-12)
    // uniform target share = 1/3; a has share 0.2 -> weight (1/3)/0.2
    assert(math.abs(byG("a")._3 - (1.0 / 3) / 0.2) < 1e-12)
    assert(math.abs(byG("c")._3 - (1.0 / 3) / 0.6) < 1e-12)
  }

  test("tokenBudgetSelect: per-group priority order, straddling row dropped") {
    val df = Seq(
      // (group, id, quality, tokens) — priority = quality desc
      ("a", 1L, 9L, 400L), ("a", 2L, 8L, 500L), ("a", 3L, 7L, 200L),
      ("b", 4L, 5L, 999L), ("b", 5L, 4L, 2L),
      ("c", 6L, 1L, 2000L)) // first row alone over budget -> group empty
      .toDF("g", "id", "q", "toks")
    val got = Sampling.tokenBudgetSelect(df, col("g"),
        Seq(col("q").desc, col("id")), col("toks"), budget = 1000L)
      .select("g", "id", "running_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    // a: 400, 900 — id 3 would reach 1100 > 1000, dropped
    // b: 999, 1001>1000 dropped; c: empty
    assert(got === Seq(("a", 1L, 400L), ("a", 2L, 900L), ("b", 4L, 999L)))
  }

  test("curriculum: threshold stages and deterministic within-stage key") {
    val df = Seq((1L, 100.0), (2L, 150.0), (3L, 151.0), (4L, 500.0))
      .toDF("id", "diff")
    val got = Sampling.curriculum(df, col("id"), col("diff"),
        thresholds = Seq(150.0, 300.0))
      .select("id", "stage", "stage_order")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // <=150 -> 1 (boundary inclusive below), >150 -> 2, >300 -> 3
    assert(got.map(x => (x._1, x._2)).toSeq ===
      Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L)))
    // stage_order is the salted md5 of the id — reproducible
    val again = Sampling.curriculum(df, col("id"), col("diff"),
        thresholds = Seq(150.0, 300.0))
      .select("id", "stage_order").as[(Long, String)].collect().sortBy(_._1)
    assert(got.map(x => (x._1, x._3)).toSeq === again.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.curriculum(df, col("id"), col("diff"), Seq(300.0, 150.0))
    }
  }

  test("epochAllocation: cap binds small sources, uncapped follow share^alpha") {
    // sources: a=100, b=900 tokens; alpha=0.5 ->
    // f_a = sqrt(0.1), f_b = sqrt(0.9); w_a ≈ 0.25, w_b ≈ 0.75
    val df = (Seq.fill(1)(("a", 100L)) ++ Seq.fill(1)(("b", 900L)))
      .toDF("src", "toks")
    val got = Sampling.epochAllocation(df, col("src"), col("toks"),
        budget = 2000L, alpha = 0.5, maxEpochs = 4.0)
      .orderBy("grp")
      .as[(String, Long, Double, Double, Long, Double)].collect().toSeq
    val fa = math.sqrt(0.1); val fb = math.sqrt(0.9)
    val wa = fa / (fa + fb); val wb = fb / (fa + fb)
    // a: 2000·wa/100 = 5.0 -> capped at 4; b: 2000·wb/900 ≈ 1.67
    assert(got.map(_._1) === Seq("a", "b"))
    assert(got(0)._5 === 4L)
    assert(math.abs(got(0)._4 - 4.0) < 1e-12)
    assert(math.abs(got(1)._4 - 2000.0 * wb / 900.0) < 1e-12)
    assert(math.abs(got(0)._3 - wa) < 1e-12)
    // weights sum to 1
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-12)
    // full + tail decompose epochs
    got.foreach(r => assert(math.abs(r._5 + r._6 - r._4) < 1e-12))
  }

  test("stratifiedSplit: exact per-stratum quotas, deterministic") {
    val big = (1 to 200).map(i => (i.toLong, if (i % 4 == 0) "de" else "en"))
      .toDF("id", "lang")
    val got = Sampling.stratifiedSplit(big, col("lang"), col("id"))
      .groupBy("lang", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (l, s, n) => (l, s) -> n }.toMap
    // en: 150 -> 120/15/15; de: 50 -> 40/5/5 (exact, not in expectation)
    assert(got(("en", "train")) === 120L)
    assert(got(("en", "val")) === 15L)
    assert(got(("en", "test")) === 15L)
    assert(got(("de", "train")) === 40L)
    assert(got(("de", "val")) === 5L)
    assert(got(("de", "test")) === 5L)
  }

  test("stratifiedSplit: assignment is a pure function of (stratum, key)") {
    val big = (1 to 100).map(i => (i.toLong, "en")).toDF("id", "lang")
    def m = Sampling.stratifiedSplit(big, col("lang"), col("id"))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(m === m)
    // quotas: singleton stratum still yields all three splits at n>=10
    assert(m.values.toSet === Set("train", "val", "test"))
  }

  test("interleaveBySource: rank slices cover every source until exhaustion") {
    val df = (1 to 9).map(i => (i.toLong, "s" + (i % 3))).toDF("id", "src") // 3 per source
      .union(Seq((10L, "s0")).toDF("id", "src"))                           // s0 has 4
    val got = Sampling.interleaveBySource(df, col("src"), col("id"))
      .groupBy("rr_rank").agg(countDistinct(col("src")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 1L))
  }
}
