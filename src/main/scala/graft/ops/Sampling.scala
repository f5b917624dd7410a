package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus sampling and mixture design for training-data pipelines.
 *
 * `quotaSample` is DETERMINISTIC sampling: rank rows inside each
 * group by a cryptographic hash of their key and keep the first k.
 * Unlike `sampleBy` (seeded Bernoulli — approximate counts, engine-
 * specific RNG), this gives exact per-group quotas, is reproducible
 * across engines (md5 is md5 everywhere — the DuckDB oracle checks
 * it value-for-value), and is stable under corpus growth: a document
 * keeps its rank position unless new docs hash below it.
 *
 * `mixtureWeights` computes per-group sampling weights that reshape
 * the corpus toward target shares (the "data mixture" step of
 * pre-training: upweight underrepresented sources, downweight
 * overrepresented ones).
 */
object Sampling {

  /**
   * Exactly k rows per group, chosen by md5(key) order (ties broken
   * by the key itself). One shuffle on the group key; the per-group
   * sort is the price of exactness — for a handful of giant groups
   * prefer a two-phase per-partition pre-top-k, for the typical
   * many-groups case (languages, domains, sources) this is the right
   * shape as-is.
   */
  def quotaSample(df: DataFrame, grp: Column, key: Column, k: Int): DataFrame = {
    require(k > 0)
    val w = Window.partitionBy(grp).orderBy(md5(key.cast("string")), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Per-group cost share and resampling weight toward uniform shares:
   * weight g = target_share / actual_share where target_share =
   * 1/n_groups. weight > 1 → upsample, < 1 → downsample. Output:
   * (group, group_cost, share, weight).
   *
   * The corpus-wide totals come from a broadcast CROSS-JOIN of the
   * one-row grand aggregate, not an unpartitioned window: same
   * values, but no single-task WindowExec (and no "No Partition
   * Defined" log noise). Both branches contain the identical
   * per-group exchange, so ReuseExchange runs the corpus scan +
   * partial aggregation ONCE; the totals branch only adds a tiny
   * final pass over the per-group rows.
   */
  def mixtureWeights(df: DataFrame, grp: Column, cost: Column): DataFrame = {
    val agg = df.groupBy(grp).agg(sum(cost).as("group_cost"))
    val tot = agg.agg(sum(col("group_cost")).as("__tot"), count(lit(1)).as("__ngrp"))
    agg.crossJoin(broadcast(tot))
      .withColumn("share",
        col("group_cost").cast("double") / col("__tot").cast("double"))
      .withColumn("weight",
        (lit(1.0) / col("__ngrp").cast("double")) / col("share"))
      .drop("__tot", "__ngrp")
  }

  /** Uniform [0,1) fraction as a pure function of (salt, key): the
    * first 8 md5 hex chars over 2^32. The division is by a power of
    * two (exact), so any engine with md5 computes the identical
    * double — the cross-engine Bernoulli coin. */
  def hashFraction(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /**
   * Temperature-scaled mixture rates (L116 — the multilingual-
   * pretraining rebalance, XLM-R style: sampling probability per
   * group ∝ share^alpha, alpha < 1 flattens the distribution). For
   * each group: rate = min(1, C · share^(alpha-1)) with C chosen so
   * the expected kept mass is `targetFraction` of the corpus:
   * C = targetFraction·T / Σ_g n_g·share_g^(alpha-1).
   *
   * Determinism: alpha = 0.5 (the common choice) evaluates via
   * sqrt — an IEEE correctly-rounded operation, so rates are
   * bit-identical across engines (q160's oracle); other alphas go
   * through pow, which libm does not correctly round — same math,
   * no bit guarantee. The Σ over groups is an ORDERED window sum
   * (group asc, unpartitioned — bounded by the number of groups), so
   * the double additions happen in the same sequence everywhere.
   *
   * Output: (group, n, rate).
   */
  def temperatureRates(df: DataFrame, grp: Column, alpha: Double,
                       targetFraction: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1]: $alpha")
    require(targetFraction > 0 && targetFraction <= 1)
    val counts = df.groupBy(grp.as("grp")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__T"))
    def powShare(share: Column): Column =
      if (alpha == 0.5) lit(1.0) / sqrt(share)
      else pow(share, lit(alpha - 1.0))
    val w = Window.partitionBy().orderBy(col("grp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts.crossJoin(broadcast(tot))
      .withColumn("__factor",
        powShare(col("n").cast("double") / col("__T").cast("double")))
      .withColumn("__denom",
        sum(col("n").cast("double") * col("__factor")).over(w))
      .withColumn("rate", least(lit(1.0),
        lit(targetFraction) * col("__T").cast("double") / col("__denom")
          * col("__factor")))
      .select(col("grp"), col("n"), col("rate"))
  }

  /**
   * Apply [[temperatureRates]]: keep a row iff its deterministic
   * md5 coin lands under its group's rate. The rates frame is
   * group-cardinality-sized and broadcast; the corpus is never
   * shuffled — one map-side join + filter.
   */
  def temperatureSample(df: DataFrame, grp: Column, key: Column, alpha: Double,
                        targetFraction: Double, salt: String = ""): DataFrame = {
    val rates = temperatureRates(df, grp, alpha, targetFraction)
      .withColumnRenamed("grp", "__tsg").drop("n")
    df.join(broadcast(rates), grp === col("__tsg"))
      .filter(hashFraction(key, salt) < col("rate"))
      .drop("__tsg", "rate")
  }

  /**
   * Deterministic train/val/test assignment: the split is a pure
   * function of (salt, key) — stable across runs, machines, and
   * corpus growth (a doc never migrates between splits when new data
   * arrives, the property random splits lose). Buckets are carved by
   * comparing md5(salt ++ key) LEXICOGRAPHICALLY against hex
   * thresholds, so any engine with md5 reproduces the assignment
   * byte-for-byte (no float fractions, no modulo-bias arithmetic).
   * Shuffle-free: one codegen'd projection.
   *
   * `boundaries` maps label -> exclusive upper hex bound, in order;
   * the last label takes the remainder. Default ≈ 80/10/10
   * (0xcc/0x100 = .797, 0xe6/0x100 = .898).
   */
  def deterministicSplit(df: DataFrame, key: Column, salt: String,
                         out: String = "split",
                         boundaries: Seq[(String, String)] = Seq(
                           "train" -> "cc", "val" -> "e6"),
                         rest: String = "test"): DataFrame = {
    val h = md5(concat(lit(salt), key.cast("string")))
    val split = boundaries.foldRight(lit(rest): Column) {
      case ((label, bound), elseC) => when(h < bound, label).otherwise(elseC)
    }
    df.withColumn(out, split)
  }

  /**
   * [[deterministicSplit]]'s EXACT-quota, stratified sibling: within
   * each stratum (language/domain/source) rows are ranked by
   * md5(key) and the first floor(n·p_train) go to train, the next
   * floor(n·p_val) to val, the rest to test — so every stratum hits
   * its split fractions exactly (±1 row), where the hash-bound split
   * only hits them in expectation (a 200-doc minority language can
   * easily land 0 val docs there). This is the held-out-set
   * discipline an eval pipeline needs: per-language val/test slices
   * of guaranteed size.
   *
   * `permilles` are (label, per-mille) quotas in order; remainder →
   * `rest`. Quota math is exact integers ((rank-1)·1000 < n·quota —
   * no float boundary), so the assignment replays bit-identically in
   * any engine. One window shuffle on the stratum key; strata are
   * corpus partitions (languages, sources), so partitions stay
   * bounded exactly like [[quotaSample]].
   */
  def stratifiedSplit(df: DataFrame, stratum: Column, key: Column,
                      out: String = "split",
                      permilles: Seq[(String, Int)] = Seq(
                        "train" -> 800, "val" -> 100),
                      rest: String = "test"): DataFrame = {
    require(permilles.map(_._2).sum <= 1000)
    val w = Window.partitionBy(stratum).orderBy(md5(key.cast("string")), key)
    val wAll = Window.partitionBy(stratum)
    val withRank = df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    val cum = permilles.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val split = permilles.zip(cum).foldRight(lit(rest): Column) {
      case (((label, _), upto), elseC) =>
        when((col("__rn") - 1) * 1000 < col("__n") * upto, label).otherwise(elseC)
    }
    withRank.withColumn(out, split).drop("__rn", "__n")
  }

  /**
   * Token-budget corpus selection: per group (source/domain), take
   * rows in the given priority order until the group's cumulative
   * token count exceeds `budget` — the pretraining data-mixing
   * primitive ("N billion tokens of X, prioritized by quality"). A
   * row that would cross the budget is dropped with everything after
   * it (budget is a cap, not a target).
   *
   * One window shuffle on the group key; the running sum is exact
   * integer math, so selection is deterministic and engine-
   * reproducible. Skewed sources (one group ≫ others) concentrate in
   * one partition here — for a pathological single-source corpus,
   * pre-filter with a cheap quality cut (or cap per finer shard) so
   * the window's partition stays bounded; for real multi-source
   * mixes the group count is small and sizes are budget-bounded on
   * OUTPUT, input-bounded per group on compute.
   */
  def tokenBudgetSelect(df: DataFrame, grp: Column, order: Seq[Column],
                        tokens: Column, budget: Long,
                        out: String = "running_tokens"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(grp).orderBy(order: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn(out, sum(tokens.cast("long")).over(w))
      .filter(col(out) <= budget)
  }

  /**
   * Curriculum staging (easy-to-hard pretraining order): assign each
   * doc a stage by comparing its difficulty against FIXED ascending
   * thresholds (stage 1 = difficulty ≤ t1, …, stage n+1 above all) —
   * the loader feeds stages in order — plus `stage_order`, the
   * deterministic md5 shuffle key for WITHIN-stage batch order
   * (curriculum training still shuffles inside a stage; a seeded RNG
   * would be engine/retry-specific, the hash is not).
   *
   * Thresholds are caller-fixed, not quantiles, so the whole op is
   * one shuffle-free codegen'd projection (derive data-driven
   * thresholds separately from [[Profiling.histogram]] /
   * `groupSummary` when needed — at 100 TB you want that profile
   * cached anyway, not recomputed inside every staging pass).
   */
  def curriculum(df: DataFrame, id: Column, difficulty: Column,
                 thresholds: Seq[Double], salt: String = "cur"): DataFrame = {
    require(thresholds == thresholds.sorted, "thresholds must ascend")
    val stage = thresholds.foldLeft(lit(1)) { (acc, t) =>
      acc + when(difficulty.cast("double") > t, 1).otherwise(0)
    }
    df.withColumn("stage", stage.cast("long"))
      .withColumn("stage_order", md5(concat(lit(salt), id.cast("string"))))
  }

  /**
   * Epoch/repeat-factor allocation — the UP-sampling complement of
   * [[temperatureRates]]' down-sampling: given a token budget for one
   * training run, how many epochs of each source to take so the
   * realized mixture follows share^alpha reweighting (the XLM-R /
   * Llama data-mixing recipe), capped at `maxEpochs` (repeating a
   * small source past ~4 epochs stops helping — Muennighoff et al.
   * 2023).
   *
   * epochs_s = min(maxEpochs, budget · w_s / tokens_s) with
   * w_s = share_s^alpha / Σ share^alpha. `full_epochs` (floor) and
   * `tail_rate` (the fractional epoch, servable via [[hashFraction]])
   * split the plan into whole passes + one sampled pass.
   *
   * Shape: one aggregation to per-source token counts, then constant-
   * space arithmetic over the GROUP frame (unpartitioned windows
   * bounded by |sources| — the temperatureRates discipline). alpha =
   * 0.5 routes through sqrt (IEEE correctly-rounded), keeping the
   * whole table engine-stable under round(, 6).
   */
  def epochAllocation(df: DataFrame, grp: Column, cost: Column,
                      budget: Long, alpha: Double,
                      maxEpochs: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1]: $alpha")
    require(budget > 0 && maxEpochs > 0)
    val counts = df.groupBy(grp.as("grp")).agg(sum(cost).as("tokens"))
    def powShare(share: Column): Column =
      if (alpha == 0.5) sqrt(share)
      else if (alpha == 1.0) share
      else pow(share, alpha)
    val w = Window.partitionBy().orderBy(col("grp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("__T", sum(col("tokens")).over(w))
      .withColumn("__f", powShare(col("tokens").cast("double") / col("__T").cast("double")))
      .withColumn("weight", col("__f") / sum(col("__f")).over(w))
      .withColumn("epochs", least(lit(maxEpochs),
        lit(budget.toDouble) * col("weight") / col("tokens").cast("double")))
      .withColumn("full_epochs", floor(col("epochs")).cast("long"))
      .withColumn("tail_rate", col("epochs") - floor(col("epochs")))
      .select(col("grp"), col("tokens"), col("weight"), col("epochs"),
        col("full_epochs"), col("tail_rate"))
  }

  /**
   * Round-robin source interleave — the training-order primitive that
   * mixes sources UNIFORMLY through an epoch without a shuffle-buffer
   * (a loader reading this order sees every source at its corpus rate
   * in every window, instead of long single-source runs): global
   * order = (rank within source by a deterministic key, then source).
   * All the rank-1 docs of every source come first, then every
   * rank-2, … Exactly one window shuffle on the source key; the
   * emitted `order_key` pair is what the export sorts by ([[
   * graft.Graft.export]] / the JSONL sink) — no global sort happens
   * here.
   */
  def interleaveBySource(df: DataFrame, src: Column, key: Column): DataFrame = {
    val w = Window.partitionBy(src).orderBy(md5(key.cast("string")), key)
    df.withColumn("rr_rank", row_number().over(w).cast("long"))
  }
}
