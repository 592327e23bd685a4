package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling for corpus curation and domain mixing.
  *
  * `df.sample()` is seed-stable only for a fixed partitioning — a repartition
  * or AQE re-plan changes which rows are kept, which is unacceptable for
  * reproducible training mixes. These operators derive the keep/drop
  * decision from a HASH OF THE ROW KEY instead, so the sample is a pure
  * function of the data: stable across partitionings, cluster sizes, and
  * engines (md5 is portable, so an external system computes the same
  * sample). Per-row codegen'd expressions — no shuffle, no UDF.
  */
object Sampling {

  /** uniform double in [0,1) derived from the md5 of the key's string form */
  def uniformHash(key: Column): Column =
    // null keys hash to 0.0 — deterministically INCLUDED at any positive
    // rate. Leaving the hash null made the policy operator-dependent:
    // where-based samplers dropped null-key rows even at rate 1.0 while
    // orderBy-based capping prioritized them; one explicit value unifies
    // every consumer (all null-key rows share one fate per stratum, the
    // same all-or-nothing any single key gets)
    coalesce(
      conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10)
        .cast(LongType).cast(DoubleType) / lit(4294967296.0),
      lit(0.0))

  /** keep a deterministic `rate` fraction of rows, keyed by `key` */
  def sampleByKey(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(uniformHash(key) < rate)

  /** Stratified deterministic sampling: per-stratum keep rates (domain
    * mixing weights). Rows in strata missing from `rates` use
    * `defaultRate`. The rate lookup compiles to a chained CASE WHEN —
    * no join, no broadcast needed for the usual handful of strata. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    df.where(uniformHash(key) < rate)
  }

  /** Deterministic reservoir-style cap: at most `n` rows per stratum,
    * chosen by smallest key hash (an order-statistic sample — stable under
    * any partitioning, unlike rank-by-arrival). One shuffle on the stratum.
    */
  def capPerStratum(df: DataFrame, key: Column, stratum: Column, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
      .orderBy(uniformHash(key), key.cast(StringType))
    df.withColumn("_rk", row_number().over(w)).where(col("_rk") <= n).drop("_rk")
  }

  /** Token-budget domain mixing: downsample each domain deterministically so
    * its expected token mass meets `budgetTokens(domain)` (domains already
    * under budget keep everything). The per-domain totals are ONE partial-agg
    * shuffle over tiny (domain, count) pairs; the rates come back via a
    * broadcast join (domains are few); keep/drop is the md5 decision — so
    * the mix is reproducible across partitionings and engines, which is the
    * property a training-data freeze needs. Returns the input rows that
    * survive, with `_mix_rate` attached for audit. */
  def tokenBudgetMix(df: DataFrame, key: Column, stratum: Column,
                     tokenCount: Column, budgetTokens: Map[String, Long],
                     defaultBudget: Long = Long.MaxValue): DataFrame = {
    val totals = df.groupBy(stratum.as("_mix_stratum"))
      .agg(sum(tokenCount.cast(LongType)).as("_mix_total"))
    val budget = budgetTokens.foldLeft(lit(defaultBudget)) { case (acc, (s, b)) =>
      when(col("_mix_stratum") === s, lit(b)).otherwise(acc)
    }
    val rates = totals.select(col("_mix_stratum"),
      least(lit(1.0), budget.cast(DoubleType) / col("_mix_total").cast(DoubleType))
        .as("_mix_rate"))
    // NULL-SAFE join: unlabeled rows (null stratum) form a real group in
    // `totals`, but `===` on null matches nothing — an inner join would
    // silently delete every unlabeled row, contradicting the
    // defaultBudget = MaxValue "keep everything unconfigured" contract
    df.join(broadcast(rates), stratum <=> col("_mix_stratum"))
      .where(uniformHash(key) < col("_mix_rate"))
      .drop("_mix_stratum")
  }

  /** Temperature-scaled domain mixing — the multilingual-pretraining
    * recipe (mT5, Xue et al. 2021; XLM-R, Conneau et al. 2020): sample
    * domain d with probability ∝ total_d^alpha, so low-resource domains
    * are up-weighted relative to their raw share (alpha=1 → proportional,
    * alpha→0 → uniform). Per-domain keep rate =
    * min(1, floor(budget·p_d) / total_d), micro-quantized so the keep
    * decision is an INTEGER compare — floor(u·1e6) < rate_e6 — and the
    * frozen mix replays identically on any engine/partitioning (the pow()
    * is confined to the #domains-row rate table, where a last-ulp libm
    * difference can only move a rate by one micro-unit).
    *
    * Scale shape: one tiny (domain, Σtokens) aggregation; the rate table
    * is #domains rows (an all-rows window over it costs nothing);
    * broadcast join back; per-row integer compare. The corpus never
    * shuffles. Returns survivors with `_mix_rate_e6` attached for audit. */
  def temperatureMix(df: DataFrame, key: Column, stratum: Column,
                     tokenCount: Column, budgetTokens: Long,
                     alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1.0, s"alpha=$alpha must be in (0, 1]")
    require(budgetTokens > 0, "budgetTokens must be positive")
    // zero-token strata are dropped EXPLICITLY (their rate would be a NaN
    // whose least()/cast treatment differs between engines): a stratum
    // contributing no tokens cannot consume budget, and its rows carry no
    // trainable mass — the deterministic policy is drop-all
    val totals = df.groupBy(stratum.as("_mix_stratum"))
      .agg(sum(tokenCount.cast(LongType)).as("_t"))
      .where(col("_t") > 0)
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val rates = totals
      // pow() is libm (not exactly rounded) — quantize each domain's weight
      // to integer micro-units BEFORE the normalizer sum, so _z is an
      // order-free LONG sum (a windowed double sum's addition order is
      // engine/implementation-defined and would break exact replay; the
      // residual pow risk is confined to per-domain quantization boundaries)
      .withColumn("_pw", floor(pow(col("_t").cast(DoubleType), lit(alpha))
        * lit(1000000.0) + lit(0.5)).cast(LongType))
      .withColumn("_z", sum(col("_pw")).over(all))
      .withColumn("_target", floor(lit(budgetTokens.toDouble)
        * col("_pw").cast(DoubleType) / col("_z").cast(DoubleType)))
      .select(col("_mix_stratum"),
        least(lit(1000000L), floor(col("_target") * lit(1000000.0)
          / col("_t").cast(DoubleType)).cast(LongType)).as("_mix_rate_e6"))
    // null-safe join, same contract as tokenBudgetMix
    df.join(broadcast(rates), stratum <=> col("_mix_stratum"))
      .where(floor(uniformHash(key) * lit(1000000.0)).cast(LongType) < col("_mix_rate_e6"))
      .drop("_mix_stratum")
  }

  /** Deterministic train/validation/test split label, derived from the key
    * hash: cumulative fraction thresholds over [[uniformHash]]. A pure
    * per-row expression (no shuffle, no state): the split is frozen by the
    * DATA, not by a seed + partitioning, so re-running on a different
    * cluster (or another engine — md5 is portable) reassigns nothing.
    * `fractions` are (label, fraction) in priority order; any remainder
    * falls to `defaultLabel`. */
  def splitLabel(key: Column, fractions: Seq[(String, Double)],
                 defaultLabel: String = "train"): Column = {
    require(fractions.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val u = uniformHash(key)
    val (expr, _) = fractions.foldLeft((lit(defaultLabel), 0.0)) {
      case ((acc, cum), (label, frac)) =>
        val hi = cum + frac
        (when(u >= cum && u < hi, lit(label)).otherwise(acc), hi)
    }
    expr
  }

  /** Deterministic shard assignment + within-shard training order for a
    * frozen corpus: shard = hash-derived (uniform, no global coordination),
    * position = rank of the key hash WITHIN the shard. This is the scalable
    * form of "globally shuffle the corpus and cut it into N files": a
    * global row_number would serialize through one partition, whereas the
    * per-shard window is `numShards`-way parallel and each shard's order is
    * still a pure function of the data. Returns (original columns) +
    * `shard` + `pos` (0-based). */
  def shardAssignment(df: DataFrame, key: Column, numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val u = uniformHash(key)
    val shard = pmod(conv(substring(md5(key.cast(StringType)), 9, 8), 16, 10)
      .cast(LongType), lit(numShards.toLong))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_shard"))
      .orderBy(col("_u"), col("_k"))
    df.withColumn("_shard", shard)
      .withColumn("_u", u)
      .withColumn("_k", key.cast(StringType))
      .withColumn("pos", row_number().over(w).cast(LongType) - 1L)
      .withColumn("shard", col("_shard"))
      .drop("_shard", "_u", "_k")
  }
}
