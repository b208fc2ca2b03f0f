package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for data-mixture construction — the operation a
  * training pipeline runs to hit target source proportions ("20% code, 50%
  * web, …") and to carve reproducible train/val/test splits out of a corpus.
  *
  * Both ops key every decision on the first 8 hex digits of
  * `md5(salt || id)` mapped to a uniform 32-bit integer, so:
  *  - the decision is a pure map-side filter/projection — zero shuffle,
  *    zero state, embarrassingly parallel at 100 TB;
  *  - membership is stable across runs, retries, cluster sizes, and
  *    engines (md5 is bit-identical everywhere — the DuckDB oracle computes
  *    the same u32), unlike `DataFrame.sample`, whose output depends on
  *    partitioning;
  *  - disjoint salts give independent decisions (sampling vs splitting).
  */
object Sampling {

  /** Uniform u32 in [0, 2^32) from md5(salt || id). */
  private def u32(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), idCol.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  private val Space = 4294967296L // 2^32

  /** Per-stratum Bernoulli sampling at `rates` (default `defaultRate`):
    * keep a row iff u32 < rate·2^32. Rows from strata with rate 1.0 always
    * survive; rate 0.0 strata are dropped entirely.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String = "mx"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.where(u32(col(idCol), salt) < (rate * Space).cast("long"))
  }

  /** Temperature-based mixture sampling — the multi-source LLM data-mix
    * recipe (T5/LLaMA style): target proportions ∝ `n_s^alpha`, so
    * `alpha = 1` keeps natural proportions and `alpha → 0` flattens
    * toward uniform across sources, up-weighting small sources. Each
    * source's keep-rate is
    * `rate_s = min(1, targetRows · n_s^alpha / Σ_t n_t^alpha / n_s)`,
    * rounded to 6 decimals (the repo's cross-engine transcendental
    * convention — JVM vs C libm `pow` ulp drift cannot move a
    * threshold), then applied through [[stratifiedSample]]'s
    * deterministic u32 filter. Realized counts are binomial around the
    * target, like any Bernoulli sampler.
    *
    * The per-source counts come from ONE aggregation collected to the
    * driver — bounded by the source-name cardinality (a handful of
    * strings at any corpus size), never the corpus.
    */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      alpha: Double,
      targetRows: Long,
      salt: String = "tm"): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0: $alpha")
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val countRows = df.groupBy(sourceCol).count().collect()
    require(countRows.forall(!_.isNullAt(0)),
      s"temperatureMix requires non-null $sourceCol values — a NULL " +
      "group would inflate the denominator while stratifiedSample's " +
      "equality predicate can never keep its rows")
    val counts = countRows
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val denom = counts.values.toSeq.sorted
      .map(n => math.pow(n.toDouble, alpha)).sum
    val rates = counts.map { case (s, n) =>
      val raw = math.min(1.0,
        targetRows * math.pow(n.toDouble, alpha) / denom / n)
      s -> BigDecimal(java.math.BigDecimal.valueOf(raw)
        .setScale(6, java.math.RoundingMode.HALF_UP)).toDouble
    }
    stratifiedSample(df, idCol, sourceCol, rates, defaultRate = 0.0, salt)
  }

  /** Token-budget mixture — [[temperatureMix]] measured in TOKENS, the
    * unit LLM pretraining budgets actually use: target proportions
    * ∝ `tok_s^alpha` over each source's total token count, scaled so the
    * EXPECTED kept tokens sum to AT MOST `budgetTokens` — exactly the
    * budget when no source clamps at rate 1.0; when a small source's
    * fair share exceeds its size the surplus is NOT redistributed to the
    * other sources (a single-pass waterfill), so the realized expectation
    * lands under budget by the clamped sources' shortfall:
    * `rate_s = min(1, budgetTokens · tok_s^alpha / Σ_t tok_t^alpha / tok_s)`,
    * rounded to 6 decimals (the cross-engine transcendental convention),
    * applied as a per-DOC deterministic u32 Bernoulli filter — doc
    * membership is hash-independent of doc length, so kept tokens are
    * unbiased at rate_s · tok_s per source. The per-source token totals
    * come from ONE aggregation collected to the driver — bounded by the
    * source-name cardinality, never the corpus; the filter itself is
    * map-side, zero shuffle, embarrassingly parallel at 100 TB.
    */
  def tokenBudgetMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokensCol: String,
      alpha: Double,
      budgetTokens: Long,
      salt: String = "tb"): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0: $alpha")
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val totalRows = df.groupBy(sourceCol)
      .agg(org.apache.spark.sql.functions.sum(col(tokensCol)).as("toks"))
      .collect()
    require(totalRows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      s"tokenBudgetMix requires non-null $sourceCol and $tokensCol")
    val totals = totalRows
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val denom = totals.values.toSeq.sorted
      .map(n => math.pow(n.toDouble, alpha)).sum
    val rates = totals.map { case (s, n) =>
      val raw = math.min(1.0,
        budgetTokens * math.pow(n.toDouble, alpha) / denom / n)
      s -> BigDecimal(java.math.BigDecimal.valueOf(raw)
        .setScale(6, java.math.RoundingMode.HALF_UP)).toDouble
    }
    stratifiedSample(df, idCol, sourceCol, rates, defaultRate = 0.0, salt)
  }

  /** Assign each row to a named split by cumulative weight over the same
    * u32 space (e.g. `Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)`).
    * The last split absorbs any rounding remainder.
    */
  def splitAssign(
      df: DataFrame,
      idCol: String,
      weights: Seq[(String, Double)],
      salt: String = "sp"): DataFrame = {
    require(weights.nonEmpty, "at least one split")
    val u = u32(col(idCol), salt)
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val assigned = weights.init.zip(cum.init).foldRight(
      lit(weights.last._1): Column) { case (((name, _), hi), acc) =>
      when(u < lit(math.floor(hi * Space).toLong), lit(name)).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }
}
