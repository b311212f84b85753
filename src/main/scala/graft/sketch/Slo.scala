package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

/**
 * SLO evaluation over stored sketches — the query layer the
 * reference's observability rollups exist to serve (latency SLOs from
 * per-window DDSketches; reference README.md:119-141's p95/p99
 * dashboards taken one step further to alerting):
 *
 *   - [[compliance]]: fraction of values within the objective, one
 *     `ddsketch_cdf` probe of a stored blob — no event rescan.
 *   - [[burnRate]]: error-budget burn (SRE workbook form):
 *     `(1 - compliance) / budget`, where budget = 1 - target (a
 *     99.9% SLO has budget 1e-3). Burn 1.0 = spending exactly the
 *     budget; 14.4 = the classic page-now threshold.
 *   - [[multiWindowBurn]]: the multiwindow alert over a
 *     [[SketchView]]: merge the view's buckets for a SHORT and a LONG
 *     trailing window per key, burn-rate both, alert when both exceed
 *     the threshold (short confirms it's still happening, long
 *     confirms it's material). Two partition-pruned scans of
 *     sketch-sized rows — the alert never touches raw events.
 */
object Slo {

  /** Fraction of values <= `objective` (NULL on NULL/undecodable). */
  def compliance(sketch: Column, objective: Double): Column =
    G.ddsketch_cdf(sketch, objective)

  /** Error-budget burn rate: `(1 - compliance) / budget`. */
  def burnRate(sketch: Column, objective: Double, budget: Double): Column = {
    require(budget > 0.0 && budget < 1.0, s"budget must be in (0,1): $budget")
    (F.lit(1.0) - compliance(sketch, objective)) / F.lit(budget)
  }

  /**
   * Multiwindow burn-rate alert from a persisted [[SketchView]] at
   * `path`: per key, the burn over `[untilMs - shortMs, untilMs)` and
   * `[untilMs - longMs, untilMs)`, and `alert` = both strictly above
   * `threshold`. Emits (keys..., n_short, n_long, burn_short,
   * burn_long, alert).
   *
   * Keys present in the long window but QUIET in the short one (a
   * service that stopped reporting) still get a row — n_short = 0,
   * NULL burn_short, alert = false — exactly the keys a dashboard
   * must surface, so they ride a left join from the long window
   * (short ⊆ long guarantees the reverse direction never drops).
   */
  def multiWindowBurn(
      spark: SparkSession,
      path: String,
      keyCols: Seq[String],
      objective: Double,
      budget: Double,
      untilMs: Long,
      shortMs: Long,
      longMs: Long,
      threshold: Double = 1.0,
      partSpanMs: Long = SketchView.DefaultPartSpanMs): DataFrame = {
    require(shortMs > 0 && longMs >= shortMs,
      s"need 0 < shortMs <= longMs (got $shortMs, $longMs)")
    def window(fromMs: Long, tag: String): DataFrame =
      SketchView.readRange(spark, path, keyCols, fromMs, untilMs,
          partSpanMs = partSpanMs)
        .groupBy(keyCols.map(F.col): _*)
        .agg(G.ddsketch_agg(F.col("sketch")).as(s"__sk_$tag"))
    window(untilMs - longMs, "l")
      .join(window(untilMs - shortMs, "s"), keyCols, "left")
      .select(keyCols.map(F.col) ++ Seq(
        F.coalesce(G.ddsketch_count(F.col("__sk_s")), F.lit(0L)).as("n_short"),
        G.ddsketch_count(F.col("__sk_l")).as("n_long"),
        burnRate(F.col("__sk_s"), objective, budget).as("burn_short"),
        burnRate(F.col("__sk_l"), objective, budget).as("burn_long")): _*)
      .withColumn("alert", F.coalesce(
        F.col("burn_short") > threshold && F.col("burn_long") > threshold,
        F.lit(false)))
  }

  /**
   * Error-budget EXHAUSTION forecast per key, from the view alone —
   * the capacity-planning companion of [[multiWindowBurn]]'s pager:
   * over the period to date (`[periodStartMs, untilMs)`, e.g. the
   * 30-day SLO window so far) the budget fraction consumed is
   * `burn_period × elapsed/period`; extrapolating the RECENT window's
   * burn rate (`[untilMs - recentMs, untilMs)`), the remaining budget
   * is spent after `remaining × period / burn_recent` ms.
   *
   * Emits (keys…, n_period, n_recent, consumed_frac, burn_recent,
   * exhaust_at_ms): `exhaust_at_ms` is `untilMs` when the budget is
   * already spent, NULL when the recent burn is zero (never, at this
   * rate) or the key is quiet in the recent window. Two
   * partition-pruned view reads — never an event rescan.
   */
  def exhaustionForecast(
      spark: SparkSession,
      path: String,
      keyCols: Seq[String],
      objective: Double,
      budget: Double,
      periodStartMs: Long,
      untilMs: Long,
      periodMs: Long,
      recentMs: Long,
      partSpanMs: Long = SketchView.DefaultPartSpanMs): DataFrame = {
    require(periodStartMs < untilMs, "period must have started")
    require(periodMs > 0 && recentMs > 0, "periodMs/recentMs must be positive")
    def window(fromMs: Long, tag: String): DataFrame =
      SketchView.readRange(spark, path, keyCols, fromMs, untilMs,
          partSpanMs = partSpanMs)
        .groupBy(keyCols.map(F.col): _*)
        .agg(G.ddsketch_agg(F.col("sketch")).as(s"__sk_$tag"))
    val elapsedFrac = (untilMs - periodStartMs).toDouble / periodMs.toDouble
    val consumed =
      burnRate(F.col("__sk_p"), objective, budget) * F.lit(elapsedFrac)
    val remaining = F.lit(1.0) - F.col("consumed_frac")
    window(periodStartMs, "p")
      .join(window(untilMs - recentMs, "r"), keyCols, "left")
      .select(keyCols.map(F.col) ++ Seq(
        G.ddsketch_count(F.col("__sk_p")).as("n_period"),
        F.coalesce(G.ddsketch_count(F.col("__sk_r")), F.lit(0L)).as("n_recent"),
        consumed.as("consumed_frac"),
        burnRate(F.col("__sk_r"), objective, budget).as("burn_recent")): _*)
      .withColumn("exhaust_at_ms",
        F.when(F.col("consumed_frac") >= 1.0, F.lit(untilMs))
          .when(F.col("burn_recent") > 0.0,
            (F.lit(untilMs.toDouble) +
              remaining * periodMs.toDouble / F.col("burn_recent"))
              .cast("long"))
          .otherwise(F.lit(null).cast("long")))
  }
}
