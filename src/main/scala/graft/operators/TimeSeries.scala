package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/**
 * Time-series / observability operators over irregular event streams —
 * the rollup side of the reference's metrics domain
 * (cardinalhq/duckdb-ddsketch README.md:189-199 rolls hourly sketches
 * into daily ones; these are the companion *value*-series transforms a
 * metrics store needs next to the sketch rollups): monotonic-counter
 * rate/increase with reset detection (PromQL `increase`/`rate`
 * semantics, samples attributed to the bucket of their own timestamp),
 * gap-filling a bucketed series onto a regular grid with
 * last-observation-carried-forward or linear interpolation, and
 * bounded-window exponential smoothing.
 *
 * Scale shape: everything here is one hash exchange on the series key.
 * [[counterIncrease]] is a single analytic window; [[counterRate]]
 * reuses the window's HashPartitioning for its per-bucket rollup (the
 * aggregation keys are a superset of the window key, so Catalyst
 * inserts no second exchange — same trick as [[Sessionize]]).
 * [[gapFill]] synthesizes the missing cells from each observation and
 * its `lead` in one analytic window on the key — no grid join and no
 * driver collect; interpolation values ride along on the same rows.
 * Nothing collects to the driver and no state grows with series
 * length, so a 100 TB events table partitions by key exactly like the
 * sketch rollups do.
 */
object TimeSeries {

  /**
   * Per-key counter deltas with reset detection: for each row (ordered
   * by `tsCol` within `keyCols`), `increase` = value - previous value
   * when the counter moved forward, or the raw value after a counter
   * reset (value < previous — the process restarted and the counter
   * restarted from ~0, so the whole new value is growth; PromQL's
   * `increase` uses the same convention). The key's first sample has
   * no baseline: NULL increase. NULL values neither emit nor consume
   * a baseline (the previous non-NULL sample stays the baseline).
   */
  def counterIncrease(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      increaseCol: String = "increase"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(F.col): _*)
      .orderBy(F.col(tsCol).asc)
    // last non-NULL value strictly before this row = the baseline
    val prev = F.last(F.col(valCol), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val v = F.col(valCol)
    df.withColumn(increaseCol,
      F.when(v.isNull || prev.isNull, F.lit(null).cast("double"))
        .when(v >= prev, v - prev)
        .otherwise(v))
  }

  /**
   * Per-key, per-bucket counter rollup: buckets `tsCol` (epoch millis)
   * into `bucketMillis`-wide cells, sums [[counterIncrease]] within
   * each cell, and derives `rate` = increase / bucket seconds.
   * Returns (keyCols..., bucket_ms, samples, increase, rate); buckets
   * with samples but no computable increase (e.g. only the key's
   * first sample) carry increase 0.0. The bucket key is pure long
   * arithmetic (`ts - pmod(ts, width)`) — exact over the full epoch
   * range, where a divide-derived id would round through double
   * division above 2^52 (see [[RangeJoin]]).
   */
  def counterRate(
      df: DataFrame,
      keyCols: Seq[String],
      tsMillisCol: String,
      valCol: String,
      bucketMillis: Long): DataFrame = {
    require(bucketMillis > 0, s"bucketMillis must be positive, got $bucketMillis")
    val inc = counterIncrease(df, keyCols, tsMillisCol, valCol, "__inc")
    val ts = F.col(tsMillisCol)
    val bucket = (ts - F.pmod(ts, F.lit(bucketMillis))).cast("long")
    inc.filter(ts.isNotNull)
      .groupBy((keyCols.map(F.col) :+ bucket.as("bucket_ms")): _*)
      .agg(
        F.count(F.lit(1)).as("samples"),
        F.coalesce(F.sum(F.col("__inc")), F.lit(0.0)).as("increase"))
      .withColumn("rate", F.col("increase") / F.lit(bucketMillis.toDouble / 1000.0))
  }

  /** Fill strategies for [[gapFill]]. */
  sealed trait FillStrategy
  /** Carry the last observed value forward (leading gap stays NULL). */
  case object Locf extends FillStrategy
  /** Linear interpolation between the neighboring observations; leading/
    * trailing gaps carry the nearest observation (so the output has no
    * NULLs once a key has at least one observation). */
  case object Linear extends FillStrategy

  /**
   * Regularize a bucketed series: for each key, emit one row per
   * `stepMillis` cell from the key's first to last observation,
   * carrying the observed value where one exists and filling gaps per
   * `strategy`. Input `tsMillisCol` must be aligned to `stepMillis`
   * multiples (e.g. [[counterRate]] bucket_ms output); misaligned,
   * NULL-timestamp, and NULL-value rows are treated as absent
   * observations and dropped before filling.
   *
   * Returns keyCols ++ (tsMillisCol, valCol, filled, was_observed),
   * where `valCol` is NULL on synthesized cells. Interpolation is
   * pure per-row IEEE arithmetic (add/sub/mul/div only), so results
   * are bit-deterministic.
   *
   * Shape: gap cells are synthesized from each observation and its
   * `lead` — ONE analytic window on the key plus a generate, no grid
   * join, so the whole operator rides a single hash exchange. A gap
   * wider than `maxCellsPerGap` cells emits only its endpoints
   * (counted on accumulator `graft.timeseries.truncatedGaps` and
   * warned; Spark may re-run tasks, so treat the count as
   * best-effort telemetry) so one pathological pair (a sample in
   * 1970 and one today) cannot explode the stage. Two observations
   * sharing one aligned timestamp in a key both pass through as that
   * single cell (the end bound is clamped, never a query error).
   *
   * Partitioning contract: when the input series is itself built by a
   * `groupBy(key, bucket)` aggregation, `repartition(key)` BEFORE that
   * groupBy — HashPartitioning(key) satisfies both the aggregate's
   * ClusteredDistribution(key, bucket) and this operator's window
   * ClusteredDistribution(key), so the whole agg→gapFill chain runs
   * on ONE exchange. Aggregating on (key, bucket) without the
   * repartition leaves the data partitioned on the pair, which does
   * NOT satisfy the window's distribution, and EnsureRequirements
   * inserts a second exchange.
   */
  def gapFill(
      df: DataFrame,
      keyCols: Seq[String],
      tsMillisCol: String,
      valCol: String,
      stepMillis: Long,
      strategy: FillStrategy = Linear,
      maxCellsPerGap: Long = 1000000L): DataFrame = {
    require(stepMillis > 0, s"stepMillis must be positive, got $stepMillis")
    require(maxCellsPerGap > 1, s"maxCellsPerGap must exceed 1, got $maxCellsPerGap")
    require(maxCellsPerGap <= Long.MaxValue / stepMillis,
      s"maxCellsPerGap * stepMillis overflows a long ($maxCellsPerGap * $stepMillis)")
    val keys = keyCols.map(F.col)
    val ts = F.col(tsMillisCol)
    val v = F.col(valCol)
    val obs = df.filter(ts.isNotNull && v.isNotNull &&
      F.pmod(ts, F.lit(stepMillis)) === 0)

    val w = Window.partitionBy(keys: _*).orderBy(ts.asc)
    val acc = graft.pipeline.AccumulatorRetainer.retain(
      df.sparkSession.sparkContext.longAccumulator("graft.timeseries.truncatedGaps"))
    // side-effecting (accumulator + warn): nondeterministic so Catalyst
    // never CSEs or reorders it; counts are best-effort under retries
    val tooWide = F.udf((spanMillis: Long) => {
      acc.add(1L)
      org.slf4j.LoggerFactory.getLogger("graft.operators.TimeSeries")
        .warn(s"gapFill: truncating a ${spanMillis / stepMillis}-cell gap (cap $maxCellsPerGap)")
      true
    }).asNondeterministic()
    // cap comparison in pure LONG math: both ts and lead(ts) are
    // step-aligned, so span > cells*step <=> span/step > cells exactly
    val capSpanMillis = maxCellsPerGap * stepMillis
    val span = F.col("__nt") - ts
    val stepped = obs
      .withColumn("__nt", F.lead(ts, 1).over(w))
      .withColumn("__nv", F.lead(v, 1).over(w))
      // cells owned by this observation: [t, next_t) — or just {t} for
      // the key's last observation, a truncated oversize gap, or a
      // duplicate timestamp (end clamped to t: no sequence error)
      .withColumn("__end",
        F.when(F.col("__nt").isNull, ts)
          .when(span > F.lit(capSpanMillis) && tooWide(span), ts)
          .otherwise(F.greatest(F.col("__nt") - F.lit(stepMillis), ts)))
      .withColumn("__t", F.explode(F.sequence(ts, F.col("__end"), F.lit(stepMillis))))

    val cell = F.col("__t")
    val observed = cell === ts
    val filled = strategy match {
      case Locf => v
      case Linear =>
        val interp = v + (F.col("__nv") - v) *
          ((cell - ts).cast("double") / (F.col("__nt") - ts).cast("double"))
        F.when(observed, v).otherwise(interp)
    }
    stepped.select((keys :+
      cell.as(tsMillisCol) :+
      F.when(observed, v).as(valCol) :+
      filled.as("filled") :+
      observed.as("was_observed")): _*)
  }

  /**
   * Rolling z-score anomaly signal: for each row, z = (v - mean) /
   * stddev over the key's trailing `window` samples (current row
   * included), ordered by `tsCol`. NULL where the trailing window has
   * fewer than 2 samples (stddev undefined) or zero variance — a
   * flat-line series has no anomaly scale, and guarding keeps the
   * IEEE division finite on both engines. Plain window aggregates:
   * whole-stage codegen, one hash exchange on the key.
   */
  def rollingZScore(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      window: Int = 24,
      zCol: String = "z"): DataFrame = {
    require(window > 1, s"window must exceed 1, got $window")
    val w = Window.partitionBy(keyCols.map(F.col): _*)
      .orderBy(F.col(tsCol).asc)
      .rowsBetween(-(window - 1), 0)
    val v = F.col(valCol)
    val mean = F.avg(v).over(w)
    val sd = F.stddev_samp(v).over(w)
    df.withColumn(zCol,
      F.when(v.isNotNull && sd.isNotNull && sd > 0, (v - mean) / sd))
  }

  /**
   * Exponentially weighted moving average over each key's trailing
   * `window` samples (ordered by `tsCol`): weight (1-alpha)^k for the
   * k-th most recent NON-NULL sample in the window, normalized by the
   * realized weight mass — pandas `ewm(alpha, adjust=True,
   * ignore_na=True)` semantics restricted to a bounded window, which
   * is what keeps the state O(window) instead of O(series) and the
   * plan a single analytic window. NULL-value rows still consume
   * window-row capacity but contribute no weight: positions are
   * counted among the surviving non-null samples, not time steps.
   * The fold runs over `aggregate(collect_list(...))` in row order,
   * so the summation order is deterministic.
   *
   * Returns df + `ewmaCol` (double; NULL where the value is NULL).
   */
  def ewma(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      alpha: Double,
      window: Int = 32,
      ewmaCol: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(window > 0, s"window must be positive, got $window")
    val w = Window.partitionBy(keyCols.map(F.col): _*)
      .orderBy(F.col(tsCol).asc)
      .rowsBetween(-(window - 1), 0)
    // trailing values oldest-first; NULL values contribute no weight
    val trail = F.collect_list(F.col(valCol)).over(w)
    val decay = F.lit(1.0 - alpha)
    // fold index i runs oldest->newest over n = size(trail) entries;
    // weight for position i is (1-alpha)^(n-1-i)
    val n = F.size(trail)
    val num = F.aggregate(
      F.zip_with(trail, F.sequence(F.lit(1), n),
        (x: Column, i: Column) => x * F.pow(decay, (n - i).cast("double"))),
      F.lit(0.0), (acc: Column, x: Column) => acc + x)
    val den = F.aggregate(
      F.sequence(F.lit(1), n),
      F.lit(0.0),
      (acc: Column, i: Column) => acc + F.pow(decay, (n - i).cast("double")))
    df.withColumn(ewmaCol,
      F.when(F.col(valCol).isNull, F.lit(null).cast("double"))
        .otherwise(num / den))
  }
}
