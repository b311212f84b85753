package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Self-serve skew dispatch for the window-based operators: profile the
 * prospective shuffle key with [[graft.sketch.SketchOps.keyCountProfile]]
 * and route to the salted/bucketed variant only when the measured skew
 * warrants it — the "should I salt this?" diagnostic wired into the
 * operator itself, AQE-style (AQE's runtime skew handling splits joins,
 * not window sorts, so these operators need their own dispatch).
 *
 * The profile pass is one map-side-combined count exchange over the
 * (sampled) input — O(keys) shuffle rows, never the payload — and runs
 * eagerly at call time; the returned plan is then exactly the plain or
 * the skew-resistant operator, both already exchange-count-pinned by
 * PlanShapeSpec. Both variants are output-identical, so the dispatch
 * can never change results, only the shuffle layout.
 */
object AutoSkew {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.operators.AutoSkew")

  /** Measured key-skew facts (from keyCountProfile, possibly sampled). */
  case class SkewProfile(nKeys: Long, nRows: Long, maxCount: Long, skewRatio: Double) {
    /** Salt when the hottest key is `threshold`x the uniform share AND
      * large enough in absolute terms that one sort task would actually
      * hurt (a 1000x-skewed but 10k-row key still sorts in one task
      * faster than any stitch). `minHotCount` is in SAMPLED rows when a
      * sample was profiled. */
    def isSkewed(threshold: Double, minHotCount: Long): Boolean =
      nKeys > 0 && skewRatio >= threshold && maxCount >= minHotCount
  }

  /** Profile the per-key row-count distribution of `df` under
    * `keyCols`; `sampleFraction` < 1 profiles a Bernoulli sample (the
    * 100 TB shape — skew ratios are scale-free, so a 1% sample
    * resolves any skew big enough to matter). */
  def profileKeys(
      df: DataFrame,
      keyCols: Seq[String],
      sampleFraction: Double = 1.0,
      seed: Long = 42L): SkewProfile = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val base = if (sampleFraction < 1.0) df.sample(sampleFraction, seed) else df
    val row = graft.sketch.SketchOps.keyCountProfile(base, keyCols)
      .select(F.col("n_keys"), F.col("n_rows"), F.col("max_count"), F.col("skew_ratio"))
      .head()
    def l(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    val ratio = if (row.isNullAt(3)) 0.0 else row.getDouble(3)
    SkewProfile(l(0), l(1), l(2), ratio)
  }

  /** Salt-bucket count matched to the measured skew: enough buckets to
    * spread the hot key to roughly the uniform share, capped (each
    * bucket replicates the right side in [[AsOfJoin.asofJoinSalted]]). */
  def chooseBuckets(p: SkewProfile, maxBuckets: Int = 32): Int =
    math.min(maxBuckets.toDouble, math.max(2.0, math.ceil(p.skewRatio))).toInt

  /**
   * As-of join with measured-skew dispatch: profiles the LEFT side's
   * keys and uses [[AsOfJoin.asofJoinSalted]] (buckets from
   * [[chooseBuckets]]) when the hot key is both `skewThreshold`x the
   * uniform share and at least `minHotCount` sampled rows; the plain
   * [[AsOfJoin.asofJoin]] otherwise. Identical output either way.
   */
  def asofJoinAuto(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      skewThreshold: Double = 8.0,
      minHotCount: Long = 1000000L,
      sampleFraction: Double = 1.0,
      maxBuckets: Int = 32): DataFrame = {
    val p = profileKeys(left, keys, sampleFraction)
    if (p.isSkewed(skewThreshold, minHotCount)) {
      val buckets = chooseBuckets(p, maxBuckets)
      log.info(s"asofJoinAuto: skew_ratio=${p.skewRatio} max_count=${p.maxCount} " +
        s"-> salted with $buckets buckets")
      AsOfJoin.asofJoinSalted(left, right, keys, leftTime, rightTime, rightValues, buckets)
    } else {
      log.info(s"asofJoinAuto: skew_ratio=${p.skewRatio} max_count=${p.maxCount} -> plain")
      AsOfJoin.asofJoin(left, right, keys, leftTime, rightTime, rightValues)
    }
  }

  /**
   * Sessionization with measured-skew dispatch: plain
   * [[Sessionize.withSessionId]] for well-distributed keys,
   * [[Sessionize.withSessionIdBucketed]] when the hot key clears the
   * thresholds. `bucketSpan` <= 0 derives `maxGap * 64` — wide enough
   * that stitch rows stay rare, narrow enough to split a hot key's
   * multi-day stream across many sort sub-partitions. Identical output
   * either way.
   */
  def withSessionIdAuto(
      df: DataFrame,
      keyCol: String,
      tsCol: Column,
      maxGap: Long,
      sessionCol: String = "session_id",
      bucketSpan: Long = 0L,
      skewThreshold: Double = 8.0,
      minHotCount: Long = 1000000L,
      sampleFraction: Double = 1.0): DataFrame = {
    val p = profileKeys(df, Seq(keyCol), sampleFraction)
    if (p.isSkewed(skewThreshold, minHotCount)) {
      val span = if (bucketSpan > 0) bucketSpan else math.max(1L, maxGap) * 64L
      log.info(s"withSessionIdAuto: skew_ratio=${p.skewRatio} max_count=${p.maxCount} " +
        s"-> bucketed with span $span")
      Sessionize.withSessionIdBucketed(df, F.col(keyCol), tsCol, maxGap, span, sessionCol)
    } else {
      log.info(s"withSessionIdAuto: skew_ratio=${p.skewRatio} max_count=${p.maxCount} -> plain")
      Sessionize.withSessionId(df, F.col(keyCol), tsCol, maxGap, sessionCol)
    }
  }
}
