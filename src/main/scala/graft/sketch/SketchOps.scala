package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

/**
 * Composite sketch operations for cluster-scale workloads.
 */
object SketchOps {

  /**
   * Skew-proof two-phase sketch aggregation: values are first aggregated
   * under (key, salt) — spreading one hot key over `saltBuckets`
   * reducers — then the per-salt sketches merge under the key alone.
   *
   * Because sketches are mergeable monoids with exact bin addition, the
   * result is byte-identical to the unsalted aggregation; salting only
   * changes the shuffle layout. Use when a single group would otherwise
   * exceed one reducer (AQE's skew handling does not split hash
   * aggregations, only joins).
   */
  def saltedSketchAgg(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val keys = keyCols.map(F.col)
    val salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(saltBuckets))
    df.withColumn("__salt", salt)
      .groupBy((keys :+ F.col("__salt")): _*)
      .agg(G.ddsketch_agg_values(F.col(valueCol)).as("__partial"))
      .groupBy(keys: _*)
      .agg(G.ddsketch_agg(F.col("__partial")).as("sketch"))
  }

  /**
   * Sketch-driven outlier trimming: keep rows whose `valueCol` lies
   * within the per-group [qLo, qHi] sketch quantiles — "drop the top
   * and bottom permille before training" as one composition. Two
   * passes over the data, but the first reduces to one sketch row per
   * group (map-side combined), and the bounds re-attach by BROADCAST —
   * the corpus itself never shuffles. Bounds are the DDSketch
   * quantiles, so the cut is within relative accuracy α of the exact
   * ranks; NULL values and groups with empty sketches drop out.
   */
  def trimOutliers(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      qLo: Double = 0.001,
      qHi: Double = 0.999): DataFrame = {
    require(qLo >= 0.0 && qHi <= 1.0 && qLo < qHi,
      s"need 0 <= qLo < qHi <= 1, got [$qLo, $qHi]")
    val keys = keyCols.map(F.col)
    val bounds = df
      .groupBy(keys: _*)
      .agg(G.ddsketch_agg_values(F.col(valueCol)).as("__sk"))
      .select(keyCols.map(F.col) :+
        G.ddsketch_quantile(F.col("__sk"), qLo).as("__lo") :+
        G.ddsketch_quantile(F.col("__sk"), qHi).as("__hi"): _*)
    df.join(F.broadcast(bounds), keyCols)
      .filter(F.col(valueCol) >= F.col("__lo") && F.col(valueCol) <= F.col("__hi"))
      .drop("__lo", "__hi")
  }

  /**
   * Equi-depth feature binning: assign every row its per-group quantile
   * bucket 0..nBuckets-1 via the group's DDSketch CDF — "discretize
   * latency into deciles per service" as one composition. Same shape as
   * [[trimOutliers]]: one sketch row per group (map-side combined), the
   * corpus re-attaches by BROADCAST and never shuffles; the bucket
   * column is a pure expression over the broadcast sketch. Buckets are
   * equi-DEPTH within the sketch's relative accuracy: each holds
   * ~count/nBuckets rows regardless of how skewed the value
   * distribution is. NULL values get a NULL bucket.
   */
  def quantileBuckets(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"need at least 2 buckets, got $nBuckets")
    val keys = keyCols.map(F.col)
    val sk = df
      .groupBy(keys: _*)
      .agg(G.ddsketch_agg_values(F.col(valueCol)).as("__sk"))
    df.join(F.broadcast(sk), keyCols)
      .withColumn("bucket",
        // explicit NULL guard: least() SKIPS nulls, so least(null, n-1)
        // would silently file NULL values into the top bucket
        F.when(F.col(valueCol).isNull, F.lit(null))
          .otherwise(F.least(
            F.floor(G.ddsketch_cdf(F.col("__sk"), F.col(valueCol)) * nBuckets),
            F.lit(nBuckets - 1L))).cast("int"))
      .drop("__sk")
  }

  /**
   * Shuffle-key skew profile: ONE row describing the per-key row-count
   * distribution of a prospective join/aggregation key — the "should I
   * salt this?" diagnostic run before committing a 100 TB shuffle.
   * Returns exact n_keys, total rows, max per-key count (the hot key),
   * the mean, and sketch quantiles p50/p90/p99/p999 of the per-key
   * counts. Two exchanges: the per-key count (map-side combined; the
   * shuffle carries (key, partial count)) and the 1-row global rollup.
   * skew_ratio = max_count * n_keys / rows — 1.0 means perfectly
   * uniform; >> 1 means the hottest key dominates and a plain shuffle
   * will straggle.
   */
  def keyCountProfile(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCountProfile needs at least one key column")
    df.groupBy(keyCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("__n"))
      .agg(
        F.count(F.lit(1)).as("n_keys"),
        F.sum(F.col("__n")).as("n_rows"),
        F.max(F.col("__n")).as("max_count"),
        G.ddsketch_agg_values(F.col("__n").cast("double")).as("__sk"))
      .select(
        F.col("n_keys"), F.col("n_rows"), F.col("max_count"),
        (F.col("n_rows").cast("double") / F.col("n_keys")).as("mean_count"),
        (F.col("max_count").cast("double") * F.col("n_keys") / F.col("n_rows"))
          .as("skew_ratio"),
        G.ddsketch_quantile(F.col("__sk"), 0.5).as("p50"),
        G.ddsketch_quantile(F.col("__sk"), 0.9).as("p90"),
        G.ddsketch_quantile(F.col("__sk"), 0.99).as("p99"),
        G.ddsketch_quantile(F.col("__sk"), 0.999).as("p999"))
  }

  /**
   * Per-group robust location/scale from sketches: (keys..., median,
   * mad) where MAD is the median absolute deviation. Two sketch
   * passes (each one sketch row per group, map-side combined), the
   * group medians re-attached by BROADCAST between them — the corpus
   * never shuffles. Both stats are within the sketch's relative
   * accuracy of the exact order statistics.
   */
  def robustStats(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "robustStats needs at least one key column")
    val keys = keyCols.map(F.col)
    val med = df.groupBy(keys: _*)
      .agg(G.ddsketch_agg_values(F.col(valueCol)).as("__sk"))
      .select(keys :+ G.ddsketch_quantile(F.col("__sk"), 0.5).as("median"): _*)
    df.join(F.broadcast(med), keyCols)
      .groupBy(keys: _*)
      .agg(F.first(F.col("median")).as("median"),
        G.ddsketch_agg_values(F.abs(F.col(valueCol) - F.col("median"))).as("__dk"))
      .select(keys :+ F.col("median") :+
        G.ddsketch_quantile(F.col("__dk"), 0.5).as("mad"): _*)
  }

  /**
   * Robust per-group z-scores: adds `outCol` =
   * 0.6745 · (value − median) / MAD — outlier scoring immune to the
   * outliers themselves, unlike mean/stddev z-scores (one 10^9 reading
   * drags a mean arbitrarily; it moves a median by one rank). Three
   * broadcast-reattached sketch passes, no corpus shuffle. NULL values
   * and exactly-zero-MAD groups get NULL scores; a near-constant group
   * has MAD at the sketch's own resolution (~α·median), so its scores
   * stay bounded near ±0.7 — never spuriously flagged.
   */
  def robustZScores(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      outCol: String = "robust_z"): DataFrame = {
    val stats = robustStats(df, keyCols, valueCol)
    df.join(F.broadcast(stats), keyCols)
      .withColumn(outCol,
        F.when(F.col("mad") > 0.0,
          F.lit(0.6745) * (F.col(valueCol) - F.col("median")) / F.col("mad")))
      .drop("median", "mad")
  }

  /**
   * Bloom-pruned side reduction — the runtime-filter shape for joins
   * whose small side is too big to broadcast as a hash table but whose
   * KEY SET fits a filter: build a Bloom filter over `small`'s keys
   * (one 1-row aggregate), broadcast it, and pre-filter `big` BEFORE
   * its shuffle. No false negatives ⇒ joining the pruned side is
   * exactly the plain join; false positives (~fpp) only cost a few
   * extra shuffled rows. Rows with NULL keys are dropped (an inner
   * join would drop them anyway). Returns the pruned `big`.
   *
   * At 100 TB this is the difference between shuffling the full fact
   * table and shuffling ~|matching keys| rows: the filter is a few MB
   * for 10^6-10^7 keys at 1% fpp, decoded ONCE on the driver and
   * broadcast in decoded form, so the per-row probe is one codegen'd
   * xxhash64 plus one bit-test — the serialized filter never enters the
   * plan (the earlier bytes-in-plan form paid an O(filter-size) row
   * copy + memcmp per probed row). Building the filter runs one small
   * eager job at call time (map-side-combined 1-row aggregate over
   * `small`), like a runtime filter would.
   */
  def bloomPrune(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long = graft.sketch.bloom.DefaultItems,
      fpp: Double = graft.sketch.bloom.DefaultFpp): DataFrame = {
    val bc = graft.sketch.bloom.broadcastFilter(
      small.select(F.col(smallKey)), smallKey, expectedItems, fpp)
    big.filter(
      graft.sketch.bloom.contains_broadcast(bc, F.col(bigKey)) === F.lit(true))
  }

  /**
   * Hourly→key rollup (the reference README's hourly/daily pattern,
   * README.md:189-199): persistable intermediate sketches plus a final
   * merge, all map-side-combinable.
   */
  def timeBucketedSketches(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      bucket: String = "hour"): DataFrame =
    df.groupBy((F.date_trunc(bucket, F.col(tsCol)).as("bucket_start") +:
        keyCols.map(F.col)): _*)
      .agg(G.ddsketch_agg_values(F.col(valueCol)).as("sketch"))

  /**
   * Seasonal residuals from a persisted [[SketchView]] — the
   * "compare each bucket against the same bucket one period ago"
   * dashboard (hour vs yesterday's hour, day vs last week's day),
   * answered from view rows alone: per (bucket, keys), the exact
   * count `n`, the previous period's `n_prev`, and
   * `ratio = n / n_prev` (NULL when the aligned bucket is absent).
   * One view read, one self-join on (bucket − period, keys) — counts
   * are exact through the merge, so residuals replay raw
   * cross-engine.
   */
  def seasonalResiduals(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      keyCols: Seq[String],
      periodMs: Long,
      family: SketchView.ViewFamily = SketchView.ViewFamily.ddsketch())
      : DataFrame = {
    require(periodMs > 0, s"periodMs must be positive: $periodMs")
    val counts = SketchView.read(spark, path, keyCols, family)
      .select(F.col("bucket_ms") +: keyCols.map(F.col) :+
        G.ddsketch_count(F.col("sketch")).as("n"): _*)
      .localCheckpoint(eager = false) // both join sides; view is small
    val prev = counts.select(
      (F.col("bucket_ms") + periodMs).as("bucket_ms") +:
        keyCols.map(F.col) :+ F.col("n").as("n_prev"): _*)
    counts.join(prev, Seq("bucket_ms") ++ keyCols, "left")
      .withColumn("ratio",
        F.col("n").cast("double") / F.col("n_prev").cast("double"))
  }

  /**
   * Window OVERLAP from a persisted KMV [[SketchView]] — "how many of
   * window A's uniques returned in window B" (user retention, repeat
   * visitors) by inclusion–exclusion over stored sketches:
   * `overlap = |A| + |B| − |A ∪ B|`, the union being one scalar KMV
   * merge. EXACT while each window's distinct count stays below the
   * sketch's `k` (the KMV exactness rule — size k to the window, and
   * the overlap is an integer, not an estimate). Two partition-pruned
   * view reads; keys quiet in one window count 0 there (full-outer
   * join, the multiWindowBurn surfacing rule). Emits (keys…,
   * uniques_a, uniques_b, uniques_union, overlap).
   */
  def kmvWindowOverlap(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      keyCols: Seq[String],
      aFromMs: Long,
      aUntilMs: Long,
      bFromMs: Long,
      bUntilMs: Long,
      k: Int = KmvSketch.DefaultK,
      partSpanMs: Long = SketchView.DefaultPartSpanMs): DataFrame = {
    val fam = SketchView.ViewFamily.kmvDistinct(k)
    def window(fromMs: Long, untilMs: Long, tag: String): DataFrame =
      SketchView.readRange(spark, path, keyCols, fromMs, untilMs, fam,
          partSpanMs)
        .groupBy(keyCols.map(F.col): _*)
        .agg(fam.merge(F.col("sketch")).as(s"__sk_$tag"))
    val joined = window(aFromMs, aUntilMs, "a")
      .join(window(bFromMs, bUntilMs, "b"), keyCols, "full_outer")
    val ua = F.coalesce(kmv.kmv_distinct(F.col("__sk_a")), F.lit(0.0))
      .cast("long")
    val ub = F.coalesce(kmv.kmv_distinct(F.col("__sk_b")), F.lit(0.0))
      .cast("long")
    val union = F.coalesce(
      kmv.kmv_distinct(kmv.kmv_merge(F.col("__sk_a"), F.col("__sk_b"))),
      kmv.kmv_distinct(F.col("__sk_a")),
      kmv.kmv_distinct(F.col("__sk_b")),
      F.lit(0.0)).cast("long")
    joined.select(keyCols.map(F.col) ++ Seq(
      ua.as("uniques_a"), ub.as("uniques_b"), union.as("uniques_union"),
      (ua + ub - union).as("overlap")): _*)
  }

  /** Mean of a [[SketchView.ViewFamily.moments]] struct (NULL on an
    * empty group — n = 0 divides to NULL via the guard). */
  def momentsMean(sk: Column): Column =
    F.when(sk.getField("n") > 0L,
      sk.getField("s") / sk.getField("n").cast("double"))

  /** Population variance of a moments struct: `s2/n − mean²`,
    * clamped at 0 against last-ulp negatives. */
  def momentsVariance(sk: Column): Column = {
    val n = sk.getField("n").cast("double")
    val mean = sk.getField("s") / n
    F.when(sk.getField("n") > 0L,
      F.greatest(sk.getField("s2") / n - mean * mean, F.lit(0.0)))
  }

  /**
   * Heavy-hitter DELTA between two time windows of a persisted TopK
   * [[SketchView]] — "what is trending" answered from stored sketches
   * alone: merge the view's per-bucket sketches over window A
   * (`[aFromMs, aUntilMs)`, the baseline) and window B (the current
   * window) per key, unpack both item lists, full-outer join on
   * (keys, item), and emit `(keys…, item, count_a, count_b, delta)`
   * with absent items at 0. Two partition-pruned scans of sketch
   * rows — never an event rescan (the multiWindowBurn shape).
   *
   * Counts (and therefore deltas) are EXACT while the TopK capacity
   * covers the distinct items of each merged window (the regrain
   * rule); beyond it they are the space-saving overestimates and the
   * output is still a valid trending report. `topN > 0` keeps the
   * largest-delta rows per key (ties broken by item for
   * determinism); `topN = 0` emits every item.
   */
  def trendingItems(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      keyCols: Seq[String],
      aFromMs: Long,
      aUntilMs: Long,
      bFromMs: Long,
      bUntilMs: Long,
      capacity: Int = graft.sketch.TopKSketch.DefaultCapacity,
      topN: Int = 0,
      partSpanMs: Long = SketchView.DefaultPartSpanMs): DataFrame = {
    require(aFromMs < aUntilMs && bFromMs < bUntilMs,
      "windows must be non-empty")
    val fam = SketchView.ViewFamily.topkItems(capacity)
    def window(fromMs: Long, untilMs: Long, tag: String): DataFrame =
      SketchView.readRange(spark, path, keyCols, fromMs, untilMs, fam,
          partSpanMs)
        .groupBy(keyCols.map(F.col): _*)
        .agg(fam.merge(F.col("sketch")).as("__sk"))
        .select(keyCols.map(F.col) :+
          F.explode(topk.topk_items(F.col("__sk"), Int.MaxValue))
            .as("__it"): _*)
        .select(keyCols.map(F.col) ++ Seq(
          F.col("__it.item").as("item"),
          F.col("__it.count").as(s"count_$tag")): _*)
    val joined = window(aFromMs, aUntilMs, "a")
      .join(window(bFromMs, bUntilMs, "b"), keyCols :+ "item", "full_outer")
      .select(keyCols.map(F.col) ++ Seq(
        F.col("item"),
        F.coalesce(F.col("count_a"), F.lit(0L)).as("count_a"),
        F.coalesce(F.col("count_b"), F.lit(0L)).as("count_b")): _*)
      .withColumn("delta", F.col("count_b") - F.col("count_a"))
    if (topN <= 0) joined
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(F.col): _*)
        .orderBy(F.col("delta").desc, F.col("item").asc)
      joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= topN).drop("__rn")
    }
  }
}
