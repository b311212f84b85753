package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Deterministic, engine-portable sampling for training-data pipelines.
 *
 * The selection predicate is a lexicographic threshold on the first 4
 * hex chars of md5(key): stable across runs, cluster sizes, and engines
 * (any SQL dialect with md5 can reproduce the exact sample — unlike
 * Spark's `sample()`, which is seed- and partitioning-dependent).
 * Granularity is 1/65536; the filter is a pure codegen'd projection
 * with no shuffle, so it pushes into the scan pipeline at any scale.
 */
object Sampling {

  // "g" sorts after every 4-char hex string, so a fraction that rounds
  // to the full 65536 keeps everything — a plain %04x would emit the
  // 5-char "10000", which sorts BELOW "1001" and inverts the predicate
  private def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    val t = math.round(fraction * 65536.0).toInt
    if (t >= 65536) "g" else f"$t%04x"
  }

  /** Boolean selection column: true for ~`fraction` of distinct keys. */
  def sampledBy(key: Column, fraction: Double): Column =
    if (fraction >= 1.0) F.lit(true)
    else F.substring(F.md5(key.cast("string")), 1, 4) < F.lit(thresholdHex(fraction))

  /** Keep ~`fraction` of rows, selected deterministically by `key`
    * (all rows of one key are kept or dropped together). */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(sampledBy(key, fraction))

  /**
   * Weighted deterministic sample: each row's keep-probability is its
   * own `weight` column clamped to [0, 1] (e.g. a quality score, so
   * high-quality documents are preferentially retained). Same md5
   * predicate with a per-row threshold rendered by format_string —
   * still shuffle-free, still engine-portable (printf in DuckDB), and
   * weights >= 1 short-circuit to keep (the %04x rendering of 65536
   * would be a 5-char string that inverts the comparison).
   */
  def weightedSample(df: DataFrame, key: Column, weight: Column): DataFrame = {
    val hex = F.substring(F.md5(key.cast("string")), 1, 4)
    // same rounding as thresholdHex so weightedSample(lit(f)) selects
    // exactly deterministicSample(f)'s rows for every constant f; the
    // t >= 65536 arm covers weights that round up to the full range
    // (%04x would render 5 chars and invert the comparison)
    val t = F.round(weight * 65536.0, 0).cast("int")
    df.filter(weight >= 1.0 ||
      (weight > 0.0 && (t >= 65536 || hex < F.format_string("%04x", t))))
  }

  /**
   * Deterministic train/val/test split: assigns every key to EXACTLY
   * one named split by consecutive md5-prefix ranges — the partition
   * counterpart of [[deterministicSample]] (and equally
   * engine-portable: any SQL with md5 reproduces the assignment).
   * All rows of one key land in the same split; fractions must sum to
   * <= 1 and any remainder maps to `otherName`. Shuffle-free: the
   * assignment is a pure projection that runs inside the scan
   * pipeline, so splitting 100 TB costs one column.
   */
  def splitColumn(
      key: Column,
      splits: Seq[(String, Double)],
      otherName: String = "rest"): Column = {
    require(splits.nonEmpty, "splitColumn requires at least one split")
    require(splits.map(_._2).forall(f => f >= 0.0 && f <= 1.0),
      s"split fractions out of range: $splits")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions sum to ${splits.map(_._2).sum} > 1")
    val hex = F.substring(F.md5(key.cast("string")), 1, 4)
    // consecutive half-open ranges [hex(c_{i-1}), hex(c_i)) over the
    // cumulative fractions — same rounding as thresholdHex so a
    // 2-way split at f is exactly deterministicSample(f) + complement
    val bounds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val cases = splits.map(_._1).zip(bounds.map(thresholdHex))
    cases.reverse.foldLeft(F.lit(otherName)) {
      case (acc, (name, bound)) =>
        F.when(hex < F.lit(bound), F.lit(name)).otherwise(acc)
    }
  }

  /** [[splitColumn]] applied: adds `splitCol` (default "split"). */
  def splitByHash(
      df: DataFrame,
      key: Column,
      splits: Seq[(String, Double)],
      splitColName: String = "split",
      otherName: String = "rest"): DataFrame =
    df.withColumn(splitColName, splitColumn(key, splits, otherName))

  /**
   * Fixed-size deterministic uniform sample: the k rows whose
   * md5(key) sorts lowest (ties broken by key). Unlike a fraction
   * sample this needs no prior row count — "give me exactly 10k
   * documents" — and stays deterministic and engine-portable (any SQL:
   * ORDER BY md5(key), key LIMIT k). Spark compiles orderBy+limit to
   * TakeOrderedAndProject: per-partition top-k then a driver merge of
   * k rows per partition — no global sort at any corpus size (keep k
   * driver-sized: ~1e6 rows, not 1e9).
   */
  def bottomK(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    df.orderBy(F.md5(key.cast("string")), key).limit(k)
  }

  /**
   * Exactly `k` rows PER STRATUM (fewer where a stratum is smaller) —
   * "100k documents from every source" as one ranked window over the
   * md5 order: deterministic, engine-portable (row_number() OVER
   * (PARTITION BY stratum ORDER BY md5(key), key) <= k), and one hash
   * exchange on the stratum column. Unlike [[stratifiedSample]] this
   * guarantees the budget exactly, at the cost of a per-stratum sort —
   * a hot stratum is one window partition, so keep per-stratum row
   * counts within executor-sort range (or pre-thin with
   * [[deterministicSample]] first at extreme skew).
   */
  def stratifiedFixedK(df: DataFrame, stratum: Column, key: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(F.md5(key.cast("string")), key)
    df.withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Exact-k WEIGHTED sampling without replacement per stratum — the
   * Efraimidis–Spirakis A-ES reservoir made deterministic: each row
   * draws u from its key's md5 prefix (u = (hex32 + 0.5) / 2^32, a
   * replayable uniform), scores ln(u) / weight, and the k largest
   * scores per stratum win (higher weight → score nearer 0 →
   * favored; inclusion probabilities match sequential weighted
   * draws without replacement). Ties (md5-prefix collisions,
   * ~pairs/2^32) break by key — fully deterministic and
   * engine-replayable: u is exact rational math, ln is the only libm
   * call and adjacent score gaps on random u dwarf its 1-ulp noise.
   *
   * Rows with NULL or non-positive weights drop. Same scale shape as
   * [[stratifiedFixedK]]: one per-stratum window (Spark 4's partial
   * WindowGroupLimit prunes to ~k rows per partition BEFORE the
   * shuffle).
   */
  def weightedFixedK(
      df: DataFrame,
      stratum: Column,
      key: Column,
      weight: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    val score = F.log(u) / weight.cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(score.desc, key)
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Rebalance to a target domain mixture: keep the LARGEST subset
   * whose per-domain row shares match `targetWeights` (weights need
   * not be normalized), without upsampling any domain. Domains absent
   * from the map are dropped. With per-domain counts n_d and
   * normalized weights w_d, the achievable total is
   * T = min_d(n_d / w_d) and each domain keeps a w_d * T / n_d
   * fraction of its rows — selected with the same shuffle-free
   * md5-threshold predicate as [[weightedSample]], so the mixture is
   * exact to within sampling noise (O(sqrt n) per domain) but the
   * corpus never shuffles. An exact per-domain quota would need a
   * per-domain total order — a single-task skew bottleneck at scale —
   * which is why the fraction form is the default. `scale` (<= 1)
   * shrinks the total below the achievable maximum.
   */
  def rebalanceToDistribution(
      df: DataFrame,
      domain: Column,
      key: Column,
      targetWeights: Map[String, Double],
      scale: Double = 1.0): DataFrame = {
    require(targetWeights.nonEmpty, "targetWeights must not be empty")
    require(targetWeights.values.forall(_ > 0.0),
      s"target weights must be > 0: $targetWeights")
    require(scale > 0.0 && scale <= 1.0, s"scale must be in (0, 1], got $scale")
    val wSum = targetWeights.values.sum
    val wCol = targetWeights.foldLeft(F.lit(null).cast("double")) {
      case (acc, (d, w)) => F.when(domain === d, F.lit(w / wSum)).otherwise(acc)
    }
    val tagged = df.withColumn("__dom", domain).withColumn("__tw", wCol)
      .filter(F.col("__tw").isNotNull)
    val counts = tagged.groupBy(F.col("__dom"))
      .agg(F.count(F.lit(1)).cast("double").as("__n"),
           F.first(F.col("__tw")).as("__w"))
    // achievable total preserving the mixture, then per-domain fraction
    val t = counts.agg(F.min(F.col("__n") / F.col("__w")).as("__t"))
    val frac = counts.crossJoin(t)
      .select(F.col("__dom"),
        F.least(F.lit(1.0), F.col("__w") * F.col("__t") * scale / F.col("__n"))
          .as("__frac"))
    val hex = F.substring(F.md5(key.cast("string")), 1, 4)
    val thr = F.round(F.col("__frac") * 65536.0, 0).cast("int")
    tagged
      .join(F.broadcast(frac), "__dom")
      .filter(F.col("__frac") >= 1.0 ||
        (F.col("__frac") > 0.0 &&
          (thr >= 65536 || hex < F.format_string("%04x", thr))))
      .drop("__dom", "__tw", "__frac")
  }

  /**
   * Temperature-based mixture rebalancing (the multilingual-pretraining
   * recipe, e.g. XLM-R: sample domain d with probability proportional
   * to n_d^alpha). alpha = 1 keeps the natural mixture; alpha -> 0
   * flattens toward uniform, up-weighting small domains. Like
   * [[rebalanceToDistribution]] this never upsamples: with weights
   * w_d = n_d^alpha the kept total is T = min_d(n_d / w_d) (the
   * smallest domain binds and is kept whole) and every domain keeps a
   * w_d * T / n_d fraction via the same shuffle-free md5 predicate —
   * one count aggregate over the domain column, then a broadcast
   * re-attach; the corpus itself never shuffles.
   */
  def temperatureRebalance(
      df: DataFrame,
      domain: Column,
      key: Column,
      alpha: Double,
      scale: Double = 1.0): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(scale > 0.0 && scale <= 1.0, s"scale must be in (0, 1], got $scale")
    val tagged = df.withColumn("__dom", domain).filter(F.col("__dom").isNotNull)
    val counts = tagged.groupBy(F.col("__dom"))
      .agg(F.count(F.lit(1)).cast("double").as("__n"))
      .withColumn("__w", F.pow(F.col("__n"), alpha))
    val t = counts.agg(F.min(F.col("__n") / F.col("__w")).as("__t"))
    val frac = counts.crossJoin(t)
      .select(F.col("__dom"),
        F.least(F.lit(1.0), F.col("__w") * F.col("__t") * scale / F.col("__n"))
          .as("__frac"))
    val hex = F.substring(F.md5(key.cast("string")), 1, 4)
    val thr = F.round(F.col("__frac") * 65536.0, 0).cast("int")
    tagged
      .join(F.broadcast(frac), "__dom")
      .filter(F.col("__frac") >= 1.0 ||
        (F.col("__frac") > 0.0 &&
          (thr >= 65536 || hex < F.format_string("%04x", thr))))
      .drop("__dom", "__frac")
  }

  /**
   * Per-domain token-budget selection: walk each domain's rows in
   * deterministic md5(key) order and keep rows while the INCLUSIVE
   * running token total stays <= `budget` — "at most B tokens from
   * every source", the budget-capping step of a data-mixture build.
   * Engine-portable (sum() OVER (PARTITION BY domain ORDER BY
   * md5(key), key) <= B) and one hash exchange on the domain column;
   * a hot domain is one window partition, so pre-thin extreme skew
   * with [[deterministicSample]] first (same caveat as
   * [[stratifiedFixedK]]).
   */
  def takeTokenBudget(
      df: DataFrame,
      domain: Column,
      key: Column,
      tokens: Column,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(domain).orderBy(F.md5(key.cast("string")), key)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__cum", F.sum(tokens.cast("long")).over(w))
      .filter(F.col("__cum") <= budget)
      .drop("__cum")
  }

  /**
   * Epoch replication to per-domain token budgets — the UP-sampling
   * side of the mixture family ([[takeTokenBudget]] only trims, and
   * real data recipes repeat small high-quality domains for several
   * epochs): domain d with total T_d tokens and budget B_d emits
   * floor(B_d / T_d) FULL copies (`epoch` 0..e-1) plus a partial
   * epoch e holding the domain's deterministic md5-ordered prefix
   * whose running token total fits the remainder (exactly
   * [[takeTokenBudget]]'s selection within the last epoch) — so the
   * emitted token total is the largest achievable <= B_d without
   * splitting documents, and nested budgets yield nested outputs.
   * Domains missing from `budgets` (or with budget 0, or zero token
   * mass) are dropped; NULL token counts count as 0.
   *
   * Epochs are clamped to `maxEpochs` (a budget of 1e9 tokens against
   * a 10-token domain must not explode the stage); clamping is logged,
   * never silent.
   *
   * Scale shape: one tiny per-domain totals aggregate broadcast back,
   * one window exchange on the domain for the prefix sums, and a
   * generate for the epoch copies — rows at most (maxEpochs+1) x
   * input, by construction exactly ceil(B_d / T_d) x per domain.
   */
  def repeatToBudget(
      df: DataFrame,
      domain: Column,
      key: Column,
      tokens: Column,
      budgets: Map[String, Long],
      maxEpochs: Int = 100): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    val session = df.sparkSession
    import session.implicits._
    val bdf = F.broadcast(budgets.toSeq.toDF("__dom", "__budget"))
    val tok = F.coalesce(tokens.cast("long"), F.lit(0L))
    val totals = df.groupBy(domain.cast("string").as("__dom"))
      .agg(F.sum(tok).as("__total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(domain).orderBy(F.md5(key.cast("string")), key)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val prepared = df
      .withColumn("__dom", domain.cast("string"))
      .withColumn("__cum", F.sum(tok).over(w))
      .join(bdf, "__dom")
      .join(F.broadcast(totals), "__dom")
      .filter(F.col("__total") > 0L && F.col("__budget") > 0L)
    val eRaw = F.expr("__budget div __total")
    val clamped = F.least(eRaw, F.lit(maxEpochs.toLong))
    // fires per clamped ROW (best-effort telemetry, like gapFill's
    // truncation counter)
    val warned = graft.pipeline.AccumulatorRetainer.retain(
      session.sparkContext.longAccumulator("graft.sampling.clampedEpochRows"))
    val clampU = F.udf((dom: String, e: Long) => {
      warned.add(1L)
      org.slf4j.LoggerFactory.getLogger("graft.pipeline.Sampling")
        .warn(s"repeatToBudget: domain '$dom' wants $e epochs; clamping to $maxEpochs")
      maxEpochs.toLong
    }).asNondeterministic()
    val epochs = F.when(eRaw > maxEpochs.toLong,
        clampU(F.col("__dom"), eRaw)).otherwise(clamped)
    val rem = F.col("__budget") - epochs * F.col("__total")
    prepared
      .withColumn("__e", epochs)
      .withColumn("__rem", rem)
      .withColumn("epoch", F.explode(F.sequence(F.lit(0L), F.col("__e"))))
      // full copies for epoch < e; the partial epoch keeps the
      // md5-prefix whose cumulative mass fits the remainder
      .filter(F.col("epoch") < F.col("__e") || F.col("__cum") <= F.col("__rem"))
      .drop("__dom", "__cum", "__budget", "__total", "__e", "__rem")
  }

  /**
   * Waterfilling allocation of a GLOBAL token budget across weighted
   * domains: find λ with Σ_d min(T_d, λ·w_d) = B and give domain d
   * the allocation min(T_d, ⌊λ·w_d⌋) — small domains keep everything
   * (saturate), large ones are capped in proportion to their weight,
   * and the surplus of saturated domains flows to the rest. This is
   * the mixture-planning step of a weighted data recipe (DoReMi-style
   * domain weights at a fixed training-token budget). Pure driver
   * math over ≤ |domains| inputs.
   *
   * Deterministic closed form: walk domains in ascending T_d/w_d
   * order (ties by name); a prefix saturates while
   * T_k · wRest_k <= remaining_k · w_k (exact multiply form), with
   * remaining/wRest updated by the EXACT totals of the saturated
   * prefix; at the first non-saturated domain λ = remaining/wRest is
   * FROZEN and every remaining domain gets ⌊λ·w_d⌋ (they all have
   * T/w > λ, so none can saturate). The frozen-λ breakpoint form is
   * engine-portable — a SQL oracle reproduces it with window prefix
   * sums, no recursion. Domains missing from `weights` or with weight
   * <= 0 get allocation 0.
   */
  def waterfillBudgets(
      tokenTotals: Seq[(String, Long)],
      weights: Map[String, Double],
      budget: Long): Map[String, Long] = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val zeroed = tokenTotals.filter { case (d, _) =>
      weights.getOrElse(d, 0.0) <= 0.0 }.map(_._1 -> 0L)
    val live = tokenTotals
      .filter { case (d, _) => weights.getOrElse(d, 0.0) > 0.0 }
      .sortBy { case (d, t) => (t.toDouble / weights(d), d) }
    var remaining = budget.toDouble
    var wRest = live.map { case (d, _) => weights(d) }.sum
    var lambda = -1.0 // frozen at the first non-saturated domain
    val out = Map.newBuilder[String, Long]
    out ++= zeroed
    live.foreach { case (d, t) =>
      val w = weights(d)
      if (lambda < 0 && t.toDouble * wRest <= remaining * w) {
        out += d -> t // saturated: keep everything
        remaining -= t.toDouble
        wRest -= w
      } else {
        if (lambda < 0) lambda = if (wRest > 0) remaining / wRest else 0.0
        out += d -> math.floor(lambda * w).toLong
      }
    }
    out.result()
  }

  /**
   * Apply [[waterfillBudgets]] to a corpus: per-domain token totals
   * (one tiny aggregate, ≤ |domains| rows collected), waterfill the
   * budget, then keep each domain's rows in deterministic md5(key)
   * order while the inclusive running token total stays within the
   * domain's allocation (the [[takeTokenBudget]] window against a
   * per-domain cap). One hash exchange on the domain column; the
   * corpus never shuffles twice.
   */
  def waterfillMixture(
      df: DataFrame,
      domain: Column,
      key: Column,
      tokens: Column,
      weights: Map[String, Double],
      budget: Long): DataFrame = {
    val tagged = df.withColumn("__dom", domain).filter(F.col("__dom").isNotNull)
    val totals = tagged.groupBy(F.col("__dom"))
      .agg(F.sum(tokens.cast("long")).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val allocs = waterfillBudgets(totals, weights, budget)
    val spark = df.sparkSession
    import spark.implicits._
    val budgets = allocs.toSeq.toDF("__dom", "__budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col("__dom")).orderBy(F.md5(key.cast("string")), key)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    tagged
      .join(F.broadcast(budgets), "__dom")
      .withColumn("__cum", F.sum(tokens.cast("long")).over(w))
      .filter(F.col("__cum") <= F.col("__budget"))
      .drop("__dom", "__budget", "__cum")
  }

  /**
   * Stable pseudorandom sort key for training-order shuffling:
   * md5("<seed>:<key>"). Changing the seed gives an independent
   * permutation; the same seed reproduces the exact order on any
   * cluster size or engine (DuckDB: md5(seed || ':' || key)).
   */
  def shuffleKey(key: Column, seed: Long): Column =
    F.md5(F.concat_ws(":", F.lit(seed.toString), key.cast("string")))

  /**
   * Deterministic global shuffle — the training-order randomization
   * pass before sequence packing / sharded writes. `orderBy` on the
   * hash key is a range exchange (sampled bounds) plus per-partition
   * sort: the standard total-order shuffle write, one pass, no driver
   * involvement. The hash key is uniform by construction, so the range
   * partitions are balanced regardless of input skew. Callers that
   * only need DECLUSTERING (not a reproducible total order) can
   * `df.repartition(n, shuffleKey(key, seed))` and skip the sort.
   */
  def deterministicShuffle(df: DataFrame, key: Column, seed: Long): DataFrame =
    df.orderBy(shuffleKey(key, seed), key)

  /**
   * Stratified deterministic sample: per-stratum fractions, with
   * `defaultFraction` for strata not in the map. Same md5 predicate,
   * just a per-stratum threshold — still shuffle-free.
   */
  def stratifiedSample(
      df: DataFrame,
      strata: Column,
      key: Column,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    val hex = F.substring(F.md5(key.cast("string")), 1, 4)
    val threshold = fractions.foldLeft(F.lit(thresholdHex(defaultFraction))) {
      case (acc, (stratum, fraction)) =>
        F.when(strata === stratum, F.lit(thresholdHex(fraction))).otherwise(acc)
    }
    df.filter(hex < threshold)
  }

  /**
   * Assign dense sequential ids 0..n-1 (plus `startAt`) in ascending
   * `orderCol` order — the id-space builder for token streams, shard
   * manifests, and matrix row indices. `orderCol` must be unique and
   * numeric-ish. A naive `row_number() OVER (ORDER BY ...)` funnels
   * the corpus through ONE partition; this rides [[RangeCumsum]]'s
   * two-phase parallel cumulative count (range-bucketed windows +
   * broadcast prefix offsets), identical output at any partition
   * count. Unlike `monotonically_increasing_id`/`zipWithIndex`, the
   * result is a pure function of the DATA, not the partitioning —
   * reproducible across runs and engines.
   */
  def withSequentialIds(
      df: DataFrame,
      orderCol: Column,
      outCol: String = "seq_id",
      startAt: Long = 0L): DataFrame =
    RangeCumsum.inclusive(df, orderCol, Seq((F.lit(1L), outCol)))
      .withColumn(outCol, F.col(outCol) - 1L + startAt)
}
