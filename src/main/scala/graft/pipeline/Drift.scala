package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/**
 * Corpus drift detection — compare the distribution of a metric (or a
 * categorical label) between two corpus snapshots. This is the
 * monitoring layer a refresh pipeline runs before promoting a new
 * crawl: did the quality-score / length / source mix shift enough to
 * block the release?
 *
 * Three complementary statistics:
 *  - [[ksStatistic]]: EXACT two-sample Kolmogorov–Smirnov distance in
 *    integer arithmetic (cross-engine bit-exact), computed with a
 *    scalable two-phase cumulative sum — range-bucketed windows, no
 *    single-partition global window.
 *  - [[ksStatisticSketch]]: the 100 TB path — one DDSketch aggregate
 *    per side (single pass, mergeable, map-side combined) and
 *    driver-side CDF comparison over the union of bin boundaries;
 *    error bounded by the sketches' relative accuracy.
 *  - [[psiBins]]/[[psiStatistic]] and [[chiSquareDrift]]: population
 *    stability index over caller-fixed cutoffs, and the chi-square
 *    homogeneity statistic for categorical columns. Per-bin counts
 *    are exact integers.
 */
object Drift {

  /** Tag-union the metric column of two frames: (__v, __ca, __cb).
    * NULL / NaN metric rows are excluded from both sides. */
  private def tagged(a: DataFrame, b: DataFrame, col: String): DataFrame = {
    def side(df: DataFrame, ca: Int, cb: Int) =
      df.select(F.col(col).cast("double").as("__v"),
          F.lit(ca.toLong).as("__ca"), F.lit(cb.toLong).as("__cb"))
        .filter(F.col("__v").isNotNull && !F.isnan(F.col("__v")))
    side(a, 1, 0).unionAll(side(b, 0, 1))
  }

  /**
   * Exact two-sample KS distance between `col` in `a` and `b`. ONE
   * output row: (d_num, n_a, n_b, d) with
   * `d = sup_x |F_a(x) - F_b(x)| = d_num / (n_a * n_b)` and `d_num`
   * the max over distinct pooled values of |cum_a*n_b - cum_b*n_a| —
   * integer arithmetic end-to-end, so d_num/n_a/n_b are bit-exact
   * across engines and `d` is a single IEEE division of exact longs.
   *
   * Scale shape: one (value)-grouped aggregate (map-side combined),
   * then the [[RangeCumsum]] two-phase cumulative sum — range-bucketed
   * parallel windows plus broadcast prefix offsets, never a
   * single-partition global window. Grouping first makes the order
   * key unique, which RangeCumsum requires.
   */
  def ksStatistic(
      a: DataFrame, b: DataFrame, col: String, buckets: Int = 64): DataFrame = {
    val u = tagged(a, b, col).groupBy(F.col("__v"))
      .agg(F.sum(F.col("__ca")).as("__ca"), F.sum(F.col("__cb")).as("__cb"))
      .localCheckpoint(eager = false)
    val totals = u.agg(
      F.sum(F.col("__ca")).as("n_a"), F.sum(F.col("__cb")).as("n_b"))
    RangeCumsum.inclusive(u, F.col("__v"),
        Seq((F.col("__ca"), "__Fa"), (F.col("__cb"), "__Fb")), buckets)
      .select(F.col("__Fa"), F.col("__Fb"))
      .crossJoin(F.broadcast(totals))
      .agg(
        F.max(F.abs(F.col("__Fa") * F.col("n_b") - F.col("__Fb") * F.col("n_a")))
          .as("d_num"),
        F.first(F.col("n_a")).as("n_a"), F.first(F.col("n_b")).as("n_b"))
      .withColumn("d", F.when(F.col("n_a") > 0 && F.col("n_b") > 0,
        F.col("d_num").cast("double") /
          (F.col("n_a") * F.col("n_b")).cast("double")))
  }

  /**
   * Sketch-based KS distance — the corpus-scale path. Each side
   * aggregates to ONE DDSketch (single pass, mergeable); the CDFs
   * compare driver-side at every bin boundary of either sketch (the
   * only points where either CDF steps). |d_est - d_exact| is bounded
   * by the mass of the straddling bins plus the 2*accuracy bin-edge
   * blur. Output: one row (d_est DOUBLE).
   */
  def ksStatisticSketch(
      a: DataFrame, b: DataFrame, col: String,
      accuracy: Double = 0.01): DataFrame = {
    import graft.sketch.{functions => S}
    def sketchOf(df: DataFrame): graft.sketch.DDSketch = {
      val blob = df
        .select(F.col(col).cast("double").as("__v"))
        .filter(F.col("__v").isNotNull && !F.isnan(F.col("__v")))
        .agg(S.ddsketch_agg_values(F.col("__v"), accuracy).as("__s"))
        .first().getAs[Array[Byte]](0)
      if (blob == null) graft.sketch.DDSketch(accuracy)
      else graft.sketch.DataDogCodec.decode(blob)
    }
    val (da, db) = (sketchOf(a), sketchOf(b))
    def points(s: graft.sketch.DDSketch): Seq[Double] = {
      val p = (0 until s.positives.size).map(i => s.binToValue(s.positives.indexAt(i)))
      val n = (0 until s.negatives.size).map(i => -s.binToValue(s.negatives.indexAt(i)))
      p ++ n :+ 0.0
    }
    val pts = (points(da) ++ points(db)).distinct
    val d =
      if (da.isEmpty || db.isEmpty) 0.0
      else pts.map(x => math.abs(da.cdf(x) - db.cdf(x))).max
    val spark = a.sparkSession
    import spark.implicits._
    Seq(d).toDF("d_est")
  }

  /** Bin index for caller-fixed ascending cutoffs: the count of cuts
    * strictly below v — v <= cuts(0) lands in bin 0, v in
    * (cuts(i-1), cuts(i)] in bin i, v > cuts(last) in bin cuts.size. */
  private def binOf(cuts: Seq[Double]) = {
    val bLit = F.array(cuts.map(F.lit(_)): _*)
    (v: org.apache.spark.sql.Column) => F.size(F.filter(bLit, c => c < v))
  }

  /**
   * Per-bin counts for the population-stability index over caller-fixed
   * `cuts` (ascending): (bin, count_a, count_b) for every bin
   * 0..cuts.size including empty ones (the smoothing in
   * [[psiStatistic]] needs the full bin range). Cutoffs are caller
   * columns by design — the Fim trick — so cross-engine oracles replay
   * them as literals; derive them from DDSketch quantiles of the
   * reference snapshot when calling at scale.
   */
  def psiBins(
      a: DataFrame, b: DataFrame, col: String, cuts: Seq[Double]): DataFrame = {
    require(cuts.nonEmpty, "psiBins needs at least one cutoff")
    require(cuts == cuts.distinct.sorted, s"cuts must be ascending: $cuts")
    val counts = tagged(a, b, col)
      .withColumn("__bin", binOf(cuts)(F.col("__v")))
      .groupBy(F.col("__bin"))
      .agg(F.sum(F.col("__ca")).as("count_a"), F.sum(F.col("__cb")).as("count_b"))
    a.sparkSession.range(cuts.size + 1)
      .select(F.col("id").cast("int").as("__bin"))
      .join(counts, Seq("__bin"), "left")
      .select(F.col("__bin").as("bin"),
        F.coalesce(F.col("count_a"), F.lit(0L)).as("count_a"),
        F.coalesce(F.col("count_b"), F.lit(0L)).as("count_b"))
  }

  /** The reference side of a drift gate: bin counts of `col` over the
    * fixed `cuts`, one long per bin 0..cuts.size (empty bins zero) —
    * a bounded (cuts.size+1)-row collect, computed ONCE per reference
    * snapshot and carried into per-window comparisons (the streaming
    * gate [[graft.streaming.SketchStreaming.driftStream]]). */
  def referenceBinCounts(
      ref: DataFrame, col: String, cuts: Seq[Double]): Seq[Long] = {
    require(cuts.nonEmpty, "referenceBinCounts needs at least one cutoff")
    require(cuts == cuts.distinct.sorted, s"cuts must be ascending: $cuts")
    val got = ref
      .select(F.col(col).cast("double").as("__v"))
      .filter(F.col("__v").isNotNull && !F.isnan(F.col("__v")))
      .withColumn("__bin", binOf(cuts)(F.col("__v")))
      .groupBy(F.col("__bin")).agg(F.count(F.lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 to cuts.size).map(got.getOrElse(_, 0L))
  }

  /**
   * PSI = sum over bins of (p_a - p_b) * ln(p_a / p_b), with add-one
   * (Laplace) smoothing p = (count+1)/(n+bins) so empty bins
   * contribute finitely. ln is libm (<= 1 ulp), so the statistic is
   * rounded to `roundTo` decimals — the repo's convention for
   * anything summed across rows through pow/log. One row: (psi).
   */
  def psiStatistic(
      a: DataFrame, b: DataFrame, col: String, cuts: Seq[Double],
      roundTo: Int = 4): DataFrame = {
    val k = cuts.size + 1
    val bins = psiBins(a, b, col, cuts).localCheckpoint(eager = false)
    val totals = bins.agg(
      F.sum(F.col("count_a")).as("__na"), F.sum(F.col("count_b")).as("__nb"))
    bins.crossJoin(F.broadcast(totals))
      .select(
        ((F.col("count_a") + 1).cast("double") /
          (F.col("__na") + k).cast("double")).as("__pa"),
        ((F.col("count_b") + 1).cast("double") /
          (F.col("__nb") + k).cast("double")).as("__pb"))
      .agg(F.round(F.sum(
        (F.col("__pa") - F.col("__pb")) * F.log(F.col("__pa") / F.col("__pb"))),
        roundTo).as("psi"))
  }

  /**
   * Chi-square homogeneity per category for a categorical column: one
   * row per observed category with exact counts and the category's
   * contribution (O_a-E_a)^2/E_a + (O_b-E_b)^2/E_b to the statistic
   * (rounded to `roundTo`; the full chi-square is their sum). Scale
   * shape: one grouped aggregate, a 1-row broadcast re-attach.
   */
  def chiSquareDrift(
      a: DataFrame, b: DataFrame, col: String, roundTo: Int = 4): DataFrame = {
    def side(df: DataFrame, ca: Int, cb: Int) =
      df.select(F.col(col).cast("string").as("category"),
          F.lit(ca.toLong).as("__ca"), F.lit(cb.toLong).as("__cb"))
        .filter(F.col("category").isNotNull)
    val counts = side(a, 1, 0).unionAll(side(b, 0, 1))
      .groupBy(F.col("category"))
      .agg(F.sum(F.col("__ca")).as("count_a"), F.sum(F.col("__cb")).as("count_b"))
      .localCheckpoint(eager = false)
    val totals = counts.agg(
      F.sum(F.col("count_a")).as("__na"), F.sum(F.col("count_b")).as("__nb"))
    val n = (F.col("__na") + F.col("__nb")).cast("double")
    val ea = (F.col("count_a") + F.col("count_b")).cast("double") *
      F.col("__na").cast("double") / n
    val eb = (F.col("count_a") + F.col("count_b")).cast("double") *
      F.col("__nb").cast("double") / n
    counts.crossJoin(F.broadcast(totals))
      .select(F.col("category"), F.col("count_a"), F.col("count_b"),
        F.when(ea > 0 && eb > 0, F.round(
          (F.col("count_a") - ea) * (F.col("count_a") - ea) / ea +
          (F.col("count_b") - eb) * (F.col("count_b") - eb) / eb, roundTo))
          .as("contrib"))
  }

  /**
   * Embedding-distribution drift against a FROZEN IVF index — the
   * re-train signal every frozen-geometry maintenance operator
   * documents ([[Similarity.appendToIvfIndex]],
   * [[ProductQuantization.appendToIvfPq]], [[Diversity.d4Incremental]]):
   * assign the fresh batch to the index's frozen centroids (map-only,
   * broadcast) and compute the PSI between the batch's cell-occupancy
   * histogram and the index's own — when the embedding distribution
   * leaves the centroids behind, fresh mass piles into few (or new
   * regions of) cells and the PSI rises. Same add-one smoothing and
   * `roundTo` rounding as [[psiStatistic]]; every cell 0..nlist-1 is a
   * bin (zero-count bins smooth to 1). Returns one row
   * (n_index, n_batch, psi). psi == 0.0 exactly when the smoothed
   * per-cell COUNTS match (e.g. the index's own vectors); equal
   * proportions at DIFFERENT totals leave a small positive smoothing
   * residue (~k/n scale) — alert on a threshold, never on psi != 0.
   *
   * Scale shape: one map-only assignment of the batch + two
   * nlist-row aggregates (the index side can be cached/reused by the
   * caller across nights). Nothing collected beyond 2·nlist longs.
   */
  /** The frozen index's cell-occupancy histogram (nlist longs) — the
    * reference distribution for [[embeddingDrift]] and
    * [[graft.streaming.SketchStreaming.embeddingDriftStream]]. One
    * bounded nlist-row aggregate. */
  def cellOccupancy(index: Similarity.IvfIndex): Array[Long] = {
    val k = index.centroids.length
    val occ = new Array[Long](k)
    index.assigned.select(F.col("__cell"))
      .groupBy(F.col("__cell")).agg(F.count(F.lit(1)).as("__n"))
      .collect().foreach { r =>
        val c = r.getInt(0)
        if (c >= 0 && c < k) occ(c) = r.getLong(1)
      }
    occ
  }

  /** `nearestCentroid` of the frozen index as a Column — usable on
    * streaming frames. NULL vectors map to NULL. */
  def cellOf(
      index: Similarity.IvfIndex,
      spark: SparkSession,
      vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val cB = spark.sparkContext.broadcast(index.centroids)
    F.udf((v: Array[Float]) =>
      if (v == null) None else Some(Similarity.nearestCentroid(cB.value, v)))
      .apply(vec)
  }

  def embeddingDrift(
      index: Similarity.IvfIndex,
      batch: DataFrame,
      vecCol: String,
      roundTo: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    val k = index.centroids.length
    val occIdx = cellOccupancy(index)
    val occBatch = {
      val occ = new Array[Long](k)
      batch.filter(F.col(vecCol).isNotNull)
        .select(cellOf(index, spark, F.col(vecCol)).as("__cell"))
        .groupBy(F.col("__cell")).agg(F.count(F.lit(1)).as("__n"))
        .collect().foreach { r =>
          val c = r.getInt(0)
          if (c >= 0 && c < k) occ(c) = r.getLong(1)
        }
      occ
    }
    val nIdx = occIdx.sum
    val nBatch = occBatch.sum
    var psi = 0.0
    var c = 0
    while (c < k) {
      val pi = (occIdx(c) + 1).toDouble / (nIdx + k)
      val pb = (occBatch(c) + 1).toDouble / (nBatch + k)
      psi += (pb - pi) * math.log(pb / pi)
      c += 1
    }
    val rounded = BigDecimal(psi)
      .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble
    spark.range(1).select(
      F.lit(nIdx).as("n_index"),
      F.lit(nBatch).as("n_batch"),
      F.lit(rounded).as("psi"))
  }
}
