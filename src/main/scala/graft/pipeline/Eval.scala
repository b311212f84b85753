package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/**
 * Classifier-quality metrics over corpus-scale score columns — the
 * evaluation side of [[QualityClassifier]] / [[Dsir]]: once a filter
 * model scores a corpus, AUC and operating-point metrics decide the
 * keep threshold.
 *
 * Scale shape: every metric here reduces the corpus to ONE row per
 * distinct score value first (a hash aggregate with map-side partial
 * combine), and only then runs the cumulative pass over that small
 * per-score table. Raw float scores would make "per distinct value" as
 * large as the corpus, so scores are rounded to `roundTo` decimal
 * places on the way in (default 6 — at most 2e6 distinct values for a
 * [0,1] score, a single-task window input by construction). All
 * rank/count arithmetic stays in BIGINT until the final division, so
 * results are exact and identical in any execution order and on any
 * engine.
 */
object Eval {

  private def quantize(score: Column, roundTo: Int): Column =
    if (roundTo < 0) score.cast("double") else F.round(score.cast("double"), roundTo)

  /**
   * Exact tie-aware ROC AUC via the grouped Mann-Whitney rank-sum.
   *
   * With rows grouped by score value — `t` rows of which `p` are
   * positive, `c` rows strictly below — every member of the group has
   * average 1-based rank `c + (t+1)/2`. Doubling keeps it integral:
   * the positives of the group contribute `p * (2c + t + 1)` to twice
   * the positive rank-sum `2R`, and
   *
   *   AUC = (2R - nPos*(nPos+1)) / (2 * nPos * nNeg)
   *
   * which equals the usual tie-corrected probability
   * P(score+ > score-) + P(tie)/2. Numerator and denominator are
   * BIGINTs, so the one double division at the end is bit-identical
   * across engines and partition layouts.
   *
   * Returns one row: (n_pos, n_neg, rank2_sum, auc). NULL labels and
   * NULL scores are excluded; auc is NULL when either class is empty.
   */
  def binaryAuc(
      df: DataFrame,
      score: Column,
      label: Column,
      roundTo: Int = 6): DataFrame = {
    val perScore = df
      .filter(score.isNotNull && label.isNotNull)
      .groupBy(quantize(score, roundTo).as("__s"))
      .agg(F.sum(F.when(label.cast("boolean"), 1L).otherwise(0L)).as("__p"),
           F.count(F.lit(1)).as("__t"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(F.col("__s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    perScore
      .withColumn("__c", F.coalesce(F.sum(F.col("__t")).over(w), F.lit(0L)))
      .agg(
        F.sum(F.col("__p")).as("n_pos"),
        F.sum(F.col("__t") - F.col("__p")).as("n_neg"),
        F.sum(F.col("__p") * (F.lit(2L) * F.col("__c") + F.col("__t") + F.lit(1L)))
          .as("rank2_sum"))
      .select(
        F.col("n_pos"), F.col("n_neg"), F.col("rank2_sum"),
        F.when(F.col("n_pos") > 0L && F.col("n_neg") > 0L,
            (F.col("rank2_sum") - F.col("n_pos") * (F.col("n_pos") + F.lit(1L)))
              .cast("double") /
            (F.lit(2L) * F.col("n_pos") * F.col("n_neg")).cast("double"))
          .as("auc"))
  }

  /**
   * ROC curve points, one per distinct (rounded) score value: scanning
   * thresholds from high to low, a row's (tp, fp) count the rows with
   * score >= its threshold. `tpr`/`fpr` are exact integer ratios cast
   * at the end. The full curve is as many rows as distinct scores —
   * round harder (or bucket upstream) if that must stay small.
   */
  def rocPoints(
      df: DataFrame,
      score: Column,
      label: Column,
      roundTo: Int = 3): DataFrame = {
    val perScore = df
      .filter(score.isNotNull && label.isNotNull)
      .groupBy(quantize(score, roundTo).as("threshold"))
      .agg(F.sum(F.when(label.cast("boolean"), 1L).otherwise(0L)).as("__p"),
           F.count(F.lit(1)).as("__t"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(F.col("threshold").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perScore
      .withColumn("tp", F.sum(F.col("__p")).over(w))
      .withColumn("fp", F.sum(F.col("__t") - F.col("__p")).over(w))
      .withColumn("__npos", F.sum(F.col("__p")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("__nneg", F.sum(F.col("__t") - F.col("__p")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(
        F.col("threshold"), F.col("tp"), F.col("fp"),
        F.when(F.col("__npos") > 0L,
          F.col("tp").cast("double") / F.col("__npos").cast("double")).as("tpr"),
        F.when(F.col("__nneg") > 0L,
          F.col("fp").cast("double") / F.col("__nneg").cast("double")).as("fpr"))
  }

  /**
   * Confusion counts and derived metrics at one threshold
   * (prediction = score >= threshold). One corpus aggregate, integer
   * counts, exact divisions; f1 is NULL when precision+recall is 0.
   */
  def confusionAt(
      df: DataFrame,
      score: Column,
      label: Column,
      threshold: Double): DataFrame = {
    val pred = score.cast("double") >= threshold
    val pos = label.cast("boolean")
    df.filter(score.isNotNull && label.isNotNull)
      .agg(
        F.sum(F.when(pred && pos, 1L).otherwise(0L)).as("tp"),
        F.sum(F.when(pred && !pos, 1L).otherwise(0L)).as("fp"),
        F.sum(F.when(!pred && !pos, 1L).otherwise(0L)).as("tn"),
        F.sum(F.when(!pred && pos, 1L).otherwise(0L)).as("fn"))
      .select(
        F.col("tp"), F.col("fp"), F.col("tn"), F.col("fn"),
        F.when(F.col("tp") + F.col("fp") > 0L,
          F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"))
          .as("precision"),
        F.when(F.col("tp") + F.col("fn") > 0L,
          F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"))
          .as("recall"))
      .withColumn("f1",
        F.when(F.col("precision").isNotNull && F.col("recall").isNotNull &&
               (F.col("precision") + F.col("recall")) > 0.0,
          F.lit(2.0) * F.col("precision") * F.col("recall") /
            (F.col("precision") + F.col("recall"))))
  }

  /**
   * Calibration table: bucket scores into `bins` equal-width bins over
   * [0, 1] and report per-bin count, mean predicted score, and
   * positive rate. Mean and rate are sums-of-integers divided at the
   * end when the score is itself quantized — here the score mean uses
   * the ROUNDED score (roundTo decimals) scaled to a long, so the
   * per-bin mean is exact and order-independent too.
   */
  def calibrationBins(
      df: DataFrame,
      score: Column,
      label: Column,
      bins: Int = 10,
      roundTo: Int = 6): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val scale = math.pow(10.0, roundTo).toLong
    val s = quantize(score, roundTo)
    val bin = F.least(F.greatest(F.floor(s * bins).cast("int"), F.lit(0)),
      F.lit(bins - 1))
    df.filter(score.isNotNull && label.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(
        F.count(F.lit(1)).as("n"),
        F.sum(F.round(s * scale, 0).cast("long")).as("__ssum"),
        F.sum(F.when(label.cast("boolean"), 1L).otherwise(0L)).as("__pos"))
      .select(
        F.col("bin"), F.col("n"),
        (F.col("__ssum").cast("double") / (F.col("n") * scale).cast("double"))
          .as("mean_score"),
        (F.col("__pos").cast("double") / F.col("n").cast("double"))
          .as("pos_rate"))
  }

  /**
   * Per-query ranking metrics at cutoff `k` over a ranked candidate
   * list — the evaluation side of [[Similarity]]/[[Retrieval]]: given
   * (query, 1-based rank, is-relevant) rows and the per-query total
   * relevant count, emits hits@k, first relevant rank, precision@k,
   * recall@k, reciprocal rank, and nDCG@k.
   *
   * `ranked` needs columns (queryCol, rankCol, relCol); `totals` needs
   * (queryCol, totalRelCol). Queries present in `totals` but absent
   * from `ranked` (empty result lists) still emit a row of zeros.
   *
   * Number discipline: precision/recall/RR are ONE IEEE division of
   * exact integers — bit-identical on any engine. DCG and ideal DCG
   * are log2-based sums, so they carry summation-order and libm noise
   * ~1e-15; `ndcg` is therefore rounded to 4 decimals (the repo's
   * cross-engine float form), while `dcg` stays raw for callers that
   * aggregate further.
   *
   * Scale shape: one hash aggregate over the (small) top-k rows plus a
   * join with the per-query totals — both sides are one row per query,
   * so this never touches corpus-scale data.
   */
  def rankingMetrics(
      ranked: DataFrame,
      queryCol: String,
      rankCol: String,
      relCol: String,
      totals: DataFrame,
      totalRelCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val rank = F.col(rankCol).cast("long")
    val rel = F.col(relCol)
    val agg = ranked.filter(rank <= k)
      .groupBy(F.col(queryCol))
      .agg(
        F.sum(F.when(rel, 1L).otherwise(0L)).as("hits"),
        F.min(F.when(rel, rank)).as("first_rank"),
        F.sum(F.when(rel, F.lit(1.0) / F.log2(rank.cast("double") + 1.0))
          .otherwise(0.0)).as("dcg"))
    val nRel = F.col(totalRelCol).cast("long")
    val joined = totals.select(F.col(queryCol), nRel.as("n_rel"))
      .join(agg, Seq(queryCol), "left")
    val hits = F.coalesce(F.col("hits"), F.lit(0L))
    val dcg = F.coalesce(F.col("dcg"), F.lit(0.0))
    // ideal DCG: the first min(n_rel, k) positions all relevant; the
    // fold runs in ascending-index order on both engines
    val idcg = F.aggregate(
      F.sequence(F.lit(1L), F.least(F.col("n_rel"), F.lit(k.toLong))),
      F.lit(0.0),
      (acc: Column, i: Column) => acc + F.lit(1.0) / F.log2(i.cast("double") + 1.0))
    joined.select(
      F.col(queryCol),
      F.col("n_rel"),
      hits.as("hits"),
      F.col("first_rank"),
      (hits.cast("double") / k).as("precision_at_k"),
      F.when(F.col("n_rel") > 0, hits.cast("double") / F.col("n_rel").cast("double"))
        .otherwise(0.0).as("recall_at_k"),
      F.coalesce(F.lit(1.0) / F.col("first_rank").cast("double"), F.lit(0.0))
        .as("reciprocal_rank"),
      dcg.as("dcg"),
      F.when(F.col("n_rel") > 0, F.round(dcg / idcg, 4)).otherwise(0.0).as("ndcg"))
  }

  /** Clipped n-gram match counts for n = 1..maxN: for each n, the sum
    * over distinct candidate grams of min(count in candidate, count in
    * reference) — the BLEU modified-precision numerator. One bounded
    * per-pair JVM pass; grams key on U+0001-joined tokens (whitespace
    * tokens cannot contain it). */
  private[pipeline] def clippedMatches(
      cand: Array[String], ref: Array[String], maxN: Int): Array[Long] = {
    val out = new Array[Long](maxN)
    var n = 1
    while (n <= maxN) {
      if (cand.length >= n && ref.length >= n) {
        val counts = new java.util.HashMap[String, Long]()
        var i = 0
        while (i + n <= ref.length) {
          val g = ref.slice(i, i + n).mkString("")
          counts.merge(g, 1L, (a, b) => a + b)
          i += 1
        }
        var m = 0L
        var j = 0
        while (j + n <= cand.length) {
          val g = cand.slice(j, j + n).mkString("")
          val c = counts.getOrDefault(g, 0L)
          if (c > 0L) { m += 1L; counts.put(g, c - 1L) }
          j += 1
        }
        out(n - 1) = m
      }
      n += 1
    }
    out
  }

  /**
   * Per-pair text-overlap metrics — BLEU-`maxN` and ROUGE-1/2 — for
   * generated-data evaluation (distillation outputs vs references,
   * paraphrase mining, decontamination audits):
   *
   *  - `m1..m{maxN}`: clipped n-gram matches (exact BIGINTs);
   *    candidate totals are `max(0, cand_tokens - n + 1)`.
   *  - `bleu`: brevity penalty x geometric mean of the maxN modified
   *    precisions — the unsmoothed sentence form; 0.0 when any
   *    precision is 0, NULL when the candidate is empty.
   *  - `rouge1/rouge2` precision/recall/F1: single integer divisions
   *    (bit-exact cross-engine; only `bleu`, which runs through
   *    exp/ln, needs the repo's 4-decimal rounding before hashing).
   *
   * Scale shape: ONE map-only pass — both texts of a pair live on the
   * same row, so all counting is a bounded per-row JVM kernel; no
   * corpus-wide gram shuffle exists to pay. Rows with a NULL on
   * either side are dropped.
   */
  def textOverlap(
      df: DataFrame,
      idCol: String,
      candCol: String,
      refCol: String,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 2 && maxN <= 8, s"maxN must be in [2, 8], got $maxN")
    val sep = java.util.regex.Pattern.compile("\\s+")
    val kernelU = F.udf((cand: String, ref: String) => {
      val c = sep.split(cand).filter(_.nonEmpty)
      val r = sep.split(ref).filter(_.nonEmpty)
      (c.length.toLong, r.length.toLong, clippedMatches(c, r, maxN))
    })
    val base = df
      .filter(F.col(candCol).isNotNull && F.col(refCol).isNotNull)
      .select(F.col(idCol), kernelU(F.col(candCol), F.col(refCol)).as("__o"))
      .select(F.col(idCol),
        F.col("__o._1").as("cand_tokens"),
        F.col("__o._2").as("ref_tokens"),
        F.col("__o._3").as("__m"))
    val cl = F.col("cand_tokens")
    val rl = F.col("ref_tokens")
    def m(n: Int) = F.col("__m").getItem(n - 1)
    def t(n: Int) = F.greatest(cl - (n - 1), F.lit(0L))
    def rt(n: Int) = F.greatest(rl - (n - 1), F.lit(0L))
    // sum of ln(p_n)/maxN; any zero precision (or empty total) => bleu 0
    val anyZero = (1 to maxN)
      .map(n => m(n) === 0L || t(n) === 0L)
      .reduce(_ || _)
    val logSum = (1 to maxN)
      .map(n => F.log(m(n).cast("double") / t(n).cast("double")))
      .reduce(_ + _) / maxN.toDouble
    val bp = F.least(F.lit(1.0), F.exp(F.lit(1.0) - rl.cast("double") / cl.cast("double")))
    def pr(n: Int) = Seq(
      F.when(t(n) > 0L, m(n).cast("double") / t(n).cast("double"))
        .otherwise(0.0).as(s"rouge${n}_p"),
      F.when(rt(n) > 0L, m(n).cast("double") / rt(n).cast("double"))
        .otherwise(0.0).as(s"rouge${n}_r"))
    val withPr = base.select(
      (Seq(F.col(idCol), cl, rl) ++
        (1 to maxN).map(n => m(n).as(s"m$n")) :+
        F.when(cl === 0L, F.lit(null).cast("double"))
          .when(anyZero, 0.0)
          .otherwise(bp * F.exp(logSum)).as("bleu")) ++
        pr(1) ++ pr(2): _*)
    def f1(p: Column, r: Column) =
      F.when(p + r > 0.0, F.lit(2.0) * p * r / (p + r)).otherwise(0.0)
    withPr
      .withColumn("rouge1_f1", f1(F.col("rouge1_p"), F.col("rouge1_r")))
      .withColumn("rouge2_f1", f1(F.col("rouge2_p"), F.col("rouge2_r")))
  }

  /**
   * Pearson and Spearman correlation between two numeric columns,
   * optionally per group — the signal-agreement audit (does the
   * quality classifier track LM perplexity? does compression ratio
   * track repetition?). Spearman = Pearson over tie-averaged ranks
   * (rank + (ties-1)/2, the fractional-rank convention), so heavy
   * ties are handled exactly rather than by the 6Σd² shortcut (which
   * assumes none). Returns (groups..., n, pearson, spearman); NaN
   * (zero variance) normalizes to NULL per the repo's NULL
   * discipline. Correlations run through incremental float
   * co-moments — round to 4 decimals before any cross-engine
   * comparison (the repo's exp/ln rule).
   *
   * Scale shape: one hash exchange on the group key; both rank
   * windows and the final aggregate reuse its partitioning (two
   * in-partition sorts, no further shuffle).
   */
  def rankCorrelation(
      df: DataFrame,
      xCol: String,
      yCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val groups = groupCols.map(F.col)
    val x = F.col(xCol).cast("double")
    val y = F.col(yCol).cast("double")
    def w(order: Column) = {
      val base = org.apache.spark.sql.expressions.Window.partitionBy(groups: _*)
      base.orderBy(order.asc)
    }
    def ties(value: Column) = org.apache.spark.sql.expressions.Window
      .partitionBy((groups :+ value): _*)
    def avgRank(value: Column) =
      F.rank().over(w(value)).cast("double") +
        (F.count(F.lit(1)).over(ties(value)).cast("double") - 1.0) / 2.0
    val ranked = df
      .filter(x.isNotNull && y.isNotNull && !F.isnan(x) && !F.isnan(y))
      .select((groups :+ x.as("__x") :+ y.as("__y")): _*)
      .withColumn("__rx", avgRank(F.col("__x")))
      .withColumn("__ry", avgRank(F.col("__y")))
    // sum-form Pearson with an explicit zero-variance guard: Spark's
    // corr aggregate raises DIVIDE_BY_ZERO under ANSI on a constant
    // column, and the guard doubles as the NaN->NULL normalization.
    // The same sum formula replays verbatim in an oracle.
    def sums(a: String, tag: String) = Seq(
      F.sum(F.col(a)).as(s"__s$tag"),
      F.sum(F.col(a) * F.col(a)).as(s"__ss$tag"))
    val agg = ranked
      .groupBy(groups: _*)
      .agg(F.count(F.lit(1)).cast("double").as("__n"),
        (sums("__x", "x") ++ sums("__y", "y") ++ sums("__rx", "rx") ++
          sums("__ry", "ry") ++ Seq(
            F.sum(F.col("__x") * F.col("__y")).as("__sxy"),
            F.sum(F.col("__rx") * F.col("__ry")).as("__srxy"))): _*)
    def pearsonOf(sx: Column, sy: Column, ssx: Column, ssy: Column, sxy: Column) = {
      val n = F.col("__n")
      val dx = n * ssx - sx * sx
      val dy = n * ssy - sy * sy
      F.when(dx > 0.0 && dy > 0.0, (n * sxy - sx * sy) / F.sqrt(dx * dy))
    }
    agg.select((groups :+
      F.col("__n").cast("long").as("n") :+
      pearsonOf(F.col("__sx"), F.col("__sy"), F.col("__ssx"), F.col("__ssy"),
        F.col("__sxy")).as("pearson") :+
      pearsonOf(F.col("__srx"), F.col("__sry"), F.col("__ssrx"), F.col("__ssry"),
        F.col("__srxy")).as("spearman")): _*)
  }

  // ---------------------------------------------------------------- //
  // Online ranker comparison: team-draft interleaving                 //
  // ---------------------------------------------------------------- //

  /** Deterministic per-round coin for [[teamDraftInterleave]]: the
    * low bit of the first hex digit of md5("seed:round") — replayable
    * in any engine with md5 (the sampling-threshold convention applied
    * to coin flips). true → team A drafts first this round. */
  private[pipeline] def draftCoin(seed: String, round: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$round".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val firstHexDigit = (md(0) >> 4) & 0xf
    firstHexDigit % 2 == 0
  }

  /**
   * Team-draft interleaving (Radlinski, Kurup & Joachims 2008) — the
   * standard online A/B for two rankers: rankings A and B take turns
   * drafting their highest-ranked not-yet-selected document into one
   * interleaved list; a per-round deterministic coin ([[draftCoin]])
   * decides who drafts first, and each selection is credited to the
   * team that drafted it. Clicks on team-A documents then score ranker
   * A (the attribution the caller joins on `team`).
   *
   * Inputs are (rank, id) serving lists (bounded top-k — collected
   * driver-side, the [[Similarity.knnClassifyIndexed]] bounded-serving
   * argument); returns (pos, id, team) with pos 1-based and team
   * 'a' | 'b'. Deterministic given the seed — replayable in SQL when
   * the lists are disjoint (each round drafts A's and B's next
   * documents in coin order; with overlap the skip logic is stateful
   * and pinned by ScalaTest instead).
   */
  def teamDraftInterleave(
      a: DataFrame, b: DataFrame, k: Int, seed: String): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def collectRanked(df: DataFrame): Seq[Long] =
      df.select(F.col("rank").cast("int"), F.col("id").cast("long"))
        .collect().sortBy(_.getInt(0)).map(_.getLong(1)).toSeq
    val la = collectRanked(a)
    val lb = collectRanked(b)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
    val seen = scala.collection.mutable.HashSet.empty[Long]
    var ia = 0
    var ib = 0
    var round = 1
    def next(list: Seq[Long], i0: Int): Int = {
      var i = i0
      while (i < list.length && seen.contains(list(i))) i += 1
      i
    }
    def draft(team: Char): Unit = {
      if (out.size >= k) return
      if (team == 'a') {
        ia = next(la, ia)
        if (ia < la.length) { seen += la(ia); out += ((out.size + 1, la(ia), "a")) }
      } else {
        ib = next(lb, ib)
        if (ib < lb.length) { seen += lb(ib); out += ((out.size + 1, lb(ib), "b")) }
      }
    }
    while (out.size < k &&
           (next(la, ia) < la.length || next(lb, ib) < lb.length)) {
      if (draftCoin(seed, round)) { draft('a'); draft('b') }
      else { draft('b'); draft('a') }
      round += 1
    }
    out.toSeq.toDF("pos", "id", "team")
  }

  // ---------------------------------------------------------------- //
  // Paired randomization test                                         //
  // ---------------------------------------------------------------- //

  /**
   * Paired two-sided randomization (permutation) test for comparing
   * two systems over a shared query set — the standard significance
   * test of IR evaluation (Smucker, Allan & Carterette 2007): under
   * the null the per-query sign of each difference is exchangeable,
   * so the observed total difference is compared against `reps`
   * random sign assignments:
   *
   *   p = (#{r : |s_r| >= |observed|} + 1) / (reps + 1)
   *
   * with s_r = Σ_q ±(a_q - b_q), the add-one form that can never
   * report p = 0.
   *
   * Signs are DETERMINISTIC md5 coins — the low bit of the first hex
   * digit of md5("seed:rep:query_id") (the [[draftCoin]] convention,
   * replayable in any engine with md5). Exactness: when the per-query
   * metrics are integer-valued (hit counts, relevant-found counts —
   * the recommended form; divide by k only at reporting time), every
   * signed sum is exact integer arithmetic in doubles and the whole
   * test replays bit-for-bit cross-engine. Fractional metrics
   * (nDCG, MRR) make the sums float-order-sensitive — round before
   * comparing in any cross-engine check.
   *
   * Input: one row per query (`query_id`, `metricA`, `metricB`).
   * Returns one row (n_queries, obs_diff, reps, n_ge, p_value).
   *
   * Scale shape: one Q x reps expansion grouped by rep — eval-bounded
   * (queries in the thousands, reps ~1000); a single shuffle on rep,
   * then a 1-row aggregate.
   */
  def pairedRandomizationTest(
      perQuery: DataFrame,
      queryIdCol: String,
      metricACol: String,
      metricBCol: String,
      reps: Int,
      seed: String): DataFrame = {
    require(reps > 0, s"reps must be positive, got $reps")
    val spark = perQuery.sparkSession
    val base = perQuery.select(
      F.col(queryIdCol).cast("string").as("__qid"),
      (F.col(metricACol).cast("double") -
        F.col(metricBCol).cast("double")).as("__d"))
    val obsRow = base.agg(F.count(F.lit(1)).as("n_queries"),
      F.sum(F.col("__d")).as("obs_diff"))
    val repsDf = spark.range(1, reps + 1L).select(F.col("id").as("__rep"))
    val coin = F.substring(
      F.md5(F.concat_ws(":", F.lit(seed), F.col("__rep"), F.col("__qid"))),
      1, 1).isin("0", "2", "4", "6", "8", "a", "c", "e")
    val sums = base.crossJoin(repsDf)
      .withColumn("__sd", F.when(coin, F.col("__d")).otherwise(-F.col("__d")))
      .groupBy("__rep")
      .agg(F.sum(F.col("__sd")).as("__s"))
    sums.crossJoin(F.broadcast(obsRow))
      .agg(F.first(F.col("n_queries")).as("n_queries"),
        F.first(F.col("obs_diff")).as("obs_diff"),
        F.count(F.lit(1)).cast("long").as("reps"),
        F.sum(F.when(F.abs(F.col("__s")) >= F.abs(F.col("obs_diff")), 1L)
          .otherwise(0L)).as("n_ge"))
      .withColumn("p_value",
        (F.col("n_ge") + F.lit(1.0)) / (F.col("reps") + F.lit(1.0)))
  }

  /**
   * Paired bootstrap confidence interval for the mean per-query
   * difference of two systems: `reps` resamples of the query set WITH
   * replacement, each drawing `n` queries by a deterministic md5 draw
   * (slot r:i -> query index `hex32(md5) mod n` — the manifest-token
   * hex convention, replayable in any engine with md5), and the
   * percentile interval at `alpha` picked as ORDER STATISTICS of the
   * resampled sums (values, not indexes — duplicate sums cannot
   * diverge across engines).
   *
   * With integer-valued metrics every resampled sum is exact and
   * `obs_mean`/`ci_lo`/`ci_hi` are single exact-over-exact divisions —
   * the whole interval replays bit-for-bit cross-engine (the
   * [[pairedRandomizationTest]] exactness rule).
   *
   * Returns one row (n_queries, obs_mean, reps, ci_lo, ci_hi).
   */
  def pairedBootstrapCI(
      perQuery: DataFrame,
      queryIdCol: String,
      metricACol: String,
      metricBCol: String,
      reps: Int,
      seed: String,
      alpha: Double = 0.05): DataFrame = {
    require(reps > 0, s"reps must be positive, got $reps")
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    val spark = perQuery.sparkSession
    val base = perQuery.select(
        F.col(queryIdCol).cast("string").as("__qid"),
        (F.col(metricACol).cast("double") -
          F.col(metricBCol).cast("double")).as("__d"))
      .withColumn("__i",
        F.row_number().over(Window.orderBy(F.col("__qid"))) - 1)
      .localCheckpoint(eager = false)
    val n = base.count()
    require(n > 0, "pairedBootstrapCI: empty query set")
    val obsRow = base.agg(F.count(F.lit(1)).as("n_queries"),
      F.sum(F.col("__d")).as("__obs"))
    val grid = spark.range(1, reps + 1L).select(F.col("id").as("__rep"))
      .crossJoin(spark.range(0, n).select(F.col("id").as("__slot")))
    val draw = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(seed), F.col("__rep"), F.col("__slot"))),
        1, 8), 16, 10).cast("long") % n
    val sums = grid.withColumn("__i", draw)
      .join(F.broadcast(base.select("__i", "__d")), "__i")
      .groupBy("__rep").agg(F.sum(F.col("__d")).as("__s"))
    val rn = F.row_number().over(Window.orderBy(F.col("__s").asc))
    val ranked = sums.withColumn("__rn", rn)
    val loPos = math.max(1L, math.ceil(alpha / 2 * reps).toLong)
    val hiPos = math.min(reps.toLong, math.ceil((1 - alpha / 2) * reps).toLong)
    val lo = ranked.filter(F.col("__rn") === loPos)
      .select(F.col("__s").as("__lo"))
    val hi = ranked.filter(F.col("__rn") === hiPos)
      .select(F.col("__s").as("__hi"))
    obsRow.crossJoin(F.broadcast(lo)).crossJoin(F.broadcast(hi))
      .select(F.col("n_queries"),
        (F.col("__obs") / F.col("n_queries")).as("obs_mean"),
        F.lit(reps.toLong).as("reps"),
        (F.col("__lo") / F.col("n_queries")).as("ci_lo"),
        (F.col("__hi") / F.col("n_queries")).as("ci_hi"))
  }

  /**
   * Rank-list diff — the regression report for a serving change (new
   * analyzer, pruned index, formula variant): full-outer join of two
   * (rank, id) lists, per-id (rank_a, rank_b, delta) with 0 standing
   * for "absent from this list" (coalesced — NULL semantics diverge
   * across engines and an absent rank is not a rank). All-integer
   * given the two pinned rankings.
   *
   * `delta = rank_a - rank_b` when present in both, else 0 (a
   * movement is only defined for docs both lists ranked).
   */
  def rankListDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val ra = a.select(F.col("id"), F.col("rank").cast("long").as("rank_a"))
    val rb = b.select(F.col("id"), F.col("rank").cast("long").as("rank_b"))
    ra.join(rb, Seq("id"), "full_outer")
      .select(F.col("id"),
        F.coalesce(F.col("rank_a"), F.lit(0L)).as("rank_a"),
        F.coalesce(F.col("rank_b"), F.lit(0L)).as("rank_b"))
      .withColumn("delta",
        F.when(F.col("rank_a") > 0 && F.col("rank_b") > 0,
          F.col("rank_a") - F.col("rank_b")).otherwise(F.lit(0L)))
  }
}
