package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Interpolated Kneser-Ney bigram language model for corpus quality
 * scoring — the classic KenLM-style perplexity-filter signal
 * (Heafield 2011; Chen & Goodman 1999 eq. 4.25) used by CCNet-like
 * pipelines to rank web documents against a reference corpus.
 *
 *   P(r | l) = max(c(l,r) - D, 0) / c(l·)  +  D · N1+(l·)/c(l·) · Pcont(r)
 *   Pcont(r) = N1+(·r) / N1+(··)
 *   D        = n1 / (n1 + 2·n2)   (counts-of-counts estimate)
 *
 * Scale shape — everything is DataFrame joins and aggregates; the
 * driver never holds a vocabulary:
 *   - one corpus scan explodes bigrams; counts and the two marginal
 *     tables are type-level (vocabulary-sized), lazily checkpointed;
 *   - the only driver action is the 1-row counts-of-counts aggregate
 *     that fixes the discount D;
 *   - scoring joins the corpus bigrams against the count tables
 *     (shuffle on word keys — AQE broadcasts them when small) and
 *     reduces per document. Contrast [[Vocab.bigramLogLoss]], which
 *     broadcasts pruned driver-side maps: that caps the vocabulary at
 *     driver memory, this does not.
 *
 * NULL discipline: null/short documents produce no bigrams and are
 * absent from the output (same contract as [[Vocab.bigramLogLoss]]).
 * Tokenization is the repo convention minus lowercasing, matching
 * [[Vocab.bigramLogLoss]]: split on `\s+`, empties dropped.
 */
object NgramLm {

  /** Fallback discount when counts-of-counts are degenerate (no
    * singleton bigrams): the textbook 0.75. */
  val DefaultDiscount = 0.75

  /**
   * A trained bigram KN model: the conditional count table and the two
   * marginals, plus the scalar discount and continuation-type total.
   * All three frames are type-level (vocabulary-sized, not
   * corpus-sized) and lazily checkpointed so reuse across scoring
   * calls does not recount the corpus.
   */
  final case class KnModel(
      bigramCounts: DataFrame, // (l, r, c)
      leftStats: DataFrame,    // (l, cl = c(l·), nl = N1+(l·))
      rightTypes: DataFrame,   // (r, nr = N1+(·r))
      discount: Double,
      totalTypes: Long)

  /** Exploded (id, l, r) bigram rows of a document table; pure Column
    * ops (adjacent-token zip), map-only. */
  private def bigramRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = F.filter(F.split(F.col(textCol), "\\s+"), t => F.length(t) > 0)
    docs
      .select(F.col(idCol).as("id"), w.as("__w"))
      .filter(F.size(F.col("__w")) >= 2)
      .select(F.col("id"), F.explode(F.zip_with(
        F.slice(F.col("__w"), F.lit(1), F.size(F.col("__w")) - 1),
        F.slice(F.col("__w"), F.lit(2), F.size(F.col("__w")) - 1),
        (a, b) => F.struct(a.as("l"), b.as("r")))).as("__bg"))
      .select(F.col("id"), F.col("__bg.l").as("l"), F.col("__bg.r").as("r"))
  }

  /**
   * Fit the KN tables on a training corpus. One corpus-wide bigram
   * count (the only corpus-scale shuffle), two vocabulary-level
   * rollups, and a 1-row counts-of-counts aggregate for D.
   */
  def learnKneserNey(train: DataFrame, textCol: String): KnModel = {
    // bigramRows needs an id column; synthesize a constant (dropped by
    // the groupBy immediately) so learn works on bare text frames.
    val counts = bigramRows(train.withColumn("__kn_id", F.lit(0L)), "__kn_id", textCol)
      .groupBy(F.col("l"), F.col("r"))
      .agg(F.count(F.lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val left = counts.groupBy(F.col("l"))
      .agg(F.sum(F.col("c")).as("cl"), F.count(F.lit(1)).as("nl"))
      .localCheckpoint(eager = false)
    val right = counts.groupBy(F.col("r"))
      .agg(F.count(F.lit(1)).as("nr"))
      .localCheckpoint(eager = false)
    val st = counts.agg(
      F.count(F.lit(1)).as("t"),
      F.sum(F.when(F.col("c") === 1L, 1L).otherwise(0L)).as("n1"),
      F.sum(F.when(F.col("c") === 2L, 1L).otherwise(0L)).as("n2")).head()
    val total = st.getLong(0)
    val d =
      if (total == 0L || st.getLong(1) == 0L) DefaultDiscount
      else st.getLong(1).toDouble / (st.getLong(1) + 2.0 * st.getLong(2))
    KnModel(counts, left, right, d, total)
  }

  /** The interpolated-KN probability Column given joined count columns
    * (nullable for out-of-model events). Unseen left context backs off
    * entirely to the continuation distribution; an unseen right word
    * gets the below-any-seen-type floor 0.5 / N1+(··). */
  private def knProb(m: KnModel): Column = {
    val t = F.lit(m.totalTypes.toDouble)
    val d = F.lit(m.discount)
    val pcont = F.coalesce(F.col("nr"), F.lit(0.5)) / t
    F.when(F.col("cl").isNull, pcont)
      .otherwise(
        F.greatest(F.coalesce(F.col("c"), F.lit(0L)).cast("double") - d, F.lit(0.0)) /
          F.col("cl") + d * F.col("nl") / F.col("cl") * pcont)
  }

  /**
   * Score documents against a trained model: (id, bigrams,
   * score = avg over bigrams of -ln P(r|l), rounded to 4 dp). Works on
   * held-out corpora — out-of-model words take the documented backoff
   * rather than erroring.
   */
  def scoreKneserNey(
      docs: DataFrame, idCol: String, textCol: String, m: KnModel): DataFrame = {
    val big = bigramRows(docs, idCol, textCol)
    val scored =
      if (m.totalTypes == 0L)
        // degenerate model (no training bigrams): uniform floor
        big.withColumn("__p", F.lit(0.5))
      else
        big
          .join(m.bigramCounts, Seq("l", "r"), "left")
          .join(m.leftStats, Seq("l"), "left")
          .join(m.rightTypes, Seq("r"), "left")
          .withColumn("__p", knProb(m))
    scored
      .groupBy(F.col("id"))
      .agg(F.count(F.lit(1)).as("bigrams"),
        F.round(F.avg(-F.log(F.col("__p"))), 4).as("score"))
      .select(F.col("id").as(idCol), F.col("bigrams"), F.col("score"))
  }

  /** Train-and-score on one corpus: the perplexity-filter shape. */
  def kneserNeyLogLoss(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreKneserNey(docs, idCol, textCol, learnKneserNey(docs, textCol))
}
