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

  // ---------------------------------------------------------------- //
  // Trigram interpolated Kneser-Ney                                   //
  // ---------------------------------------------------------------- //

  /**
   * The full trigram hierarchy (Chen & Goodman 1999 eq. 4.25-4.27):
   *
   *   P3(w|u,v) = max(c3(uvw) − D3, 0)/c2(uv) + D3·N1+(uv·)/c2(uv) · P2(w|v)
   *   P2(w|v)   = max(N1+(·vw) − D2, 0)/N1+(·v·)
   *               + D2·N1+(v·)/N1+(·v·) · Pcont(w)
   *   Pcont(w)  = N1+(·w)/N1+(··)        (bigram TYPE statistics)
   *
   * with c2(uv) = Σ_w c3(uvw) (the trigram-context total) and the
   * middle level built from CONTINUATION counts — the Kneser-Ney
   * insight that a lower-order distribution should model how many
   * contexts a word completes, not how often it occurs.
   *
   * Same scale shape as the bigram model: every table is n-gram-TYPE
   * level, scoring is joins, the driver holds two discounts and one
   * type total.
   */
  final case class Kn3Model(
      triCounts: DataFrame, // (u, v, w, c3)
      triCtx: DataFrame,    // (u, v, c2 = Σc3, n3l = N1+(uv·))
      contBi: DataFrame,    // (v, w, nvw = N1+(·vw))
      midCtx: DataFrame,    // (v, nv = N1+(·v·), nvr = N1+(v·))
      uniCont: DataFrame,   // (w, nw = N1+(·w))
      d3: Double,
      d2: Double,
      totalBigramTypes: Long)

  /** (id, u, v, w) trigram rows; adjacent-token triple zip, map-only. */
  private def trigramRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = F.filter(F.split(F.col(textCol), "\\s+"), t => F.length(t) > 0)
    docs
      .select(F.col(idCol).as("id"), w.as("__w"))
      .filter(F.size(F.col("__w")) >= 3)
      .select(F.col("id"), F.explode(F.transform(
        F.sequence(F.lit(1), F.size(F.col("__w")) - 2),
        i => F.struct(
          F.element_at(F.col("__w"), i).as("u"),
          F.element_at(F.col("__w"), i + 1).as("v"),
          F.element_at(F.col("__w"), i + 2).as("w")))).as("__t"))
      .select(F.col("id"), F.col("__t.u").as("u"), F.col("__t.v").as("v"),
        F.col("__t.w").as("w"))
  }

  private def cofcDiscount(counts: DataFrame, col: String): Double = {
    val st = counts.agg(
      F.sum(F.when(F.col(col) === 1L, 1L).otherwise(0L)).as("n1"),
      F.sum(F.when(F.col(col) === 2L, 1L).otherwise(0L)).as("n2")).head()
    if (st.isNullAt(0) || st.getLong(0) == 0L) DefaultDiscount
    else st.getLong(0).toDouble / (st.getLong(0) + 2.0 * st.getLong(1))
  }

  /** Fit the trigram KN tables: one trigram count (the corpus-scale
    * shuffle) and type-level rollups. The unigram continuation level
    * needs the corpus's distinct BIGRAM set — derived from the trigram
    * TYPE table instead of a second corpus tokenize: per document with
    * >= 3 tokens, every adjacent bigram is the (u,v) of some trigram
    * or the (v,w) of the last one, so the corpus bigram set is
    * proj_uv(tri) ∪ proj_vw(tri) ∪ {the single bigram of each
    * exactly-2-token doc}. The projections run over the (far smaller)
    * type table; the 2-token residue is a map-only scan that emits
    * almost nothing — the old form exploded and distinct-shuffled
    * every bigram OCCURRENCE in the corpus. */
  def learnKneserNey3(train: DataFrame, textCol: String): Kn3Model = {
    val tri = trigramRows(train.withColumn("__kn_id", F.lit(0L)), "__kn_id", textCol)
      .groupBy(F.col("u"), F.col("v"), F.col("w"))
      .agg(F.count(F.lit(1)).as("c3"))
      .localCheckpoint(eager = false)
    val ctx = tri.groupBy(F.col("u"), F.col("v"))
      .agg(F.sum(F.col("c3")).as("c2"), F.count(F.lit(1)).as("n3l"))
      .localCheckpoint(eager = false)
    val contBi = tri.groupBy(F.col("v"), F.col("w"))
      .agg(F.count(F.lit(1)).as("nvw"))
      .localCheckpoint(eager = false)
    val mid = contBi.groupBy(F.col("v"))
      .agg(F.sum(F.col("nvw")).as("nv"), F.count(F.lit(1)).as("nvr"))
      .localCheckpoint(eager = false)
    // unigram continuation from BIGRAM types of the same corpus:
    // trigram-type projections plus the 2-token-doc residue
    val toks2 = F.filter(F.split(F.col(textCol), "\\s+"), t => F.length(t) > 0)
    val shortBi = train
      .select(toks2.as("__w"))
      .filter(F.size(F.col("__w")) === 2)
      .select(F.element_at(F.col("__w"), 1).as("l"),
        F.element_at(F.col("__w"), 2).as("r"))
    val biTypes = tri.select(F.col("u").as("l"), F.col("v").as("r"))
      .unionByName(tri.select(F.col("v").as("l"), F.col("w").as("r")))
      .unionByName(shortBi)
      .distinct()
      .localCheckpoint(eager = false)
    val uni = biTypes.groupBy(F.col("r").as("w"))
      .agg(F.count(F.lit(1)).as("nw"))
      .localCheckpoint(eager = false)
    val total = Option(biTypes.agg(F.count(F.lit(1))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    Kn3Model(tri, ctx, contBi, mid, uni,
      d3 = cofcDiscount(tri, "c3"), d2 = cofcDiscount(contBi, "nvw"),
      totalBigramTypes = total)
  }

  /** Interpolated trigram probability Column over the joined stats
    * (all nullable). Backoff: unseen (u,v) context → P2; unseen middle
    * v → Pcont; unseen w → 0.5/N1+(··). */
  private def knProb3(m: Kn3Model): Column = {
    val t = F.lit(m.totalBigramTypes.toDouble)
    val d3 = F.lit(m.d3)
    val d2 = F.lit(m.d2)
    val pw = F.coalesce(F.col("nw"), F.lit(0.5)) / t
    val p2 = F.when(F.col("nv").isNull, pw)
      .otherwise(
        F.greatest(F.coalesce(F.col("nvw"), F.lit(0L)).cast("double") - d2, F.lit(0.0)) /
          F.col("nv") + d2 * F.col("nvr") / F.col("nv") * pw)
    F.when(F.col("c2").isNull, p2)
      .otherwise(
        F.greatest(F.coalesce(F.col("c3"), F.lit(0L)).cast("double") - d3, F.lit(0.0)) /
          F.col("c2") + d3 * F.col("n3l") / F.col("c2") * p2)
  }

  /** Score documents with a trigram model: (id, trigrams, score =
    * avg −ln P3, 4 dp). Docs with < 3 tokens are absent. */
  def scoreKneserNey3(
      docs: DataFrame, idCol: String, textCol: String, m: Kn3Model): DataFrame = {
    val tri = trigramRows(docs, idCol, textCol)
    val scored =
      if (m.totalBigramTypes == 0L) tri.withColumn("__p", F.lit(0.5))
      else tri
        .join(m.triCounts, Seq("u", "v", "w"), "left")
        .join(m.triCtx, Seq("u", "v"), "left")
        .join(m.contBi, Seq("v", "w"), "left")
        .join(m.midCtx, Seq("v"), "left")
        .join(m.uniCont, Seq("w"), "left")
        .withColumn("__p", knProb3(m))
    scored
      .groupBy(F.col("id"))
      .agg(F.count(F.lit(1)).as("trigrams"),
        F.round(F.avg(-F.log(F.col("__p"))), 4).as("score"))
      .select(F.col("id").as(idCol), F.col("trigrams"), F.col("score"))
  }

  /** Train-and-score on one corpus at trigram order. */
  def kneserNey3LogLoss(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreKneserNey3(docs, idCol, textCol, learnKneserNey3(docs, textCol))
}
