package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/**
 * Diversity-maximizing subset selection (greedy k-center /
 * farthest-point traversal) over an embedding column — the data-
 * curation move that picks k maximally-spread exemplars instead of k
 * random rows (dataset pruning, eval-set seeding, prototype mining).
 *
 * Scale shape: k passes over the corpus, each pass ONE narrow
 * aggregation — the running min-distance column updates against the
 * single newest center (broadcast as a literal), and the argmax row is
 * the only row collected per round (k rows total on the driver, like
 * IVF's nlist centroid collect). Lineage is cut each round with a lazy
 * localCheckpoint so round r doesn't replay rounds 1..r-1.
 *
 * Deterministic: seeded at the smallest id; argmax ties break on
 * smallest id.
 */
object Diversity {

  /**
   * Select k ids by farthest-point traversal under cosine distance.
   * Returns (id, pick_order LONG, dist_at_pick DOUBLE): pick_order 0
   * is the seed (dist_at_pick NULL), pick_order r is the row farthest
   * (max cosine distance to its nearest already-picked center) at
   * round r. Rows with NULL/zero-norm vectors are never picked.
   */
  def farthestPointSample(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._

    val base = df
      .select(F.col(idCol).cast("long").as("id"), F.col(vecCol).as("v"))
      .filter(F.col("v").isNotNull)
      .filter(F.aggregate(F.col("v"), F.lit(0.0d),
        (acc, x) => acc + x * x) > 0.0)
      .localCheckpoint(eager = false)

    val seedRow = base.orderBy(F.col("id")).limit(1)
      .select(F.col("id"), F.col("v")).head()
    var picked = List((seedRow.getLong(0), 0L, Option.empty[Double]))
    var centerVec = seedRow.getSeq[Float](1).toArray

    // running nearest-picked-center distance, updated one center per round
    var state = base.withColumn("mind", F.lit(Double.MaxValue))
    for (round <- 1 until k) {
      val c = F.typedLit(centerVec)
      state = state
        .withColumn("mind", F.least(F.col("mind"),
          F.lit(1.0) - Similarity.cosine(F.col("v"), c)))
        .localCheckpoint(eager = false)
      val next = state
        .filter(!F.col("id").isInCollection(picked.map(_._1)))
        .orderBy(F.col("mind").desc, F.col("id")).limit(1)
        .select(F.col("id"), F.col("mind"), F.col("v")).head()
      picked = (next.getLong(0), round.toLong, Some(next.getDouble(1))) :: picked
      centerVec = next.getSeq[Float](2).toArray
    }
    picked.reverse
      .toDF("id", "pick_order", "dist_at_pick")
      .withColumnRenamed("id", idCol)
  }

  /**
   * Prototypicality scoring (SSL-prototypes, Sorscher et al. 2022
   * "Beyond neural scaling laws"; the ranking D4 composes after
   * SemDeDup): k-means the embedding space and score every row by
   * cosine similarity to its assigned cell centroid. High score =
   * prototypical/redundant mass the corpus over-samples; low score =
   * the hard, informative tail. Returns (idCol, cell INT,
   * proto_score DOUBLE); rows with NULL vectors are omitted (they
   * cannot be scored).
   *
   * Scale shape: centroid training and assignment reuse the IVF
   * machinery ([[Similarity.buildIvfIndex]] — bounded nlist×dim
   * driver state, broadcast centroids, map-only assignment); scoring
   * is one more map-only pass. Nothing all-pairs, nothing collected.
   */
  def prototypicalityScores(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int = 16,
      iterations: Int = 2): DataFrame = {
    require(nClusters >= 1, s"nClusters must be >= 1, got $nClusters")
    val idx = Similarity.buildIvfIndex(
      df.filter(F.col(vecCol).isNotNull), idCol, vecCol, nClusters, iterations)
    val cB = df.sparkSession.sparkContext.broadcast(idx.centroids)
    val csimU = F.udf((v: Array[Float], cell: Int) => {
      val c = cB.value(cell)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < v.length && i < c.length) {
        dot += v(i).toDouble * c(i); na += v(i).toDouble * v(i)
        nb += c(i).toDouble * c(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    })
    idx.assigned.select(
      F.col("neighbor_id").as(idCol),
      F.col("__cell").as("cell"),
      csimU(F.col("__cv"), F.col("__cell")).as("proto_score"))
  }

  /**
   * Prototypicality pruning: keep the LEAST prototypical
   * `ceil(keepFraction * n)` rows of every k-means cell (rank by
   * (proto_score ASC, id ASC) — a deterministic total order, so exact
   * re-runs keep identical sets). Per-cell pruning is the
   * cluster-balanced form: the kept set preserves the corpus's
   * cluster proportions instead of gutting dense clusters first.
   * `ceil` keeps singleton cells alive (their lone member scores
   * ~1.0 against its own centroid). Rows with NULL vectors pass
   * through unpruned — they were never judged.
   *
   * Scale: one window per cell (HashPartitioning(cell), parallel
   * across cells) + one semi-join back on the id. A GLOBAL
   * prototypicality rank (the non-balanced published variant) should
   * ride [[RangeCumsum]]'s two-phase global order instead of a
   * single-partition window.
   */
  def prunePrototypical(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      keepFraction: Double,
      nClusters: Int = 16,
      iterations: Int = 2): DataFrame = {
    require(keepFraction >= 0.0 && keepFraction <= 1.0,
      s"keepFraction must be in [0, 1], got $keepFraction")
    val scored = prototypicalityScores(df, idCol, vecCol, nClusters, iterations)
    val keepIds = keepLeastPrototypical(scored, idCol, keepFraction)
    df.filter(F.col(vecCol).isNull)
      .unionByName(df.filter(F.col(vecCol).isNotNull)
        .join(keepIds, Seq(idCol), "left_semi"))
  }

  /**
   * The per-cell keep rule over a precomputed [[prototypicalityScores]]
   * frame — exposed separately because k-means means are parallel
   * float sums (NOT bit-stable across runs): a caller that needs the
   * scores AND the kept set must derive both from ONE scoring pass,
   * never score twice. Returns the kept ids (one column, `idCol`).
   */
  def keepLeastPrototypical(
      scores: DataFrame,
      idCol: String,
      keepFraction: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col("cell"))
      .orderBy(F.col("proto_score").asc, F.col(idCol).asc)
    scores
      .withColumn("__rn", F.row_number().over(w))
      .withColumn("__n", F.count(F.lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(F.col("cell"))))
      .filter(F.col("__rn") <= F.ceil(F.lit(keepFraction) * F.col("__n")))
      .select(idCol)
  }

  /**
   * GLOBAL prototypicality keep rule — the non-cluster-balanced
   * published variant (Sorscher et al.'s corpus-wide percentile):
   * rank ALL scored rows by (proto_score ASC, id ASC), keep the first
   * `ceil(keepFraction * N)`. A naive `Window.orderBy(score)` is a
   * single-partition funnel; this rides [[RangeCumsum]]'s two-phase
   * parallel cumulative count over tie-grouped scores:
   * cum(s) = #rows with score <= s, every score group with
   * cum <= K keeps all members, and THE one boundary group keeps its
   * lowest-id remainder through a window partitioned by that single
   * score value (bounded work: one tie group, almost always one row).
   * Same deterministic total order as the per-cell rule.
   */
  /** Staged outputs of [[d4Pipeline]] — all lazily checkpointed, so a
    * caller can count/inspect each stage without recomputing the
    * clustering. `scored` covers the SemDeDup SURVIVORS only. */
  final case class D4Result(
      dedupedIds: DataFrame, scored: DataFrame, keptIds: DataFrame)

  /**
   * The D4 composition (Tirumala et al. 2023) on ONE clustering:
   * SemDeDup then global prototypicality prune, both stages reading
   * the SAME k-means assignment + centroid-similarity pass — the
   * paper's own construction (it reuses the SemDeDup clustering for
   * the prototypicality ranking), and half the cost of composing
   * [[graft.pipeline.Dedup.semanticDeduplicate]] with
   * [[prototypicalityScores]], whose dominant cost is each building
   * its own index. Feed `keptIds` to
   * [[graft.pipeline.Sampling.temperatureRebalance]] for the mixture
   * stage. Rows with NULL vectors are omitted (they can't be judged).
   *
   * Scale shape: one IVF build (broadcast centroids, map-only
   * assignment), the in-cell SemDeDup verify, and the two-phase
   * RangeCumsum global rank — nothing all-pairs, nothing collected.
   */
  def d4Pipeline(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      keepFraction: Double,
      nClusters: Int = 16,
      dedupThreshold: Double = 0.97,
      iterations: Int = 2,
      maxCluster: Int = Dedup.DefaultMaxBucket): DataFrame = {
    d4Stages(df, idCol, vecCol, keepFraction, nClusters, dedupThreshold,
      iterations, maxCluster).keptIds
  }

  /** [[d4Pipeline]] with every stage exposed (audit/gate form). */
  def d4Stages(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      keepFraction: Double,
      nClusters: Int = 16,
      dedupThreshold: Double = 0.97,
      iterations: Int = 2,
      maxCluster: Int = Dedup.DefaultMaxBucket): D4Result = {
    require(nClusters >= 1, s"nClusters must be >= 1, got $nClusters")
    val idx = Similarity.buildIvfIndex(
      df.filter(F.col(vecCol).isNotNull), idCol, vecCol, nClusters, iterations)
    val scored = scoredSurvivors(
        idx.assigned, idx.centroids, idCol, dedupThreshold, maxCluster)
      .localCheckpoint(eager = false)
    val dedupedIds = scored.select(idCol).localCheckpoint(eager = false)
    val keptIds = keepLeastPrototypicalGlobal(scored, idCol, keepFraction)
      .localCheckpoint(eager = false)
    D4Result(dedupedIds, scored, keptIds)
  }

  /** The shared D4 core over a (neighbor_id, __cv, __cell) assignment
    * and its (frozen or just-trained) centroids: centroid-similarity
    * score every row, run the SemDeDup drop, and return the SURVIVOR
    * scores (idCol, cell, proto_score) — one pass feeding both stages
    * (scores are parallel float sums only at training time; given
    * fixed centroids the csim arithmetic is deterministic). */
  private def scoredSurvivors(
      assignedRows: DataFrame,
      centroids: Array[Array[Float]],
      idCol: String,
      dedupThreshold: Double,
      maxCluster: Int): DataFrame = {
    val cB = assignedRows.sparkSession.sparkContext.broadcast(centroids)
    val csimU = F.udf((v: Array[Float], cell: Int) => {
      val c = cB.value(cell)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < v.length && i < c.length) {
        dot += v(i).toDouble * c(i); na += v(i).toDouble * v(i)
        nb += c(i).toDouble * c(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    })
    val assigned = assignedRows
      .select(F.col("neighbor_id").as("__id"), F.col("__cv"), F.col("__cell"))
      .withColumn("__csim", csimU(F.col("__cv"), F.col("__cell")))
      .localCheckpoint(eager = false)
    val dropped = Dedup.semanticDroppedIds(assigned, dedupThreshold, maxCluster)
    assigned
      .join(dropped, Seq("__id"), "left_anti")
      .select(F.col("__id").as(idCol), F.col("__cell").as("cell"),
        F.col("__csim").as("proto_score"))
  }

  private def readScored(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      idCol: String): DataFrame =
    spark.read.parquet(s"$path/scored")
      .withColumn("cell", F.col("cell").cast("int"))
      .select(idCol, "cell", "proto_score")

  /**
   * Materialized D4 state — the one-off pass behind [[d4Incremental]]:
   * train + save the IVF index (frozen centroids, cell-partitioned
   * assignment) under `path/index`, run both D4 stages, persist the
   * survivor score table PARTITIONED BY cell under `path/scored`, and
   * return the kept ids. Nightly batches then ride [[d4Incremental]];
   * re-run materialize when drift telemetry says the embedding
   * distribution left the centroids behind (the
   * [[Similarity.appendToIvfIndex]] contract).
   */
  def d4Materialize(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      keepFraction: Double,
      nClusters: Int = 16,
      dedupThreshold: Double = 0.97,
      iterations: Int = 2,
      maxCluster: Int = Dedup.DefaultMaxBucket): DataFrame = {
    require(nClusters >= 1, s"nClusters must be >= 1, got $nClusters")
    val spark = df.sparkSession
    Similarity.buildIvfIndex(
        df.filter(F.col(vecCol).isNotNull), idCol, vecCol, nClusters, iterations)
      .save(s"$path/index")
    // derive from the RELOADED index so materialize and every later
    // increment read the identical parquet-round-tripped floats
    val idx = Similarity.loadIvfIndex(spark, s"$path/index")
    scoredSurvivors(idx.assigned, idx.centroids, idCol, dedupThreshold,
        maxCluster)
      .repartition(F.col("cell")) // one file per cell, not per task-slice
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/scored")
    keepLeastPrototypicalGlobal(readScored(spark, path, idCol), idCol,
      keepFraction)
  }

  /**
   * Incremental (nightly-delta) D4 over the state [[d4Materialize]]
   * persisted: assign the fresh batch to the FROZEN centroids and
   * append it to the index (the [[Similarity.appendToIvfIndex]]
   * pattern — no re-clustering, no history rewrite), then re-derive
   * SemDeDup keepers and survivor scores for the TOUCHED CELLS ONLY
   * (cells that received a batch vector — untouched cells' membership,
   * pairs, keepers and scores are provably unchanged) and dynamically
   * overwrite exactly those cell partitions of `path/scored`. The
   * global prune boundary re-derives over the merged score table
   * (an aggregation over score GROUPS — no re-scoring).
   *
   * EXACTLY equals [[d4RebuildFrozen]] over history ∪ batch
   * (IncrementalD4Spec + the q_d4_incremental gate pin it): frozen
   * centroids make assignment and csim deterministic, so only touched
   * cells can differ — and those are recomputed in full. Note a kept
   * HISTORY doc can be displaced by a new arrival (a lower-(csim, id)
   * cluster member or a shifted prune boundary) — this operator
   * maintains the corpus-curation VIEW; for immutable shipped
   * training splits use
   * [[graft.pipeline.Dedup.incrementalLeakFreeSplits]]'s
   * quarantine semantics instead.
   *
   * Single-maintainer, NOT idempotent on replay (the index append
   * lands twice); wrap in the caller's job-level exactly-once. At
   * 100 TB: nightly cost = the batch assignment + the pair join
   * inside touched cells (capped by maxCluster) + one aggregate over
   * the score table — history vectors outside touched cells are
   * never read.
   */
  def d4Incremental(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      keepFraction: Double,
      dedupThreshold: Double = 0.97,
      maxCluster: Int = Dedup.DefaultMaxBucket): DataFrame = {
    // the append assigns the batch exactly once and hands back the
    // touched cells — no second assignment pass
    val (idx, touched) = Similarity.appendToIvfIndexTouched(
      spark, s"$path/index", batch, idCol, vecCol)
    if (touched.nonEmpty) {
      val touchedAssigned =
        idx.assigned.filter(F.col("__cell").isInCollection(touched))
      // every nonempty cell keeps >= 1 survivor (SemDeDup keeps one
      // member per duplicate cluster; capped cells skip dedup), so the
      // dynamic overwrite below never leaves a stale partition behind
      scoredSurvivors(touchedAssigned, idx.centroids, idCol, dedupThreshold,
          maxCluster)
        .repartition(F.col("cell"))
        .write.partitionBy("cell")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$path/scored")
    }
    keepLeastPrototypicalGlobal(readScored(spark, path, idCol), idCol,
      keepFraction)
  }

  /** The frozen-assignment REBUILD reference: assign `corpus` to the
    * saved index's frozen centroids and run both D4 stages over every
    * cell from scratch — the semantics [[d4Incremental]] must equal
    * (and the spec proves it does). O(corpus) per call; use it to
    * re-derive the view after manual index surgery, not nightly. */
  def d4RebuildFrozen(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      keepFraction: Double,
      dedupThreshold: Double = 0.97,
      maxCluster: Int = Dedup.DefaultMaxBucket): D4Result = {
    val centroids = Similarity.loadIvfIndex(spark, indexPath).centroids
    val cB = spark.sparkContext.broadcast(centroids)
    val cellU = F.udf((v: Array[Float]) =>
      Similarity.nearestCentroid(cB.value, v))
    val assigned = corpus.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"),
        cellU(F.col(vecCol)).as("__cell"))
    val scored = scoredSurvivors(assigned, centroids, idCol, dedupThreshold,
        maxCluster)
      .localCheckpoint(eager = false)
    D4Result(scored.select(idCol),
      scored,
      keepLeastPrototypicalGlobal(scored, idCol, keepFraction))
  }

  def keepLeastPrototypicalGlobal(
      scores: DataFrame,
      idCol: String,
      keepFraction: Double,
      buckets: Int = 64): DataFrame = {
    require(keepFraction >= 0.0 && keepFraction <= 1.0,
      s"keepFraction must be in [0, 1], got $keepFraction")
    val n = scores.count()
    val k = math.ceil(keepFraction * n).toLong
    if (k <= 0L) return scores.select(idCol).limit(0)
    val per = scores.groupBy(F.col("proto_score"))
      .agg(F.count(F.lit(1)).as("__c"))
    val cum = RangeCumsum.inclusive(
      per, F.col("proto_score"), Seq((F.col("__c"), "__cum")), buckets)
    // boundary = smallest score whose inclusive cum reaches K; its
    // group keeps (K - rows-before-it) members in id order
    val b = cum.filter(F.col("__cum") >= k)
      .orderBy(F.col("proto_score")).limit(1)
      .select(F.col("proto_score"),
        (F.lit(k) - (F.col("__cum") - F.col("__c"))).as("__take"))
      .head()
    val bScore = b.getDouble(0)
    val take = b.getLong(1)
    val full = scores.filter(F.col("proto_score") < bScore).select(idCol)
    // the boundary tie group is almost always one row, but an
    // all-equal-scores corpus puts EVERYTHING here — rank it with the
    // same two-phase cumsum (ids are unique), never a one-value window
    val boundary = RangeCumsum.inclusive(
        scores.filter(F.col("proto_score") === bScore).select(F.col(idCol)),
        F.col(idCol), Seq((F.lit(1L), "__rk")), buckets)
      .filter(F.col("__rk") <= take)
      .select(idCol)
    full.union(boundary)
  }
}
