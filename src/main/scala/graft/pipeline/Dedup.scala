package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/**
 * Deduplication operators for large-scale training-data pipelines.
 *
 * Scale design: every path avoids all-pairs comparison of the corpus —
 * exact dedup shuffles on a 256-bit content hash (not the text), and
 * near-dup detection goes through candidate generation (MinHash-LSH
 * banding or SimHash chunk collision) whose shuffle keys are small
 * integers/hashes, followed by exact verification only on candidates.
 */
object Dedup {

  /** Default LSH bucket cap: a bucket of m ids yields m^2/2 candidate
    * pairs, so one viral boilerplate string (m ~ 10^6 at corpus scale)
    * would OOM a single task with ~5*10^11 pairs. 1024 caps any bucket
    * at ~520k pairs while staying far above legitimate near-dup cluster
    * sizes. 0 disables the cap. */
  val DefaultMaxBucket = 1024

  /** Drop rows whose bucket-size column exceeds `maxBucket`, counting
    * drops in a named accumulator (visible in the Spark UI) and logging
    * each executor-side — caps are never silent. No-op when
    * `maxBucket <= 0`. */
  private def capBuckets(
      df: DataFrame,
      sizeCol: org.apache.spark.sql.Column,
      maxBucket: Int,
      what: String): DataFrame = {
    if (maxBucket <= 0) df
    else {
      val acc = AccumulatorRetainer.retain(df.sparkSession.sparkContext
        .longAccumulator(s"graft.dedup.droppedBuckets.$what"))
      val keep = F.udf((n: Long) => {
        val ok = n <= maxBucket
        if (!ok) {
          acc.add(1L)
          org.slf4j.LoggerFactory.getLogger("graft.pipeline.Dedup")
            .warn(s"$what: dropping LSH bucket of $n ids (cap $maxBucket)")
        }
        ok
      })
      df.filter(keep(sizeCol))
    }
  }

  /**
   * Exact dedup: keep the lowest-id row per distinct content.
   * Groups on sha2(content) so the shuffle carries a 32-byte key, not
   * the document body.
   */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = df.withColumn("__h", F.sha2(F.col(textCol), 256))
    val keep = keyed.groupBy(F.col("__h")).agg(F.min(F.col(idCol)).as(idCol))
    keep.join(keyed, Seq("__h", idCol)).drop("__h")
  }

  /** Persistable content-hash index for [[incrementalExactDuplicates]]:
    * one (h) row per distinct sha2(content) — 32 bytes per document,
    * never the text. Plain parquet via DataFrameWriter. */
  def buildContentHashIndex(df: DataFrame, textCol: String): DataFrame =
    df.select(F.sha2(F.col(textCol), 256).as("h")).distinct()

  /**
   * Incremental EXACT dedup — the nightly-batch shape: a fresh batch
   * checked against a persisted [[buildContentHashIndex]] without
   * reshuffling or re-reading history text. Two stages, both sound:
   * a broadcast-bloom pre-filter over the index hashes (decoded once
   * driver-side — no false negatives, so nothing already-seen slips
   * through; ~fpp of the batch survives spuriously) and a semi-join
   * against the index that removes those false positives exactly.
   * Returns the fresh rows whose content was already seen (the
   * duplicates to drop). At 100 TB the index is scanned once into a
   * 1-row filter build and the verify join only shuffles the pruned
   * sliver of the batch.
   */
  def incrementalExactDuplicates(
      fresh: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      expectedItems: Long = graft.sketch.bloom.DefaultItems,
      fpp: Double = graft.sketch.bloom.DefaultFpp): DataFrame = {
    require(!fresh.columns.contains("__h"),
      "column name __h is reserved by incrementalExactDuplicates")
    val hashed = fresh.withColumn("__h", F.sha2(F.col(textCol), 256))
    val pruned = graft.sketch.SketchOps
      .bloomPrune(hashed, "__h", index, "h", expectedItems, fpp)
    pruned.join(index, pruned("__h") === index("h"), "left_semi").drop("__h")
  }

  /**
   * MinHash-LSH candidate pairs over a shingle-array column.
   * numHashes = bands * rowsPerBand. Returns distinct (id_a, id_b) with
   * id_a < id_b. maxBucket caps degenerate buckets (identical boilerplate
   * floods) — see [[DefaultMaxBucket]]; drops are counted in the
   * `graft.dedup.droppedBuckets.minhash` accumulator and logged, never
   * silent. Run [[dropExactDuplicates]] first so a flood of *identical*
   * documents is deduped before it can flood a bucket here.
   */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      shingleCol: String,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val numHashes = bands * rowsPerBand
    val buckets = df.select(
        F.col(idCol),
        F.explode(TextFunctions.minhashBandsUdf(numHashes, bands, rowsPerBand)(
          F.col(shingleCol))).as("__b"))
      .select(F.col(idCol), F.col("__b._1").as("__band"), F.col("__b._2").as("__bucket"))
    val grouped = buckets.groupBy(F.col("__band"), F.col("__bucket"))
      .agg(F.collect_list(F.col(idCol)).as("__ids"))
      .filter(F.size(F.col("__ids")) > 1)
    capBuckets(grouped, F.size(F.col("__ids")), maxBucket, "minhash")
      .select(F.explode(pairsUdf(F.col("__ids"))).as("__p"))
      .select(F.col("__p._1").as("id_a"), F.col("__p._2").as("id_b"))
      .distinct()
  }

  private val pairsUdf = F.udf((ids: Seq[Long]) => {
    val sorted = ids.sorted
    for {
      i <- sorted.indices
      j <- (i + 1) until sorted.length
    } yield (sorted(i), sorted(j))
  })

  /**
   * Duplicate-cluster formation: connected components over a near-dup
   * pair set, labeling every involved document with the smallest id in
   * its component. This is the transitively-correct form of dedup — a
   * direct-pair drop rule can keep B and C when A~B and B~C but A!~C
   * was never emitted as a pair; clustering cannot.
   *
   * Spark-first shape, a two-tier hybrid: min-label propagation first
   * (ONE join + ONE aggregation per round — the cheapest possible
   * round, and near-dup graphs are clique-shaped, diameter 1-2, so it
   * converges almost immediately), falling back to alternating
   * large-star/small-star contraction ([[duplicateClustersStar]])
   * ONLY when propagation fails to converge within `maxIterations` —
   * the long-chain case (A~B~C~... substring-overlap runs) where
   * diameter-bounded propagation would previously return silently
   * WRONG labels. The fallback re-solves from the raw pairs, so its
   * answer never depends on the abandoned propagation state.
   *
   * Input must have long columns `id_a`, `id_b`; output is
   * (id, cluster = component-minimum id) for every id that appears in
   * some pair.
   */
  def duplicateClusters(pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    val (labels, converged) = propagateClusters(pairs, maxIterations)
    if (converged) labels else duplicateClustersStar(pairs)
  }

  /**
   * Alternating large-star/small-star connected components (Kiveris
   * et al. 2014, "Connected Components in MapReduce and Beyond"):
   * each round re-hangs every edge on the minimum of its smaller
   * endpoint's neighborhood (large-star), then of its larger
   * endpoint's (small-star), collapsing components toward a star
   * rooted at their minimum id in O(log) rounds REGARDLESS of
   * diameter. Costlier per round than propagation (two
   * neighborhood aggregates + joins vs one), so [[duplicateClusters]]
   * reserves it for graphs propagation couldn't finish; call it
   * directly when the pair graph is KNOWN to be deep.
   */
  def duplicateClustersStar(pairs: DataFrame, maxIterations: Int = 35): DataFrame = {
    require(maxIterations >= 1, s"maxIterations must be >= 1, got $maxIterations")
    val u = F.col("__u"); val v = F.col("__v")
    // canonical undirected edge list (u < v), self-loops dropped
    var edges = pairs
      .select(F.col("id_a").cast("long").as("__a"), F.col("id_b").cast("long").as("__b"))
      .filter(F.col("__a") =!= F.col("__b"))
      .select(F.least(F.col("__a"), F.col("__b")).as("__u"),
              F.greatest(F.col("__a"), F.col("__b")).as("__v"))
      .distinct()
      .localCheckpoint(eager = false)
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(v.as("__u"), u.as("__v")))
    def minMap(e: DataFrame): DataFrame =
      sym(e).groupBy(u).agg(F.min(v).as("__mn"))
        .select(u, F.least(u, F.col("__mn")).as("__m"))
    // convergence = edge-set signature (count, xor of per-edge
    // xxhash64 — xor, not sum: ANSI long sums overflow) unchanged
    // across a round: ONE cheap aggregate per round instead of two
    // exceptAll anti-joins (which tripled b_dedup_semantic). A
    // colliding signature on a CHANGED set would exit early — the
    // same ~2^-64 risk class as the hash-keyed gram dedup this
    // codebase already accepts.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(F.count(F.lit(1)).as("c"),
        F.coalesce(F.expr("bit_xor(xxhash64(__u, __v))"), F.lit(0L)).as("h"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(edges)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      // large-star: every edge processed at its SMALLER endpoint u —
      // the larger endpoint re-hangs on m(u) = min(N(u) ∪ {u})
      val ls = sym(edges).filter(v > u)
        .join(minMap(edges), "__u")
        .select(F.col("__m").as("__u"), v) // m <= u < v: already canonical
        .filter(v > u).distinct()
      // small-star: every edge processed at its LARGER endpoint u —
      // smaller neighbors AND u itself re-hang on m(u)
      val symLs = sym(ls)
      val m2 = symLs.groupBy(u).agg(F.min(v).as("__mn"))
        .select(u, F.least(u, F.col("__mn")).as("__m"))
      val smaller = symLs.filter(v < u)
      val next = smaller.join(m2, "__u")
        .select(F.col("__m").as("__u"), v)            // (v, m(u)) with m <= v
        .union(smaller.select(u).distinct().join(m2, "__u")
          .select(F.col("__m").as("__u"), u.as("__v"))) // (u, m(u))
        .filter(v > u).distinct()
        .localCheckpoint(eager = false)
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      edges = next
      iter += 1
    }
    // at the fixpoint every component is a star rooted at its min id
    val star = sym(edges).groupBy(u).agg(F.min(v).as("__mn"))
      .select(u.as("id"), F.least(u, F.col("__mn")).as("cluster"))
    // nodes appearing only in self-pairs still label themselves
    val nodes = pairs.select(F.col("id_a").cast("long").as("id"))
      .union(pairs.select(F.col("id_b").cast("long").as("id"))).distinct()
    nodes.join(star, Seq("id"), "left")
      .select(F.col("id"), F.coalesce(F.col("cluster"), F.col("id")).as("cluster"))
  }

  /**
   * Min-label propagation connected components — the diameter-bounded
   * first tier of [[duplicateClusters]]. Labels are only correct when
   * the returned flag says it converged; the hybrid discards them
   * otherwise.
   */
  def duplicateClustersPropagate(pairs: DataFrame, maxIterations: Int = 20): DataFrame =
    propagateClusters(pairs, maxIterations)._1

  private def propagateClusters(
      pairs: DataFrame, maxIterations: Int): (DataFrame, Boolean) = {
    require(maxIterations >= 1, s"maxIterations must be >= 1, got $maxIterations")
    val edges = pairs.select(F.col("id_a").as("__src"), F.col("id_b").as("__dst"))
      .union(pairs.select(F.col("id_b").as("__src"), F.col("id_a").as("__dst")))
      .distinct()
      .localCheckpoint(eager = false)
    var labels = edges.select(F.col("__src").as("id")).distinct()
      .withColumn("cluster", F.col("id"))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      val neighborMin = edges
        .join(labels.select(F.col("id").as("__dst"), F.col("cluster").as("__nc")), "__dst")
        .groupBy(F.col("__src").as("id"))
        .agg(F.min(F.col("__nc")).as("__minN"))
      val next = labels.join(neighborMin, "id")
        .select(F.col("id"), F.col("cluster"),
          F.least(F.col("cluster"), F.col("__minN")).as("__new"))
        .localCheckpoint(eager = false)
      converged = next.filter(F.col("__new") =!= F.col("cluster")).isEmpty
      labels = next.select(F.col("id"), F.col("__new").as("cluster"))
      iter += 1
    }
    (labels, converged)
  }

  /**
   * Transitive near-dup dedup: cluster the verified pairs and keep only
   * each cluster's smallest id (documents in no pair survive untouched).
   */
  def dropNearDuplicatesClustered(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      threshold: Double = 0.8,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val pairs = nearDuplicatePairs(df, idCol, textCol, shingleSize, threshold,
      bands, rowsPerBand, maxBucket)
    val losers = duplicateClusters(pairs)
      .filter(F.col("id") =!= F.col("cluster"))
      .select(F.col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /**
   * Exact Jaccard verification of candidate pairs against the shingle
   * sets: returns (id_a, id_b, inter, uni) for pairs with
   * inter/uni >= threshold. intersect/union are exact set operations on
   * the distinct-shingle arrays. Pairs where both shingle sets are
   * empty (documents shorter than the shingle size) are NOT duplicates
   * — Jaccard of two empty sets is undefined, and treating it as 1
   * would mass-delete short documents.
   */
  def verifyJaccard(
      candidates: DataFrame,
      docs: DataFrame,
      idCol: String,
      shingleCol: String,
      threshold: Double): DataFrame = {
    val a = docs.select(F.col(idCol).as("id_a"), F.col(shingleCol).as("__sa"))
    val b = docs.select(F.col(idCol).as("id_b"), F.col(shingleCol).as("__sb"))
    candidates.join(a, "id_a").join(b, "id_b")
      .withColumn("inter", F.size(F.array_intersect(F.col("__sa"), F.col("__sb"))).cast("long"))
      .withColumn("uni", F.size(F.array_union(F.col("__sa"), F.col("__sb"))).cast("long"))
      .filter(F.col("uni") > 0 && F.col("inter") >= F.col("uni") * threshold)
      .select("id_a", "id_b", "inter", "uni")
  }

  /**
   * Full MinHash near-dup pipeline: fused text→signature LSH candidates,
   * then exact-Jaccard verification. Only candidate documents are
   * shingled for verification (semi-join first) — at corpus scale the
   * candidate set is orders of magnitude smaller than the corpus, so
   * the expensive shingle arrays never materialize for non-candidates.
   * Oversize buckets are capped at `maxBucket` ids (accumulator-counted
   * and logged, see [[DefaultMaxBucket]]); run [[dropExactDuplicates]]
   * first so identical-document floods never reach the LSH stage.
   */
  def nearDuplicatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      threshold: Double = 0.8,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val numHashes = bands * rowsPerBand
    // OPH signatures: one hash per shingle position (vs numHashes in the
    // KM construction) — 6x faster scans, verified recall-equivalent on
    // the exact-pair oracle at every scale factor
    val buckets = df.select(
        F.col(idCol),
        F.explode(TextFunctions.minhashTextOphBandsUdf(
          shingleSize, numHashes, bands, rowsPerBand)(F.col(textCol))).as("__b"))
      .select(F.col(idCol), F.col("__b._1").as("__band"), F.col("__b._2").as("__bucket"))
    // materialize the (small) candidate pair set once — localCheckpoint
    // blocks are released by the ContextCleaner when the DataFrame goes
    // out of scope, unlike cache(), and the three downstream references
    // (two id sides + the verify join) reuse it without recompute; lazy
    // so that building the plan without executing it runs no job
    val grouped = buckets.groupBy(F.col("__band"), F.col("__bucket"))
      .agg(F.collect_list(F.col(idCol)).as("__ids"))
      .filter(F.size(F.col("__ids")) > 1)
    val candidates = capBuckets(grouped, F.size(F.col("__ids")), maxBucket, "minhash")
      .select(F.explode(pairsUdf(F.col("__ids"))).as("__p"))
      .select(F.col("__p._1").as("id_a"), F.col("__p._2").as("id_b"))
      .distinct()
      .localCheckpoint(eager = false)
    // shingle each candidate DOCUMENT once (semi-join first): a
    // boilerplate cluster of m docs has ~m^2/2 pairs but only m texts
    val candidateIds = candidates.select(F.col("id_a").as(idCol))
      .union(candidates.select(F.col("id_b").as(idCol))).distinct()
    val shingled = df.join(candidateIds, idCol).select(
      F.col(idCol),
      TextFunctions.shinglesUdf(shingleSize)(F.col(textCol)).as("__sh"))
    verifyJaccard(candidates, shingled, idCol, "__sh", threshold)
  }

  /**
   * LSH signature index for INCREMENTAL dedup — the daily-ingest shape:
   * the historical corpus's band buckets are computed once and
   * persisted; each new batch checks against the index without ever
   * re-scanning (or re-shingling) history. Rows are (band INT, bucket
   * LONG, id LONG) — ~bands rows per document, no text. Oversize
   * buckets are capped here at build time (accumulator-counted and
   * logged, see [[DefaultMaxBucket]]) so a boilerplate flood in history
   * can never multiply against every future batch.
   */
  def buildSignatureIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val numHashes = bands * rowsPerBand
    val buckets = df.select(
        F.col(idCol).as("id"),
        F.explode(TextFunctions.minhashTextOphBandsUdf(
          shingleSize, numHashes, bands, rowsPerBand)(F.col(textCol))).as("__b"))
      .select(F.col("__b._1").as("band"), F.col("__b._2").as("bucket"), F.col("id"))
    val grouped = buckets.groupBy(F.col("band"), F.col("bucket"))
      .agg(F.collect_list(F.col("id")).as("__ids"))
    capBuckets(grouped, F.size(F.col("__ids")), maxBucket, "sigindex")
      .select(F.col("band"), F.col("bucket"), F.explode(F.col("__ids")).as("id"))
  }

  /** Persist a signature index (plain parquet; use mode append for
    * daily increments — geometry must match across appends). */
  def saveSignatureIndex(index: DataFrame, path: String, mode: String = "overwrite"): Unit =
    index.write.mode(mode).parquet(path)

  def loadSignatureIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /**
   * Takedown removal from any saved flat index whose rows carry an
   * `id` column (minhash [[buildSignatureIndex]], hamming
   * [[buildHashIndex]], edit-1 [[buildEditOneIndex]], edit-k
   * [[buildEditKIndex]], gram [[buildGramIndex]] — the whole
   * saveSignatureIndex family): anti-join the broadcast id set and
   * rewrite. These indexes are FLAT parquet (the probe side prunes by
   * join, not partitions), so removal is one rewrite of the index —
   * O(index), not O(corpus); at TB index sizes batch the takedowns
   * nightly. The rewrite lands in a sibling temp dir and promotes by
   * ATOMIC-ish rename (the [[graft.sources.Compaction]] swap): no
   * executor-storage materialization of the whole index, and a crash
   * between the write and the swap leaves the ORIGINAL index intact
   * (the orphaned temp dir is overwritten by the next removal).
   * Returns the pruned index frame (reloaded). Buckets the BUILD
   * capped stay absent (removal never resurrects flood-capped rows —
   * recall-conservative, like the append path).
   */
  def removeFromSavedIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      ids: DataFrame,
      idCol: String,
      indexIdCol: String = "id"): DataFrame =
    removeFromSavedIndexImpl(spark, path, ids, idCol, indexIdCol, () => ())

  /** [[removeFromSavedIndex]] with a crash-window hook (test seam):
    * `afterWrite` runs once the pruned temp dir is complete, before
    * the swap — the window a crash must leave the old index intact. */
  private[graft] def removeFromSavedIndexImpl(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      ids: DataFrame,
      idCol: String,
      indexIdCol: String,
      afterWrite: () => Unit): DataFrame =
      // the lock lives BESIDE the index dir (the promote swap replaces
      // the dir itself, which would destroy a lock held inside it)
      Maintenance.withSiblingLock(spark, path) {
    val del = ids.select(F.col(idCol).as(indexIdCol)).distinct()
    val tmp = path.stripSuffix("/") + "__takedown"
    loadSignatureIndex(spark, path)
      .join(F.broadcast(del), Seq(indexIdCol), "left_anti")
      .write.mode("overwrite").parquet(tmp)
    afterWrite()
    graft.sources.Compaction.promote(spark, tmp, path)
    loadSignatureIndex(spark, path)
  }

  /**
   * Incremental near-dup check: verified (id_new, id_old, inter, uni)
   * pairs between a new batch and the historical corpus behind a
   * persisted signature index.
   *
   * Scale shape: the new batch's band buckets BROADCAST onto the index
   * scan — the TB-scale history side is never shuffled, never
   * re-shingled; only candidate old documents (semi-join on candidate
   * ids) have their text re-read for the exact-Jaccard verify. Batch
   * geometry (shingleSize/bands/rowsPerBand) must match the index's.
   */
  def incrementalNearDuplicatePairs(
      newDocs: DataFrame,
      histIndex: DataFrame,
      histDocs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      threshold: Double = 0.8,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val newIndex = buildSignatureIndex(
      newDocs, idCol, textCol, shingleSize, bands, rowsPerBand, maxBucket)
      .withColumnRenamed("id", "__id_new")
    val candidates = histIndex
      .join(F.broadcast(newIndex), Seq("band", "bucket"))
      .select(F.col("__id_new").as("id_new"), F.col("id").as("id_old"))
      .distinct()
      .localCheckpoint(eager = false)
    val shingleNew = newDocs
      .join(candidates.select(F.col("id_new").as(idCol)).distinct(), idCol)
      .select(F.col(idCol).as("id_new"),
        TextFunctions.shinglesUdf(shingleSize)(F.col(textCol)).as("__sn"))
    val shingleOld = histDocs
      .join(candidates.select(F.col("id_old").as(idCol)).distinct(), idCol)
      .select(F.col(idCol).as("id_old"),
        TextFunctions.shinglesUdf(shingleSize)(F.col(textCol)).as("__so"))
    candidates.join(shingleNew, "id_new").join(shingleOld, "id_old")
      .withColumn("inter",
        F.size(F.array_intersect(F.col("__sn"), F.col("__so"))).cast("long"))
      .withColumn("uni",
        F.size(F.array_union(F.col("__sn"), F.col("__so"))).cast("long"))
      .filter(F.col("uni") > 0 && F.col("inter") >= F.col("uni") * threshold)
      .select("id_new", "id_old", "inter", "uni")
  }

  /**
   * Near-dup dedup: drop every document that has a verified near-dup
   * with a smaller id (direct-pair rule — purely distributed, no
   * transitive closure, so the survivor set is well-defined and cheap:
   * an anti-join against the pair list's id_b side; a chain a~b~c keeps
   * `a` and drops b and c just like min-of-cluster would whenever
   * near-dup clusters are cliques, which 0.8+ Jaccard clusters are in
   * practice).
   */
  def dropNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      threshold: Double = 0.8,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val pairs = nearDuplicatePairs(df, idCol, textCol, shingleSize, threshold,
      bands, rowsPerBand, maxBucket)
    val removed = pairs.select(F.col("id_b").as(idCol)).distinct()
    df.join(removed, Seq(idCol), "left_anti")
  }

  // ============== exact set-similarity join (prefix filter) ==============

  /** AllPairs/PPJoin prefix length at Jaccard threshold `t`:
    * |x| - ceil(t*|x|) + 1. The epsilon absorbs IEEE noise in t*|x|
    * (0.8*5 evaluates to 4.0000000000000002, which would ceil to 5 and
    * silently SHORTEN the prefix — a recall loss, the one failure mode
    * an exact join must never have; a too-small ceil only lengthens
    * the prefix, which costs candidates but never misses a pair). */
  private def prefixLen(
      sz: org.apache.spark.sql.Column, t: Double): org.apache.spark.sql.Column =
    sz - F.ceil(sz * t - 1e-9).cast("int") + 1

  /** Within-bucket pair expansion with the symmetric length filter
    * applied BEFORE emission: J(x,y) >= t forces t|x| <= |y| and
    * t|y| <= |x|, so a member pair whose sizes cannot reach the
    * threshold never materializes a candidate row. */
  private val sizedPairsBase =
    (t: Double, ms: Seq[org.apache.spark.sql.Row]) => {
      val arr = ms.map(r => (r.getLong(0), r.getInt(1)))
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var i = 0
      while (i < arr.length) {
        var j = i + 1
        while (j < arr.length) {
          val (ia, sa) = arr(i); val (ib, sb) = arr(j)
          val lo = math.min(sa, sb).toDouble; val hi = math.max(sa, sb).toDouble
          if (lo >= t * hi - 1e-9 && ia != ib) {
            if (ia < ib) out += ((ia, ib)) else out += ((ib, ia))
          }
          j += 1
        }
        i += 1
      }
      out.toSeq
    }

  /**
   * EXACT set-similarity self-join at word-token Jaccard >= `threshold`
   * via prefix filtering (the AllPairs/PPJoin family; Bayardo et al.
   * WWW'07, Xiao et al. WWW'08): order every document's distinct
   * tokens by ascending global frequency (rarest first — one total
   * order corpus-wide); any pair with J(x,y) >= t MUST share a token
   * within the first |x| - ceil(t|x|) + 1 tokens of BOTH sides, so an
   * equi-join on prefix tokens alone finds every qualifying pair with
   * ZERO false negatives — the exact, guaranteed-recall complement to
   * MinHash-LSH (probabilistic recall). Returns (id_a, id_b, inter,
   * uni) with id_a < id_b, Jaccard over DISTINCT lower-cased
   * whitespace tokens, verified exactly.
   *
   * Scale shape: one token-frequency aggregate (map-side combined), a
   * per-doc rank window, and a self-join keyed on PREFIX tokens only.
   * The frequent tokens that would flood join buckets sort to the END
   * of the rarity order and fall outside every prefix, so bucket sizes
   * shrink as the corpus (and its stopword frequencies) grows — the
   * opposite of a naive token join. Exact verification touches only
   * candidates; `maxBucket` caps pathological buckets
   * (accumulator-counted) as a safety valve.
   */
  def jaccardPrefixPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1]: $threshold")
    val toks = df.select(
        F.col(idCol),
        F.array_distinct(wsTokens(F.lower(F.col(textCol)))).as("__toks"))
      .withColumn("__sz", F.size(F.col("__toks")))
      .filter(F.col("__sz") > 0)
      .localCheckpoint(eager = false)
    val occ = toks.select(
      F.col(idCol), F.col("__sz"), F.explode(F.col("__toks")).as("__tok"))
    val tf = occ.groupBy(F.col("__tok")).agg(F.count(F.lit(1)).as("__tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col(idCol)).orderBy(F.col("__tf").asc, F.col("__tok").asc)
    val prefix = occ.join(tf, "__tok")
      .withColumn("__rk", F.row_number().over(w))
      .filter(F.col("__rk") <= prefixLen(F.col("__sz"), threshold))
      .select(F.col(idCol), F.col("__sz"), F.col("__tok"))
    val grouped = prefix.groupBy(F.col("__tok"))
      .agg(F.collect_list(
        F.struct(F.col(idCol).as("_1"), F.col("__sz").as("_2"))).as("__ms"))
      .filter(F.size(F.col("__ms")) > 1)
    val sizedPairs = F.udf(sizedPairsBase.curried(threshold))
    val candidates = capBuckets(grouped, F.size(F.col("__ms")), maxBucket, "jaccardPrefix")
      .select(F.explode(sizedPairs(F.col("__ms"))).as("__p"))
      .select(F.col("__p._1").as("id_a"), F.col("__p._2").as("id_b"))
      .distinct()
    verifyJaccard(candidates, toks.select(F.col(idCol), F.col("__toks")),
      idCol, "__toks", threshold)
  }

  /**
   * MinHash-LSH parameter auto-dial: choose (bands b, rowsPerBand r)
   * with b*r <= maxHashes whose S-curve midpoint (1/b)^(1/r) — the
   * Jaccard at which a pair's bucket-collision probability crosses
   * ~50% — sits closest to `threshold`. Fixed (b, r) are a scale trap
   * the same way fixed nprobe is for IVF: a dial tuned for t=0.8
   * silently under-recalls when a pipeline reuses it at t=0.6. Ties
   * prefer more total hashes (sharper S-curve), then more rows per
   * band (fewer, larger bands — cheaper shuffle keys).
   */
  def lshParamsFor(threshold: Double, maxHashes: Int = 128): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold in (0,1): $threshold")
    require(maxHashes >= 2, s"maxHashes >= 2: $maxHashes")
    // the OPH signature kernel requires numHashes = b*r to be a power
    // of two >= 2 (its positions derive from high bits of one hash)
    val cands = for {
      r <- 1 to maxHashes
      b <- 2 to maxHashes / r
      if Integer.bitCount(b * r) == 1
    } yield (b, r)
    cands.minBy { case (b, r) =>
      val mid = math.pow(1.0 / b, 1.0 / r)
      (math.abs(mid - threshold), -(b * r), -r)
    }
  }

  /** [[nearDuplicatePairs]] with LSH geometry derived from the
    * threshold via [[lshParamsFor]] instead of caller-fixed (b, r). */
  def nearDuplicatePairsAuto(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      threshold: Double = 0.8,
      maxHashes: Int = 128,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val (b, r) = lshParamsFor(threshold, maxHashes)
    nearDuplicatePairs(df, idCol, textCol, shingleSize, threshold, b, r, maxBucket)
  }

  /**
   * Embedding-cosine near-duplicate pairs: random-hyperplane LSH
   * candidate generation (corpus self-join on (table, signature)
   * buckets), then exact cosine verification of candidates only.
   * Returns (id_a, id_b, cos) with id_a < id_b and cos >= threshold.
   *
   * Scale shape: the bucket join's keys are small ints and each vector
   * is replicated `tables` times — never an all-pairs comparison. True
   * duplicates (identical vectors) hash identically in every table, so
   * recall is 1.0 for exact copies and degrades gracefully with angle;
   * raise `tables` (more candidates, more recall) to taste. Verified
   * cosine makes precision exact.
   */
  def embeddingNearDuplicatePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 8,
      planes: Int = 8,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val sigU = Similarity.tableSigsUdf(tables, planes)
    // signatures materialize once (id + small ints; lazy so plan
    // building runs no job) — both self-join sides read the blocks
    // instead of re-running the tables x planes x dim signature scan
    val bucketed = df.select(F.col(idCol),
        F.posexplode(sigU(F.col(vecCol))).as(Seq("__t", "__sig")))
      .localCheckpoint(eager = false)
    // prune singleton and oversize buckets before the self-join: a
    // bucket of m vectors emits m^2 join rows, so a flood of identical
    // vectors (which collide in EVERY table) must be capped here —
    // identical copies are dropExactDuplicates' job, not LSH's
    val sizes = bucketed.groupBy(F.col("__t"), F.col("__sig"))
      .agg(F.count(F.lit(1)).as("__n"))
      .filter(F.col("__n") > 1)
    val allowed = capBuckets(sizes, F.col("__n"), maxBucket, "embed")
      .select("__t", "__sig")
    val pruned = bucketed.join(allowed, Seq("__t", "__sig"))
    val l = pruned.select(F.col(idCol).as("id_a"), F.col("__t"), F.col("__sig"))
    val r = pruned.select(F.col(idCol).as("id_b"), F.col("__t"), F.col("__sig"))
    // candidates dedup on bare id pairs (a pair collides in up to
    // `tables` buckets), then the vectors re-attach once per pair —
    // never `tables` vector copies through a distinct
    val candidates = l.join(r, Seq("__t", "__sig"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val va = df.select(F.col(idCol).as("id_a"), F.col(vecCol).as("__va"))
    val vb = df.select(F.col(idCol).as("id_b"), F.col(vecCol).as("__vb"))
    candidates.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos", Similarity.cosine(F.col("__va"), F.col("__vb")))
      .filter(F.col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /**
   * Persistable hyperplane-LSH signature index over embeddings:
   * (tbl, sig, id, vec) — one row per (vector, table), the vector
   * carried alongside so the verify join never re-scans history.
   * Plain parquet via save/load; geometry (tables/planes) must match
   * between build and probe.
   */
  def buildVectorSignatureIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tables: Int = 8,
      planes: Int = 8): DataFrame = {
    val sigU = Similarity.tableSigsUdf(tables, planes)
    df.select(F.col(idCol).as("id"), F.col(vecCol).as("vec"))
      .select(F.col("id"), F.col("vec"),
        F.posexplode(sigU(F.col("vec"))).as(Seq("tbl", "sig")))
      .select("tbl", "sig", "id", "vec")
  }

  /**
   * Incremental embedding near-dup check — STREAM-CAPABLE: new vectors
   * (batch or streaming DataFrame) probed against a persisted
   * [[buildVectorSignatureIndex]]; emits (id_new, id_old, cos) with
   * exact cosine >= threshold. Stateless stream-static equi-join on
   * (tbl, sig) + a map-side verify — no watermark, no state store; a
   * pair colliding in several tables emits once per collision (batch
   * callers can `.dropDuplicates("id_new", "id_old")`; a stream stays
   * stateless and dedupes downstream). Exact copies collide in every
   * table, so copy recall is 1.0 — same guarantee as
   * [[embeddingNearDuplicatePairs]]. A probed id already present in the
   * index (re-ingest/overlap) is NOT reported as its own duplicate:
   * self-pairs (id_new = id_old) are filtered out.
   */
  def incrementalEmbeddingDuplicates(
      newVecs: DataFrame,
      index: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 8,
      planes: Int = 8): DataFrame = {
    val sigU = Similarity.tableSigsUdf(tables, planes)
    newVecs
      .select(F.col(idCol).as("id_new"), F.col(vecCol).as("__vn"))
      .select(F.col("id_new"), F.col("__vn"),
        F.posexplode(sigU(F.col("__vn"))).as(Seq("tbl", "sig")))
      .join(index.select(F.col("tbl"), F.col("sig"),
        F.col("id").as("id_old"), F.col("vec").as("__vo")), Seq("tbl", "sig"))
      .withColumn("cos", Similarity.cosine(F.col("__vn"), F.col("__vo")))
      .filter(F.col("cos") >= threshold && F.col("id_new") =!= F.col("id_old"))
      .select("id_new", "id_old", "cos")
  }

  /**
   * Canonical-document selection: one survivor per duplicate group,
   * chosen by the caller's preference order (e.g. highest quality
   * score, then lowest id). A single hash-shuffle on the group key plus
   * a per-partition ranked window — the standard "keep best of cluster"
   * step after any dedup pass.
   */
  def keepCanonical(
      df: DataFrame,
      groupKey: org.apache.spark.sql.Column,
      order: Seq[org.apache.spark.sql.Column]): DataFrame =
    keepTopK(df, groupKey, order, 1)

  /**
   * Per-group top-K selection: keep the K best rows of each group by
   * the caller's preference order — per-source capping, best-of-cluster
   * with runners-up, etc. Same single-shuffle ranked-window shape as
   * [[keepCanonical]] (which is the K=1 case).
   */
  def keepTopK(
      df: DataFrame,
      groupKey: org.apache.spark.sql.Column,
      order: Seq[org.apache.spark.sql.Column],
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(order.nonEmpty, "keepTopK needs at least one ordering column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupKey).orderBy(order: _*)
    df.withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * SimHash near-dup candidates: 64-bit signature, banded into eight
   * 8-bit chunks (guaranteed collision for hamming distance <= 7),
   * exact hamming filter on candidates.
   */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 6,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(maxHamming <= 7, "8x8-bit banding only guarantees hamming <= 7")
    // materialize signatures once (id + one long per doc — tiny): both
    // sides of the self-join read persisted blocks instead of re-running
    // the tokenize+hash UDF over the corpus twice. Lazy so that merely
    // building the plan (explain, dry-run) runs no job.
    val sigs = df.select(F.col(idCol), TextFunctions.simhash(F.col(textCol)).as("__sig"))
      .localCheckpoint(eager = false)
    val chunked = sigs.select(
        F.col(idCol), F.col("__sig"),
        F.explode(TextFunctions.simhashChunksUdf(F.col("__sig"))).as("__c"))
      .select(F.col(idCol), F.col("__sig"),
              F.col("__c._1").as("__chunk"), F.col("__c._2").as("__val"))
    // prune singleton and oversize buckets before the self-join (a
    // flooded chunk value would emit m^2 join rows). A pair within
    // maxHamming <= 6 differs in at most 6 of 64 bits, which spread over
    // 8 chunks leaves >= 2 equal chunks — so dropping one flooded bucket
    // rarely loses the pair outright.
    val sizes = chunked.groupBy(F.col("__chunk"), F.col("__val"))
      .agg(F.count(F.lit(1)).as("__n"))
      .filter(F.col("__n") > 1)
    val allowed = capBuckets(sizes, F.col("__n"), maxBucket, "simhash")
      .select("__chunk", "__val")
    val pruned = chunked.join(allowed, Seq("__chunk", "__val"))
    val l = pruned.select(F.col(idCol).as("id_a"), F.col("__sig").as("__siga"),
                          F.col("__chunk"), F.col("__val"))
    val r = pruned.select(F.col(idCol).as("id_b"), F.col("__sig").as("__sigb"),
                          F.col("__chunk"), F.col("__val"))
    l.join(r, Seq("__chunk", "__val"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select(F.col("id_a"), F.col("id_b"),
              F.bit_count(F.col("__siga").bitwiseXOR(F.col("__sigb"))).as("hamming"))
      .filter(F.col("hamming") <= maxHamming)
      .distinct()
  }

  /** The 64-bit signature's `bands` equal chunks as an array of
    * (_1: band index, _2: chunk bits) structs — pure
    * shiftrightunsigned/bitwiseAND Column arithmetic, so the chunking
    * stays inside whole-stage codegen (the ScalaUDF it replaced broke
    * the span and paid a boxed tuple array per row). Bit-exact the
    * same values: `(sig >>> (b * width)) & mask`. */
  private[graft] def chunkCols(sig: org.apache.spark.sql.Column, bands: Int)
      : org.apache.spark.sql.Column = {
    val width = 64 / bands
    val mask = (1L << width) - 1
    F.array((0 until bands).map { b =>
      F.struct(
        F.lit(b).as("_1"),
        F.shiftrightunsigned(sig, b * width).bitwiseAND(F.lit(mask)).as("_2"))
    }: _*)
  }

  /**
   * Generic Hamming-banded near-dup pairs over a precomputed 64-bit
   * signature column (the [[simhashPairs]] machinery with the
   * signature supplied by the caller — perceptual image hashes,
   * audio fingerprints, any 64-bit locality-sensitive code): the
   * signature splits into `bands` equal chunks, so two signatures
   * within Hamming distance `bands - 1` are guaranteed to collide in
   * at least one chunk (pigeonhole); candidates sharing a (band,
   * bits) bucket get the exact popcount check. NULL signatures drop.
   * Returns (id_a, id_b, hamming) with id_a < id_b.
   *
   * Scale shape: identical to [[simhashPairs]] — signatures
   * checkpoint as (id, long) rows, singleton and flooded buckets
   * prune before the self-join, the shuffle key is 8 bytes.
   */
  def hammingPairs(
      df: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 6,
      bands: Int = 8,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must be >= 2 and divide 64, got $bands")
    require(maxHamming >= 0 && maxHamming <= bands - 1,
      s"$bands bands only guarantee hamming <= ${bands - 1}, got $maxHamming")
    val sigs = df
      .filter(F.col(hashCol).isNotNull)
      .select(F.col(idCol), F.col(hashCol).cast("long").as("__sig"))
      .localCheckpoint(eager = false)
    val chunked = sigs.select(
        F.col(idCol), F.col("__sig"),
        F.explode(chunkCols(F.col("__sig"), bands)).as("__c"))
      .select(F.col(idCol), F.col("__sig"),
              F.col("__c._1").as("__chunk"), F.col("__c._2").as("__val"))
    val sizes = chunked.groupBy(F.col("__chunk"), F.col("__val"))
      .agg(F.count(F.lit(1)).as("__n"))
      .filter(F.col("__n") > 1)
    val allowed = capBuckets(sizes, F.col("__n"), maxBucket, "hamming")
      .select("__chunk", "__val")
    val pruned = chunked.join(allowed, Seq("__chunk", "__val"))
    val l = pruned.select(F.col(idCol).as("id_a"), F.col("__sig").as("__siga"),
                          F.col("__chunk"), F.col("__val"))
    val r = pruned.select(F.col(idCol).as("id_b"), F.col("__sig").as("__sigb"),
                          F.col("__chunk"), F.col("__val"))
    l.join(r, Seq("__chunk", "__val"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select(F.col("id_a"), F.col("id_b"),
              F.bit_count(F.col("__siga").bitwiseXOR(F.col("__sigb"))).as("hamming"))
      .filter(F.col("hamming") <= maxHamming)
      .distinct()
  }

  /** Persistable Hamming index over a 64-bit signature column: rows
    * (band INT, bits LONG, id, sig) — `bands` rows per record, the
    * full signature carried alongside so probes verify WITHOUT
    * re-reading (or re-decoding) history. Oversize buckets are capped
    * at build time like [[buildSignatureIndex]]. Persist/reload with
    * [[saveSignatureIndex]] / [[loadSignatureIndex]]. */
  def buildHashIndex(
      df: DataFrame,
      idCol: String,
      hashCol: String,
      bands: Int = 8,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must be >= 2 and divide 64, got $bands")
    val rows = df
      .filter(F.col(hashCol).isNotNull)
      .select(F.col(idCol).as("id"), F.col(hashCol).cast("long").as("sig"))
      .select(F.col("id"), F.col("sig"),
              F.explode(chunkCols(F.col("sig"), bands)).as("__c"))
      .select(F.col("__c._1").as("band"), F.col("__c._2").as("bits"),
              F.col("id"), F.col("sig"))
    val grouped = rows.groupBy(F.col("band"), F.col("bits"))
      .agg(F.collect_list(F.struct(F.col("id"), F.col("sig"))).as("__e"))
    capBuckets(grouped, F.size(F.col("__e")), maxBucket, "hashindex")
      .select(F.col("band"), F.col("bits"), F.explode(F.col("__e")).as("__x"))
      .select(F.col("band"), F.col("bits"),
              F.col("__x.id").as("id"), F.col("__x.sig").as("sig"),
              // geometry metadata: probes fail fast on a band-count
              // mismatch instead of silently losing recall (constant
              // column — parquet RLE makes it free)
              F.lit(bands).as("bands"))
  }

  /**
   * Stateless incremental Hamming matches: one (id_new, id_old,
   * hamming) row PER MATCHING BAND between a new batch's signatures
   * and the history behind a persisted [[buildHashIndex]] — a pair
   * within distance d shares >= bands-d bands and appears that many
   * times. Fully stateless (chunk-explode + stream-static join +
   * popcount filter; no aggregation, no distinct), so it applies to
   * a STREAMING batch in append mode unchanged — the
   * [[incrementalEmbeddingDuplicates]] precedent. Flood control
   * lives in the index build's bucket capping. Geometry (`bands`)
   * must match the index's — checked against the index's `bands`
   * metadata column at query-construction time (one 1-row driver
   * job; a mismatch, e.g. an index built with the bands=4 scale
   * dial probed with the default 8, would otherwise yield
   * near-zero recall with no error).
   */
  def incrementalHammingMatches(
      batch: DataFrame,
      histIndex: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 6,
      bands: Int = 8): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must be >= 2 and divide 64, got $bands")
    if (histIndex.columns.contains("bands")) {
      histIndex.select(F.col("bands")).take(1).foreach { r =>
        require(r.getInt(0) == bands,
          s"hash index was built with bands=${r.getInt(0)} but is being " +
            s"probed with bands=$bands — band ids/bit widths would not " +
            "line up and recall would silently collapse")
      }
    }
    require(maxHamming >= 0 && maxHamming <= bands - 1,
      s"$bands bands only guarantee hamming <= ${bands - 1}, got $maxHamming")
    batch
      .filter(F.col(hashCol).isNotNull)
      .select(F.col(idCol).as("id_new"), F.col(hashCol).cast("long").as("__sn"))
      .select(F.col("id_new"), F.col("__sn"),
              F.explode(chunkCols(F.col("__sn"), bands)).as("__c"))
      .select(F.col("id_new"), F.col("__sn"),
              F.col("__c._1").as("band"), F.col("__c._2").as("bits"))
      .join(histIndex, Seq("band", "bits"))
      .select(F.col("id_new"), F.col("id").as("id_old"),
              F.bit_count(F.col("__sn").bitwiseXOR(F.col("sig"))).as("hamming"))
      .filter(F.col("hamming") <= maxHamming)
  }

  /** Batch form of [[incrementalHammingMatches]]: one row per
    * distinct (id_new, id_old) pair. The batch's band chunks reach
    * the index scan via the join (AQE broadcasts the small side) —
    * TB-scale history is never shuffled and never re-decoded, so a
    * daily media increment costs one index scan. */
  def incrementalHammingPairs(
      batch: DataFrame,
      histIndex: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 6,
      bands: Int = 8): DataFrame =
    incrementalHammingMatches(batch, histIndex, idCol, hashCol, maxHamming, bands)
      .distinct()

  /** Merge sorted-or-not (start, end) intervals, fusing overlapping AND
    * adjacent ones (tokens 1-8 and 9-16 both duplicated = one
    * contiguous duplicated region 1-16). Input sizes are bounded by a
    * single document's token count, so this runs rowwise in a UDF. */
  private[pipeline] def mergeIntervals(iv: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    if (iv.isEmpty) Nil
    else {
      val sorted = iv.sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)](sorted.head)
      sorted.tail.foreach { case (s, e) =>
        val (ps, pe) = out.last
        if (s <= pe + 1) out(out.length - 1) = (ps, math.max(pe, e))
        else out += ((s, e))
      }
      out.toSeq
    }
  }

  /** Whitespace tokens (split on `\s+`, empties dropped) — the same
    * tokenization every text oracle in this repo uses. */
  private def wsTokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.filter(F.split(c, "\\s+"), t => F.length(t) > 0)

  /** One row per k-token gram occurrence: (id, __s, __e, __gh) with
    * 1-based inclusive token positions and a 64-bit gram hash. The
    * shuffle key downstream is the 8-byte hash, never the gram text;
    * collision odds at n grams are ~n^2/2^65 (~3e-4 at 1e8 grams —
    * and a collision only ever over-marks a span, never crashes). */
  private def gramOccurrences(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    df.select(F.col(idCol), wsTokens(F.col(textCol)).as("__toks"))
      .withColumn("__n", F.size(F.col("__toks")))
      .filter(F.col("__n") >= k)
      .select(F.col(idCol), F.posexplode(
        F.transform(F.sequence(F.lit(1), F.col("__n") - (k - 1)),
          i => F.xxhash64(F.array_join(F.slice(F.col("__toks"), i, F.lit(k)), " ")))))
      .select(F.col(idCol),
        (F.col("pos") + 1).cast("long").as("__s"),
        (F.col("pos") + k).cast("long").as("__e"),
        F.col("col").as("__gh"))
  }

  /**
   * Exact duplicated-substring detection (Lee et al. 2021,
   * "Deduplicating Training Data Makes Language Models Better"): every
   * k-token gram occurring >= `minCount` times in the corpus marks its
   * token span; overlapping/adjacent marks merge into maximal spans.
   * Returns (idCol, span_start, span_end) with 1-based inclusive
   * whitespace-token indices, one row per maximal span.
   *
   * With `keepFirst` the globally first occurrence of each duplicated
   * gram (lowest (id, position)) is NOT marked — the span set then
   * describes exactly what [[stripDuplicateSpans]] removes while one
   * copy of every repeated passage survives.
   *
   * Scale shape: the corpus explodes to one 24-byte row per token (the
   * same order as any tokenizing scan); the single wide shuffle is the
   * gram-hash groupBy, whose partial aggregation emits one row per
   * DISTINCT gram. The duplicated-gram table that joins back is the
   * repeated sliver only — AQE broadcasts it when small. Per-doc span
   * merge is a rowwise UDF over position lists bounded by document
   * length.
   */
  def duplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minCount: Int = 2,
      keepFirst: Boolean = false): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    // occ feeds BOTH the duplicated-gram aggregate and the mark join —
    // without the pin each side re-runs the full tokenize + gram
    // explode over the corpus (measured ~40% of the pass)
    val occ = gramOccurrences(df, idCol, textCol, k)
      .localCheckpoint(eager = false)
    val dup = occ.groupBy(F.col("__gh"))
      .agg(F.count(F.lit(1)).as("__c"),
           F.min(F.struct(F.col(idCol), F.col("__s"))).as("__first"))
      .filter(F.col("__c") >= minCount)
      .select(F.col("__gh"), F.col("__first"))
    val marked0 = occ.join(dup, "__gh")
    val marked =
      if (keepFirst)
        marked0.filter(!(F.col(idCol) === F.col(s"__first.$idCol") &&
                         F.col("__s") === F.col("__first.__s")))
      else marked0
    spansFromMarked(marked, idCol)
  }

  /** Merge marked (id, __s, __e) gram occurrences into maximal spans
    * (overlap AND adjacency merge) — the shared tail of the direct and
    * escalated span detectors. */
  private def spansFromMarked(marked: DataFrame, idCol: String): DataFrame = {
    val merge = F.udf((iv: Seq[org.apache.spark.sql.Row]) =>
      mergeIntervals(iv.map(r => (r.getLong(0), r.getLong(1)))))
    marked
      .groupBy(F.col(idCol))
      .agg(F.collect_list(F.struct(F.col("__s"), F.col("__e"))).as("__iv"))
      .select(F.col(idCol), F.explode(merge(F.col("__iv"))).as("__sp"))
      .select(F.col(idCol),
        F.col("__sp._1").as("span_start"),
        F.col("__sp._2").as("span_end"))
  }

  /**
   * Leakage-free train/val/test assignment: two near-duplicate
   * documents split across train and eval LEAK the training set into
   * the benchmark, so the split key must be the duplicate CLUSTER,
   * never the document. Connected-components the verified `pairs`
   * ([[duplicateClusters]]), key every document by its cluster
   * representative (the cluster's min id; documents in no pair are
   * their own representative), and push the key through
   * [[Sampling.splitColumn]]'s md5-range rule — deterministic,
   * engine-portable, and constant per cluster by construction.
   *
   * Scale shape: the cluster table is the duplicate SLIVER only (one
   * row per id that appears in a pair) — the corpus left-joins it and
   * the split itself is a pure projection; fractions apportion
   * clusters by their representative's hash, so split sizes track the
   * weights in cluster mass.
   */
  def leakFreeSplits(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      splits: Seq[(String, Double)],
      splitColName: String = "split",
      otherName: String = "rest"): DataFrame = {
    val clusters = duplicateClusters(pairs)
      .select(F.col("id").as(idCol), F.col("cluster").as("__cluster"))
    df.join(clusters, Seq(idCol), "left")
      .withColumn(splitColName,
        Sampling.splitColumn(
          F.coalesce(F.col("__cluster"), F.col(idCol).cast("long")),
          splits, otherName))
      .drop("__cluster")
  }

  /**
   * [[leakFreeSplits]] for a GROWING corpus — the nightly shape:
   * yesterday's documents already carry immutable split assignments,
   * and today's batch must join them without ever letting a near-dup
   * cluster straddle an eval boundary. Per fresh-batch duplicate
   * cluster (fresh↔fresh links, singletons included):
   *
   *   - the cluster gathers every split its members INHERIT from
   *     history near-dup matches (a probe of the persisted
   *     [[buildSignatureIndex]] — history is never re-shingled);
   *   - exactly one inherited split → the whole cluster takes it
   *     (consistency with history is forced, history is immutable);
   *   - two or more → the cluster would BRIDGE differently-assigned
   *     history clusters; re-assigning history would leak, so the
   *     cluster lands in `quarantineName` (typically dropped or
   *     routed to train-only);
   *   - none → a genuinely novel cluster, assigned by the same
   *     md5-range rule as [[leakFreeSplits]] on its representative.
   *
   * Scale shape: one index probe (batch-sized stream side), one
   * fresh↔fresh pair pass (batch-sized), cluster table = the batch's
   * duplicate sliver; history text is touched only through the
   * probe's verify join.
   */
  def incrementalLeakFreeSplits(
      fresh: DataFrame,
      idCol: String,
      textCol: String,
      histIndex: DataFrame,
      histDocs: DataFrame,
      histIdCol: String,
      histTextCol: String,
      histSplitCol: String,
      splits: Seq[(String, Double)],
      shingleSize: Int = 5,
      threshold: Double = 0.8,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      quarantineName: String = "quarantine",
      otherName: String = "rest",
      splitColName: String = "split"): DataFrame = {
    val inherited = incrementalNearDuplicatePairs(
        fresh, histIndex, histDocs, idCol, textCol,
        shingleSize, threshold, bands, rowsPerBand)
      .join(histDocs.select(F.col(histIdCol).as("id_old"),
        F.col(histSplitCol).as("__hs")), "id_old")
      .select(F.col("id_new").as(idCol), F.col("__hs"))
      .distinct()
    val ffPairs = nearDuplicatePairs(fresh, idCol, textCol,
      shingleSize, threshold, bands, rowsPerBand)
    val clusters = duplicateClusters(ffPairs)
      .select(F.col("id").as(idCol), F.col("cluster").as("__rep"))
    val members = fresh.select(F.col(idCol))
      .join(clusters, Seq(idCol), "left")
      .withColumn("__rep",
        F.coalesce(F.col("__rep"), F.col(idCol).cast("long")))
    val perCluster = members
      .join(inherited, Seq(idCol), "left")
      .groupBy(F.col("__rep"))
      .agg(F.collect_set(F.col("__hs")).as("__ss"))
      .withColumn(splitColName,
        F.when(F.size(F.col("__ss")) === 0,
            Sampling.splitColumn(F.col("__rep"), splits, otherName))
          .when(F.size(F.col("__ss")) === 1, F.element_at(F.col("__ss"), 1))
          .otherwise(F.lit(quarantineName)))
      .select(F.col("__rep"), F.col(splitColName))
    fresh.join(members.join(perCluster, "__rep")
        .select(F.col(idCol), F.col(splitColName)), Seq(idCol))
  }

  /** Merge a frame of (idCol, span_start, span_end) rows into maximal
    * per-document spans (overlap and adjacency merge) — the batch
    * finisher for UNMERGED span emitters like [[indexGramHits]] and
    * the streaming probe (span merging needs all of a document's hits
    * together, which a stateless stream can't see). */
  def mergeSpans(df: DataFrame, idCol: String): DataFrame =
    spansFromMarked(
      df.select(F.col(idCol), F.col("span_start").as("__s"),
        F.col("span_end").as("__e")),
      idCol)

  /**
   * [[duplicateSpans]] with GRAM-SIZE ESCALATION — output-identical
   * (DuplicateSpanSpec pins it), built for LARGE length floors where
   * the direct form's corpus-wide O(n·k) gram hashing dominates:
   * suffix-array-style "remove any shared span of >= k tokens" dedup
   * runs k = 50+ (Lee et al. 2021 use 50 BPE tokens), and hashing
   * every 50-token window of 100 TB is ~50x a tokenizing scan.
   *
   * Escalation: probe at `seedK`, then re-probe SURVIVORS at doubled
   * gram sizes until reaching `k`. Soundness: a duplicated k-gram
   * contains duplicated sub-grams at every size (each occurrence of
   * the parent contributes a distinct occurrence of the sub-gram, so
   * sub-gram counts >= parent counts >= minCount) — so candidate
   * positions where BOTH covering half-grams survived are a superset
   * of the true duplicated k-grams, and the final round's exact
   * group-count at size k makes the result exact, never approximate.
   * Only round one touches the whole corpus (at the cheap `seedK`);
   * every later round hashes only the duplicated sliver.
   */
  def duplicateSpansEscalated(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 50,
      minCount: Int = 2,
      keepFirst: Boolean = false,
      seedK: Int = 8): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(seedK >= 2, s"seedK must be >= 2, got $seedK")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    if (k <= seedK)
      return duplicateSpans(df, idCol, textCol, k, minCount, keepFirst)
    // doubling ladder seedK, 2*seedK, ... capped at k
    val sizes = Iterator.iterate(seedK)(s => math.min(2 * s, k))
      .takeWhile(_ < k).toSeq :+ k
    val toks = df
      .select(F.col(idCol), wsTokens(F.col(textCol)).as("__toks"))
      .localCheckpoint(eager = false)
    def dupJoin(occ: DataFrame): DataFrame = {
      val dup = occ.groupBy(F.col("__gh"))
        .agg(F.count(F.lit(1)).as("__c"),
             F.min(F.struct(F.col(idCol), F.col("__s"))).as("__first"))
        .filter(F.col("__c") >= minCount)
        .select(F.col("__gh"), F.col("__first"))
      occ.join(dup, "__gh")
    }
    var kPrev = sizes.head
    var dupOcc = dupJoin(gramOccurrences(df, idCol, textCol, kPrev))
      .localCheckpoint(eager = false)
    sizes.tail.foreach { kNext =>
      // a kNext-gram at s is duplicated only if the kPrev-grams at s
      // and at s + kNext - kPrev (its two covering halves) both are
      val delta = (kNext - kPrev).toLong
      val lhs = dupOcc.select(F.col(idCol), F.col("__s"))
      val rhs = dupOcc.select(F.col(idCol), (F.col("__s") - delta).as("__s"))
      val cand = lhs.join(rhs, Seq(idCol, "__s"))
        .groupBy(F.col(idCol)).agg(F.collect_list(F.col("__s")).as("__ps"))
      // hash full kNext-grams only at candidate positions (the sliver)
      val occNext = toks.join(cand, Seq(idCol))
        .select(F.col(idCol), F.explode(F.transform(F.col("__ps"),
          s => F.struct(s.as("_s"),
            F.array_join(F.slice(F.col("__toks"), s.cast("int"), F.lit(kNext)), " ")
              .as("_g")))).as("__x"))
        .select(F.col(idCol),
          F.col("__x._s").as("__s"),
          (F.col("__x._s") + (kNext - 1)).as("__e"),
          F.xxhash64(F.col("__x._g")).as("__gh"))
      dupOcc = dupJoin(occNext).localCheckpoint(eager = false)
      kPrev = kNext
    }
    val marked =
      if (keepFirst)
        dupOcc.filter(!(F.col(idCol) === F.col(s"__first.$idCol") &&
                        F.col("__s") === F.col("__first.__s")))
      else dupOcc
    spansFromMarked(marked, idCol)
  }

  /**
   * Remove duplicated substrings, keeping the globally first occurrence
   * of each repeated k-gram: rewrites `textCol` with the tokens inside
   * [[duplicateSpans]](keepFirst = true) spans deleted (remaining
   * tokens re-joined with single spaces — the rewrite is
   * whitespace-normalizing, like every tokenizing rewrite here).
   * Documents without duplicated spans pass through byte-identical.
   * One broadcast-or-shuffle join of the span sliver onto the corpus;
   * the corpus itself never shuffles.
   */
  def stripDuplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minCount: Int = 2): DataFrame = {
    val spans = duplicateSpans(df, idCol, textCol, k, minCount, keepFirst = true)
      .groupBy(F.col(idCol))
      .agg(F.collect_list(F.struct(F.col("span_start"), F.col("span_end"))).as("__spans"))
    val ws = java.util.regex.Pattern.compile("\\s+")
    val rewrite = F.udf((t: String, spans: Seq[org.apache.spark.sql.Row]) => {
      if (t == null) null
      else {
        val sp = spans.map(r => (r.getLong(0), r.getLong(1)))
        val toks = ws.split(t).iterator.filter(_.nonEmpty).toArray
        val kept = toks.iterator.zipWithIndex.collect {
          case (tok, i0) if !sp.exists { case (s, e) => i0 + 1 >= s && i0 + 1 <= e } => tok
        }
        kept.mkString(" ")
      }
    })
    df.join(spans, Seq(idCol), "left")
      .withColumn(textCol,
        F.when(F.col("__spans").isNull, F.col(textCol))
          .otherwise(rewrite(F.col(textCol), F.col("__spans"))))
      .drop("__spans")
  }

  /** Persistable gram index for [[incrementalDuplicateSpans]]: one
    * (gh) row per DISTINCT k-token gram hash in the corpus — 8 bytes
    * per distinct gram, never the text. Plain parquet via
    * DataFrameWriter. */
  def buildGramIndex(df: DataFrame, textCol: String, k: Int = 8): DataFrame =
    gramOccurrences(df.withColumn("__id", F.monotonically_increasing_id()),
        "__id", textCol, k)
      .select(F.col("__gh").as("gh")).distinct()

  /**
   * Incremental duplicated-substring detection — the nightly-batch
   * shape: spans in a FRESH batch whose k-token grams either already
   * exist in a persisted [[buildGramIndex]] of the history, or repeat
   * within the batch itself (>= `minCount` occurrences). History text
   * is never re-read or re-shingled. Same two-stage probe as
   * [[incrementalExactDuplicates]]: a broadcast-bloom pre-filter over
   * the index hashes (no false negatives) prunes the batch's gram
   * stream to the probable-hit sliver, then an exact semi-join removes
   * the bloom's false positives. Returns (idCol, span_start, span_end)
   * merged maximal spans, like [[duplicateSpans]].
   */
  def incrementalDuplicateSpans(
      fresh: DataFrame,
      gramIndex: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minCount: Int = 2,
      expectedItems: Long = graft.sketch.bloom.DefaultItems,
      fpp: Double = graft.sketch.bloom.DefaultFpp): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val occ = gramOccurrences(fresh, idCol, textCol, k)
      .localCheckpoint(eager = false)
    // within-batch repeats: one count aggregate over the batch's grams
    val withinDup = occ.groupBy(F.col("__gh"))
      .agg(F.count(F.lit(1)).as("__c"))
      .filter(F.col("__c") >= minCount)
      .select(F.col("__gh"))
    // history hits: bloom-pruned probe stream, exact semi-join verify
    val pruned = graft.sketch.SketchOps
      .bloomPrune(occ.select(F.col("__gh")).distinct(), "__gh",
        gramIndex, "gh", expectedItems, fpp)
    val histDup = pruned
      .join(gramIndex, pruned("__gh") === gramIndex("gh"), "left_semi")
    val merge = F.udf((iv: Seq[org.apache.spark.sql.Row]) =>
      mergeIntervals(iv.map(r => (r.getLong(0), r.getLong(1)))))
    occ.join(withinDup.union(histDup).distinct(), "__gh")
      .groupBy(F.col(idCol))
      .agg(F.collect_list(F.struct(F.col("__s"), F.col("__e"))).as("__iv"))
      .select(F.col(idCol), F.explode(merge(F.col("__iv"))).as("__sp"))
      .select(F.col(idCol),
        F.col("__sp._1").as("span_start"),
        F.col("__sp._2").as("span_end"))
  }

  /**
   * Stream-capable slice of [[incrementalDuplicateSpans]]: the gram
   * occurrences in `fresh` whose hash exists in the persisted
   * [[buildGramIndex]] — (idCol, span_start, span_end), one UNMERGED
   * row per matching k-gram occurrence. Every stage is stateless
   * (select/posexplode shingling, a broadcast-bloom predicate, a
   * stream-static left-semi verify join), so the same call runs
   * unchanged on a streaming DataFrame in append mode with no
   * watermark or state store. Within-batch repeat detection and
   * maximal-span merging need batch-global context — run the batch
   * form on micro-batch sinks (`foreachBatch`) when merged spans are
   * required downstream.
   */
  def indexGramHits(
      fresh: DataFrame,
      gramIndex: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      expectedItems: Long = graft.sketch.bloom.DefaultItems,
      fpp: Double = graft.sketch.bloom.DefaultFpp): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val occ = gramOccurrences(fresh, idCol, textCol, k)
    val pruned = graft.sketch.SketchOps
      .bloomPrune(occ, "__gh", gramIndex, "gh", expectedItems, fpp)
    pruned.join(gramIndex, pruned("__gh") === gramIndex("gh"), "left_semi")
      .select(F.col(idCol),
        F.col("__s").as("span_start"),
        F.col("__e").as("span_end"))
  }

  /**
   * SemDeDup (Abbas et al. 2023) semantic deduplication: k-means-
   * cluster the embedding space, verify exact cosine >= `threshold`
   * for pairs WITHIN a cluster only, connected-component the verified
   * pairs, and from every duplicate group keep the member LEAST
   * similar to its cluster centroid (the paper's keep-the-outlier
   * rule — near-centroid members are the redundant ones; ties break
   * on the id, so exact copies keep their lowest id). Returns the
   * surviving rows of `df`.
   *
   * Scale shape: the corpus never all-pairs joins — candidates exist
   * only within k-means cells (the SemDeDup observation that semantic
   * duplicates co-cluster), cells are capped like LSH buckets (drops
   * accumulator-counted and logged, never silent), centroids ride a
   * broadcast, and component labeling is the same iterated min-label
   * join as [[duplicateClusters]]. Recall is cell-bounded by
   * construction: a duplicate pair split across cells is missed, the
   * deliberate approximation of the method (identical vectors always
   * co-cluster, so exact-copy recall is 1.0).
   */
  def semanticDeduplicate(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int = 16,
      threshold: Double = 0.97,
      iterations: Int = 2,
      maxCluster: Int = DefaultMaxBucket): DataFrame = {
    require(nClusters >= 1, s"nClusters must be >= 1, got $nClusters")
    val idx = Similarity.buildIvfIndex(df, idCol, vecCol, nClusters, iterations)
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
    val assigned = idx.assigned
      .select(F.col("neighbor_id").as("__id"), F.col("__cv"), F.col("__cell"))
      .withColumn("__csim", csimU(F.col("__cv"), F.col("__cell")))
      .localCheckpoint(eager = false)
    val dropped = semanticDroppedIds(assigned, threshold, maxCluster)
      .select(F.col("__id").as(idCol))
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** The SemDeDup core over a PRECOMPUTED (__id, __cv, __cell, __csim)
    * assignment — shared by [[semanticDeduplicate]] and the
    * one-clustering D4 composition ([[Diversity.d4Pipeline]]). Returns
    * the ids to DROP (one `__id` column). */
  private[pipeline] def semanticDroppedIds(
      assigned: DataFrame,
      threshold: Double,
      maxCluster: Int = DefaultMaxBucket): DataFrame = {
    val sizes = assigned.groupBy(F.col("__cell"))
      .agg(F.count(F.lit(1)).as("__n"))
      .filter(F.col("__n") > 1)
    val allowed = capBuckets(sizes, F.col("__n"), maxCluster, "semantic")
      .select("__cell")
    val pruned = assigned.join(allowed, Seq("__cell"))
    val l = pruned.select(F.col("__id").as("id_a"), F.col("__cell"),
      F.col("__cv").as("__va"))
    val r = pruned.select(F.col("__id").as("id_b"), F.col("__cell"),
      F.col("__cv").as("__vb"))
    val pairs = l.join(r, Seq("__cell"))
      .filter(F.col("id_a") < F.col("id_b"))
      .filter(Similarity.cosine(F.col("__va"), F.col("__vb")) >= threshold)
      .select("id_a", "id_b")
      .localCheckpoint(eager = false)
    // the common incremental/clean-corpus case has NO qualifying pair:
    // one limit(1) probe replaces the whole clustering round-trip
    if (pairs.limit(1).isEmpty)
      return assigned.select(F.col("__id")).limit(0)
    val labeled = duplicateClusters(pairs)
      .join(assigned.select(F.col("__id").as("id"), F.col("__csim")), Seq("id"))
    val keepers = labeled.groupBy(F.col("cluster"))
      .agg(F.min(F.struct(F.col("__csim"), F.col("id"))).as("__k"))
      .select(F.col("__k.id").as("id"))
    labeled.select("id")
      .join(keepers, Seq("id"), "left_anti")
      .select(F.col("id").as("__id"))
  }

  /**
   * Incremental SemDeDup — the nightly shape of [[semanticDeduplicate]]:
   * a fresh vector batch probed against a PERSISTED
   * [[Similarity.IvfIndex]] of history (`Similarity.buildIvfIndex` +
   * `IvfIndex.save` / `Similarity.loadIvfIndex`). Each fresh vector
   * probes its `nprobe` nearest cells and exact cosine verifies
   * against the in-cell history vectors only. Returns verified
   * (id_new, id_old, cos) pairs with cos >= `threshold`; ids already
   * present in the index are excluded (no self-pairs).
   *
   * Scale shape: history never re-clusters or reshuffles — the
   * assignment parquet is partitioned by cell, so probing reads only
   * the touched cells, and the fresh batch rides a BROADCAST onto
   * them. Identical re-ingested vectors probe their own cell first, so
   * exact-copy recall is 1.0 at any `nprobe`.
   */
  def incrementalSemanticDuplicates(
      fresh: DataFrame,
      index: Similarity.IvfIndex,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nprobe: Int = 2): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val spark = fresh.sparkSession
    val cB = spark.sparkContext.broadcast(index.centroids)
    val probeU = F.udf((v: Array[Float]) =>
      Similarity.nearestCentroids(cB.value, v, nprobe))
    val probes = fresh.select(F.col(idCol).as("id_new"),
      F.col(vecCol).as("__qv"),
      F.explode(probeU(F.col(vecCol))).as("__cell"))
    index.assigned.join(F.broadcast(probes), "__cell")
      .withColumn("cos", Similarity.cosine(F.col("__qv"), F.col("__cv")))
      .filter(F.col("cos") >= threshold &&
        F.col("id_new") =!= F.col("neighbor_id"))
      .select(F.col("id_new"), F.col("neighbor_id").as("id_old"), F.col("cos"))
  }

  /**
   * Paragraph-level exact dedup — the Dolma/C4 granularity between
   * whole-document [[dropExactDuplicates]] and token-span
   * [[duplicateSpans]]: split each document on `sep`, drop every
   * paragraph whose text occurs >= `minCount` times corpus-wide
   * EXCEPT the globally first copy (lowest (id, position)), and
   * reconstruct the document joining survivors with `joinSep`.
   * Returns `df` with `textCol` rewritten plus a `paras_removed`
   * count; NULL text passes through with a NULL count.
   *
   * Scale shape: paragraphs shuffle as 8-byte xxhash64 keys, never
   * text (a collision over-removes one paragraph, odds ~n^2/2^65);
   * the groupBy partial-aggregates to one row per DISTINCT paragraph
   * and the duplicated sliver that joins back is AQE-broadcastable.
   * Per-doc reassembly groups on the id — bounded by document size.
   */
  def dedupParagraphs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\\n+",
      joinSep: String = "\n",
      minCount: Int = 2): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val reserved = Set("__p", "__pi", "__ph", "__text", "__total", "__kept")
    require(!df.columns.exists(reserved), s"column names $reserved are reserved")
    // paras feeds BOTH the dup aggregate and the mark join — pin one
    // materialization (the duplicateSpans occ rule) so the corpus is
    // split + exploded once, not once per side
    val paras = df
      .select(F.col(idCol), F.posexplode(
        F.filter(F.split(F.col(textCol), sep), p => F.length(p) > 0)))
      .select(F.col(idCol),
        (F.col("pos") + 1).cast("long").as("__pi"),
        F.col("col").as("__p"))
      .withColumn("__ph", F.xxhash64(F.col("__p")))
      .localCheckpoint(eager = false)
    val dup = paras.groupBy(F.col("__ph"))
      .agg(F.count(F.lit(1)).as("__c"),
           F.min(F.struct(F.col(idCol), F.col("__pi"))).as("__first"))
      .filter(F.col("__c") >= minCount)
      .select(F.col("__ph"), F.col("__first"))
    // totals, kept-count, and reconstruction in ONE per-doc aggregate:
    // collect_list skips the NULLs the `when` leaves on dropped
    // paragraphs, so the dup-marked rows fold in a single exchange
    val marked = paras.join(dup, Seq("__ph"), "left")
      .withColumn("__keep", F.col("__first").isNull ||
        (F.col(s"__first.$idCol") === F.col(idCol) &&
         F.col("__first.__pi") === F.col("__pi")))
    val out = marked.groupBy(F.col(idCol))
      .agg(F.count(F.lit(1)).as("__total"),
        F.sum(F.when(F.col("__keep"), 1L).otherwise(0L)).as("__kept"),
        F.array_join(
          F.transform(F.array_sort(F.collect_list(
            F.when(F.col("__keep"), F.struct(F.col("__pi"), F.col("__p"))))),
            s => s.getField("__p")), joinSep).as("__text"))
      .select(F.col(idCol), F.col("__text"),
        (F.col("__total") - F.col("__kept")).as("__removed"))
    df.join(out, Seq(idCol), "left")
      .withColumn("paras_removed",
        F.when(F.col(textCol).isNull, F.lit(null).cast("long"))
          .otherwise(F.coalesce(F.col("__removed"), F.lit(0L))))
      .withColumn(textCol,
        F.when(F.col(textCol).isNull, F.col(textCol))
          .otherwise(F.coalesce(F.col("__text"), F.lit(""))))
      .drop("__text", "__removed")
  }

  /**
   * Asymmetric containment detection — the quote/wrapper case Jaccard
   * (and MinHash-LSH, which targets Jaccard) structurally misses: a
   * 30-token quote inside a 1000-token page has Jaccard ~0.03 but
   * containment ~1.0. For each probe document p and corpus document c,
   * C(p, c) = |grams(p) ∩ grams(c)| / |grams(p)| over DISTINCT
   * lowercase word `gramSize`-grams, with corpus-side stop grams
   * (document frequency > `maxDf`) removed from both the intersection
   * and the denominator — boilerplate grams carry no provenance signal
   * and their posting lists are the gram join's only skew risk.
   *
   * 100 TB shape: probe grams equi-join the corpus posting list on a
   * 64-bit gram hash (the shuffle carries 8-byte hashes, never text;
   * text-equality semantics up to the ~n²/2⁶⁵ collision odds the
   * substring-dedup family already accepts). The df cap bounds every
   * posting list at `maxDf` rows, and the stop-gram set — tiny by
   * construction — rides broadcast anti-joins into both passes. The
   * probe side is the small side by design (a new batch, a quote
   * candidate set); history is scanned once and never re-shuffled
   * beyond the gram key.
   *
   * Returns (id_p, id_c, inter, sz_p) for pairs with
   * inter >= sz_p * threshold; self-pairs (shared ids between probe
   * and corpus) are excluded.
   */
  def containmentPairs(
      probe: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      gramSize: Int = 5,
      threshold: Double = 0.9,
      maxDf: Int = DefaultMaxBucket): DataFrame = {
    val index = buildContainmentIndex(corpus, idCol, textCol, gramSize, maxDf)
      .localCheckpoint(eager = false) // probe reads it twice; build the df scan once
    probeContainment(probe, index, idCol, textCol, gramSize, threshold)
  }

  private def containmentGrams(
      df: DataFrame, idCol: String, textCol: String,
      gramSize: Int, idAs: String): DataFrame =
    df.select(F.col(idCol).as(idAs),
        F.explode(F.array_distinct(
          TextFunctions.allWordNgrams(F.col(textCol), gramSize))).as("__g"))
      .select(F.col(idAs), F.xxhash64(F.col("__g")).as("h"))

  /**
   * Persistable containment index: rows (h LONG, id LONG) — live gram
   * postings, plus (h, NULL) marker rows for STOP grams (corpus
   * document frequency > `maxDf`). The markers must persist with the
   * postings: a probe needs them to take stop grams out of its
   * denominator, and they are exactly the grams whose posting lists
   * were dropped. ~8 bytes of key per distinct (gram, doc); text never
   * leaves the executors. Save/load with [[saveSignatureIndex]] /
   * [[loadSignatureIndex]] (plain parquet).
   */
  def buildContainmentIndex(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      gramSize: Int = 5,
      maxDf: Int = DefaultMaxBucket): DataFrame = {
    require(gramSize >= 1, s"gramSize must be >= 1, got $gramSize")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val cg = containmentGrams(corpus, idCol, textCol, gramSize, "id")
    val dfs = cg.groupBy("h").agg(F.count(F.lit(1)).as("__df"))
    val stop = dfs.filter(F.col("__df") > maxDf)
      .select(F.col("h"), F.lit(null).cast("long").as("id"))
    cg.join(F.broadcast(dfs.filter(F.col("__df") > maxDf).select("h")),
        Seq("h"), "left_anti")
      .select("h", "id")
      .unionByName(stop)
  }

  /**
   * Probe a [[buildContainmentIndex]] (freshly built or loaded from
   * parquet) with a new batch — the incremental quote-detection shape:
   * history is never re-shingled, the probe side grams once, the stop
   * set rides broadcast. Output and semantics match
   * [[containmentPairs]] exactly.
   */
  def probeContainment(
      probe: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      gramSize: Int = 5,
      threshold: Double = 0.9): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val pg = containmentGrams(probe, idCol, textCol, gramSize, "id_p")
    val stop = index.filter(F.col("id").isNull).select("h")
    val postings = index.filter(F.col("id").isNotNull)
      .select(F.col("h"), F.col("id").as("id_c"))
    val inter = pg.join(postings, "h")
      .groupBy("id_p", "id_c").agg(F.count(F.lit(1)).as("inter"))
    val szp = pg.join(F.broadcast(stop), Seq("h"), "left_anti")
      .groupBy("id_p").agg(F.count(F.lit(1)).as("sz_p"))
    inter.join(szp, "id_p")
      .filter(F.col("id_p") =!= F.col("id_c") &&
        F.col("inter") >= F.col("sz_p") * threshold)
      .select("id_p", "id_c", "inter", "sz_p")
  }

  /** Levenshtein distance <= 1, decided without the DP table: equal
    * strings are distance 0; otherwise lengths may differ by at most
    * 1, and one aligned scan over the first mismatch settles it. */
  private[graft] def editDistanceLeOne(a: String, b: String): Boolean = {
    if (a == b) return true
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (l.length - s.length > 1) return false
    var i = 0
    while (i < s.length && s.charAt(i) == l.charAt(i)) i += 1
    if (s.length == l.length) {
      var j = i + 1
      while (j < s.length && s.charAt(j) == l.charAt(j)) j += 1
      j == s.length // exactly one substitution
    } else {
      var j = i
      while (j < s.length && s.charAt(j) == l.charAt(j + 1)) j += 1
      j == s.length // one insertion in the longer
    }
  }

  /** xxhash-free deletion-neighborhood keys: FNV over the string with
    * position i skipped, each variant O(len) from the shared prefix
    * hashes — O(len²) time per row but only (len+1) LONGS leave it. */
  private[graft] def deletionHashes(s: String): Array[Long] = {
    val n = s.length
    val prefix = new Array[Long](n + 1)
    prefix(0) = 0xCBF29CE484222325L
    var i = 0
    while (i < n) {
      prefix(i + 1) = (prefix(i) ^ s.charAt(i).toLong) * 0x100000001B3L
      i += 1
    }
    val out = new Array[Long](n + 1)
    var skip = 0
    while (skip <= n) {
      var h = prefix(skip)
      var j = if (skip == n) n else skip + 1
      while (j < n) { h = (h ^ s.charAt(j).toLong) * 0x100000001B3L; j += 1 }
      out(skip) = TextFunctions.mix64(h)
      skip += 1
    }
    // skip == n hashes the full string: identical-string pairs bucket too
    out
  }

  /**
   * Exact edit-distance-<=1 similarity self-join — the fuzzy-key join
   * for titles, URLs, product names and other SHORT strings where one
   * typo/variant character separates duplicates. Guaranteed recall
   * for distance <= 1: two strings within one edit share at least one
   * deletion-neighborhood key (substitution → both drop position i;
   * insert/delete → the longer's deletion equals the shorter, whose
   * full-string hash is in its own neighborhood), so the bucket join
   * finds every pair and [[editDistanceLeOne]] verifies candidates
   * exactly. Returns (id_a, id_b) with id_a < id_b.
   *
   * Scale shape: (len+1) 64-bit keys per row shuffle — never the
   * O(len²) variant strings; buckets capped like every banded family.
   * Rows longer than `maxLen` are skipped (edit-1 is a key/title
   * notion; a 100 kB document one character off is a SUBSTRING-dedup
   * problem): skipped rows simply emit no keys, never an error.
   */
  def editOnePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxLen: Int = 256,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(maxLen >= 1, s"maxLen must be positive, got $maxLen")
    val delU = F.udf((s: String) =>
      if (s == null || s.length > maxLen) Array.empty[Long]
      else deletionHashes(s))
    val keyed = df.select(F.col(idCol).cast("long").as("__id"),
        F.col(strCol).as("__s"))
      .filter(F.col("__s").isNotNull)
      .select(F.col("__id"), F.col("__s"),
        F.explode(delU(F.col("__s"))).as("__k"))
    val grouped = keyed.groupBy(F.col("__k"))
      .agg(F.collect_list(F.struct(F.col("__id").as("id"), F.col("__s").as("s")))
        .as("__rows"))
      .filter(F.size(F.col("__rows")) > 1)
    val verifyU = F.udf((rows: Seq[org.apache.spark.sql.Row]) => {
      val arr = rows.map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var i = 0
      while (i < arr.length) {
        var j = i + 1
        while (j < arr.length) {
          if (arr(i)._1 != arr(j)._1 &&
              editDistanceLeOne(arr(i)._2, arr(j)._2))
            out += ((arr(i)._1, arr(j)._1))
          j += 1
        }
        i += 1
      }
      out.toSeq
    })
    capBuckets(grouped, F.size(F.col("__rows")), maxBucket, "editone")
      .select(F.explode(verifyU(F.col("__rows"))).as("__p"))
      .select(F.col("__p._1").as("id_a"), F.col("__p._2").as("id_b"))
      .distinct()
  }

  /**
   * Persistable deletion-hash index for INCREMENTAL edit-1 matching —
   * the nightly shape of [[editOnePairs]] (same contract as the other
   * `buildXxxIndex` families): history's (key, id, string) postings
   * are computed once; each new batch probes the index without
   * re-hashing history. Strings ride along because candidate
   * verification is exact — at `maxLen <= 256` a posting is bounded
   * and the index is (len+1) rows per history string.
   */
  def buildEditOneIndex(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxLen: Int = 256): DataFrame = {
    require(maxLen >= 1, s"maxLen must be positive, got $maxLen")
    val delU = F.udf((s: String) =>
      if (s == null || s.length > maxLen) Array.empty[Long]
      else deletionHashes(s))
    df.select(F.col(idCol).cast("long").as("id"), F.col(strCol).as("s"))
      .filter(F.col("s").isNotNull)
      .select(F.col("id"), F.col("s"), F.explode(delU(F.col("s"))).as("key"))
  }

  /**
   * Probe a [[buildEditOneIndex]] with a fresh batch: every
   * (batch id, history id) pair within edit distance 1. The batch
   * side explodes its own (len+1) keys and hash-joins the index;
   * exact verification on the joined strings. `maxLen` must match the
   * index build (a longer probe string can't have been indexed — its
   * keys simply find nothing).
   */
  def incrementalEditOnePairs(
      index: DataFrame,
      batch: DataFrame,
      idCol: String,
      strCol: String,
      maxLen: Int = 256): DataFrame = {
    val delU = F.udf((s: String) =>
      if (s == null || s.length > maxLen) Array.empty[Long]
      else deletionHashes(s))
    val probes = batch
      .select(F.col(idCol).cast("long").as("__bid"), F.col(strCol).as("__bs"))
      .filter(F.col("__bs").isNotNull)
      .select(F.col("__bid"), F.col("__bs"),
        F.explode(delU(F.col("__bs"))).as("key"))
    val okU = F.udf((a: String, b: String) => editDistanceLeOne(a, b))
    probes.join(index, "key")
      .filter(okU(F.col("__bs"), F.col("s")))
      .select(F.col("__bid").as("id_new"), F.col("id").as("id_old"))
      .distinct()
  }

  // -------------------------------------------------- edit distance <= k

  /** Levenshtein decision: distance <= k, two rolling rows with a
    * row-minimum early exit (once every cell of a row exceeds k no
    * later row can recover) — the verify kernel of the PassJoin
    * family. O(n·m) worst case, but only over the candidate sliver
    * and k-bounded rows exit early. */
  private[graft] def editDistanceAtMost(a: String, b: String, k: Int): Boolean = {
    if (a == b) return true
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (l.length - s.length > k) return false
    val n = s.length
    val prev = Array.tabulate(n + 1)(identity)
    val cur = new Array[Int](n + 1)
    var j = 1
    while (j <= l.length) {
      cur(0) = j
      var rowMin = cur(0)
      var i = 1
      while (i <= n) {
        val sub = prev(i - 1) +
          (if (s.charAt(i - 1) == l.charAt(j - 1)) 0 else 1)
        val del = cur(i - 1) + 1
        val ins = prev(i) + 1
        var best = sub
        if (del < best) best = del
        if (ins < best) best = ins
        cur(i) = best
        if (best < rowMin) rowMin = best
        i += 1
      }
      if (rowMin > k) return false
      System.arraycopy(cur, 0, prev, 0, n + 1)
      j += 1
    }
    prev(n) <= k
  }

  /** PassJoin even-partition scheme: `k + 1` disjoint segments of
    * `s`, shorter segments first — (segment, index, startPos). */
  private[graft] def passJoinSegments(
      s: String, k: Int): Seq[(String, Int, Int)] = {
    val parts = k + 1
    val l = s.length
    val base = l / parts
    val rem = l % parts
    val out = new scala.collection.mutable.ArrayBuffer[(String, Int, Int)](parts)
    var pos = 0
    var i = 0
    while (i < parts) {
      val len = if (i < parts - rem) base else base + 1
      out += ((s.substring(pos, pos + len), i, pos))
      pos += len
      i += 1
    }
    out.toSeq
  }

  private def segKey(sub: String, i: Int, l: Int): Long = {
    var h = 0xCBF29CE484222325L
    var j = 0
    while (j < sub.length) { h = (h ^ sub.charAt(j).toLong) * 0x100000001B3L; j += 1 }
    TextFunctions.mix64(h ^ (i.toLong << 40) ^ (l.toLong << 20))
  }

  /** Probe-side PassJoin keys for `t`: for every indexable source
    * length `l` within `k` of `|t|` and every segment of the
    * l-scheme, the substrings of `t` with that segment's length at
    * positions within ±k of the segment's — by pigeonhole, a string
    * within `k` edits of an indexed string of length `l` shares at
    * least one segment at such a position, so the bucket join has
    * GUARANTEED recall. O(k³) keys per row (5·3·5 ≈ 75 at k = 2). */
  private[graft] def passJoinProbeKeys(
      t: String, k: Int, maxLen: Int): Array[Long] = {
    val m = t.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var l = math.max(k + 1, m - k)
    val lMax = math.min(maxLen, m + k)
    while (l <= lMax) {
      // reconstruct the l-scheme's segment lengths/positions
      val parts = k + 1
      val base = l / parts
      val rem = l % parts
      var pos = 0
      var i = 0
      while (i < parts) {
        val len = if (i < parts - rem) base else base + 1
        var p = math.max(0, pos - k)
        val pHi = math.min(m - len, pos + k)
        while (p <= pHi) {
          out += segKey(t.substring(p, p + len), i, l)
          p += 1
        }
        pos += len
        i += 1
      }
      l += 1
    }
    out.distinct.toArray
  }

  /**
   * Persistable PassJoin segment index for edit-distance-<= k matching
   * (Li et al. 2011, "PassJoin") — the general-k sibling of
   * [[buildEditOneIndex]]: each history string of length `>= k + 1`
   * (and `<= maxLen`) contributes its `k + 1` even-partition segment
   * keys. Strings ride along for exact verification.
   */
  def buildEditKIndex(
      df: DataFrame,
      idCol: String,
      strCol: String,
      k: Int = 2,
      maxLen: Int = 256): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxLen >= k + 1, s"maxLen must be >= k + 1")
    val segU = F.udf((s: String) =>
      if (s == null || s.length < k + 1 || s.length > maxLen) Array.empty[Long]
      else passJoinSegments(s, k)
        .map { case (seg, i, _) => segKey(seg, i, s.length) }.toArray)
    df.select(F.col(idCol).cast("long").as("id"), F.col(strCol).as("s"))
      .filter(F.col("s").isNotNull)
      .select(F.col("id"), F.col("s"), F.explode(segU(F.col("s"))).as("key"))
  }

  /**
   * Probe a [[buildEditKIndex]] with a fresh batch: every
   * (batch id, history id) pair within edit distance `k`, verified
   * with the banded DP. `k`/`maxLen` must match the index build.
   * Guaranteed recall for indexed strings (length in
   * `[k + 1, maxLen]`) by the PassJoin pigeonhole. Stateless except
   * the final distinct, so the pre-distinct shape streams (pair with
   * `dropDuplicatesWithinWatermark` like the edit-1 stream).
   */
  def incrementalEditKPairs(
      index: DataFrame,
      batch: DataFrame,
      idCol: String,
      strCol: String,
      k: Int = 2,
      maxLen: Int = 256): DataFrame = {
    val probeU = F.udf((s: String) =>
      if (s == null || s.length > maxLen + k) Array.empty[Long]
      else passJoinProbeKeys(s, k, maxLen))
    val probes = batch
      .select(F.col(idCol).cast("long").as("__bid"), F.col(strCol).as("__bs"))
      .filter(F.col("__bs").isNotNull)
      .select(F.col("__bid"), F.col("__bs"),
        F.explode(probeU(F.col("__bs"))).as("key"))
    val okU = F.udf((a: String, b: String) => editDistanceAtMost(a, b, k))
    probes.join(index, "key")
      .filter(okU(F.col("__bs"), F.col("s")))
      .select(F.col("__bid").as("id_new"), F.col("id").as("id_old"))
      .distinct()
  }

  /** Self-join form: all unordered pairs within edit distance `k`
    * (ids `id_a < id_b`) — the fuzzy-key entity-resolution join.
    * Pairs NORMALIZE to (min, max) rather than filtering a direction:
    * a too-short-to-index string (length <= k) can still PROBE its
    * indexed partner, and that single direction must survive. */
  def editKPairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      k: Int = 2,
      maxLen: Int = 256): DataFrame = {
    val index = buildEditKIndex(df, idCol, strCol, k, maxLen)
    incrementalEditKPairs(index, df, idCol, strCol, k, maxLen)
      .filter(F.col("id_new") =!= F.col("id_old"))
      .select(F.least(F.col("id_new"), F.col("id_old")).as("id_a"),
        F.greatest(F.col("id_new"), F.col("id_old")).as("id_b"))
      .distinct()
  }

  // ------------------------------------------------------ CDC chunking

  /** Deterministic gear table for content-defined chunking: 256
    * mix64-derived longs, fixed seed — chunk boundaries are a pure
    * function of content, never of position or session. */
  private val cdcGear: Array[Long] =
    Array.tabulate(256)(b => TextFunctions.mix64(0x9E3779B97F4A7C15L ^ b.toLong))

  /** Content-defined chunk spans of one string (FastCDC-style gear
    * rolling hash): a boundary closes the current chunk when the
    * rolling hash's low `log2(avgSize)` bits are all zero AND the
    * chunk has reached `minSize`; `maxSize` force-splits. Returns
    * (start, endExclusive, chunkHash) triples covering the string
    * exactly; the final chunk may be shorter than `minSize`.
    *
    * Why CDC and not fixed windows: boundaries depend only on the
    * LOCAL bytes, so two documents sharing a long region re-align on
    * the same chunk grid within ~one average chunk of the region's
    * edge — an inserted prefix shifts nothing downstream. This is the
    * storage-dedup / partial-overlap primitive the gram-based
    * [[duplicateSpans]] family does not give (grams catch exact
    * k-windows; CDC catches "these two documents share most of their
    * bytes" at chunk granularity, robust to edits).
    */
  private[pipeline] def cdcSpans(
      t: String, minSize: Int, avgSize: Int, maxSize: Int): Array[(Int, Int, Long)] = {
    val mask = (avgSize - 1).toLong
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    val n = t.length
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + cdcGear(t.charAt(i) & 0xFF)
      val size = i - start + 1
      if ((size >= minSize && (h & mask) == 0L) || size >= maxSize || i == n - 1) {
        out += ((start, i + 1, chunkHash(t, start, i + 1)))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    out.toArray
  }

  /** 64-bit chunk content hash (first 8 bytes of the md5 of the
    * chunk's UTF-8 bytes, big-endian) — cross-doc equality only needs
    * a consistent JVM-side function; collisions are the usual
    * ~n²/2^65. */
  private def chunkHash(t: String, a: Int, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(t.substring(a, b)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  /**
   * Content-defined chunks of every document: (id, chunk_ix, start,
   * len, chunk_hash). Map-only (one UDF pass + posexplode); chunk
   * spans cover each document exactly in order. `avgSize` must be a
   * power of two (it is the boundary mask).
   */
  def cdcChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minSize: Int = 32,
      avgSize: Int = 64,
      maxSize: Int = 256): DataFrame = {
    require(avgSize >= 2 && (avgSize & (avgSize - 1)) == 0,
      s"avgSize must be a power of two, got $avgSize")
    require(minSize >= 1 && minSize <= avgSize && avgSize <= maxSize,
      s"need 1 <= minSize <= avgSize <= maxSize, got $minSize/$avgSize/$maxSize")
    val u = F.udf((t: String) =>
      if (t == null) null else cdcSpans(t, minSize, avgSize, maxSize))
    docs
      .select(F.col(idCol).as("id"), F.posexplode(u(F.col(textCol)))
        .as(Seq("chunk_ix", "__c")))
      .select(F.col("id"), F.col("chunk_ix"),
        F.col("__c._1").as("start"),
        (F.col("__c._2") - F.col("__c._1")).as("len"),
        F.col("__c._3").as("chunk_hash"))
  }

  /**
   * Chunks whose content appears in two or more DISTINCT documents:
   * (chunk_hash, n_docs, len) — the storage-dedup signal. One
   * map-side-combined exchange on the chunk hash; nothing is ever
   * all-pairs.
   */
  def duplicateChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minSize: Int = 32,
      avgSize: Int = 64,
      maxSize: Int = 256): DataFrame =
    cdcChunks(docs, idCol, textCol, minSize, avgSize, maxSize)
      .select(F.col("chunk_hash"), F.col("id"), F.col("len"))
      .distinct()
      .groupBy(F.col("chunk_hash"))
      .agg(F.count(F.lit(1)).as("n_docs"), F.max(F.col("len")).as("len"))
      .filter(F.col("n_docs") >= 2)

  /**
   * Document pairs sharing at least `minShared` distinct chunk
   * contents — partial-overlap detection robust to edits (a copy with
   * a rewritten intro still shares every interior chunk of the body).
   * Bucketed by chunk hash with a `maxBucket` cap (accumulator-free
   * analogue of [[hammingPairs]]'s dial: a chunk shared by THOUSANDS
   * of documents is boilerplate, not provenance — cap it out rather
   * than quadratically pairing); pairs normalized (id_a < id_b).
   */
  def chunkOverlapPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minShared: Int = 2,
      minSize: Int = 32,
      avgSize: Int = 64,
      maxSize: Int = 256,
      maxBucket: Int = 64): DataFrame = {
    val chunks = cdcChunks(docs, idCol, textCol, minSize, avgSize, maxSize)
      .select(F.col("chunk_hash"), F.col("id")).distinct()
    val grouped = chunks.groupBy(F.col("chunk_hash"))
      .agg(F.collect_list(F.col("id")).as("__ids"))
      .filter(F.size(F.col("__ids")) > 1)
    // the cap is accumulator-counted and logged (capBuckets — caps are
    // never silent); the QUERYABLE drop report is [[chunkCapReport]]
    val buckets = capBuckets(grouped, F.size(F.col("__ids")), maxBucket, "cdc")
    val pairU = F.udf((ids: Seq[Long]) => {
      val s = ids.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var i = 0
      while (i < s.length) {
        var j = i + 1
        while (j < s.length) { out += ((s(i), s(j))); j += 1 }
        i += 1
      }
      out.toArray
    })
    buckets
      .select(F.explode(pairU(F.col("__ids"))).as("__p"))
      .select(F.col("__p._1").as("id_a"), F.col("__p._2").as("id_b"))
      .groupBy(F.col("id_a"), F.col("id_b"))
      .agg(F.count(F.lit(1)).as("shared_chunks"))
      .filter(F.col("shared_chunks") >= minShared)
  }

  /**
   * Persistable CDC chunk index: one row per distinct (chunk_hash, id)
   * for chunks shared by at most `maxBucket` documents — a chunk in
   * thousands of documents is boilerplate, not provenance, and capping
   * it keeps probe fanout bounded (the [[chunkOverlapPairs]] dial).
   * Flat parquet via [[saveSignatureIndex]] (id-bearing rows →
   * [[removeFromSavedIndex]] takedowns work unchanged).
   */
  def buildChunkIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minSize: Int = 32,
      avgSize: Int = 64,
      maxSize: Int = 256,
      maxBucket: Int = 64): DataFrame = {
    // ch feeds both the size aggregate and the cap join — pin one
    // materialization or the gear-hash chunking pass runs twice
    val ch = cdcChunks(docs, idCol, textCol, minSize, avgSize, maxSize)
      .select(F.col("chunk_hash"), F.col("id")).distinct()
      .localCheckpoint(eager = false)
    val sizes = ch.groupBy(F.col("chunk_hash"))
      .agg(F.count(F.lit(1)).as("__n"))
    val ok = capBuckets(sizes, F.col("__n"), maxBucket, "chunkindex")
      .select(F.col("chunk_hash"))
    ch.join(ok, Seq("chunk_hash"))
  }

  /** One-row report over a (bucket, __n) size frame of what a
    * `maxBucket` cap DROPS: (n_buckets_dropped, n_candidates_dropped,
    * max_bucket_size) — `n_candidates_dropped` is the pair count the
    * dropped buckets would have generated (n·(n−1)/2 each, long
    * shift-math), i.e. the dedup-recall error bar the cap trades away.
    * Empty when nothing exceeds the cap. */
  private def capReport(sizes: DataFrame, maxBucket: Int): DataFrame = {
    val over = sizes.filter(F.col("__n") > maxBucket)
    over.agg(
      F.count(F.lit(1)).as("n_buckets_dropped"),
      F.coalesce(
        F.sum(F.shiftright(F.col("__n") * (F.col("__n") - F.lit(1L)), 1)),
        F.lit(0L)).as("n_candidates_dropped"),
      F.coalesce(F.max(F.col("__n")), F.lit(0L)).as("max_bucket_size"))
  }

  /** The QUERYABLE drop report behind [[chunkOverlapPairs]] /
    * [[buildChunkIndex]]'s `maxBucket` dial (the
    * frequentSegmentSetCapped rule — no silent caps): how many chunk
    * buckets the cap drops, how many candidate pairs that forgoes, and
    * the largest flooded bucket. Run it alongside the pair query when
    * the capped fraction matters (it IS the recall error bar at crawl
    * scale; see SCALING.md). */
  def chunkCapReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minSize: Int = 32,
      avgSize: Int = 64,
      maxSize: Int = 256,
      maxBucket: Int = 64): DataFrame =
    capReport(
      cdcChunks(docs, idCol, textCol, minSize, avgSize, maxSize)
        .select(F.col("chunk_hash"), F.col("id")).distinct()
        .groupBy(F.col("chunk_hash"))
        .agg(F.count(F.lit(1)).as("__n")),
      maxBucket)

  /** [[chunkCapReport]]'s sibling for [[hammingPairs]] /
    * [[buildHashIndex]]: drop report over the (band, bits) buckets of
    * a 64-bit signature column at the given geometry. A single flooded
    * signature shows up once per band (`bands` buckets). */
  def hammingCapReport(
      df: DataFrame,
      idCol: String,
      hashCol: String,
      bands: Int = 8,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must be >= 2 and divide 64, got $bands")
    capReport(
      df.filter(F.col(hashCol).isNotNull)
        .select(F.col(idCol),
          F.explode(chunkCols(F.col(hashCol).cast("long"), bands)).as("__c"))
        .groupBy(F.col("__c._1"), F.col("__c._2"))
        .agg(F.count(F.lit(1)).as("__n")),
      maxBucket)
  }

  /**
   * Incremental partial-overlap detection — the nightly-batch shape
   * for the CDC family: a FRESH batch's chunks probe a persisted
   * [[buildChunkIndex]]; history text is never re-read or re-chunked.
   * Returns (id_new, id_old, shared_chunks) pairs with
   * `shared_chunks >= minShared`. One shuffle join on the chunk hash;
   * the index side arrives pre-capped.
   */
  def incrementalChunkOverlap(
      fresh: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      minShared: Int = 2,
      minSize: Int = 32,
      avgSize: Int = 64,
      maxSize: Int = 256): DataFrame =
    cdcChunks(fresh, idCol, textCol, minSize, avgSize, maxSize)
      .select(F.col("chunk_hash"), F.col("id").as("id_new")).distinct()
      .join(index.select(F.col("chunk_hash"), F.col("id").as("id_old")),
        Seq("chunk_hash"))
      .filter(F.col("id_new") =!= F.col("id_old"))
      .groupBy(F.col("id_new"), F.col("id_old"))
      .agg(F.count(F.lit(1)).as("shared_chunks"))
      .filter(F.col("shared_chunks") >= minShared)

  /**
   * Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
   * MOSS scheme): hash every word `k`-gram, slide a `w`-window over
   * the hash sequence, keep the RIGHTMOST minimal hash per window,
   * and drop consecutive repeats. The selection guarantee: any run of
   * `w + k - 1` shared tokens between two documents shares at least
   * one fingerprint (selection depends only on window content, so the
   * same content picks the same relative position), while expected
   * density is ~2/(w+1) of the grams — the position-robust
   * fingerprinting used for plagiarism/provenance detection, sitting
   * between full-shingle indexes (dense) and MinHash (no positions).
   *
   * One map-only pass: grams and hashes are Column transforms, the
   * per-document selection is an O(n) monotonic-deque kernel in one
   * UDF (docs shorter than `w` grams winnow as a single window).
   * Returns (id, pos, fp) — `pos` the 0-based gram position, `fp`
   * xxhash64 of the gram. Fingerprint rows are what you index: ~2/w
   * of the gram table, id-bearing (flat [[saveSignatureIndex]] family
   * → takedowns work unchanged).
   */
  def winnowFingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val selU = F.udf((hs: Seq[Long]) => {
      val n = if (hs == null) 0 else hs.length
      if (n == 0) Array.empty[(Int, Long)]
      else {
        val win = math.min(w, n)
        val idx = new Array[Int](n)
        var head = 0
        var tail = 0
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
        var lastSel = -1
        var i = 0
        while (i < n) {
          // pop >= (not >) so a later equal hash replaces an earlier
          // one: the deque front is always the RIGHTMOST min
          while (tail > head && hs(idx(tail - 1)) >= hs(i)) tail -= 1
          idx(tail) = i
          tail += 1
          if (idx(head) <= i - win) head += 1
          if (i >= win - 1) {
            val s = idx(head)
            if (s != lastSel) {
              out += ((s, hs(s)))
              lastSel = s
            }
          }
          i += 1
        }
        out.toArray
      }
    })
    val grams = TextFunctions.allWordNgrams(F.col(textCol), k)
    docs
      .filter(F.col(textCol).isNotNull)
      .select(F.col(idCol).cast("long").as("id"),
        F.explode(selU(F.transform(grams, g => F.xxhash64(g)))).as("__s"))
      .select(F.col("id"), F.col("__s._1").as("pos"), F.col("__s._2").as("fp"))
  }

  /**
   * Document-overlap pairs by shared winnowing fingerprints — the
   * [[chunkOverlapPairs]] shape on the winnowed gram table: distinct
   * (fp, id), capped fp buckets (a fingerprint in > `maxBucket` docs
   * is boilerplate, and the drop is accumulator-counted, never
   * silent), within-bucket pairs, `shared_fps >= minShared`. Detects
   * any shared run of >= (minShared - 1) * w + w + k - 1 tokens by
   * the winnowing guarantee.
   */
  def winnowOverlapPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 8,
      minShared: Int = 2,
      maxBucket: Int = 64): DataFrame = {
    // repartition(fp) up front: HashPartitioning(fp) satisfies both
    // the (fp, id) distinct's clustering and the fp bucket groupBy's,
    // so dedupe -> bucket rides ONE exchange
    val fps = winnowFingerprints(docs, idCol, textCol, k, w)
      .select(F.col("fp"), F.col("id"))
      .repartition(F.col("fp"))
      .distinct()
    val grouped = fps.groupBy(F.col("fp"))
      .agg(F.collect_list(F.col("id")).as("__ids"))
      .filter(F.size(F.col("__ids")) > 1)
    val buckets = capBuckets(grouped, F.size(F.col("__ids")), maxBucket, "winnow")
    val pairU = F.udf((ids: Seq[Long]) => {
      val s = ids.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var i = 0
      while (i < s.length) {
        var j = i + 1
        while (j < s.length) { out += ((s(i), s(j))); j += 1 }
        i += 1
      }
      out.toArray
    })
    buckets
      .select(F.explode(pairU(F.col("__ids"))).as("__p"))
      .select(F.col("__p._1").as("id_a"), F.col("__p._2").as("id_b"))
      .groupBy(F.col("id_a"), F.col("id_b"))
      .agg(F.count(F.lit(1)).as("shared_fps"))
      .filter(F.col("shared_fps") >= minShared)
  }

  /** Persistable winnowing index: distinct (fp, id) rows for
    * fingerprints shared by at most `maxBucket` documents — the
    * [[buildChunkIndex]] twin; flat parquet via [[saveSignatureIndex]]
    * so [[removeFromSavedIndex]] takedowns work unchanged. */
  def buildWinnowIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 8,
      maxBucket: Int = 64): DataFrame = {
    // fps feeds both the size aggregate and the cap join — pin one
    // materialization or the winnowing selection pass runs twice
    val fps = winnowFingerprints(docs, idCol, textCol, k, w)
      .select(F.col("fp"), F.col("id"))
      .repartition(F.col("fp"))
      .distinct()
      .localCheckpoint(eager = false)
    val sizes = fps.groupBy(F.col("fp")).agg(F.count(F.lit(1)).as("__n"))
    val ok = capBuckets(sizes, F.col("__n"), maxBucket, "winnowindex")
      .select(F.col("fp"))
    fps.join(ok, Seq("fp"))
  }

  /** Nightly-delta winnowing overlap: fresh documents' fingerprints
    * probed against a persisted [[buildWinnowIndex]] — only the delta
    * is tokenized and winnowed (the [[incrementalChunkOverlap]]
    * discipline). */
  def incrementalWinnowOverlap(
      fresh: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 8,
      minShared: Int = 2): DataFrame =
    winnowFingerprints(fresh, idCol, textCol, k, w)
      .select(F.col("fp"), F.col("id").as("id_new")).distinct()
      .join(index.select(F.col("fp"), F.col("id").as("id_old")), Seq("fp"))
      .filter(F.col("id_new") =!= F.col("id_old"))
      .groupBy(F.col("id_new"), F.col("id_old"))
      .agg(F.count(F.lit(1)).as("shared_fps"))
      .filter(F.col("shared_fps") >= minShared)

  /**
   * Duplicate DOWNWEIGHTING — the soft alternative to
   * [[dropNearDuplicates]]: every document outside a near-dup cluster
   * is kept, and each member of a cluster survives with probability
   * 1/|cluster| (expected ONE copy per cluster), so heavily duplicated
   * boilerplate keeps proportional representation instead of a single
   * arbitrary winner or total deletion — the duplicate-aware sampling
   * used when hard dedup is measured to hurt (cf. the "deduplicating
   * training data makes language models better" ablations).
   *
   * Fully deterministic and engine-replayable: the keep rule is
   * [[Sampling.weightedSample]]'s md5-threshold with weight = 1/size
   * (threshold = round(65536/size) rendered %04x), so any SQL engine
   * reproduces the exact survivor set from the cluster sizes.
   * Cluster discovery is the banded-LSH + propagation machinery —
   * nothing here is all-pairs.
   */
  def downweightDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      threshold: Double = 0.8,
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val pairs = nearDuplicatePairs(docs, idCol, textCol, shingleSize,
      threshold, bands, rowsPerBand)
    val clusters = duplicateClusters(pairs)
    val sizes = clusters
      .groupBy(F.col("cluster")).agg(F.count(F.lit(1)).as("__sz"))
    val byDoc = clusters.join(sizes, "cluster")
      .select(F.col("id").as("__did"), F.col("__sz"))
    // NOT broadcast: on a real crawl the clustered slice can be a
    // third of the corpus — a plain keyed join (AQE broadcasts it when
    // it is actually small)
    val joined = docs.join(byDoc,
      docs(idCol) === F.col("__did"), "left")
    Sampling.weightedSample(joined, docs(idCol),
        F.lit(1.0) / F.coalesce(F.col("__sz"), F.lit(1L)).cast("double"))
      .drop("__did", "__sz")
  }

  /**
   * Continuous partial-overlap detection: a foreachBatch sink running
   * [[incrementalChunkOverlap]] per micro-batch against the persisted
   * chunk index and landing each batch's pairs under its own
   * `__batch` partition with dynamic overwrite — a replayed
   * micro-batch replaces exactly its own results (effectively-once),
   * the streaming twin of the CDC family. Read the results with a
   * plain parquet scan (drop `__batch`). One streaming writer per
   * `outPath`.
   */
  def streamChunkOverlap(
      stream: DataFrame,
      indexPath: String,
      outPath: String,
      idCol: String,
      textCol: String,
      minShared: Int = 2,
      minSize: Int = 32,
      avgSize: Int = 64,
      maxSize: Int = 256)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val pairs = incrementalChunkOverlap(batch,
          loadSignatureIndex(spark, indexPath), idCol, textCol,
          minShared, minSize, avgSize, maxSize)
        if (!pairs.isEmpty)
          pairs.withColumn("__batch", F.lit(batchId))
            .repartition(1)
            .write.partitionBy("__batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(outPath)
        ()
    }

  /** Streaming twin of [[incrementalWinnowOverlap]] (the
    * [[streamChunkOverlap]] protocol): each micro-batch winnows only
    * its own documents, probes the persisted [[buildWinnowIndex]], and
    * dynamic-overwrites its own `__batch` partition of the pair
    * results — a crash-replay rewrites exactly its own files, so the
    * output is replay-idempotent. */
  def streamWinnowOverlap(
      stream: DataFrame,
      indexPath: String,
      outPath: String,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 8,
      minShared: Int = 2)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val pairs = incrementalWinnowOverlap(batch,
          loadSignatureIndex(spark, indexPath), idCol, textCol, k, w, minShared)
        if (!pairs.isEmpty)
          pairs.withColumn("__batch", F.lit(batchId))
            .repartition(1)
            .write.partitionBy("__batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(outPath)
        ()
    }

  /**
   * The banding s-curve's 50%-detection threshold for a
   * (bands, rowsPerBand) split: t with 1 - (1 - t^r)^b = 1/2 is
   * approximately (1/b)^(1/r) — the standard LSH tuning identity
   * (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch. 3).
   */
  def sCurveThreshold(bands: Int, rowsPerBand: Int): Double =
    math.pow(1.0 / bands, 1.0 / rowsPerBand)

  /**
   * Auto-tune the minhash banding split: among all (bands, rows)
   * factorizations of `numHashes`, the pair whose s-curve threshold
   * sits closest to `targetJaccard` (ties -> fewer bands, i.e. the
   * cheaper candidate volume). Driver-side integer enumeration over
   * the divisors of numHashes — deterministic, no search.
   *
   * This replaces hand-picked (32, 4)-style dials with the question a
   * user can actually answer ("which Jaccard counts as a duplicate?"):
   * pass the returned pair to [[minhashCandidates]] /
   * [[dropNearDuplicates]] and near-duplicate detection centers on
   * the stated similarity.
   */
  def chooseBandsRows(numHashes: Int, targetJaccard: Double): (Int, Int) = {
    require(numHashes > 0, s"numHashes must be positive, got $numHashes")
    require(targetJaccard > 0 && targetJaccard < 1,
      s"targetJaccard in (0,1), got $targetJaccard")
    val pairs = (1 to numHashes)
      .filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
    pairs.minBy { case (b, r) =>
      (math.abs(sCurveThreshold(b, r) - targetJaccard), b) }
  }
}
