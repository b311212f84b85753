package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, functions => F}

/**
 * Binary (sign-bit) vector quantization for approximate nearest-
 * neighbor search: 1 bit per dimension, hamming distance as the
 * coarse score, exact-cosine rerank of a bounded candidate pool —
 * the "binary quantization" family modern vector stores ship next to
 * IVF/PQ/HNSW (32x smaller than float32, XOR+popcount distances).
 *
 * Scale shape: the coarse pass is a LINEAR SCAN of packed bits — a
 * map-only pass over the corpus with the query batch broadcast, the
 * per-query pool window shuffling only (query_id, neighbor_id,
 * hamming) triples (never the vectors), and the exact rerank touching
 * only `poolSize` rows per query. That is the honest BQ contract: no
 * index build, no training, recall bounded by how well coordinate
 * signs preserve angular order (near-perfect for zero-centered
 * embeddings; see `center`). For sub-linear candidate generation use
 * the IVF/HNSW families — BQ's niche is cheap full-scan distances and
 * tiny memory.
 *
 * Signature geometry: bit (i mod 64) of word (i / 64) is set iff
 * vec(i) > threshold(i). With dim <= 64 (one word) the hamming hot
 * path is native `bit_count(xor)` inside whole-stage codegen; wider
 * vectors fall back to a per-word zip (interpreted, still one pass).
 */
object BinaryQuant {

  /** 64-bit words needed for `dim` sign bits. */
  def wordsFor(dim: Int): Int = (dim + 63) / 64

  private def signUdf(thresholds: Array[Double]) =
    F.udf((v: Seq[Float]) => {
      if (v == null) null
      else {
        val words = new Array[Long](wordsFor(v.length))
        var i = 0
        while (i < v.length) {
          val t = if (thresholds == null || i >= thresholds.length) 0.0
                  else thresholds(i)
          if (v(i) > t) words(i >> 6) |= (1L << (i & 63))
          i += 1
        }
        words
      }
    })

  /** Sign signature of a float-array column: array<long>, bit
    * (i mod 64) of word (i / 64) set iff vec(i) > 0. NULL in, NULL
    * out. The packed form feeds [[hammingCol]] and interops with the
    * banded-bucket index family (Dedup.hammingPairs takes any 64-bit
    * signature — pass one word at a time). */
  def signBits(vec: Column): Column = signUdf(null)(vec)

  /** Hamming distance between equal-length word-array signatures.
    * `words == 1` specializes to native bit_count(xor) (codegen). */
  def hammingCol(a: Column, b: Column, words: Int): Column =
    if (words == 1)
      F.bit_count(F.element_at(a, 1).bitwiseXOR(F.element_at(b, 1))).cast("int")
    else
      F.aggregate(
        F.zip_with(a, b, (x, y) => F.bit_count(x.bitwiseXOR(y)).cast("int")),
        F.lit(0), (acc, x) => acc + x)

  /**
   * Binary-quantized top-k: hamming-coarse scan, exact-cosine rerank.
   *
   * `center = true` thresholds each dimension at its corpus mean
   * (one bounded vec_sum aggregate, d doubles broadcast as literals)
   * instead of 0 — the standard fix when coordinates are not
   * zero-centered and sign bits would all agree. Means are parallel
   * float sums, so centered signatures are deterministic within a
   * call but not bit-stable across cluster layouts; identical vectors
   * still always collide (hamming 0) under any threshold vector.
   *
   * Returns (query_id, rank, neighbor_id, cos) like every ANN top-k
   * here; self-pairs (equal ids) are excluded. Recall is the pool
   * dial: an exact copy has hamming 0 and is always pooled (ties
   * broken by neighbor_id, deterministic).
   */
  /** Persistable signature table: (id, sig) — 1/32 the bytes of a
    * float32 embedding column. Save flat ([[Dedup.saveSignatureIndex]]
    * family: id-bearing rows, takedowns via removeFromSavedIndex work
    * unchanged); [[binaryTopKIndexed]]'s coarse pass then scans ONLY
    * this table — the actual 32x IO win at corpus scale — and touches
    * the embeddings table for the bounded rerank pool alone.
    * Signatures are the zero-threshold form (uncentered): centering
    * thresholds are an ingest-time transform, and persisting them
    * alongside would let index and query drift apart. */
  def buildBinarySignatures(
      corpus: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    corpus.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).cast("long").as("id"),
        signBits(F.col(vecCol)).as("sig"))

  /**
   * [[binaryTopK]] against a persisted [[buildBinarySignatures]]
   * table: the hamming scan reads the bit table only; vectors rejoin
   * from `corpus` for the `poolSize`-bounded exact rerank. Identical
   * results to the one-shot form (same signatures, same tie-breaks).
   */
  def binaryTopKIndexed(
      sigs: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      poolSize: Int = 1000): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(poolSize >= k, s"poolSize ($poolSize) must be >= k ($k)")
    val wordsRow = sigs.select(F.size(F.col("sig")).as("w")).limit(1).collect()
    if (wordsRow.isEmpty)
      return emptyResult(corpus)
    val words = wordsRow.head.getInt(0)
    val q = queries.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).cast("long").as("query_id"),
        F.col(vecCol).as("__qv"), signBits(F.col(vecCol)).as("__qsig"))
    val pool = coarseRanked(sigs,
        q.select(F.col("query_id"), F.col("__qsig")), words)
      .filter(F.col("__pr") <= poolSize)
      .select("query_id", "neighbor_id")
    val c = corpus.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).cast("long").as("neighbor_id"), F.col(vecCol).as("__cv"))
    rerank(c, q.select(F.col("query_id"), F.col("__qv")), pool, k)
  }

  /** The ONE coarse-ranking builder (hamming asc, neighbor_id asc) —
    * query probes and pool calibration must replay the identical rule
    * (the bm25Weight one-builder lesson). Returns
    * (query_id, neighbor_id, __pr). */
  private def coarseRanked(
      sigs: DataFrame, q: DataFrame, words: Int): DataFrame = {
    val slim = sigs.select(F.col("id").as("neighbor_id"), F.col("sig").as("__csig"))
      .crossJoin(F.broadcast(q))
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        hammingCol(F.col("__csig"), F.col("__qsig"), words).as("hamming"))
    val wPool = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("hamming").asc, F.col("neighbor_id").asc)
    slim.withColumn("__pr", F.row_number().over(wPool))
      .select("query_id", "neighbor_id", "__pr")
  }

  /**
   * Measure the pool → recall@k curve ([[Similarity.PoolCalibration]])
   * of the zero-threshold signature family — the persisted
   * ([[buildBinarySignatures]]) and default one-shot query path. A
   * bounded hash-ordered sample brute-forces its exact top-k once,
   * then ONE coarse ranking pass records each true neighbor's hamming
   * rank; recall at pool P follows by counting. Deterministic replay:
   * [[binaryTopKIndexed]] computes the identical coarse ranking.
   */
  def calibratePool(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nSample: Int = 64,
      grid: Seq[Int] = Similarity.DefaultPoolGrid)
      : Similarity.PoolCalibration = {
    val sample = Similarity.poolCalibrationSample(corpus, idCol, vecCol, nSample)
    val truth = Similarity.bruteForceTopK(corpus, sample, idCol, vecCol, k)
      .select(F.col("query_id").cast("long").as("query_id"),
        F.col("neighbor_id").cast("long").as("neighbor_id"))
      .localCheckpoint(eager = false)
    val sigs = buildBinarySignatures(corpus, idCol, vecCol)
    val wordsRow = sigs.select(F.size(F.col("sig")).as("w")).limit(1).collect()
    require(wordsRow.nonEmpty, "calibratePool: empty corpus")
    val q = sample.select(F.col(idCol).cast("long").as("query_id"),
      signBits(F.col(vecCol)).as("__qsig"))
    val ranks = coarseRanked(sigs, q, wordsRow.head.getInt(0))
      .join(truth, Seq("query_id", "neighbor_id"))
      .select(F.col("__pr").cast("long")).collect().map(_.getLong(0)).toSeq
    Similarity.poolCurveFromRanks(ranks, truth.count(), k, grid)
  }

  /** [[binaryTopK]] with the pool solved from a requested recall
    * target via the measured curve — the pool-family analogue of
    * [[Similarity.ivfTopKTarget]]. */
  def binaryTopKTarget(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      targetRecall: Double,
      cal: Similarity.PoolCalibration): DataFrame =
    binaryTopK(corpus, queries, idCol, vecCol, k,
      poolSize = math.max(cal.poolFor(targetRecall), k))

  private def emptyResult(df: DataFrame): DataFrame =
    df.sparkSession.emptyDataFrame
      .select(F.lit(0L).as("query_id"), F.lit(0).as("rank"),
        F.lit(0L).as("neighbor_id"), F.lit(0.0).as("cos"))
      .limit(0)

  private def rerank(
      c: DataFrame, q: DataFrame, pool: DataFrame, k: Int): DataFrame = {
    val withVecs = c.join(F.broadcast(pool), "neighbor_id")
      .join(F.broadcast(q), "query_id")
      .withColumn("cos", Similarity.cosine(F.col("__qv"), F.col("__cv")))
    val wK = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    withVecs.withColumn("rank", F.row_number().over(wK))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  def binaryTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      poolSize: Int = 1000,
      center: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(poolSize >= k, s"poolSize ($poolSize) must be >= k ($k)")
    val dimRow = corpus.filter(F.col(vecCol).isNotNull)
      .select(F.size(F.col(vecCol)).as("d")).limit(1).collect()
    val dim = if (dimRow.isEmpty) 0 else dimRow.head.getInt(0)
    if (dim == 0) return emptyResult(corpus)
    val thr: Array[Double] =
      if (!center) null
      else {
        val row = corpus.filter(F.col(vecCol).isNotNull)
          .agg(F.count(F.lit(1)).as("n"),
               VectorAgg.vec_sum(F.transform(F.col(vecCol), _.cast("double")))
                 .as("sx"))
          .collect().head
        val n = math.max(row.getLong(0), 1L).toDouble
        row.getSeq[Double](1).toArray.map(_ / n)
      }
    val sigU = signUdf(thr)
    val words = wordsFor(dim)
    val c = corpus.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"),
        sigU(F.col(vecCol)).as("__csig"))
    val q = queries.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"),
        sigU(F.col(vecCol)).as("__qsig"))
    // coarse pass: signatures only — the window shuffles 3 scalars/row
    val slim = c.select(F.col("neighbor_id"), F.col("__csig"))
      .crossJoin(F.broadcast(q.select(F.col("query_id"), F.col("__qsig"))))
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        hammingCol(F.col("__csig"), F.col("__qsig"), words).as("hamming"))
    val wPool = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("hamming").asc, F.col("neighbor_id").asc)
    val pool = slim.withColumn("__pr", F.row_number().over(wPool))
      .filter(F.col("__pr") <= poolSize)
      .select("query_id", "neighbor_id")
    // rerank: pool is |queries| x poolSize — broadcast it onto the
    // corpus scan for the vector fetch, then one tiny window
    rerank(c.select(F.col("neighbor_id"), F.col("__cv")),
      q.select(F.col("query_id"), F.col("__qv")), pool, k)
  }
}
