package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, functions => F}

/**
 * Matryoshka (dimension-prefix) retrieval: coarse-score candidates
 * with only the FIRST `dPrime` dimensions of each embedding, then
 * exact-rerank a bounded pool with the full vectors — the serving
 * pattern for Matryoshka Representation Learning embeddings
 * (Kusupati et al. 2022), where models are trained so every prefix of
 * the embedding is itself a usable representation.
 *
 * This is the remaining compression rung next to binary (32x), SQ8
 * (4x), and PQ: a dim-prefix table at d'/d of the bytes with NO
 * training, NO codebook, and graceful quality decay as d' shrinks.
 * Unlike PQ/SQ8 the coarse score is a true cosine (of the prefix), so
 * the machinery is the plain brute-force kernel over narrower
 * vectors.
 *
 * Scale shape (mirrors [[BinaryQuant.binaryTopKIndexed]]): the coarse
 * pass scans ONLY the d'-dim table with the query batch broadcast;
 * the per-query pool window ships (query_id, neighbor_id, tcos)
 * triples — never vectors — and Spark 4's partial WindowGroupLimit
 * prunes the pool per-partition before the shuffle; full vectors
 * rejoin for the `poolSize`-bounded exact rerank only.
 *
 * Exactness contract (the q_ann_binary family): with
 * `poolSize >= corpus` every candidate is pooled regardless of its
 * truncated score, so the result is row-for-row
 * [[Similarity.bruteForceTopK]] (same cosine kernel, same
 * (cos DESC, neighbor_id ASC) tie-break). At bounded pools recall is
 * the d'/pool dial — measured in bench telemetry, floor-gated.
 */
object Matryoshka {

  /** First-`dPrime`-dims prefix of a float-vector column. */
  def truncate(vec: Column, dPrime: Int): Column =
    F.slice(vec, 1, dPrime)

  /** Persistable dim-prefix table: (id, tvec) with tvec the first
    * `dPrime` dims — d'/d of the embedding bytes; the coarse pass
    * reads only this. Flat id-bearing rows: the
    * [[Dedup.saveSignatureIndex]] save/takedown family applies
    * unchanged. */
  def buildTruncatedTable(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dPrime: Int): DataFrame = {
    require(dPrime > 0, s"dPrime must be positive, got $dPrime")
    corpus.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).cast("long").as("id"),
        truncate(F.col(vecCol), dPrime).as("tvec"))
  }

  /**
   * Truncated-coarse + exact-rerank top-k against a
   * [[buildTruncatedTable]] prefix table. Returns
   * (query_id, rank, neighbor_id, cos) — full-precision cosines,
   * self-pairs excluded, ties by neighbor_id.
   */
  def truncatedTopKIndexed(
      prefixes: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dPrime: Int,
      k: Int,
      poolSize: Int = 1000): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(poolSize >= k, s"poolSize ($poolSize) must be >= k ($k)")
    val q = queries.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).cast("long").as("query_id"),
        truncate(F.col(vecCol), dPrime).as("__qt"),
        F.col(vecCol).as("__qv"))
    // coarse: prefix-table scan, query batch broadcast; only triples
    // cross the pool window
    val coarse = prefixes
      .crossJoin(F.broadcast(q.select("query_id", "__qt")))
      .filter(F.col("id") =!= F.col("query_id"))
      .select(F.col("query_id"), F.col("id").as("neighbor_id"),
        Similarity.cosine(F.col("__qt"), F.col("tvec")).as("tcos"))
    val poolW = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("tcos").desc, F.col("neighbor_id").asc)
    val pool = coarse
      .withColumn("__pr", F.row_number().over(poolW))
      .filter(F.col("__pr") <= poolSize)
      .select("query_id", "neighbor_id")
    // exact rerank: full vectors rejoin for the bounded pool only
    val cv = corpus.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).cast("long").as("neighbor_id"),
        F.col(vecCol).as("__cv"))
    val rer = pool
      .join(cv, Seq("neighbor_id"))
      .join(F.broadcast(q.select("query_id", "__qv")), Seq("query_id"))
      .withColumn("cos", Similarity.cosine(F.col("__qv"), F.col("__cv")))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    rer.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** One-shot form: builds the transient prefix table and probes —
    * identical results to the indexed form (same prefixes, same
    * tie-breaks). */
  def truncatedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dPrime: Int,
      k: Int,
      poolSize: Int = 1000): DataFrame =
    truncatedTopKIndexed(
      buildTruncatedTable(corpus, idCol, vecCol, dPrime),
      corpus, queries, idCol, vecCol, dPrime, k, poolSize)
}
