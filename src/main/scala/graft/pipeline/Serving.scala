package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.pipeline.Retrieval.TextIndex

/**
 * Serving-layer compositions over the persisted retrieval indexes:
 * more-like-this, prefix completion, field collapsing, federated
 * sharded search, and a manifest-keyed result cache. Everything here
 * is a composition of the already-audited primitives — the point of
 * the module is the SERVING CONTRACT each entry pins (exact global
 * statistics for sharded merge, all-integer term selection for MLT,
 * deterministic invalidation for the cache), not new kernels.
 */
object Serving {

  // ---------------------------------------------------------------- //
  // More-like-this                                                    //
  // ---------------------------------------------------------------- //

  /**
   * The classic "more like this" query composition: pick the source
   * document's `mTerms` most DISTINCTIVE terms and run a BM25 query
   * with them, excluding the source document itself.
   *
   * Term selection is ALL-INTEGER — terms rank by
   * (df ASC, tf DESC, term ASC): rare-in-corpus first (rarity is what
   * makes a term distinctive), frequent-in-doc as the tie-break —
   * so the selected query replays exactly cross-engine with no float
   * comparisons (the tf*idf product form would rank by a libm double;
   * the lexicographic integer form is deterministic by construction).
   *
   * Scale shape: the source document's text comes from the CALLER
   * (one row — a forward lookup, never an id-scan of the inverted
   * index, whose partitioning is by term bucket and cannot prune on
   * id); dfs for exactly the doc's distinct terms come from a
   * partition-pruned probe of those terms' buckets; the final query
   * is a plain [[Retrieval.bm25TopKIndexed]] probe. Driver state is
   * bounded by one document's distinct terms.
   *
   * Returns (rank, id, score, tf_total, n_terms_hit, query) with the
   * selected terms joined by ' ' in `query` (ordered by selection
   * rank) — the source doc never appears.
   */
  def moreLikeThisTopK(
      idx: TextIndex,
      docId: Long,
      docText: String,
      mTerms: Int,
      k: Int,
      k1: Double = Retrieval.DefaultK1,
      b: Double = Retrieval.DefaultB): DataFrame = {
    require(mTerms > 0, s"mTerms must be positive, got $mTerms")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    // the doc's (term, tf) profile — driver-side, one document
    val toks = Option(docText).getOrElse("").toLowerCase
      .split("\\s+").filter(_.nonEmpty)
    val tfs: Map[String, Long] =
      toks.groupBy(identity).map { case (t, a) => (t, a.length.toLong) }
    if (tfs.isEmpty)
      return spark.emptyDataFrame
        .withColumn("rank", F.lit(0)).limit(0)
    val terms = tfs.keys.toSeq
    val qBuckets =
      terms.map(t => Retrieval.localTermBucket(t, idx.buckets)).distinct
    // dfs for exactly these terms: partition-pruned probe
    val dfRows = idx.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
      .filter(F.col("term").isin(terms: _*))
      .groupBy("term").agg(F.count(F.lit(1)).as("df"))
      .collect()
    val dfMap = dfRows.map(r => (r.getString(0), r.getLong(1))).toMap
    val ranked = terms
      .map(t => (t, dfMap.getOrElse(t, 0L), tfs(t)))
      .sortBy { case (t, df, tf) => (df, -tf, t) }
      .take(mTerms)
      .map(_._1)
    Retrieval.bm25TopKIndexedExcluding(idx, ranked, k, Seq(docId), k1, b)
      .withColumn("query", F.lit(ranked.mkString(" ")))
  }

  /**
   * Batched more-like-this: the distributed form of
   * [[moreLikeThisTopK]] for a SET of source documents at once (the
   * "related items for these docs" pipeline shape) — term profiles,
   * dfs, the (df ASC, tf DESC, term ASC) selection, and the final
   * scoring all run in-plan; the only driver state is the distinct
   * source-term list (the [[Retrieval.bm25TopKBatch]] serving-batch
   * collect rule — sources are a bounded batch, not the corpus).
   *
   * Returns (query_id, rel_rank, id, score, tf_total, n_terms_hit,
   * query) per source: `query_id` is the source doc id, `rel_rank`
   * the 1-based related-document rank AFTER self-exclusion (the
   * all-integer re-rank over the pinned pool ranking), `query` the
   * selected terms in selection order.
   */
  def moreLikeThisBatch(
      idx: TextIndex,
      sources: DataFrame,
      idCol: String,
      textCol: String,
      mTerms: Int,
      k: Int,
      k1: Double = Retrieval.DefaultK1,
      b: Double = Retrieval.DefaultB): DataFrame = {
    require(mTerms > 0, s"mTerms must be positive, got $mTerms")
    require(k > 0, s"k must be positive, got $k")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val srcToks = sources
      .select(F.col(idCol).cast("long").as("query_id"),
        F.explode(F.split(F.lower(F.col(textCol)), "\\s+")).as("term"))
      .filter(F.length(F.col("term")) > 0)
      .groupBy("query_id", "term")
      .agg(F.count(F.lit(1)).as("__tf"))
      .localCheckpoint(eager = false)
    val terms = srcToks.select("term").distinct().as[String].collect().toSeq
    require(terms.nonEmpty, "moreLikeThisBatch: no source terms")
    val qBuckets =
      terms.map(t => Retrieval.localTermBucket(t, idx.buckets)).distinct
    val dfs = idx.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
      .filter(F.col("term").isin(terms: _*))
      .groupBy("term").agg(F.count(F.lit(1)).as("__df"))
    val selW = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("__df").asc, F.col("__tf").desc, F.col("term").asc)
    val selected = srcToks
      .join(F.broadcast(dfs), Seq("term"), "left")
      .withColumn("__df", F.coalesce(F.col("__df"), F.lit(0L)))
      .withColumn("__rk", F.row_number().over(selW))
      .filter(F.col("__rk") <= mTerms)
      .localCheckpoint(eager = false)
    val queries = selected.groupBy("query_id")
      .agg(F.collect_list(F.col("term")).as("terms"),
        F.concat_ws(" ",
          F.array_sort(F.collect_list(F.struct(F.col("__rk"), F.col("term"))))
            .getField("term")).as("query"))
    val pool = Retrieval.bm25TopKBatch(
      idx, queries.select("query_id", "terms"), k + 1, k1, b)
    val relW = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("rank").asc)
    pool.filter(F.col("id") =!= F.col("query_id"))
      .withColumn("rel_rank", F.row_number().over(relW))
      .filter(F.col("rel_rank") <= k)
      .join(F.broadcast(queries.select("query_id", "query")), "query_id")
      .select("query_id", "rel_rank", "id", "score", "tf_total",
        "n_terms_hit", "query")
  }

  // ---------------------------------------------------------------- //
  // Pinned (editorial) results                                        //
  // ---------------------------------------------------------------- //

  /**
   * Pinned-results serving (the Elasticsearch "pinned query" /
   * editorial-curation shape): the given ids occupy ranks
   * 1..|pinned| IN THE GIVEN ORDER — matched or not (editorial
   * placement is unconditional) — and organic BM25 results fill the
   * remaining slots, excluding the pinned ids. All-integer
   * composition over the pinned organic ranking.
   *
   * Returns (rank, id, score, pinned): `score` is the organic BM25
   * score when the pinned doc matches the query, NULL otherwise
   * (nothing to score); organic rows always carry their score.
   */
  def pinnedTopK(
      idx: TextIndex,
      queryTerms: Seq[String],
      pinned: Seq[Long],
      k: Int,
      k1: Double = Retrieval.DefaultK1,
      b: Double = Retrieval.DefaultB): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(pinned.size <= k, s"more pinned ids (${pinned.size}) than k ($k)")
    require(pinned.distinct.size == pinned.size, "duplicate pinned ids")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets =
      q.map(t => Retrieval.localTermBucket(t, idx.buckets)).distinct
    val pruned = idx.postings.filter(F.col("__bucket").isin(qBuckets: _*))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    // the FULL scored set: a pinned doc's score must not depend on
    // whether it would have made the organic top-k
    val scored = Retrieval.bm25Scores(pruned, stats, q, k1, b)
      .localCheckpoint(eager = false)
    val pinDf = pinned.zipWithIndex
      .map { case (id, i) => (id, i + 1) }.toDF("id", "rank")
    val pinnedRows = pinDf
      .join(scored.select(F.col("id"), F.col("score")), Seq("id"), "left")
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.lit(true).as("pinned"))
    val organicRows = Retrieval.rankTopKPublic(
        scored.filter(!F.col("id").isin(pinned: _*)), k - pinned.size)
      .select((F.col("rank") + F.lit(pinned.size)).as("rank"),
        F.col("id"), F.col("score"), F.lit(false).as("pinned"))
    pinnedRows.unionByName(organicRows)
  }

  // ---------------------------------------------------------------- //
  // Synonym-expanded retrieval                                        //
  // ---------------------------------------------------------------- //

  /**
   * Synonym-expanded BM25: each query position is a GROUP of
   * interchangeable terms; a document matches the group through any
   * variant, with tf summed over the variants and df counted as the
   * number of documents matching ANY variant — the term-group
   * statistics of an analyzer-level synonym filter (scoring the group
   * as one token), not a bag of independent OR-terms (which would
   * double-count near-duplicate variants and skew idf per variant).
   *
   * Returns the [[Retrieval.bm25TopKIndexed]] shape
   * (rank, id, score, tf_total, n_terms_hit) with `n_terms_hit` the
   * number of GROUPS matched.
   *
   * Scale shape: the variant->group mapping broadcasts onto the
   * partition-pruned postings scan (all variants' buckets probed);
   * one (group, id) pre-aggregate then the per-doc sum — the
   * bm25Scores shuffle shape with one extra map-side-combined
   * aggregate.
   */
  def synonymTopK(
      idx: TextIndex,
      synGroups: Seq[Seq[String]],
      k: Int,
      k1: Double = Retrieval.DefaultK1,
      b: Double = Retrieval.DefaultB): DataFrame = {
    require(synGroups.nonEmpty && synGroups.forall(_.nonEmpty),
      "synonymTopK: empty group")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val mapping = synGroups.zipWithIndex
      .flatMap { case (g, gi) => g.map(t => (t.toLowerCase, gi.toLong)) }
      .distinct.toDF("term", "__gid")
    val terms = synGroups.flatten.map(_.toLowerCase).distinct
    val qBuckets =
      terms.map(t => Retrieval.localTermBucket(t, idx.buckets)).distinct
    val matched = idx.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
      .filter(F.col("term").isin(terms: _*))
      .join(F.broadcast(mapping), "term")
    val byGroup = matched
      .groupBy(F.col("__gid"), F.col("id"))
      .agg(F.sum(F.col("tf")).as("tf"), F.first(F.col("dl")).as("dl"))
    val dfs = byGroup.groupBy("__gid").agg(F.count(F.lit(1)).as("df"))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    val scored = byGroup
      .join(F.broadcast(dfs), "__gid")
      .crossJoin(F.broadcast(stats))
      .withColumn("__w", Retrieval.bm25WeightPublic(k1, b))
      .groupBy("id")
      .agg(F.sum(F.col("__w")).as("score"),
        F.sum(F.col("tf")).as("tf_total"),
        F.count(F.lit(1)).as("n_terms_hit"))
    Retrieval.rankTopKPublic(scored, k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  // ---------------------------------------------------------------- //
  // Percolation (reverse search)                                      //
  // ---------------------------------------------------------------- //

  /**
   * Percolation — reverse search (the Elasticsearch percolator /
   * alerting shape): STORED queries match against incoming documents
   * instead of documents against an incoming query. A stored query
   * (query_id, terms) matches a document iff the document contains
   * EVERY term (the conjunctive contract, [[Retrieval.bm25TopKBoolean]]
   * `must` semantics).
   *
   * All-integer: per (doc, query) the distinct-matched count equals
   * the query's term count — no scores, exact replay anywhere.
   * Returns (doc_id, query_id, n_terms) for each match.
   *
   * Scale shape: the stored-query term table broadcasts onto the
   * document token scan (alert sets are serving-bounded; documents
   * are the big side and stream through map-side); one
   * (doc_id, query_id) shuffle for the conjunction count. Duplicate
   * terms in a stored query collapse (distinct) so the count
   * comparison is sound.
   */
  def percolate(
      storedQueries: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val qCols = storedQueries.columns
    val q = storedQueries
      .select(F.col(qCols(0)).cast("long").as("query_id"),
        F.explode(F.col(qCols(1))).as("__qt"))
      .select(F.col("query_id"), F.lower(F.col("__qt")).as("term"))
      .distinct()
    val qSize = q.groupBy("query_id").agg(F.count(F.lit(1)).as("n_terms"))
    val dtoks = docs
      .select(F.col(idCol).cast("long").as("doc_id"),
        F.explode(F.split(F.lower(F.col(textCol)), "\\s+")).as("term"))
      .filter(F.length(F.col("term")) > 0)
      .distinct()
    dtoks.join(F.broadcast(q), "term")
      .groupBy("doc_id", "query_id")
      .agg(F.count(F.lit(1)).as("__matched"))
      .join(F.broadcast(qSize), "query_id")
      .filter(F.col("__matched") === F.col("n_terms"))
      .select("doc_id", "query_id", "n_terms")
  }

  /**
   * Streaming percolation: each micro-batch of documents
   * batch-percolates against the (frozen) stored queries and lands
   * its matches under `outPath/__batch=<id>` with dynamic overwrite —
   * a replayed micro-batch replaces exactly its own matches
   * (effectively-once, the [[SketchView]] protocol). Stateless across
   * batches: a document matches on its own content alone.
   */
  def percolateStream(
      storedQueries: DataFrame,
      docStream: DataFrame,
      outPath: String,
      idCol: String,
      textCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        percolate(storedQueries, batch, idCol, textCol)
          .withColumn("__batch", F.lit(batchId))
          .repartition(1)
          .write.partitionBy("__batch")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(outPath)
        ()
    }

  // ---------------------------------------------------------------- //
  // Prefix completion (autocomplete)                                  //
  // ---------------------------------------------------------------- //

  /**
   * Term dictionary of an index frame as a completion table:
   * (term, df) with df = the number of documents containing the term
   * (postings are unique per (term, id), so a plain count is the df).
   * This is the table [[saveCompletionIndex]] persists and
   * [[completeTopK]] probes; [[completionsFromIndex]] derives it on
   * the fly for ad-hoc use.
   */
  def completionTable(index: DataFrame): DataFrame =
    index.groupBy("term").agg(F.count(F.lit(1)).as("df"))

  /**
   * Persist a completion index derived from a saved [[TextIndex]]:
   * `path/terms/__p=<first char>/part-*.parquet` rows (term, df).
   *
   * The dictionary is REBUILT from the index postings — a term
   * dictionary is orders of magnitude smaller than its corpus (type
   * count, not token count), so the rebuild is the honest maintenance
   * story: re-derive after index mutations rather than carrying a
   * second delta protocol whose failure modes would need their own
   * audit. The first-character partitioning makes every prefix probe
   * a single-directory scan.
   */
  def saveCompletionIndex(
      spark: SparkSession, indexPath: String, outPath: String): Unit = {
    val idx = Retrieval.loadTextIndex(spark, indexPath)
    completionTable(idx.postings)
      .withColumn("__p", F.substring(F.col("term"), 1, 1))
      .repartition(F.col("__p"))
      .write.partitionBy("__p").mode("overwrite")
      .parquet(s"$outPath/terms")
  }

  /**
   * Top-k completions of `prefix` from a [[saveCompletionIndex]]
   * table: terms starting with the prefix, ranked by
   * (df DESC, term ASC) — all-integer, fully deterministic. Returns
   * (rank, term, df). The `__p` filter is a partition filter: the
   * scan touches one directory.
   */
  def completeTopK(
      spark: SparkSession, path: String, prefix: String, k: Int): DataFrame = {
    require(prefix.nonEmpty, "completeTopK: empty prefix")
    require(k > 0, s"k must be positive, got $k")
    val p = prefix.toLowerCase
    val matched = spark.read.parquet(s"$path/terms")
      .filter(F.col("__p") === p.substring(0, 1))
      .filter(F.col("term").startsWith(p))
    rankCompletions(matched, k)
  }

  /** Ad-hoc completions straight off a [[TextIndex]] (full dictionary
    * derivation — one pass over the postings; use the persisted form
    * for serving). Identical results to [[completeTopK]] over a
    * completion index built from the same index state. */
  def completionsFromIndex(idx: TextIndex, prefix: String, k: Int): DataFrame = {
    require(prefix.nonEmpty, "completionsFromIndex: empty prefix")
    val p = prefix.toLowerCase
    rankCompletions(
      completionTable(idx.postings).filter(F.col("term").startsWith(p)), k)
  }

  /**
   * Token-gated completion-index refresh: rebuild the completion
   * dictionary IFF the source index changed since the last build —
   * the [[indexStateToken]] of the source index is stored beside the
   * terms at build time and compared on every sync (the
   * cache-invalidation key applied to derived-index maintenance).
   * Returns true when a rebuild ran. The token writes AFTER the
   * terms, so a crash mid-rebuild leaves a stale/absent token and the
   * next sync rebuilds again (safe).
   */
  def syncCompletionIndex(
      spark: SparkSession, indexPath: String, outPath: String): Boolean = {
    val token = indexStateToken(spark, indexPath)
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tokFile = new org.apache.hadoop.fs.Path(s"$outPath/_source_token.json")
    val stored =
      if (!fs.exists(tokFile)) None
      else {
        val in = fs.open(tokFile)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
        finally in.close()
      }
    val now = s"""{"token": $token}"""
    if (stored.contains(now)) false
    else {
      saveCompletionIndex(spark, indexPath, outPath)
      val out = fs.create(tokFile, true)
      out.write(now.getBytes("UTF-8"))
      out.close()
      true
    }
  }

  private def rankCompletions(matched: DataFrame, k: Int): DataFrame = {
    val top = matched.orderBy(F.col("df").desc, F.col("term").asc).limit(k)
    top.withColumn("rank",
        F.row_number().over(Window.orderBy(F.col("df").desc, F.col("term").asc)))
      .select("rank", "term", "df")
  }

  // ---------------------------------------------------------------- //
  // Field collapsing                                                  //
  // ---------------------------------------------------------------- //

  /**
   * Collapse a ranked result set by a group key (the search-engine
   * "field collapsing" / dedup-by-site operator): keep the best-ranked
   * row per group, then re-rank the group representatives and return
   * the top `k` — one result per group, no near-duplicate pileup.
   *
   * `ranked` is any (rank, id, ...) result (rank ties impossible —
   * row_number semantics); `groups` maps id -> group. Rows whose id
   * has no group mapping collapse under their own id (coalesce —
   * ungrouped results are their own representatives, never dropped).
   * Returns the surviving rows with `group` and `collapsed_rank`
   * (1-based over groups) plus the original columns.
   *
   * The collapse is ALL-INTEGER (min rank per group, re-rank by that
   * rank) — deterministic given the input ranking; the caller should
   * rank a candidate pool larger than `k` (pool >= k groups wanted).
   *
   * Scale shape: the input is a top-pool result (serving-bounded);
   * one hash shuffle on group for the min, one bounded window over
   * <= pool rows for the re-rank.
   */
  def collapseTopK(
      ranked: DataFrame,
      groups: DataFrame,
      idCol: String,
      groupCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val g = groups.select(F.col(idCol).as("id"),
      F.col(groupCol).cast("string").as("__grp"))
    val withG = ranked.join(g, Seq("id"), "left")
      .withColumn("group",
        F.coalesce(F.col("__grp"), F.col("id").cast("string")))
      .drop("__grp")
    val best = Window.partitionBy(F.col("group"))
      .orderBy(F.col("rank").asc)
    val reps = withG
      .withColumn("__within", F.row_number().over(best))
      .filter(F.col("__within") === 1)
      .drop("__within")
    val top = reps.orderBy(F.col("rank").asc).limit(k)
    top.withColumn("collapsed_rank",
      F.row_number().over(Window.orderBy(F.col("rank").asc)))
  }

  // ---------------------------------------------------------------- //
  // Federated sharded search                                          //
  // ---------------------------------------------------------------- //

  /**
   * Save a corpus as `shards` independent [[TextIndex]]es under
   * `path/shard=<s>/` plus a `_shards.json` manifest — the federated
   * layout for a corpus too large (or too operationally segmented)
   * for one index: each shard is built, appended, compacted, and
   * taken down with the UNCHANGED single-index maintenance machinery,
   * and [[bm25TopKSharded]] merges probes with EXACT global
   * statistics.
   *
   * Shard assignment is `pmod(xxhash64(id), shards)` — deterministic,
   * so a document's shard is re-derivable for routing takedowns.
   * Building loops shard jobs (each a one-pass index build over its
   * slice); at cluster scale each iteration is an independent job
   * over a corpus partition, which is exactly how a federated build
   * is scheduled anyway.
   */
  def saveShardedTextIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      shards: Int,
      buckets: Int = 64): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = docs.sparkSession
    val tagged = docs.withColumn("__shard",
      F.pmod(F.xxhash64(F.col(idCol).cast("long")), F.lit(shards.toLong)))
    (0 until shards).foreach { s =>
      Retrieval.buildTextIndex(
          tagged.filter(F.col("__shard") === s.toLong).drop("__shard"),
          idCol, textCol, buckets)
        .save(s"$path/shard=$s")
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/_shards.json"), true)
    out.write(s"""{"shards": $shards, "buckets": $buckets}"""
      .getBytes("UTF-8"))
    out.close()
  }

  /**
   * Route new documents into an existing sharded index: each shard's
   * slice (the same `pmod(xxhash64(id), shards)` rule as the build)
   * goes through the UNCHANGED single-index append — batch stamping,
   * stats deltas, term-meta ordering and all. Only shards that
   * actually received documents are touched (bounded driver list of
   * shard ids).
   */
  def appendToShardedTextIndex(
      spark: SparkSession,
      path: String,
      newDocs: DataFrame,
      idCol: String,
      textCol: String): Unit = {
    val shards = shardCount(spark, path)
    val tagged = newDocs.withColumn("__shard",
      F.pmod(F.xxhash64(F.col(idCol).cast("long")), F.lit(shards.toLong)))
    val touched = tagged.select("__shard").distinct()
      .collect().map(_.getLong(0)).sorted
    touched.foreach { sh =>
      Retrieval.appendToTextIndex(spark, s"$path/shard=$sh",
        tagged.filter(F.col("__shard") === sh).drop("__shard"),
        idCol, textCol)
    }
  }

  /**
   * Streaming ingest into a sharded index: each micro-batch routes by
   * the build hash and lands per-shard through the single-index
   * micro-batch append (batch-stamped, dynamic overwrite) — a
   * replayed micro-batch rewrites exactly its own postings and stats
   * rows in EVERY shard it touched, so the fan-out is
   * effectively-once as a whole. Heartbeats and the
   * exclusive-maintenance gate run per touched shard root (locks are
   * per-shard, matching the routed batch maintenance).
   */
  def streamToShardedTextIndex(
      stream: DataFrame,
      path: String,
      idCol: String,
      textCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val shards = shardCount(spark, path)
        val tagged = batch.withColumn("__shard",
          F.pmod(F.xxhash64(F.col(idCol).cast("long")), F.lit(shards.toLong)))
          .localCheckpoint(eager = false)
        val touched = tagged.select("__shard").distinct()
          .collect().map(_.getLong(0)).sorted
        touched.foreach { sh =>
          val shardPath = s"$path/shard=$sh"
          Maintenance.heartbeat(spark, shardPath)
          Maintenance.requireNoExclusiveMaintenance(spark, shardPath)
          Retrieval.appendBatchToTextIndex(spark, shardPath,
            tagged.filter(F.col("__shard") === sh).drop("__shard"),
            idCol, textCol, batchId)
        }
        ()
    }

  /** Takedowns against a sharded index: ids route to their shard by
    * the hash rule; each touched shard runs the single-index removal
    * (exclusive lock, touched-bucket rewrite) unchanged. */
  def removeFromShardedTextIndex(
      spark: SparkSession,
      path: String,
      ids: DataFrame,
      idCol: String): Unit = {
    val shards = shardCount(spark, path)
    val tagged = ids.select(F.col(idCol).cast("long").as("id"))
      .withColumn("__shard",
        F.pmod(F.xxhash64(F.col("id")), F.lit(shards.toLong)))
    val touched = tagged.select("__shard").distinct()
      .collect().map(_.getLong(0)).sorted
    touched.foreach { sh =>
      Retrieval.removeFromTextIndex(spark, s"$path/shard=$sh",
        tagged.filter(F.col("__shard") === sh).select("id"), "id")
    }
  }

  /** Shard count of a sharded index root (from `_shards.json`). */
  def shardCount(spark: SparkSession, path: String): Int = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$path/_shards.json"))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val m = """"shards"\s*:\s*(\d+)""".r.findFirstMatchIn(body)
    m.map(_.group(1).toInt).getOrElse(
      throw new IllegalStateException(s"unreadable _shards.json at $path"))
  }

  /**
   * Federated BM25 top-k over a [[saveShardedTextIndex]] root —
   * EXACTLY equal to probing one monolithic index of the same corpus:
   *
   *  - global N and avgdl are the exact long sums of the per-shard
   *    stats deltas (each shard's (n_delta, dl_delta) rows are exact;
   *    the division happens once, globally);
   *  - dfs derive from the UNION of per-shard matched postings —
   *    and the union of per-shard matches IS the monolithic matched
   *    set, so the per-term df equals the monolithic count.
   *
   * This is the federated-search correction naive score merging gets
   * wrong (per-shard idfs differ shard to shard; merging per-shard
   * top-k lists by local score mis-ranks) — shipping matched
   * POSTINGS (bounded: query terms only, partition-pruned within
   * every shard) instead of scored lists makes the merge exact.
   */
  def bm25TopKSharded(
      spark: SparkSession,
      path: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = Retrieval.DefaultK1,
      b: Double = Retrieval.DefaultB): DataFrame = {
    import spark.implicits._
    val n = shardCount(spark, path)
    val idxs = (0 until n).map(s =>
      Retrieval.loadTextIndex(spark, s"$path/shard=$s"))
    val q = queryTerms.map(_.toLowerCase).distinct
    val pruned = idxs.map { idx =>
      val qb = q.map(t => Retrieval.localTermBucket(t, idx.buckets)).distinct
      idx.postings.filter(F.col("__bucket").isin(qb: _*))
        .select("term", "id", "tf", "dl")
    }.reduce(_ unionByName _)
    val nDocs = idxs.map(_.nDocs).sum
    val dlSum = idxs.map(i => math.max(i.dlSum, 0L)).sum
    val avgdl = if (nDocs <= 0) 0.0 else dlSum.toDouble / nDocs
    val stats = Seq((nDocs, avgdl)).toDF("n_docs", "avgdl")
    Retrieval.rankTopKPublic(
        Retrieval.bm25Scores(pruned, stats, q, k1, b), k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  // ---------------------------------------------------------------- //
  // Hard-negative mining                                              //
  // ---------------------------------------------------------------- //

  /**
   * BM25 hard-negative mining for contrastive retrieval training
   * (the DPR/ANCE recipe): for each training query, the top-ranked
   * documents that are NOT its labeled positives — the negatives a
   * lexical searcher confuses with the answer, which train far
   * stronger embedders than random negatives.
   *
   * `queries` is (query_id, terms array); `positives` is
   * (query_id, positive_id) — multi-positive queries are fine.
   * Returns (query_id, neg_rank, negative_id, pool_rank, score):
   * `pool_rank` is the BM25 rank inside the `pool`-deep candidate
   * list, `neg_rank` the 1-based rank among surviving negatives
   * (all-integer once the pool ranking is fixed). A positive deeper
   * than `pool` is simply never seen — mine with a pool comfortably
   * above `nNegatives` + max positives per query.
   *
   * Scale shape: [[Retrieval.bm25TopKBatch]] does the bounded probe
   * (one query_id repartition); the positive exclusion is a bounded
   * anti-join; the re-rank windows over <= pool rows per query.
   */
  def mineHardNegatives(
      idx: TextIndex,
      queries: DataFrame,
      positives: DataFrame,
      nNegatives: Int,
      pool: Int): DataFrame = {
    require(nNegatives > 0, s"nNegatives must be positive, got $nNegatives")
    require(pool >= nNegatives,
      s"pool ($pool) must be >= nNegatives ($nNegatives)")
    val pCols = positives.columns
    val pos = positives.select(F.col(pCols(0)).as("query_id"),
      F.col(pCols(1)).as("id"))
    val ranked = Retrieval.bm25TopKBatch(idx, queries, pool)
    val negs = ranked.join(pos, Seq("query_id", "id"), "left_anti")
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("rank").asc)
    negs.withColumn("neg_rank", F.row_number().over(w))
      .filter(F.col("neg_rank") <= nNegatives)
      .select(F.col("query_id"), F.col("neg_rank"),
        F.col("id").as("negative_id"), F.col("rank").as("pool_rank"),
        F.col("score"))
  }

  // ---------------------------------------------------------------- //
  // Near-real-time serving (index + unindexed tail)                   //
  // ---------------------------------------------------------------- //

  /**
   * Near-real-time search: serve over a SAVED index plus a fresh,
   * not-yet-indexed document tail — the federation math applied to
   * recency (the Lucene NRT / Elasticsearch refresh-gap pattern). A
   * transient index over the tail merges with the saved one exactly
   * like shards merge: matched postings union, dfs recomputed over
   * the union, global stats by exact long addition — so the result
   * EQUALS an index over corpus ∪ tail, and freshly ingested
   * documents rank correctly the moment they exist, before any index
   * maintenance runs.
   *
   * Tail doc ids must be disjoint from the indexed corpus (they are
   * the not-yet-appended documents by definition). Returns the
   * [[Retrieval.bm25TopKIndexed]] shape.
   */
  def bm25TopKWithTail(
      idx: TextIndex,
      tailDocs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = Retrieval.DefaultK1,
      b: Double = Retrieval.DefaultB): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets =
      q.map(t => Retrieval.localTermBucket(t, idx.buckets)).distinct
    val indexed = idx.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
      .select("term", "id", "tf", "dl")
    val tail = Retrieval.buildTextIndex(tailDocs, idCol, textCol, idx.buckets)
    val tailPruned = tail.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
      .select("term", "id", "tf", "dl")
    val nDocs = idx.nDocs + tail.nDocs
    val dlSum = math.max(idx.dlSum, 0L) + math.max(tail.dlSum, 0L)
    val avgdl = if (nDocs <= 0) 0.0 else dlSum.toDouble / nDocs
    val stats = Seq((nDocs, avgdl)).toDF("n_docs", "avgdl")
    Retrieval.rankTopKPublic(
        Retrieval.bm25Scores(indexed.unionByName(tailPruned), stats, q, k1, b),
        k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  // ---------------------------------------------------------------- //
  // Static-prior boosted ranking                                      //
  // ---------------------------------------------------------------- //

  /**
   * BM25 with a static per-document prior (authority, freshness,
   * editorial quality): score' = bm25 + lambda * boost, with `boosts`
   * a (id, boost) table — absent ids boost 0. The additive form keeps
   * non-matching documents out (a prior alone never retrieves) and
   * replays exactly when the boost column is itself replayable
   * (in-degree, integer quality tiers, ln(1 + indeg)-style
   * expressions).
   *
   * Scale shape: the probe is the plain partition-pruned scan; boosts
   * join the SCORED candidates (bounded by matched docs), broadcast
   * when the boost table is small, shuffle-joined otherwise.
   */
  def bm25TopKBoosted(
      idx: TextIndex,
      queryTerms: Seq[String],
      boosts: DataFrame,
      k: Int,
      lambda: Double = 1.0,
      k1: Double = Retrieval.DefaultK1,
      b: Double = Retrieval.DefaultB): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets =
      q.map(t => Retrieval.localTermBucket(t, idx.buckets)).distinct
    val pruned = idx.postings.filter(F.col("__bucket").isin(qBuckets: _*))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    val bCols = boosts.columns
    val bst = boosts.select(F.col(bCols(0)).cast("long").as("id"),
      F.col(bCols(1)).cast("double").as("__boost"))
    val scored = Retrieval.bm25Scores(pruned, stats, q, k1, b)
      .join(bst, Seq("id"), "left")
      .withColumn("score",
        F.col("score") +
          F.lit(lambda) * F.coalesce(F.col("__boost"), F.lit(0.0)))
      .drop("__boost")
    Retrieval.rankTopKPublic(scored, k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  // ---------------------------------------------------------------- //
  // Manifest-keyed result cache                                       //
  // ---------------------------------------------------------------- //

  /**
   * Deterministic state token of an index directory: an xor of
   * per-file hashes over the recursive (relative path, length)
   * listing — metadata only, no data scan, so the token costs a
   * namenode listing at any corpus size. Any append / removal /
   * compaction / retrain changes the file set (names carry job UUIDs
   * and batch stamps) and therefore the token; two listings of an
   * untouched directory always agree.
   *
   * This is an INVALIDATION key, not an integrity check: it detects
   * that maintenance touched the index (so cached results may be
   * stale), not silent in-place bit flips (which no mutation path
   * here performs — every writer creates new files).
   */
  def indexStateToken(spark: SparkSession, path: String): Long = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0L
    val rootUri = root.toUri.getPath
    var tok = 0L
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(rootUri)
      // locks and heartbeats churn without changing query results
      if (!rel.contains("_maintenance_lock") &&
          !rel.contains("_compact_lock") &&
          !rel.contains("_writer_heartbeat")) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes2(
          rel.getBytes("UTF-8"),
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          rel.getBytes("UTF-8").length, 42)
        tok ^= (h.toLong << 32) ^ st.getLen
      }
    }
    tok
  }

  /** [[cachedTopK]]'s result: the rows plus whether they came from
    * the cache (`hit`) and the index-state token they are valid for. */
  final case class CachedResult(rows: DataFrame, hit: Boolean, token: Long)

  /**
   * Result-cached BM25 serving: compute [[Retrieval.bm25TopKIndexed]]
   * for `(queryTerms, k)` against the index at `indexPath`, caching
   * the result rows under `cachePath` keyed by (normalized query, k,
   * [[indexStateToken]]). A repeat call with an UNCHANGED index
   * returns the cached parquet without touching the index; any
   * maintenance on the index flips the token and forces a recompute —
   * the cache can never serve a result the current index would not
   * produce.
   *
   * The cache key file is written AFTER the rows — a crash between
   * the two leaves a stale/absent key, which reads as a miss (safe:
   * misses recompute). One writer per cache path (last-writer-wins on
   * races; both writers hold results valid for their observed token).
   */
  def cachedTopK(
      spark: SparkSession,
      cachePath: String,
      indexPath: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = Retrieval.DefaultK1,
      b: Double = Retrieval.DefaultB): CachedResult = {
    val q = queryTerms.map(_.toLowerCase).distinct.sorted
    val token = indexStateToken(spark, indexPath)
    val keyNow = s"""{"q": "${q.mkString(" ")}", "k": $k, "token": $token}"""
    val fs = new org.apache.hadoop.fs.Path(cachePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keyFile = new org.apache.hadoop.fs.Path(s"$cachePath/_key.json")
    val stored =
      if (!fs.exists(keyFile)) None
      else {
        val in = fs.open(keyFile)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
        finally in.close()
      }
    if (stored.contains(keyNow))
      CachedResult(spark.read.parquet(s"$cachePath/rows"), hit = true, token)
    else {
      val idx = Retrieval.loadTextIndex(spark, indexPath)
      Retrieval.bm25TopKIndexed(idx, queryTerms, k, k1, b)
        .write.mode("overwrite").parquet(s"$cachePath/rows")
      val out = fs.create(keyFile, true)
      out.write(keyNow.getBytes("UTF-8"))
      out.close()
      CachedResult(spark.read.parquet(s"$cachePath/rows"), hit = false, token)
    }
  }
}
