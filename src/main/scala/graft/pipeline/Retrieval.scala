package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/**
 * Lexical retrieval over a document corpus: positional inverted index,
 * BM25 ranked search, exact phrase matching, and reciprocal-rank
 * fusion for hybrid (lexical + embedding) retrieval.
 *
 * Scale shape:
 *   - The index is ONE shuffle over the exploded tokens (groupBy
 *     (term, id)); document length rides along as a grouping column so
 *     no second join is needed.
 *   - A query never shuffles the index: the query-term postings are
 *     filtered map-side, per-term document frequencies (|query| rows)
 *     and the 1-row corpus stats are broadcast back, and the final
 *     top-k is TakeOrdered (orderBy.limit), not a global window.
 *   - [[TextIndex.save]] persists the postings PARTITIONED BY a
 *     term-hash bucket, so a probe against a saved index partition-
 *     prunes its scan to |query terms| buckets out of `buckets` —
 *     the same pruning pattern as [[Similarity.IvfIndex]].
 *
 * Tokenization matches the repo convention (TextFunctions.wordNgrams):
 * lowercase, split on `\s+`, empty tokens dropped. NULL text yields no
 * postings (NULL discipline: malformed input never errors).
 */
object Retrieval {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** Lowercased whitespace tokens with empties removed. Positions in
    * this array are the positions the phrase machinery uses. */
  def terms(text: Column): Column =
    F.filter(F.split(F.lower(text), "\\s+"), t => F.length(t) > 0)

  /**
   * Positional inverted index: one row per distinct (term, document)
   * with columns (term, id, tf, dl, positions). `dl` is the document's
   * token count; `positions` the sorted 0-based token offsets of the
   * term. Exactly one shuffle (the groupBy); `dl` is computed from the
   * token array before the explode so it needs no extra join.
   */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    buildIndexTokens(docs, idCol, terms(F.col(textCol)))

  /** [[buildIndex]] with an injected ANALYZER: `tokens` is any Column
    * producing the token array (e.g. [[Stemmer.stemmedTerms]]). The
    * query side must run the SAME analyzer — see [[bm25TopKStemmed]]
    * for the paired form. */
  def buildIndexTokens(
      docs: DataFrame, idCol: String, tokens: Column): DataFrame =
    docs
      .select(F.col(idCol).as("id"), tokens.as("__t"))
      .select(F.col("id"), F.size(F.col("__t")).as("dl"),
        F.posexplode(F.col("__t")).as(Seq("pos", "term")))
      .groupBy("term", "id", "dl")
      .agg(F.count(F.lit(1)).as("tf"),
        F.sort_array(F.collect_list(F.col("pos"))).as("positions"))

  /** Porter-stemmed positional index: morphological variants fold to
    * one term ("merging"/"merges"/"merged" → "merg"), so the postings
    * dictionary SHRINKS and variants retrieve each other. Query with
    * [[bm25TopKStemmed]] (same analyzer on both sides — an
    * index/query analyzer mismatch is the classic search bug). */
  def buildStemmedIndex(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    buildIndexTokens(docs, idCol, Stemmer.stemmedTerms(F.col(textCol)))

  /** BM25 top-k through the Porter-stemmed analyzer, one-shot form:
    * the index stems document tokens, the query stems its terms with
    * the SAME kernel ([[Stemmer.stemQuery]]) — paired by construction.
    * Returns (rank, id, score, tf_total, n_terms_hit). */
  def bm25TopKStemmed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val index = buildStemmedIndex(docs, idCol, textCol)
    val scored = bm25Scores(index, corpusStats(index),
      Stemmer.stemQuery(queryTerms).distinct, k1, b)
    rankTopK(scored, k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  /** 1-row corpus statistics (n_docs, avgdl) derived from an index.
    * Computed once per index build; persisted alongside by
    * [[TextIndex.save]]. */
  def corpusStats(index: DataFrame): DataFrame =
    index.select(F.col("id"), F.col("dl")).distinct()
      .agg(F.count(F.lit(1)).as("n_docs"), F.avg(F.col("dl")).as("avgdl"))

  /**
   * BM25 scores for every document matching at least one query term:
   * (id, score, tf_total, n_terms_hit).
   *
   * idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
   * w(t, d)  = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
   *
   * The postings filter is map-side (partition-pruned when the index
   * is bucket-partitioned and `bucketCol` pre-filtering was applied by
   * the caller); dfs (|query| rows) and stats (1 row) come back as
   * broadcast joins, so the only shuffle is the per-document sum.
   */
  def bm25Scores(
      index: DataFrame,
      stats: DataFrame,
      queryTerms: Seq[String],
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame =
    bm25ScoresImpl(index, stats, queryTerms, k1, b, restrict = None)

  /** The ONE copy of the BM25 idf, over columns (df, n_docs) —
    * composed by [[bm25Weight]] and the LTR feature exporter. */
  private[pipeline] def idfCol: Column =
    F.log(F.lit(1.0) +
      (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))

  /** The ONE copy of the BM25 per-posting weight, over columns
    * (tf, dl, df, n_docs, avgdl) — every scoring path (single,
    * filtered, batched) composes it so the formula cannot diverge. */
  private def bm25Weight(k1: Double, b: Double): Column =
    idfCol * F.col("tf") * F.lit(k1 + 1.0) /
      (F.col("tf") + F.lit(k1) *
        (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))

  private def bm25ScoresImpl(
      index: DataFrame,
      stats: DataFrame,
      queryTerms: Seq[String],
      k1: Double,
      b: Double,
      restrict: Option[DataFrame],
      delta: Double = 0.0): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Scores: empty query")
    val matched = index
      .filter(F.col("term").isin(queryTerms.map(_.toLowerCase): _*))
    // corpus-level df: counted BEFORE any filter restricts candidates
    val dfs = matched.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    val candidates = restrict match {
      case Some(ok) => matched.join(ok, Seq("id"), "left_semi")
      case None => matched
    }
    // delta != 0 is BM25+ (Lv & Zhai 2011): a per-matched-term floor
    // delta * idf that long documents cannot normalize away — composed
    // from the same idfCol/bm25Weight builders, never a second formula
    val weight =
      if (delta == 0.0) bm25Weight(k1, b)
      else bm25Weight(k1, b) + F.lit(delta) * idfCol
    candidates
      .join(F.broadcast(dfs), "term")
      .crossJoin(F.broadcast(stats))
      .withColumn("__w", weight)
      .groupBy("id")
      .agg(F.sum(F.col("__w")).as("score"),
        F.sum(F.col("tf")).as("tf_total"),
        F.count(F.lit(1)).as("n_terms_hit"))
  }

  /**
   * BM25+ top-k against a saved index (Lv & Zhai 2011): BM25 with a
   * `delta * idf` floor per matched term, fixing BM25's over-penalty
   * of very long documents (a long doc matching a term always beats a
   * doc not matching it, which plain BM25 does not guarantee).
   * `delta = 1.0` is the paper's default.
   */
  def bm25PlusTopKIndexed(
      idx: TextIndex,
      queryTerms: Seq[String],
      k: Int,
      delta: Double = 1.0,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets = q.map(t => localTermBucket(t, idx.buckets))
    val pruned = idx.postings
      .filter(F.col("__bucket").isin(qBuckets.distinct: _*))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    rankTopK(
        bm25ScoresImpl(pruned, stats, q, k1, b, restrict = None, delta), k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  /**
   * Upsert: replace (or insert) documents in a saved index — the
   * takedown removal of the incoming ids followed by the batch
   * append, under one exclusive-maintenance window per step. Absent
   * ids remove nothing (plain inserts); present ids are fully
   * replaced (postings AND their exact stats contribution). RETRY-
   * CONVERGENT: re-running an upsert removes the half-landed prior
   * attempt before appending again, so a crash between the two steps
   * (documents transiently absent) is repaired by the retry.
   */
  def upsertIntoTextIndex(
      spark: SparkSession,
      path: String,
      docs: DataFrame,
      idCol: String,
      textCol: String): TextIndex = {
    removeFromTextIndex(spark, path, docs.select(F.col(idCol)), idCol)
    appendToTextIndex(spark, path, docs, idCol, textCol)
  }

  /**
   * Term-level statistics from a saved index, partition-pruned to the
   * queried terms: (term, df, cf, idf) — document frequency, collection
   * frequency (Σ tf, exact long), and the BM25 idf at the index's
   * current N. Terms absent from the corpus are absent from the
   * result (df 0 has no posting to derive from).
   */
  def termStats(idx: TextIndex, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "termStats: no terms")
    val q = terms.map(_.toLowerCase).distinct
    val qBuckets = q.map(t => localTermBucket(t, idx.buckets)).distinct
    idx.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
      .filter(F.col("term").isin(q: _*))
      .groupBy("term")
      .agg(F.count(F.lit(1)).as("df"), F.sum(F.col("tf")).as("cf"))
      .withColumn("n_docs", F.lit(idx.nDocs))
      .withColumn("idf", idfCol)
      .drop("n_docs")
  }

  /**
   * Numeric facet panel over the matched set: per facet value, the
   * matched-document count and the EXACT sum of a numeric column
   * (token budgeting / corpus-slice sizing over search results).
   * `stat_avg` is the one division over exact longs. Top-N facet
   * values by (n_docs DESC, facet ASC) — all-integer ordering.
   */
  def facetStats(
      idx: TextIndex,
      queryTerms: Seq[String],
      docs: DataFrame,
      idCol: String,
      facetCol: String,
      statCol: String,
      topN: Int): DataFrame = {
    require(queryTerms.nonEmpty, "facetStats: empty query")
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets = q.map(t => localTermBucket(t, idx.buckets)).distinct
    val ids = idx.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
      .filter(F.col("term").isin(q: _*))
      .select(F.col("id").as(idCol)).distinct()
    docs.join(ids, Seq(idCol), "left_semi")
      .groupBy(F.col(facetCol))
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.sum(F.col(statCol).cast("long")).as("stat_sum"))
      .withColumn("stat_avg",
        F.col("stat_sum").cast("double") / F.col("n_docs"))
      .orderBy(F.col("n_docs").desc, F.col(facetCol).asc)
      .limit(topN)
  }

  /** Attach 1-based `rank` to the k best rows of `scored` by
    * (score DESC, id ASC). TakeOrdered first (no global sort), then a
    * window over the k collected rows only. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val top = scored.orderBy(F.col("score").desc, F.col("id").asc).limit(k)
    top.withColumn("rank",
      F.row_number().over(
        Window.orderBy(F.col("score").desc, F.col("id").asc)))
  }

  /**
   * One-shot BM25 top-k over a raw document table: builds a transient
   * index and ranks. Returns (rank, id, score, tf_total, n_terms_hit).
   * For repeated queries build a [[TextIndex]] once instead.
   */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val index = buildIndex(docs, idCol, textCol)
    val scored = bm25Scores(index, corpusStats(index), queryTerms, k1, b)
    rankTopK(scored, k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  // ---------------------------------------------------------------- //
  // Metadata-filtered retrieval                                       //
  // ---------------------------------------------------------------- //

  /**
   * [[bm25Scores]] restricted to the documents in `allowed` — the
   * text side of the serving constraint the ANN family already has
   * ([[Similarity.ivfTopKFilteredIndexed]]): "search within this
   * collection / license / date range".
   *
   * == Statistics semantics — corpus-level, by design ==
   *
   * idf (df, N) and avgdl come from the FULL index, not the filtered
   * subset. This is the defensible serving choice: term informativeness
   * is a property of the collection, not of one query's filter (a term
   * rare in the corpus stays informative inside a small filter, where
   * subset-df would call it common); it keeps scores COMPARABLE across
   * filters; and it keeps the probe cheap — subset stats would force a
   * full-index scan per query to recount df/avgdl where corpus stats
   * ride the same broadcast as the unfiltered probe. The resulting
   * exactness contract (pinned in q_retrieval_filtered): filtered
   * top-k over the full index ≡ score the FULL corpus, drop rows
   * outside the filter, re-rank — row for row.
   *
   * The order of operations enforces that contract: dfs derive from
   * the term-matched postings BEFORE the id semi-join (so the filter
   * cannot perturb df), and the semi-join restricts candidates before
   * any per-document work. `allowed` is a one-column id DataFrame —
   * the caller's metadata predicate stays a declarative DataFrame
   * filter (pushdown applies); the semi-join broadcasts when small.
   */
  def bm25ScoresFiltered(
      index: DataFrame,
      stats: DataFrame,
      queryTerms: Seq[String],
      allowed: DataFrame,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val aCol = allowed.columns.head
    bm25ScoresImpl(index, stats, queryTerms, k1, b,
      restrict = Some(allowed.select(F.col(aCol).as("id")).distinct()))
  }

  /** One-shot metadata-filtered BM25 top-k ([[bm25TopK]]'s filtered
    * sibling). Returns (rank, id, score, tf_total, n_terms_hit) over
    * the allowed documents only, scored with corpus-level statistics
    * (see [[bm25ScoresFiltered]]). */
  def bm25TopKFiltered(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      allowed: DataFrame,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val index = buildIndex(docs, idCol, textCol)
    val scored = bm25ScoresFiltered(index, corpusStats(index), queryTerms,
      allowed, k1, b)
    rankTopK(scored, k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  /**
   * BM25F top-k (the Robertson–Zaragoza field-weighted variant): each
   * field f contributes a weighted, field-length-normalized term
   * frequency
   *
   *   tfn_f(t, d) = w_f * tf_f / ((1 - b_f) + b_f * dl_f / avgdl_f)
   *
   * summed ACROSS fields BEFORE saturation — the property that makes
   * BM25F ≠ a weighted sum of per-field BM25s (a term in both title
   * and body saturates once, not twice):
   *
   *   score(d) = Σ_t idf(t) * tft(t, d) / (k1 + tft(t, d)),
   *   idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5)),
   *
   * with df = documents containing t in ANY field. `fields` is
   * (column, weight w_f, length-normalization b_f) — the classic
   * setup boosts short title-like fields with higher w and lower b.
   *
   * Scale shape: one postings build per field (map-side term filter),
   * per-field 1-row stats broadcast, the cross-field sum repartitioned
   * on id so the tft aggregate and the final per-document sum share
   * one exchange; dfs (<= |query| rows) broadcasts back. Returns
   * (rank, id, score, n_terms_hit).
   */
  def bm25fTopK(
      docs: DataFrame,
      idCol: String,
      fields: Seq[(String, Double, Double)],
      queryTerms: Seq[String],
      k: Int,
      k1: Double = DefaultK1): DataFrame =
    bm25fTopKImpl(docs, idCol, fields, queryTerms, k, k1, restrict = None)

  /** [[bm25fTopK]] restricted to the `allowed` ids — the same
    * corpus-level-statistics contract as [[bm25ScoresFiltered]]: df
    * (any-field document frequency) and N come from the full corpus,
    * the semi-join restricts candidates AFTER dfs derive, so the
    * filtered top-k equals filter-then-rank of full-corpus BM25F
    * scoring. */
  def bm25fTopKFiltered(
      docs: DataFrame,
      idCol: String,
      fields: Seq[(String, Double, Double)],
      queryTerms: Seq[String],
      k: Int,
      allowed: DataFrame,
      k1: Double = DefaultK1): DataFrame = {
    val aCol = allowed.columns.head
    val ok = allowed.select(F.col(aCol).as("id")).distinct()
    bm25fTopKImpl(docs, idCol, fields, queryTerms, k, k1, restrict = Some(ok))
  }

  private def bm25fTopKImpl(
      docs: DataFrame,
      idCol: String,
      fields: Seq[(String, Double, Double)],
      queryTerms: Seq[String],
      k: Int,
      k1: Double,
      restrict: Option[DataFrame]): DataFrame = {
    require(queryTerms.nonEmpty, "bm25fTopK: empty query")
    require(fields.nonEmpty, "bm25fTopK: no fields")
    val q = queryTerms.map(_.toLowerCase)
    val nDocs = docs.count()
    val perField = fields.map { case (c, w, bf) =>
      require(bf >= 0.0 && bf <= 1.0, s"b for field $c must be in [0,1], got $bf")
      // NOT pinned (measured): the matched-term filter pushes below
      // the postings aggregation, so the probe subtree is far cheaper
      // than materializing full per-field postings would be; only the
      // avgdl subtree pays a full pass, and a checkpoint here read
      // 1.13 -> 1.52 s on b_bm25f
      val idx = buildIndex(docs, idCol, c)
      val stats = corpusStats(idx).select(F.col("avgdl").as("__avgdl"))
      idx.filter(F.col("term").isin(q: _*))
        .crossJoin(F.broadcast(stats))
        .select(F.col("term"), F.col("id"),
          (F.lit(w) * F.col("tf") /
            (F.lit(1.0 - bf) + F.lit(bf) * F.col("dl") / F.col("__avgdl")))
            .as("__tfn"))
    }
    val tft = perField.reduce(_ unionByName _)
      .repartition(F.col("id"))
      .groupBy(F.col("term"), F.col("id"))
      .agg(F.sum(F.col("__tfn")).as("__tft"))
    // corpus-level df: counted before any filter restricts candidates
    val dfs = tft.groupBy(F.col("term")).agg(F.count(F.lit(1)).as("df"))
    val candidates = restrict match {
      case Some(ok) => tft.join(ok, Seq("id"), "left_semi")
      case None => tft
    }
    val scored = candidates.join(F.broadcast(dfs), "term")
      .withColumn("__idf", F.log(F.lit(1.0) +
        (F.lit(nDocs.toDouble) - F.col("df") + F.lit(0.5)) /
          (F.col("df") + F.lit(0.5))))
      .withColumn("__w",
        F.col("__idf") * F.col("__tft") / (F.lit(k1) + F.col("__tft")))
      .groupBy(F.col("id"))
      .agg(F.sum(F.col("__w")).as("score"),
        F.count(F.lit(1)).as("n_terms_hit"))
    rankTopK(scored, k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("n_terms_hit"))
  }

  // ---------------------------------------------------------------- //
  // Persisted multi-field index (BM25F serving)                       //
  // ---------------------------------------------------------------- //

  /**
   * A persisted multi-field index — the serving form of [[bm25fTopK]],
   * which otherwise re-tokenizes every field of the whole corpus per
   * query: one [[TextIndex]] per field under `<path>/field_<name>`
   * plus a `_fields.json` manifest carrying the field names and the
   * corpus row count N (BM25F's idf denominator counts DOCUMENTS, not
   * per-field indexed docs — a doc with an empty title still counts).
   * Each per-field index is a full [[TextIndex]]: appends, removals,
   * compaction, and the streaming sink all work per field through the
   * existing machinery ([[appendToFieldedTextIndex]] /
   * [[removeFromFieldedTextIndex]] loop them).
   */
  final case class FieldedTextIndex(
      fields: Seq[String],
      nDocs: Long,
      perField: Map[String, TextIndex])

  /** Build and persist a fielded index (one indexing pass per field).
    * The idf denominator N rides a batch-stamped DELTA table
    * (`<path>/n_deltas/__batch=*`, summed at load — the TextIndex
    * stats protocol applied to the manifest), so appends/removals are
    * delta rows and a streaming micro-batch dynamic-overwrites exactly
    * its own N contribution on replay. The `_fields.json` manifest
    * carries the field names (and a legacy n_docs read only when no
    * delta table exists). */
  def saveFieldedTextIndex(
      docs: DataFrame,
      idCol: String,
      fieldCols: Seq[String],
      path: String,
      buckets: Int = 64): FieldedTextIndex = {
    require(fieldCols.nonEmpty, "saveFieldedTextIndex: no fields")
    val spark = docs.sparkSession
    val n = docs.count()
    fieldCols.foreach { f =>
      buildTextIndex(docs, idCol, f, buckets).save(s"$path/field_$f")
    }
    writeFieldsManifest(spark, path, fieldCols, n)
    writeNDelta(spark, path, n, batchId = -1L, base = true)
    loadFieldedTextIndex(spark, path)
  }

  /** One N-delta row. `base = true` statically overwrites the whole
    * delta table with one `__batch=-1` row (save / reconcile); a real
    * micro-batch id dynamic-overwrites exactly its own partition
    * (replay-idempotent); `-1` without `base` is a pure file-add
    * (batch append/removal deltas accumulate and SUM at load). */
  private def writeNDelta(
      spark: SparkSession, path: String, nDelta: Long, batchId: Long,
      base: Boolean = false): Unit = {
    import spark.implicits._
    val w = Seq((nDelta, batchId)).toDF("n_delta", "__batch")
      .repartition(1)
      .write.partitionBy("__batch")
    (if (base) w.mode("overwrite")
     else if (batchId == -1L) w.mode("append")
     else w.option("partitionOverwriteMode", "dynamic").mode("overwrite"))
      .parquet(s"$path/n_deltas")
  }

  /** Reload a fielded index written by [[saveFieldedTextIndex]]. */
  def loadFieldedTextIndex(
      spark: SparkSession, path: String): FieldedTextIndex = {
    val p = new org.apache.hadoop.fs.Path(path, "_fields.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val raw =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, "UTF-8")
      } finally in.close()
    val legacyN = """"n_docs"\s*:\s*(\d+)""".r.findFirstMatchIn(raw)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(
        s"$path/_fields.json: missing n_docs"))
    val fields = """"([^"]+)"""".r
      .findAllMatchIn(raw.substring(raw.indexOf("[")))
      .map(_.group(1)).toSeq
    // N = the exact sum of the batch-stamped deltas; the manifest's
    // n_docs is the legacy fallback for indexes saved before the delta
    // protocol
    val dRoot = new org.apache.hadoop.fs.Path(path, "n_deltas")
    val nDocs =
      if (fs.exists(dRoot)) {
        val r = spark.read.parquet(s"$path/n_deltas")
          .agg(F.sum(F.col("n_delta"))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      } else legacyN
    FieldedTextIndex(fields, nDocs,
      fields.map(f => f -> loadTextIndex(spark, s"$path/field_$f")).toMap)
  }

  /** Incrementally index a new batch into every field of a saved
    * fielded index (the [[appendToTextIndex]] contract per field; the
    * manifest's N grows by the batch size).
    *
    * Crash contract — the single-field rule, stated for the loop: a
    * BATCH append (`__batch = -1` file-adds) is NOT replay-idempotent,
    * so a crash mid-loop (some fields appended, some not) must not be
    * blindly retried — re-ingesting an already-indexed id
    * double-counts, exactly as in [[appendToTextIndex]]. Recover by
    * rebuilding the affected fields (or [[syncTextIndex]] per field)
    * and then [[setFieldedTextIndexN]] with the known corpus count.
    * N itself is an appended DELTA row written LAST (never a
    * read-modify-write of the manifest), so a crash can only leave it
    * undercounted by exactly this batch — and the STREAMING form
    * ([[streamToFieldedTextIndex]]) is fully replay-idempotent. */
  def appendToFieldedTextIndex(
      spark: SparkSession,
      path: String,
      newDocs: DataFrame,
      idCol: String): FieldedTextIndex =
    appendBatchToFieldedTextIndex(spark, path, newDocs, idCol,
      batchId = -1L)

  private[graft] def appendBatchToFieldedTextIndex(
      spark: SparkSession,
      path: String,
      newDocs: DataFrame,
      idCol: String,
      batchId: Long): FieldedTextIndex = {
    val cur = loadFieldedTextIndex(spark, path)
    // a micro-batch at or below the FIELDED-root maintenance watermark
    // was folded/mutated after it committed: its replay must write
    // nothing AT ALL — per-field suppression alone would still let the
    // N-delta rewrite re-create a partition the compaction folded into
    // the base row (a double count)
    if (batchId >= 0L &&
        batchId <= CellTable.readMaintainedThrough(spark, path)) return cur
    val n = newDocs.count()
    // an empty batch writes nothing anywhere — in particular it must
    // not land a zero delta partition or clear any field's
    // empty-index schema sentinel
    if (n == 0L) return cur
    val pinned = newDocs.localCheckpoint(eager = false)
    cur.fields.foreach(f =>
      appendBatchToTextIndex(spark, s"$path/field_$f", pinned, idCol, f,
        batchId))
    writeNDelta(spark, path, n, batchId)
    loadFieldedTextIndex(spark, path)
  }

  /**
   * Continuous fielded indexing — the [[streamToTextIndex]] protocol
   * fanned out per field (the streamCardViews shape): each
   * micro-batch heartbeats the writer lease, refuses inside a
   * writer-exclusive maintenance window, lands every field's postings
   * and stats delta under its own `__batch` partitions with dynamic
   * overwrite, and dynamic-overwrites its own N delta — so a replayed
   * micro-batch (crash between fields included) replaces exactly its
   * own files in EVERY field and its own N contribution:
   * effectively-once across the whole fan-out on at-least-once
   * delivery. One streaming writer per path. Returns the writer — set
   * trigger/checkpoint and `.start()`.
   */
  def streamToFieldedTextIndex(
      stream: DataFrame,
      path: String,
      idCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        Maintenance.heartbeat(batch.sparkSession, path)
        Maintenance.requireNoExclusiveMaintenance(batch.sparkSession, path)
        appendBatchToFieldedTextIndex(batch.sparkSession, path, batch,
          idCol, batchId)
        ()
    }

  /**
   * Small-file reclaim for a long-streamed fielded index:
   * [[compactTextIndex]] per field, then the N-delta table folds into
   * one base row PLUS the newest streaming batch's row — kept
   * unfolded for the same reason the per-field stats folds keep it
   * (that batch may replay after a crash of a mid-commit writer and
   * dynamic-overwrite its own partition; were its delta already in
   * the base row, the replay would double-count it). Replays of the
   * FOLDED batches are suppressed by the fielded-root maintenance
   * watermark, advanced before the fold. Writer-exclusive (enforced
   * per field by compactTextIndex's stats fold). A crash inside the
   * N rewrite repairs with [[setFieldedTextIndexN]].
   */
  def compactFieldedTextIndex(
      spark: SparkSession, path: String): FieldedTextIndex =
      Maintenance.withExclusiveLock(spark, path) {
    import spark.implicits._
    val cur = loadFieldedTextIndex(spark, path)
    cur.fields.foreach(f => compactTextIndex(spark, s"$path/field_$f"))
    val rows = spark.read.parquet(s"$path/n_deltas")
      .select(F.col("n_delta"),
        F.col("__batch").cast("long").as("__batch"))
      .as[(Long, Long)].collect()
    val maxStream = rows.map(_._2).filter(_ >= 0L).sorted.lastOption
      .getOrElse(-1L)
    val (keep, fold) = rows.partition(r => maxStream >= 0L && r._2 == maxStream)
    if (fold.length > 1 || fold.exists(_._2 != -1L)) {
      val foldedMax = fold.map(_._2).filter(_ >= 0L).sorted.lastOption
        .getOrElse(-1L)
      // suppress folded-batch replays FIRST: a crash between the
      // watermark and the rewrite leaves a correct, merely unfolded,
      // delta table
      if (foldedMax > CellTable.readMaintainedThrough(spark, path))
        CellTable.writeMaintainedThrough(spark, path, foldedMax)
      ((fold.map(_._1).sum, -1L) +: keep.toSeq)
        .toDF("n_delta", "__batch")
        .repartition(1)
        .write.partitionBy("__batch").mode("overwrite")
        .parquet(s"$path/n_deltas")
    }
    loadFieldedTextIndex(spark, path)
  }

  /** Takedown from every field index ([[removeFromTextIndex]] per
    * field). N shrinks by the count of requested ids ACTUALLY PRESENT
    * in the index (the union of per-field postings) — never by the
    * request size, so a retried or over-broad takedown list cannot
    * drift the idf denominator (a doc with no indexable tokens in any
    * field is invisible to scores either way). */
  def removeFromFieldedTextIndex(
      spark: SparkSession,
      path: String,
      ids: DataFrame,
      idCol: String): FieldedTextIndex =
      // the FIELDED-root lease + marker: the streaming sink heartbeats
      // (and checks markers at) this root, not the per-field roots —
      // without this wrapper a takedown could interleave a LIVE
      // fielded stream whose per-field checks never see it
      Maintenance.withExclusiveLock(spark, path) {
    val cur = loadFieldedTextIndex(spark, path)
    val del = ids.select(F.col(idCol).as("id")).distinct()
      .localCheckpoint(eager = false)
    val present = cur.fields.map(f =>
        cur.perField(f).postings.select(F.col("id")))
      .reduce(_ unionByName _)
      .join(F.broadcast(del), Seq("id"), "left_semi")
      .distinct().count()
    cur.fields.foreach(f =>
      removeFromTextIndex(spark, s"$path/field_$f", del, "id"))
    if (present > 0L)
      writeNDelta(spark, path, -math.min(present, cur.nDocs), batchId = -1L)
    loadFieldedTextIndex(spark, path)
  }

  /** Reconcile the idf denominator to a known corpus count — a static
    * overwrite of the whole N-delta table with one base row (the
    * repair for a crashed BATCH [[appendToFieldedTextIndex]] loop). */
  def setFieldedTextIndexN(
      spark: SparkSession, path: String, nDocs: Long): FieldedTextIndex = {
    writeNDelta(spark, path, nDocs, batchId = -1L, base = true)
    loadFieldedTextIndex(spark, path)
  }

  private def writeFieldsManifest(
      spark: SparkSession, path: String, fields: Seq[String],
      nDocs: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "_fields.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val json = s"""{"n_docs":$nDocs,"fields":[${fields
      .map(f => "\"" + f + "\"").mkString(",")}]}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /**
   * BM25F probe of a saved [[FieldedTextIndex]] — [[bm25fTopK]]'s
   * semantics over persisted per-field postings: each field's scan
   * partition-prunes to the query-term buckets, tfn uses the saved
   * EXACT per-field avgdl, the cross-field sum rides one id
   * repartition, dfs (any-field document frequency) broadcast back,
   * and idf uses the manifest's N. `fieldParams` is (field, w_f, b_f);
   * every named field must exist in the index.
   */
  def bm25fTopKIndexed(
      idx: FieldedTextIndex,
      fieldParams: Seq[(String, Double, Double)],
      queryTerms: Seq[String],
      k: Int,
      k1: Double = DefaultK1): DataFrame = {
    require(queryTerms.nonEmpty, "bm25fTopKIndexed: empty query")
    require(fieldParams.nonEmpty, "bm25fTopKIndexed: no fields")
    val q = queryTerms.map(_.toLowerCase).distinct
    val perField = fieldParams.map { case (f, w, bf) =>
      require(bf >= 0.0 && bf <= 1.0, s"b for field $f must be in [0,1], got $bf")
      val fi = idx.perField.getOrElse(f, throw new IllegalArgumentException(
        s"field '$f' not in the index (has: ${idx.fields.mkString(", ")})"))
      val qBuckets = q.map(t => localTermBucket(t, fi.buckets)).distinct
      fi.postings
        .filter(F.col("__bucket").isin(qBuckets: _*))
        .filter(F.col("term").isin(q: _*))
        .select(F.col("term"), F.col("id"),
          (F.lit(w) * F.col("tf") /
            (F.lit(1.0 - bf) + F.lit(bf) * F.col("dl") / F.lit(fi.avgdl)))
            .as("__tfn"))
    }
    val tft = perField.reduce(_ unionByName _)
      .repartition(F.col("id"))
      .groupBy(F.col("term"), F.col("id"))
      .agg(F.sum(F.col("__tfn")).as("__tft"))
    val dfs = tft.groupBy(F.col("term")).agg(F.count(F.lit(1)).as("df"))
    val scored = tft.join(F.broadcast(dfs), "term")
      .withColumn("__idf", F.log(F.lit(1.0) +
        (F.lit(idx.nDocs.toDouble) - F.col("df") + F.lit(0.5)) /
          (F.col("df") + F.lit(0.5))))
      .withColumn("__w",
        F.col("__idf") * F.col("__tft") / (F.lit(k1) + F.col("__tft")))
      .groupBy(F.col("id"))
      .agg(F.sum(F.col("__w")).as("score"),
        F.count(F.lit(1)).as("n_terms_hit"))
    rankTopK(scored, k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("n_terms_hit"))
  }

  /**
   * Batched multi-query BM25F over a saved [[FieldedTextIndex]] —
   * [[bm25TopKBatch]]'s fielded sibling: ONE union-of-terms
   * partition-pruned scan per field, the cross-field tf sum computed
   * ONCE (it is query-independent, like the per-term dfs), then the
   * (term → query) map broadcasts and one query_id repartition serves
   * the per-query sum and window. `queries` is (query_id, terms).
   */
  def bm25fTopKBatch(
      idx: FieldedTextIndex,
      fieldParams: Seq[(String, Double, Double)],
      queries: DataFrame,
      k: Int,
      k1: Double = DefaultK1): DataFrame = {
    require(fieldParams.nonEmpty, "bm25fTopKBatch: no fields")
    val spark = queries.sparkSession
    import spark.implicits._
    val qCols = queries.columns
    val q = queries
      .select(F.col(qCols(0)).as("query_id"),
        F.explode(F.col(qCols(1))).as("__qt"))
      .select(F.col("query_id"), F.lower(F.col("__qt")).as("term"))
      .distinct()
      .localCheckpoint(eager = false)
    val terms = q.select("term").distinct().as[String].collect().toSeq
    require(terms.nonEmpty, "bm25fTopKBatch: no query terms")
    val perField = fieldParams.map { case (f, w, bf) =>
      require(bf >= 0.0 && bf <= 1.0, s"b for field $f must be in [0,1], got $bf")
      val fi = idx.perField.getOrElse(f, throw new IllegalArgumentException(
        s"field '$f' not in the index (has: ${idx.fields.mkString(", ")})"))
      val qBuckets = terms.map(t => localTermBucket(t, fi.buckets)).distinct
      fi.postings
        .filter(F.col("__bucket").isin(qBuckets: _*))
        .filter(F.col("term").isin(terms: _*))
        .select(F.col("term"), F.col("id"),
          (F.lit(w) * F.col("tf") /
            (F.lit(1.0 - bf) + F.lit(bf) * F.col("dl") / F.lit(fi.avgdl)))
            .as("__tfn"))
    }
    // the cross-field saturation input and the any-field dfs are
    // query-INDEPENDENT — computed once for the whole batch
    val tft = perField.reduce(_ unionByName _)
      .repartition(F.col("id"))
      .groupBy(F.col("term"), F.col("id"))
      .agg(F.sum(F.col("__tfn")).as("__tft"))
    val dfs = tft.groupBy(F.col("term")).agg(F.count(F.lit(1)).as("df"))
    val scored = tft
      .join(F.broadcast(q), "term")
      .join(F.broadcast(dfs), "term")
      .withColumn("__idf", F.log(F.lit(1.0) +
        (F.lit(idx.nDocs.toDouble) - F.col("df") + F.lit(0.5)) /
          (F.col("df") + F.lit(0.5))))
      .withColumn("__w",
        F.col("__idf") * F.col("__tft") / (F.lit(k1) + F.col("__tft")))
      .repartition(F.col("query_id"))
      .groupBy(F.col("query_id"), F.col("id"))
      .agg(F.sum(F.col("__w")).as("score"),
        F.count(F.lit(1)).as("n_terms_hit"))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("score").desc, F.col("id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "id", "score", "n_terms_hit")
  }

  // ---------------------------------------------------------------- //
  // Persisted index                                                   //
  // ---------------------------------------------------------------- //

  /** Bucket a term for partition layout: pmod(xxhash64(term), buckets).
    * LONG math throughout (repo rule: `/` on longs is double division —
    * pmod is the safe form). */
  def termBucket(term: Column, buckets: Int): Column =
    F.pmod(F.xxhash64(term), F.lit(buckets.toLong))

  /**
   * A built lexical index: bucket-tagged postings plus the corpus
   * stats needed by BM25. [[save]] persists it partitioned by
   * (`__bucket`, `__batch`); [[Retrieval.loadTextIndex]] reloads it,
   * so the one-off indexing pass is reused across sessions and query
   * batches.
   *
   * == On-disk layout (the SketchView `__batch` protocol) ==
   *
   * `path/postings/__bucket=B/__batch=N/part-*.parquet` plus delta
   * stats rows at `path/stats/__batch=N/` carrying EXACT
   * (n_delta, dl_delta) token totals — [[loadTextIndex]] SUMS them, so
   * `nDocs`/`avgdl` stay exact through any append/remove schedule (no
   * incremental-float-mean drift). Batch maintenance writes
   * `__batch=-1`; [[streamToTextIndex]] stamps the micro-batch id with
   * dynamic overwrite, so a replayed micro-batch replaces exactly its
   * own postings AND its own stats row — effectively-once on
   * Structured Streaming's at-least-once foreachBatch contract. One
   * streaming writer per path; batch appends/removals interleave
   * safely (pure file adds / touched-partition rewrites).
   *
   * `dlSum` is the exact corpus token total behind `avgdl` (-1 when
   * unknown on ad-hoc constructions).
   */
  final case class TextIndex(postings: DataFrame, buckets: Int,
      nDocs: Long, avgdl: Double, dlSum: Long = -1L) {
    def save(path: String): Unit = {
      val spark = postings.sparkSession
      // a RE-save over an existing path must drop the old meta BEFORE
      // overwriting the postings: a crash between the two would
      // otherwise leave OLD meta describing NEW postings — the one
      // stale-LOW direction the MaxScore soundness argument cannot
      // absorb (missing meta merely falls back)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/term_meta"), true)
      postings.withColumn("__batch", F.lit(-1L))
        .repartition(F.col("__bucket"))
        .write.partitionBy("__bucket", "__batch").mode("overwrite")
        .parquet(s"$path/postings")
      writeStatsDelta(spark, path, buckets, nDocs,
        if (dlSum >= 0) dlSum else math.rint(avgdl * nDocs).toLong,
        batchId = -1L, overwrite = true)
      writeTermMetaBatch(postings, path, batchId = -1L, overwrite = true)
    }
  }

  // ---------------------------------------------------------------- //
  // Per-term impact metadata (the MaxScore side table)                //
  // ---------------------------------------------------------------- //

  /**
   * Per-term score-bound metadata of an index frame: one row per
   * (__bucket, term) with (max_tf, min_dl). Together with the exact
   * query-time df these bound any posting's BM25 weight from above —
   * the weight is monotone INCREASING in tf and DECREASING in dl, so
   *
   *   w(tf, dl) <= idf(df) * (k1+1) * max_tf
   *                / (max_tf + k1 * ((1-b) + b * min_dl / avgdl))
   *
   * for every posting of the term, for ANY (k1, b) — the bound is not
   * baked to one parameterization.
   */
  private[pipeline] def termMetaOf(index: DataFrame): DataFrame =
    index.groupBy(F.col("__bucket"), F.col("term"))
      .agg(F.max(F.col("tf")).as("max_tf"), F.min(F.col("dl")).as("min_dl"))

  /** One meta write, mirroring the postings writer modes: `-1` batch
    * maintenance appends (or statically overwrites on a fresh save);
    * a real micro-batch id dynamic-overwrites its own partitions so a
    * replay converges. */
  private def writeTermMetaBatch(index: DataFrame, path: String,
      batchId: Long, overwrite: Boolean): Unit = {
    val w = termMetaOf(index).withColumn("__batch", F.lit(batchId))
      .repartition(F.col("__bucket"))
      .write.partitionBy("__bucket", "__batch")
    (if (overwrite && batchId == -1L) w.mode("overwrite")
     else if (batchId == -1L) w.mode("append")
     else w.option("partitionOverwriteMode", "dynamic").mode("overwrite"))
      .parquet(s"$path/term_meta")
  }

  /**
   * Backfill the term-meta side table onto a legacy saved index (one
   * consolidated row per (bucket, term) from the live postings).
   * Exclusive maintenance: a concurrent writer's meta rows would be
   * lost by the static overwrite, leaving stale-LOW bounds — the one
   * direction the soundness argument cannot absorb.
   */
  def buildTermMeta(spark: SparkSession, path: String): Unit =
    Maintenance.withExclusiveLock(spark, path) {
      writeTermMetaBatch(loadTextIndex(spark, path).postings, path,
        batchId = -1L, overwrite = true)
    }

  private def writeStatsDelta(
      spark: SparkSession, path: String, buckets: Int,
      nDelta: Long, dlDelta: Long, batchId: Long,
      overwrite: Boolean): Unit = {
    import spark.implicits._
    val w = Seq((buckets, nDelta, dlDelta, batchId))
      .toDF("buckets", "n_delta", "dl_delta", "__batch")
      .repartition(1)
      .write.partitionBy("__batch")
    (if (overwrite && batchId == -1L) w.mode("overwrite")
     else if (overwrite)
       w.option("partitionOverwriteMode", "dynamic").mode("overwrite")
     else w.mode("append"))
      .parquet(s"$path/stats")
  }

  /** Exact (n_docs, Σdl) of an index frame — the delta every stats row
    * carries (long sums; means derive at load time). */
  private def exactStats(index: DataFrame): (Long, Long) = {
    val r = index.select(F.col("id"), F.col("dl")).distinct()
      .agg(F.count(F.lit(1)), F.sum(F.col("dl"))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** One-off indexing pass for [[TextIndex]]. The stats aggregate is
    * the only action (2 tiny numbers); the postings stay lazy until
    * saved or queried. */
  def buildTextIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 64): TextIndex = {
    // pin the postings: the eager stats aggregate below is always
    // followed by at least one more read (save or probe), and without
    // the pin each one re-runs the full tokenize + postings shuffle
    val index = buildIndex(docs, idCol, textCol)
      .withColumn("__bucket", termBucket(F.col("term"), buckets))
      .localCheckpoint(eager = false)
    val (n, dl) = exactStats(index)
    TextIndex(index, buckets, n,
      if (n == 0) 0.0 else dl.toDouble / n, dl)
  }

  /** [[buildTextIndex]] through the Porter-stemmed analyzer — probe a
    * SAVED stemmed index with [[bm25TopKIndexedStemmed]] (the query
    * must stem with the same kernel; every TextIndex protocol —
    * save/append/remove/compact/stream/MaxScore meta — applies
    * unchanged, the analyzer only changes what a "term" is). */
  def buildStemmedTextIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 64): TextIndex = {
    // pinned for the same reason as [[buildTextIndex]]
    val index = buildStemmedIndex(docs, idCol, textCol)
      .withColumn("__bucket", termBucket(F.col("term"), buckets))
      .localCheckpoint(eager = false)
    val (n, dl) = exactStats(index)
    TextIndex(index, buckets, n,
      if (n == 0) 0.0 else dl.toDouble / n, dl)
  }

  /** [[bm25TopKIndexed]] with the query run through the SAME stemmer
    * a [[buildStemmedTextIndex]] index was built with. */
  def bm25TopKIndexedStemmed(
      idx: TextIndex,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame =
    bm25TopKIndexed(idx, Stemmer.stemQuery(queryTerms).distinct, k, k1, b)

  /**
   * Incrementally index a new document batch into a SAVED index:
   * the batch's postings (bucketed with the index's own bucket count)
   * are APPENDED to the partitioned postings layout and the 1-row
   * stats are updated from the batch's token totals. The history is
   * never re-read, re-shingled, or re-shuffled — cost is one shuffle
   * over the new batch, the same incremental contract as
   * [[Dedup.incrementalDuplicates]].
   *
   * BM25 needs no further reconciliation: document frequencies are
   * derived from the matched postings at query time, so appended
   * documents integrate exactly — a probe of (index ∪ batch) equals a
   * probe of an index built on the union from scratch. Re-ingesting an
   * id that is already indexed is the caller's responsibility (it
   * would double-count, as in every append-only index).
   *
   * Returns the updated index handle (reload cost only — stats row).
   */
  def appendToTextIndex(
      spark: SparkSession,
      path: String,
      newDocs: DataFrame,
      idCol: String,
      textCol: String): TextIndex =
    appendBatchToTextIndex(spark, path, newDocs, idCol, textCol,
      batchId = -1L)

  /** One (batch or micro-batch) append. Batch maintenance stamps
    * `__batch=-1` as pure file-adds; a real micro-batch id writes with
    * DYNAMIC overwrite so a replay replaces exactly its own postings
    * and its own stats row (effectively-once). */
  private[graft] def appendBatchToTextIndex(
      spark: SparkSession,
      path: String,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      batchId: Long): TextIndex = {
    val prior = loadTextIndex(spark, path)
    // a micro-batch at or below the maintenance watermark was already
    // MUTATED by a removal/reconcile after it committed to disk: its
    // replay must write nothing, or the taken-down documents (and the
    // folded stats) would resurrect — the SketchView foldedThroughBatch
    // contract applied to search
    if (batchId >= 0L && batchId <= readMaintainedThrough(spark, path))
      return prior
    val batch = buildIndex(newDocs, idCol, textCol)
      .withColumn("__bucket", termBucket(F.col("term"), prior.buckets))
      .localCheckpoint(eager = false)
    val (nNew, dlNew) = exactStats(batch)
    // an all-empty batch (no indexable rows) writes nothing — in
    // particular it must NOT clear the empty-index schema sentinel,
    // or a zero-row partitioned write would leave the directory
    // uninferrable and kill every later load
    if (nNew == 0L) return prior
    // an index once emptied by removeFromTextIndex holds a flat
    // schema-sentinel file; partitioned appends must clear it or the
    // mixed directory depth breaks discovery
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val proot = new org.apache.hadoop.fs.Path(s"$path/postings")
    if (fs.exists(proot)) fs.listStatus(proot).foreach { st =>
      if (st.isFile && !st.getPath.getName.startsWith("_"))
        fs.delete(st.getPath, false)
    }
    // term-meta BEFORE postings: a crash between the two leaves meta
    // rows describing postings that never landed — bounds stale-HIGH
    // (sound, merely loose; a replayed micro-batch converges via its
    // dynamic overwrite). The reverse order would leave stale-LOW
    // bounds, which silently breaks MaxScore pruning. Maintained only
    // on meta-bearing indexes (dir present, or a fresh/emptied index
    // this append re-seeds); legacy indexes opt in via
    // [[buildTermMeta]].
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/term_meta")) ||
        prior.nDocs == 0L)
      writeTermMetaBatch(batch, path, batchId, overwrite = false)
    val w = batch.withColumn("__batch", F.lit(batchId))
      .repartition(F.col("__bucket"))
      .write.partitionBy("__bucket", "__batch")
    (if (batchId == -1L) w.mode("append")
     else w.option("partitionOverwriteMode", "dynamic").mode("overwrite"))
      .parquet(s"$path/postings")
    writeStatsDelta(spark, path, prior.buckets, nNew, dlNew, batchId,
      overwrite = batchId != -1L)
    loadTextIndex(spark, path)
  }

  /**
   * Fold a saved text index's retired posting batches into the base
   * `__batch=-1` layer, one file per bucket — the small-file reclaim
   * for long-lived [[streamToTextIndex]] writers (each micro-batch
   * leaves one file per touched bucket). The newest streaming batch
   * stays merge-on-read; a crash-replay of a FOLDED batch writes
   * nothing (the fold advances `_maintained_through` before pruning,
   * and the postings fold is crash-safe via the shared staged-fold +
   * journal protocol). The stats deltas then fold into one exact base
   * row — their SUM is invariant under folding, so a crash between
   * the two folds leaves a correct, merely unfolded, stats table; a
   * crash inside the stats rewrite repairs with
   * [[reconcileTextIndexStats]]. Contract — ENFORCED, not
   * conventional: single-maintainer (the [[Maintenance]] lock at
   * `path`, held across BOTH folds) AND the streaming writer stopped
   * (refused while a writer heartbeat is fresh — the stats fold
   * statically rewrites the delta table, so a concurrently appended
   * delta row would be lost). Returns the reloaded index.
   */
  def compactTextIndex(spark: SparkSession, path: String): TextIndex =
    Maintenance.withExclusiveLock(spark, path) {
      compactTextIndexLocked(spark, path)
    }

  /** Auto-compaction policy hook for a LIVE index: fold the postings
    * iff they hold more than `maxFilesPerBucket` files per bucket.
    * Postings-only — the CellTable snapshot fold is safe under a
    * running [[streamToTextIndex]] writer, and an unfolded stats table
    * is merely unfolded, never wrong (the deltas SUM exactly); the
    * stats fold stays inside the writer-stopped [[compactTextIndex]].
    * Returns true iff a fold ran. */
  def maybeCompactTextIndex(
      spark: SparkSession, path: String,
      maxFilesPerBucket: Int = 4): Boolean =
    CellTable.maybeCompact(spark, path, s"$path/postings",
      maxFilesPerBucket, keyName = "__bucket")

  private def compactTextIndexLocked(
      spark: SparkSession, path: String): TextIndex = {
    import spark.implicits._
    val maxFolded = CellTable.compactLocked(spark, path, s"$path/postings",
      keyName = "__bucket")
    // fold exactly the batches the postings fold retired (and the -1
    // layer) — the EXCLUDED newest batch keeps its own delta row, so
    // its replay still dynamic-overwrites its own stats partition
    // instead of double-appending
    val rows = spark.read.parquet(s"$path/stats")
      .select(F.col("buckets"), F.col("n_delta"), F.col("dl_delta"),
        F.col("__batch").cast("long").as("__batch"))
      .as[(Int, Long, Long, Long)].collect()
    val (fold, keep) = rows.partition(_._4 <= maxFolded)
    if (fold.length > 1 || fold.exists(_._4 != -1L)) {
      val buckets = rows.map(_._1).max
      val merged = (buckets, fold.map(_._2).sum, fold.map(_._3).sum, -1L)
      (merged +: keep.toSeq)
        .toDF("buckets", "n_delta", "dl_delta", "__batch")
        .repartition(1)
        .write.partitionBy("__batch").mode("overwrite")
        .parquet(s"$path/stats")
    }
    // fold the term-meta deltas over the SAME batch boundary: max/min
    // are exact under any grouping, so the fold is pure consolidation.
    // Static overwrite (lineage cut first) — the lock + writer-stopped
    // contract already covers it, same as the stats fold above; a
    // crash mid-overwrite leaves missing meta (probe treats missing
    // terms as always-essential: sound), repaired by re-compacting or
    // [[reconcileTextIndexStats]].
    val metaRoot = new org.apache.hadoop.fs.Path(s"$path/term_meta")
    val mfs = metaRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (mfs.exists(metaRoot)) {
      val m = spark.read.parquet(s"$path/term_meta")
        .withColumn("__bucket", F.col("__bucket").cast("long"))
        .withColumn("__batch", F.col("__batch").cast("long"))
      val foldable = m.filter(F.col("__batch") <= maxFolded)
      val folded = foldable
        .groupBy(F.col("__bucket"), F.col("term"))
        .agg(F.max(F.col("max_tf")).as("max_tf"),
          F.min(F.col("min_dl")).as("min_dl"))
        .withColumn("__batch", F.lit(-1L))
      val out = folded.unionByName(
          m.filter(F.col("__batch") > maxFolded)
            .select("__bucket", "term", "max_tf", "min_dl", "__batch"))
        .localCheckpoint(eager = true)
      out.repartition(F.col("__bucket"))
        .write.partitionBy("__bucket", "__batch").mode("overwrite")
        .parquet(s"$path/term_meta")
    }
    loadTextIndex(spark, path)
  }

  // watermark plumbing is shared with the cell-table family — ONE
  // implementation of the crash-protocol file format (two copies is
  // how they drift)
  private def readMaintainedThrough(spark: SparkSession, path: String): Long =
    CellTable.readMaintainedThrough(spark, path)

  private def writeMaintainedThrough(
      spark: SparkSession, path: String, v: Long): Unit =
    CellTable.writeMaintainedThrough(spark, path, v)

  /** Repair path for a crash between a removal's postings rewrite and
    * its stats delta: recount the postings EXACTLY and rewrite the
    * stats as one base row (advancing the maintenance watermark like a
    * removal — run it with the streaming writer stopped). */
  def reconcileTextIndexStats(spark: SparkSession, path: String): TextIndex =
      Maintenance.withExclusiveLock(spark, path) {
    val prior = loadTextIndex(spark, path)
    val (n, dl) = exactStats(prior.postings)
    val maxStream = maxStreamBatch(prior.postings)
    writeStatsDelta(spark, path, prior.buckets, n, dl, batchId = -1L,
      overwrite = true) // static overwrite: ONE base row replaces all deltas
    // exact meta rebuild rides the same repair (tightens any stale-
    // HIGH bounds a crashed append/removal left behind)
    val metaRoot = new org.apache.hadoop.fs.Path(s"$path/term_meta")
    if (metaRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(metaRoot) && n > 0)
      writeTermMetaBatch(prior.postings, path, batchId = -1L,
        overwrite = true)
    if (maxStream >= 0L) writeMaintainedThrough(spark, path, maxStream)
    loadTextIndex(spark, path)
  }

  private def maxStreamBatch(postings: DataFrame): Long = {
    val r = postings.agg(F.max(F.when(F.col("__batch") >= 0L,
      F.col("__batch")))).head()
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  /**
   * Continuous indexing: a foreachBatch sink that lands each
   * micro-batch's postings and stats delta under its own `__batch`
   * partitions with dynamic overwrite — a replayed micro-batch
   * replaces exactly its own files, so the index stays correct
   * (effectively-once) on at-least-once delivery, the
   * [[graft.sketch.SketchView.streamAppend]] protocol applied to
   * search. One streaming writer per path; batch
   * [[appendToTextIndex]]/[[removeFromTextIndex]] interleave safely.
   * Returns the writer — set trigger/checkpoint and `.start()`.
   */
  def streamToTextIndex(
      stream: DataFrame,
      path: String,
      idCol: String,
      textCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        Maintenance.heartbeat(batch.sparkSession, path)
        Maintenance.requireNoExclusiveMaintenance(batch.sparkSession, path)
        appendBatchToTextIndex(batch.sparkSession, path, batch, idCol,
          textCol, batchId)
        ()
    }

  /**
   * Takedown removal from a SAVED text index — [[appendToTextIndex]]'s
   * inverse: one postings scan finds the touched term buckets and the
   * doomed documents' exact (count, Σdl); only those bucket partitions
   * rewrite (anti-join against the broadcast id set, dynamic
   * overwrite; emptied bucket dirs are deleted explicitly), and the
   * 1-row stats update by exact subtraction. Document frequencies
   * derive from matched postings at QUERY time, so a probe of the
   * pruned index ranks like an index built on the remaining corpus —
   * the append-equivalence argument, reversed (stats are exact delta
   * sums, so even avgdl matches a rebuild bit-for-bit). Returns the
   * reloaded index.
   *
   * Contract — ENFORCED via the [[Maintenance]] lock and writer-lease
   * guard: single-maintainer AND the streaming writer stopped (the
   * SketchView backfill/expire rule) — the removal first advances the
   * `_maintained_through` watermark so a crash-replay of an
   * already-mutated micro-batch writes nothing instead of
   * resurrecting the removed documents. A crash between the postings
   * rewrite and the stats delta leaves stats overcounted; repair with
   * [[reconcileTextIndexStats]] (an exact recount).
   */
  def removeFromTextIndex(
      spark: SparkSession,
      path: String,
      ids: DataFrame,
      idCol: String): TextIndex = Maintenance.withExclusiveLock(spark, path) {
    // finish any crashed postings compaction FIRST: a later recovery
    // would otherwise move the staged PRE-removal fold into __batch=-1,
    // resurrecting the removed documents and duplicating folded rows
    CellTable.recover(spark, s"$path/postings", keyName = "__bucket")
    val prior = loadTextIndex(spark, path)
    val del = ids.select(F.col(idCol).as("id")).distinct()
      .localCheckpoint(eager = false)
    // one scan: touched (bucket, batch) partitions, which of them
    // empty out, and the doomed docs' exact token totals
    val marked = prior.postings
      .join(F.broadcast(del.withColumn("__del", F.lit(1))), Seq("id"), "left")
      .localCheckpoint(eager = false)
    val perPart = marked.groupBy(F.col("__bucket"), F.col("__batch"))
      .agg(F.sum(F.coalesce(F.col("__del"), F.lit(0))).as("__doomed"),
           F.count(F.lit(1)).as("__n"))
      .filter(F.col("__doomed") > 0)
      .select(F.col("__bucket"), F.col("__batch"),
        (F.col("__n") === F.col("__doomed")).as("__e"))
      .collect()
    if (perPart.isEmpty) return prior
    // suppress crash-replays of every streaming batch on disk BEFORE
    // mutating any of them: a batch whose checkpoint never committed
    // would otherwise be replayed after this removal and resurrect the
    // taken-down documents (its files are complete on disk — the
    // stream writer must be STOPPED during removals, the SketchView
    // backfill/expire contract — so suppression loses nothing)
    val maxStream = maxStreamBatch(prior.postings)
    if (maxStream > readMaintainedThrough(spark, path))
      writeMaintainedThrough(spark, path, maxStream)
    val touched = perPart.map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rm = marked.filter(F.col("__del").isNotNull)
      .select(F.col("id"), F.col("dl")).distinct()
      .agg(F.count(F.lit(1)).as("n"), F.sum(F.col("dl")).as("s")).head()
    val nRm = rm.getLong(0)
    val dlRm = if (rm.isNullAt(1)) 0L else rm.getLong(1)
    val nDocs = prior.nDocs - nRm
    val touchedBuckets = touched.map(_._1).distinct
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (nDocs <= 0) {
      // the index emptied out entirely: a partitioned write of zero
      // rows writes NOTHING (no partition values) and deleting every
      // partition dir leaves an uninferrable directory — land one
      // empty schema-bearing file instead (the partition keys become
      // plain columns; a later append clears the sentinel). The empty
      // frame is built from the schema (no lineage from the path being
      // overwritten).
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          prior.postings.schema)
        .repartition(1)
        .write.mode("overwrite").parquet(s"$path/postings")
    } else {
      // survivors go to a sibling STAGE dir first (the Compaction
      // temp-dir pattern: no executor-storage materialization of the
      // rewrite, and a crash before the swap leaves the old index
      // intact), then each touched (bucket, batch) partition swaps by
      // rename; an emptied partition has no staged dir — delete only.
      // A crash mid-swap leaves some partitions already pruned (docs
      // transiently under-counted, never resurrected) — re-running the
      // removal finishes, reconcileTextIndexStats repairs stats.
      val stage = s"$path/postings__takedown"
      prior.postings
        .filter(F.col("__bucket").isInCollection(touchedBuckets))
        .filter(F.array_contains(F.typedLit(touched),
          F.struct(F.col("__bucket").as("_1"), F.col("__batch").as("_2"))))
        .join(F.broadcast(del), Seq("id"), "left_anti")
        .repartition(F.col("__bucket"))
        .write.partitionBy("__bucket", "__batch")
        .mode("overwrite").parquet(stage)
      touched.foreach { case (b, batch) =>
        val orig = new org.apache.hadoop.fs.Path(
          s"$path/postings/__bucket=$b", s"__batch=$batch")
        if (fs.exists(orig) && !fs.delete(orig, true))
          throw new java.io.IOException(s"takedown: cannot prune $orig")
        val staged = new org.apache.hadoop.fs.Path(
          s"$stage/__bucket=$b", s"__batch=$batch")
        if (fs.exists(staged)) {
          fs.mkdirs(orig.getParent)
          if (!fs.rename(staged, orig))
            throw new java.io.IOException(
              s"takedown: swap failed: $staged -> $orig")
        }
      }
      fs.delete(new org.apache.hadoop.fs.Path(stage), true)
      // drop bucket dirs whose last batch dir just went away
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/postings"))
        .foreach { st =>
          if (st.isDirectory && st.getPath.getName.startsWith("__bucket=") &&
              fs.listStatus(st.getPath).isEmpty)
            fs.delete(st.getPath, false)
        }
    }
    // term-meta AFTER the postings rewrite: recompute the touched
    // buckets from the surviving postings (exact tightening). A crash
    // before this point leaves the PRE-removal meta — removal only
    // shrinks max_tf / grows min_dl, so stale meta is stale-HIGH:
    // sound, merely loose. Delete-then-append per bucket: the crash
    // window between them shows missing meta rows, which the probe
    // treats as an unbounded (always-essential) term — also sound.
    val metaRoot = new org.apache.hadoop.fs.Path(s"$path/term_meta")
    if (fs.exists(metaRoot)) {
      if (nDocs <= 0) fs.delete(metaRoot, true)
      else {
        val fresh = termMetaOf(loadTextIndex(spark, path).postings
            .filter(F.col("__bucket").isInCollection(touchedBuckets)))
          .withColumn("__batch", F.lit(-1L))
          .localCheckpoint(eager = true)
        touchedBuckets.foreach { bkt =>
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$path/term_meta/__bucket=$bkt"), true)
        }
        fresh.repartition(F.col("__bucket"))
          .write.partitionBy("__bucket", "__batch").mode("append")
          .parquet(s"$path/term_meta")
      }
    }
    // negative exact delta; batch maintenance rides the -1 partition
    writeStatsDelta(spark, path, prior.buckets, -nRm, -dlRm,
      batchId = -1L, overwrite = false)
    loadTextIndex(spark, path)
  }

  /**
   * Nightly search-index sync from snapshot diffs — the composition a
   * delta pipeline runs instead of re-indexing the corpus:
   * [[graft.pipeline.Snapshot.diffSnapshots]] classifies every id,
   * `removed`/`changed` ids leave the index
   * ([[removeFromTextIndex]]) and `added`/`changed` docs from the NEW
   * snapshot append ([[appendToTextIndex]]). `unchanged` documents are
   * never re-tokenized, re-shuffled, or rewritten (outside the term
   * buckets their removal peers touch). Posting sets AND stats equal a
   * rebuild on the new snapshot EXACTLY (stats are summed exact-long
   * deltas, so avgdl is a fresh mean either way).
   * Returns the synced index.
   */
  def syncTextIndex(
      spark: SparkSession,
      path: String,
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      textCol: String): TextIndex = {
    val diff = Snapshot
      .diffSnapshots(oldSnap, newSnap, idCol, Seq(textCol))
      .localCheckpoint(eager = false)
    val leaving = diff
      .filter(F.col("status").isin("removed", "changed"))
      .select(idCol)
    val arriving = newSnap.join(
      diff.filter(F.col("status").isin("added", "changed")).select(idCol),
      Seq(idCol), "left_semi")
    removeFromTextIndex(spark, path, leaving, idCol)
    appendToTextIndex(spark, path, arriving, idCol, textCol)
  }

  /** Reload an index written by [[TextIndex.save]]: stats rows are
    * EXACT deltas and sum to the current totals (so `avgdl` is a fresh
    * mean over exact longs through any append/remove schedule). */
  def loadTextIndex(spark: SparkSession, path: String): TextIndex = {
    val st = spark.read.parquet(s"$path/stats")
      .agg(F.max(F.col("buckets")), F.sum(F.col("n_delta")),
        F.sum(F.col("dl_delta"))).head()
    val buckets = st.getInt(0)
    val nDocs = if (st.isNullAt(1)) 0L else st.getLong(1)
    val dlSum = if (st.isNullAt(2)) 0L else st.getLong(2)
    val postings = CellTable.readVisible(spark, s"$path/postings", "__bucket")
      .withColumn("__bucket", F.col("__bucket").cast("long"))
      // partition-column inference types __batch as int; normalize
      // (an emptied-then-sentinel index carries it as a plain long col)
      .withColumn("__batch", F.col("__batch").cast("long"))
    TextIndex(postings, buckets, nDocs,
      if (nDocs <= 0) 0.0 else dlSum.toDouble / nDocs, dlSum)
  }

  /**
   * Point-in-time (as-of) read of a saved [[TextIndex]]: the index
   * state after streaming micro-batch `maxBatch` landed and before
   * any later batch — postings AND exact stats deltas filtered to
   * `__batch <= maxBatch` (the base `-1` layer always included), so
   * time-travel probes rank with the statistics of that moment, not
   * today's.
   *
   * Reconstructible only while the batches are still physically
   * separate: compaction folds old batches into the base layer and
   * removals mutate it, so the read REFUSES an as-of point before the
   * `_maintained_through` watermark (fail fast beats silently serving
   * a state that mixes eras). On an append-only stream the full
   * history stays addressable; schedule compaction at the retention
   * horizon you want for time travel. `maxBatch = -1` reads the base
   * layer alone.
   *
   * Scale shape: `__batch` is a partition column — the as-of filter
   * prunes directories, costing nothing over a current-state read.
   */
  def loadTextIndexAsOf(
      spark: SparkSession, path: String, maxBatch: Long): TextIndex = {
    val mt = readMaintainedThrough(spark, path)
    require(maxBatch >= mt,
      s"as-of batch $maxBatch precedes the maintenance watermark $mt " +
        "(folded/suppressed batches cannot be reconstructed)")
    val keep = (b: Column) => b === -1L || b <= maxBatch
    val st = spark.read.parquet(s"$path/stats")
      .filter(keep(F.col("__batch").cast("long")))
      .agg(F.max(F.col("buckets")), F.sum(F.col("n_delta")),
        F.sum(F.col("dl_delta"))).head()
    val buckets = st.getInt(0)
    val nDocs = if (st.isNullAt(1)) 0L else st.getLong(1)
    val dlSum = if (st.isNullAt(2)) 0L else st.getLong(2)
    val postings = CellTable.readVisible(spark, s"$path/postings", "__bucket")
      .withColumn("__bucket", F.col("__bucket").cast("long"))
      .withColumn("__batch", F.col("__batch").cast("long"))
      .filter(keep(F.col("__batch")))
    TextIndex(postings, buckets, nDocs,
      if (nDocs <= 0) 0.0 else dlSum.toDouble / nDocs, dlSum)
  }

  /**
   * Merge saved text indexes into one (shard consolidation — the
   * inverse of [[Serving.saveShardedTextIndex]]): postings union
   * under the shared bucket geometry, stats by exact long addition,
   * written as a fresh base layer at `outPath`. Source doc-id sets
   * must be disjoint (the sharded-build contract); bucket counts must
   * match (terms hash to the same bucket in every source, so the
   * union IS a valid single index — no re-bucketing shuffle beyond
   * the save's repartition).
   */
  def mergeTextIndexes(
      spark: SparkSession, sources: Seq[String], outPath: String): Unit = {
    require(sources.nonEmpty, "mergeTextIndexes: no sources")
    val idxs = sources.map(p => loadTextIndex(spark, p))
    val buckets = idxs.head.buckets
    require(idxs.forall(_.buckets == buckets),
      s"bucket counts differ: ${idxs.map(_.buckets).mkString(",")}")
    val postings = idxs.map(_.postings.drop("__batch")).reduce(_ unionByName _)
    val nDocs = idxs.map(_.nDocs).sum
    val dlSum = idxs.map(i => math.max(i.dlSum, 0L)).sum
    TextIndex(postings, buckets, nDocs,
      if (nDocs <= 0) 0.0 else dlSum.toDouble / nDocs, dlSum).save(outPath)
  }

  /**
   * BM25 top-k against a (possibly reloaded) [[TextIndex]]. The
   * `__bucket` filter is a PARTITION filter on a saved index — the
   * scan touches at most |query terms| of `buckets` directories.
   */
  def bm25TopKIndexed(
      idx: TextIndex,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets = q.map(t => graft.pipeline.Retrieval.localTermBucket(t, idx.buckets))
    val pruned = idx.postings
      .filter(F.col("__bucket").isin(qBuckets.distinct: _*))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    rankTopK(bm25Scores(pruned, stats, q, k1, b), k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  /**
   * [[bm25TopKIndexed]] with an excluded-id list (the more-like-this
   * contract: the source document must not answer its own query).
   * dfs still derive from ALL matched postings — corpus-level
   * statistics, the [[bm25ScoresFiltered]] discipline — so exclusion
   * never perturbs surviving documents' scores.
   */
  def bm25TopKIndexedExcluding(
      idx: TextIndex,
      queryTerms: Seq[String],
      k: Int,
      excluded: Seq[Long],
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets = q.map(t => localTermBucket(t, idx.buckets))
    val pruned = idx.postings
      .filter(F.col("__bucket").isin(qBuckets.distinct: _*))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    val scored = bm25Scores(pruned, stats, q, k1, b)
      .filter(!F.col("id").isin(excluded: _*))
    rankTopK(scored, k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  /** [[rankTopK]] for sibling serving modules ([[Serving]]). */
  private[pipeline] def rankTopKPublic(scored: DataFrame, k: Int): DataFrame =
    rankTopK(scored, k)

  /** [[bm25Weight]] for sibling serving modules ([[Serving]] synonym
    * scoring — one formula, every caller). */
  private[pipeline] def bm25WeightPublic(k1: Double, b: Double): Column =
    bm25Weight(k1, b)

  /**
   * Score explanation (the Lucene `explain` API shape): the per-term
   * breakdown behind a document's BM25 score — (id, term, tf, df, dl,
   * idf, weight) for each matched (doc, term) pair, restricted to the
   * docs under inspection. `sum(weight)` over a doc's rows IS its
   * served score ([[bm25Weight]], the shared builder). Serving-
   * bounded: explanations are for a handful of docs a human is
   * looking at.
   */
  def explainScores(
      idx: TextIndex,
      queryTerms: Seq[String],
      docIds: Seq[Long],
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    require(docIds.nonEmpty, "explainScores: no docs")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets = q.map(t => localTermBucket(t, idx.buckets)).distinct
    val matched = idx.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
      .filter(F.col("term").isin(q: _*))
    // corpus-level dfs from ALL matched postings, THEN the doc filter
    // (the bm25ScoresFiltered discipline — explanation must show the
    // same numbers serving used)
    val dfs = matched.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    matched.filter(F.col("id").isin(docIds: _*))
      .join(F.broadcast(dfs), "term")
      .crossJoin(F.broadcast(stats))
      .withColumn("idf", idfCol)
      .withColumn("weight", bm25Weight(k1, b))
      .select(F.col("id"), F.col("term"), F.col("tf"),
        F.col("df"), F.col("dl").cast("long").as("dl"),
        F.col("idf"), F.col("weight"))
  }

  /**
   * Static impact-ordered index pruning (Carmel et al. 2001): keep at
   * most `keepPerTerm` postings per term — the highest-impact ones,
   * by (tf DESC, id ASC) — and drop the rest. The pruned index
   * answers the same probes at a fraction of the postings IO; quality
   * degrades gracefully because the dropped postings are precisely
   * the lowest-tf (lowest-weight) ones per term.
   *
   * The retained subset is ALL-INTEGER deterministic (tf and id tie
   * break), so the pruned index is exactly reproducible — and
   * SQL-replayable — from the full index. Corpus stats (N, avgdl)
   * stay UNCHANGED (they describe the collection, not the surviving
   * postings; the [[bm25ScoresFiltered]] corpus-level discipline);
   * query-time dfs derive from the pruned matched postings, i.e.
   * df' = min(df, keepPerTerm) — the pruned index is self-consistent,
   * not a bit-identical scorer of the full one. Stopword-class terms
   * shrink from millions of postings to `keepPerTerm`; rare terms are
   * untouched, so top-k overlap vs the unpruned index stays high
   * (bench telemetry).
   *
   * Scale shape: one window partitioned by (bucket, term) — a single
   * shuffle of the postings at build time, paid once; `.save` the
   * result for serving.
   */
  def prunedTextIndex(idx: TextIndex, keepPerTerm: Int): TextIndex = {
    require(keepPerTerm > 0, s"keepPerTerm must be positive, got $keepPerTerm")
    val w = Window.partitionBy(F.col("__bucket"), F.col("term"))
      .orderBy(F.col("tf").desc, F.col("id").asc)
    val pruned = idx.postings
      .withColumn("__pp", F.row_number().over(w))
      .filter(F.col("__pp") <= keepPerTerm)
      .drop("__pp")
    TextIndex(pruned, idx.buckets, idx.nDocs, idx.avgdl, idx.dlSum)
  }

  /**
   * Metadata-filtered BM25 probe of a saved [[TextIndex]] — the
   * partition-pruned form of [[bm25TopKFiltered]]: the `__bucket`
   * partition filter still cuts the scan to |query terms| of `buckets`
   * directories (the filter does not widen the probe), dfs derive from
   * the matched postings BEFORE the id semi-join (corpus-level
   * statistics, see [[bm25ScoresFiltered]]), and the semi-join
   * restricts candidates inside the probed buckets — the
   * [[Similarity.ivfTopKFilteredIndexed]] discipline on the text
   * index. Equals [[bm25TopKFiltered]] over the indexed corpus row for
   * row.
   */
  def bm25TopKFilteredIndexed(
      idx: TextIndex,
      queryTerms: Seq[String],
      k: Int,
      allowed: DataFrame,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets = q.map(t => graft.pipeline.Retrieval.localTermBucket(t, idx.buckets))
    val pruned = idx.postings
      .filter(F.col("__bucket").isin(qBuckets.distinct: _*))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    rankTopK(bm25ScoresFiltered(pruned, stats, q, allowed, k1, b), k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  // ---------------------------------------------------------------- //
  // MaxScore-pruned probe                                              //
  // ---------------------------------------------------------------- //

  /** [[bm25TopKMaxScore]]'s result: the top-k rows (same shape as
    * [[bm25TopKIndexed]]) plus the pruning telemetry — whether the
    * bound check passed, the tail score bound S_tail, the realized
    * k-th score θ, and the essential/tail term split. */
  final case class MaxScoreTopK(
      rows: DataFrame, pruned: Boolean, tailBound: Double,
      kthScore: Double, essential: Seq[String], tail: Seq[String])

  /**
   * MaxScore-pruned BM25 top-k against a SAVED index — the classic
   * top-k early-termination family (Turtle & Flood's MaxScore),
   * re-expressed for a partitioned batch engine.
   *
   * Query terms split into ESSENTIAL (high upper-bound impact — rare,
   * informative) and TAIL (low bound — the stopword class) by the
   * per-term bound from the `term_meta` side table:
   *
   *   ub(t) = idf(df_t) * (k1+1) * max_tf / (max_tf + k1*((1-b) + b*min_dl/avgdl))
   *
   * Only documents matching >= 1 essential term are CANDIDATES; they
   * are scored over ALL their matched postings (the tail buckets are
   * probed through an id semi-join, never fully scored). A document
   * matching only tail terms scores at most S_tail = Σ_{t∈tail} ub(t);
   * when the realized k-th candidate score θ satisfies θ > S_tail
   * (strict — the (score DESC, id ASC) tie-break can never smuggle a
   * tail-only doc past a strict bound), the pruned result is EXACTLY
   * [[bm25TopKIndexed]]'s. When the check fails — or the index has no
   * meta table — the probe falls back to the full scan, so the result
   * is exact UNCONDITIONALLY; pruning only ever saves work.
   *
   * Exactness never leans on meta freshness: scores use dfs counted
   * from the matched postings at query time (a map-side, one-column
   * count over the partition-pruned buckets — the same dfs the plain
   * probe derives), and every maintenance crash window leaves bounds
   * stale-HIGH (loose, sound) or missing (treated as unbounded →
   * always essential). See the meta write-ordering notes at
   * [[appendBatchToTextIndex]] / [[removeFromTextIndex]].
   *
   * Scale shape: the win is the SHUFFLE and the per-posting scoring on
   * the tail — at 100 TB a stopword-class term's postings dominate the
   * probe, and here they are reduced map-side to the candidate rows by
   * a broadcastable semi-join instead of all flowing into the per-doc
   * sum. The tail buckets' `term` column is still scanned once for the
   * df count (dictionary-encoded, no row materialization).
   *
   * `maxTailShare` picks the split: the smallest essential prefix (by
   * ub DESC) whose tail bound is <= maxTailShare * Σ ub. Smaller =
   * more terms essential = the θ-check passes more often but prunes
   * less.
   */
  def bm25TopKMaxScore(
      spark: SparkSession,
      path: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB,
      maxTailShare: Double = 0.25): MaxScoreTopK = {
    import spark.implicits._
    val idx = loadTextIndex(spark, path)
    val q = queryTerms.map(_.toLowerCase).distinct
    require(q.nonEmpty, "bm25TopKMaxScore: empty query")
    def fallback(essential: Seq[String], tail: Seq[String],
        sTail: Double, theta: Double) =
      MaxScoreTopK(bm25TopKIndexed(idx, q, k, k1, b), pruned = false,
        sTail, theta, essential, tail)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/term_meta")) ||
        idx.nDocs <= 0L)
      return fallback(q, Nil, Double.NaN, Double.NaN)
    val qBuckets = q.map(t => localTermBucket(t, idx.buckets)).distinct
    val matched = idx.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
      .filter(F.col("term").isin(q: _*))
    // exact per-term dfs: a count-only pass (reads the term column of
    // the pruned buckets, partial-aggregated map-side; <= |q| rows).
    // The dfs scan and the term_meta scan are independent bounded
    // collects — run them as concurrent jobs (guide §2.6: actions are
    // only sequential because the driver calls them sequentially), so
    // the pruned probe pays one job latency here, not two.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val dfF = Future {
      matched.groupBy("term")
        .agg(F.count(F.lit(1)).as("df"))
        .as[(String, Long)].collect()
    }
    val metaF = Future {
      spark.read.parquet(s"$path/term_meta")
        .withColumn("__bucket", F.col("__bucket").cast("long"))
        .filter(F.col("__bucket").isin(qBuckets: _*))
        .filter(F.col("term").isin(q: _*))
        .groupBy("term")
        .agg(F.max(F.col("max_tf")).as("max_tf"),
          F.min(F.col("min_dl")).as("min_dl"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    }
    val dfRows = Await.result(dfF, Duration.Inf)
    val metaRows = Await.result(metaF, Duration.Inf)
    if (dfRows.isEmpty) return fallback(q, Nil, Double.NaN, Double.NaN)
    val n = idx.nDocs.toDouble
    val ub: Seq[(String, Double)] = dfRows.toSeq.map { case (t, df) =>
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      metaRows.get(t) match {
        case Some((maxTf, minDl)) =>
          t -> idf * (k1 + 1.0) * maxTf /
            (maxTf + k1 * ((1.0 - b) + b * minDl / idx.avgdl))
        // a term with live postings but no meta row (crash window /
        // partial backfill): unbounded — force it essential
        case None => t -> Double.PositiveInfinity
      }
    }.sortBy(-_._2)
    val total = ub.map(_._2).sum
    // smallest essential prefix with tail bound <= maxTailShare * total
    var cut = 1
    while (cut < ub.length &&
           ub.drop(cut).map(_._2).sum > maxTailShare * total) cut += 1
    val essential = ub.take(cut).map(_._1)
    val tail = ub.drop(cut).map(_._1)
    if (tail.isEmpty) return fallback(essential, tail, 0.0, Double.NaN)
    val sTail = ub.drop(cut).map(_._2).sum
    val essBuckets = essential.map(t => localTermBucket(t, idx.buckets)).distinct
    val tailBuckets = tail.map(t => localTermBucket(t, idx.buckets)).distinct
    val proj = Seq("term", "id", "tf", "dl").map(F.col)
    val essP = idx.postings
      .filter(F.col("__bucket").isin(essBuckets: _*))
      .filter(F.col("term").isin(essential: _*))
      .select(proj: _*)
    val tailP = idx.postings
      .filter(F.col("__bucket").isin(tailBuckets: _*))
      .filter(F.col("term").isin(tail: _*))
      .select(proj: _*)
      .join(essP.select("id").distinct(), Seq("id"), "left_semi")
    val dfs = dfRows.toSeq.toDF("term", "df")
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    val scored = essP.unionByName(tailP)
      .join(F.broadcast(dfs), "term")
      .crossJoin(F.broadcast(stats))
      .withColumn("__w", bm25Weight(k1, b))
      .groupBy("id")
      .agg(F.sum(F.col("__w")).as("score"),
        F.sum(F.col("tf")).as("tf_total"),
        F.count(F.lit(1)).as("n_terms_hit"))
    // TakeOrdered (orderBy.limit) — collect is bounded by k
    val top = scored.orderBy(F.col("score").desc, F.col("id").asc)
      .limit(k).collect()
    val scoreIdx = scored.schema.fieldIndex("score")
    val theta =
      if (top.length < k) Double.NegativeInfinity
      else top.last.getDouble(scoreIdx)
    if (theta > sTail) {
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType, nullable = false) +:
        scored.schema.fields.toSeq)
      val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
      top.zipWithIndex.foreach { case (r, i) =>
        rows.add(Row.fromSeq((i + 1) +: r.toSeq))
      }
      val out = spark.createDataFrame(rows, schema)
        .select(F.col("rank"), F.col("id"), F.col("score"),
          F.col("tf_total"), F.col("n_terms_hit"))
      MaxScoreTopK(out, pruned = true, sTail, theta, essential, tail)
    } else fallback(essential, tail, sTail, theta)
  }

  /** [[bm25TopKBatchMaxScore]]'s result: the per-query top-k rows
    * (the [[bm25TopKBatch]] shape) plus which queries were served
    * pruned and which fell back to the full batch probe. */
  final case class BatchMaxScoreTopK(
      rows: DataFrame, prunedQueries: Seq[Long], fallbackQueries: Seq[Long])

  /**
   * MaxScore pruning for a SERVING BATCH — [[bm25TopKMaxScore]]'s
   * multi-query form, riding ONE shared postings pass: every query's
   * essential/tail split derives driver-side from the same per-term
   * bounds; the essential scan carries a broadcast (query, term) map,
   * candidates are per-(query, doc), and tail postings semi-join on
   * (query_id, id). The θ > S_tail check runs PER QUERY over the
   * collected top-k (bounded |queries|·k): passing queries keep their
   * pruned rows — exactly [[bm25TopKBatch]]'s for them — and failing
   * queries re-run through one plain batch probe, so every query's
   * result is exact unconditionally. A query whose tail is empty
   * (every term essential) needs no bound check: there are no
   * tail-only documents to miss.
   */
  def bm25TopKBatchMaxScore(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB,
      maxTailShare: Double = 0.25): BatchMaxScoreTopK = {
    import spark.implicits._
    val idx = loadTextIndex(spark, path)
    val qCols = queries.columns
    val qPairs = queries
      .select(F.col(qCols(0)).cast("long").as("query_id"),
        F.explode(F.col(qCols(1))).as("__qt"))
      .select(F.col("query_id"), F.lower(F.col("__qt")).as("term"))
      .distinct().as[(Long, String)].collect().toSeq
    require(qPairs.nonEmpty, "bm25TopKBatchMaxScore: no query terms")
    val queryIds = qPairs.map(_._1).distinct.sorted
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/term_meta")) ||
        idx.nDocs <= 0L)
      return BatchMaxScoreTopK(bm25TopKBatch(idx, queries, k, k1, b),
        Nil, queryIds)
    val terms = qPairs.map(_._2).distinct
    val tBuckets = terms.map(t => localTermBucket(t, idx.buckets)).distinct
    val matched = idx.postings
      .filter(F.col("__bucket").isin(tBuckets: _*))
      .filter(F.col("term").isin(terms: _*))
    // independent bounded collects run as concurrent jobs (the
    // bm25TopKMaxScore rule): one job latency, not two
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val dfMapF = Future {
      matched.groupBy("term").agg(F.count(F.lit(1)).as("df"))
        .as[(String, Long)].collect().toMap
    }
    val metaMapF = Future {
      spark.read.parquet(s"$path/term_meta")
        .withColumn("__bucket", F.col("__bucket").cast("long"))
        .filter(F.col("__bucket").isin(tBuckets: _*))
        .filter(F.col("term").isin(terms: _*))
        .groupBy("term")
        .agg(F.max(F.col("max_tf")).as("max_tf"),
          F.min(F.col("min_dl")).as("min_dl"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    }
    val dfMap = Await.result(dfMapF, Duration.Inf)
    val metaMap = Await.result(metaMapF, Duration.Inf)
    val n = idx.nDocs.toDouble
    def ubOf(t: String): Option[Double] = dfMap.get(t).map { df =>
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      metaMap.get(t) match {
        case Some((maxTf, minDl)) =>
          idf * (k1 + 1.0) * maxTf /
            (maxTf + k1 * ((1.0 - b) + b * minDl / idx.avgdl))
        case None => Double.PositiveInfinity
      }
    }
    final case class Split(qid: Long, ess: Seq[String], tail: Seq[String],
        sTail: Double)
    val splits = queryIds.map { qid =>
      val ub = qPairs.filter(_._1 == qid).map(_._2)
        .flatMap(t => ubOf(t).map(t -> _)).sortBy(-_._2)
      if (ub.isEmpty) Split(qid, Nil, Nil, 0.0)
      else {
        val total = ub.map(_._2).sum
        var cut = 1
        while (cut < ub.length &&
               ub.drop(cut).map(_._2).sum > maxTailShare * total) cut += 1
        Split(qid, ub.take(cut).map(_._1), ub.drop(cut).map(_._1),
          ub.drop(cut).map(_._2).sum)
      }
    }
    val essPairs = splits.flatMap(s => s.ess.map(t => (s.qid, t)))
      .toDF("query_id", "term")
    val tailPairs = splits.flatMap(s => s.tail.map(t => (s.qid, t)))
      .toDF("query_id", "term")
    val essTerms = splits.flatMap(_.ess).distinct
    val tailTerms = splits.flatMap(_.tail).distinct
    val proj = Seq("term", "id", "tf", "dl").map(F.col)
    val essP = idx.postings
      .filter(F.col("__bucket").isin(
        essTerms.map(t => localTermBucket(t, idx.buckets)).distinct: _*))
      .filter(F.col("term").isin(essTerms: _*))
      .select(proj: _*)
      .join(F.broadcast(essPairs), "term")
    val cand = essP.select("query_id", "id").distinct()
    val tailP =
      if (tailTerms.isEmpty) essP.limit(0)
      else idx.postings
        .filter(F.col("__bucket").isin(
          tailTerms.map(t => localTermBucket(t, idx.buckets)).distinct: _*))
        .filter(F.col("term").isin(tailTerms: _*))
        .select(proj: _*)
        .join(F.broadcast(tailPairs), "term")
        .join(cand, Seq("query_id", "id"), "left_semi")
    val dfs = dfMap.toSeq.toDF("term", "df")
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    val scored = essP.unionByName(tailP)
      .join(F.broadcast(dfs), "term")
      .crossJoin(F.broadcast(stats))
      .withColumn("__w", bm25Weight(k1, b))
      .repartition(F.col("query_id"))
      .groupBy(F.col("query_id"), F.col("id"))
      .agg(F.sum(F.col("__w")).as("score"),
        F.sum(F.col("tf")).as("tf_total"),
        F.count(F.lit(1)).as("n_terms_hit"))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("score").desc, F.col("id").asc)
    val top = scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "id", "score", "tf_total", "n_terms_hit")
    val collected = top.collect()
    val byQ = collected.groupBy(_.getAs[Long]("query_id"))
    val fallbackQ = splits.filter { s =>
      s.tail.nonEmpty && {
        val rows = byQ.getOrElse(s.qid, Array.empty[Row])
        rows.length < k ||
          !(rows.map(_.getAs[Double]("score")).min > s.sTail)
      }
    }.map(_.qid)
    val prunedQ = queryIds.filterNot(fallbackQ.contains)
    val okRows: java.util.List[Row] = new java.util.ArrayList[Row]()
    collected.foreach { r =>
      if (!fallbackQ.contains(r.getAs[Long]("query_id"))) okRows.add(r)
    }
    val prunedDf = spark.createDataFrame(okRows, top.schema)
    val out =
      if (fallbackQ.isEmpty) prunedDf
      else {
        // normalize the caller's query_id to long so the union cannot
        // type-mismatch the pruned side (which derives from the cast)
        val fbQueries = queries.select(
          F.col(qCols(0)).cast("long").as("query_id"),
          F.col(qCols(1)).as("terms"))
          .filter(F.col("query_id").isin(fallbackQ: _*))
        prunedDf.unionByName(
          bm25TopKBatch(idx, fbQueries, k, k1, b)
            .select("query_id", "rank", "id", "score", "tf_total",
              "n_terms_hit"))
      }
    BatchMaxScoreTopK(out, prunedQ, fallbackQ)
  }

  /**
   * Batched multi-query BM25 over a saved [[TextIndex]] — the serving
   * form: `queries` is (query_id, terms array<string>), each query
   * ranked independently with exactly the single-query semantics
   * (corpus-level stats; per-term dfs from the matched postings).
   *
   * Scale shape: the distinct term set collects driver-side (a
   * serving batch is bounded — the [[Similarity.knnClassifyIndexed]]
   * neighbor-table argument) so the postings scan partition-prunes to
   * the UNION of all query-term buckets; the (term → query) map and
   * dfs broadcast onto that scan; then ONE query_id repartition
   * serves both the per-(query, doc) sum and the top-k window (the
   * [[rrfFusePerQuery]] exchange discipline). Returns (query_id,
   * rank, id, score, tf_total, n_terms_hit) — row-for-row equal to
   * running [[bm25TopKIndexed]] per query.
   */
  def bm25TopKBatch(
      idx: TextIndex,
      queries: DataFrame,
      k: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame =
    bm25TopKBatchImpl(idx, queries, k, k1, b, restrict = None)

  /** [[bm25TopKBatch]] restricted to `allowed` ids — the batch form of
    * [[bm25TopKFilteredIndexed]]: one shared filter for the whole
    * batch, corpus-level statistics, dfs derived before the semi-join
    * (so each query equals its single-query filtered probe row for
    * row). */
  def bm25TopKBatchFiltered(
      idx: TextIndex,
      queries: DataFrame,
      k: Int,
      allowed: DataFrame,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val aCol = allowed.columns.head
    bm25TopKBatchImpl(idx, queries, k, k1, b,
      restrict = Some(allowed.select(F.col(aCol).as("id")).distinct()))
  }

  /**
   * Learning-to-rank feature export: one row per (query, candidate)
   * over the top-`pool` BM25 candidates of a query batch, carrying
   * the per-pair features an LTR trainer consumes —
   *
   *   f_bm25      BM25 score (the [[bm25Weight]] builder, shared)
   *   f_idf_sum   Σ idf over the pair's matched terms ([[idfCol]])
   *   f_tf_sum    Σ tf over matched terms (exact long)
   *   f_n_hit     matched-term count (exact long)
   *   f_dl        document length in tokens (exact long)
   *   f_n_qterms  the query's distinct-term count (exact long)
   *   f_matched_frac  f_n_hit / f_n_qterms
   *
   * plus `pool_rank` (the BM25 rank that bounded the candidate set)
   * and `label` from the judgments table (query_id, id, label),
   * NULL→0.0 for unjudged pairs — the standard implicit-negative
   * convention.
   *
   * One partition-pruned probe, one (query_id) repartition serving
   * both the per-pair aggregate and the pool window — the
   * [[bm25TopKBatch]] scale shape with a wider aggregate. Features
   * derive from the SAME matched postings as the scores, so exporter
   * and server can never disagree about what matched.
   */
  def ltrFeatures(
      idx: TextIndex,
      queries: DataFrame,
      labels: DataFrame,
      pool: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    require(pool > 0, s"pool must be positive, got $pool")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val qCols = queries.columns
    val q = queries
      .select(F.col(qCols(0)).as("query_id"),
        F.explode(F.col(qCols(1))).as("__qt"))
      .select(F.col("query_id"), F.lower(F.col("__qt")).as("term"))
      .distinct()
      .localCheckpoint(eager = false)
    val terms = q.select("term").distinct().as[String].collect().toSeq
    require(terms.nonEmpty, "ltrFeatures: no query terms")
    val qBuckets = terms.map(t => localTermBucket(t, idx.buckets)).distinct
    val matched = idx.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
      .filter(F.col("term").isin(terms: _*))
    val dfs = matched.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    val nq = q.groupBy("query_id").agg(F.count(F.lit(1)).as("f_n_qterms"))
    val scored = matched
      .join(F.broadcast(q), "term")
      .join(F.broadcast(dfs), "term")
      .crossJoin(F.broadcast(stats))
      .withColumn("__w", bm25Weight(k1, b))
      .withColumn("__idf", idfCol)
      .repartition(F.col("query_id"))
      .groupBy(F.col("query_id"), F.col("id"))
      .agg(F.sum(F.col("__w")).as("f_bm25"),
        F.sum(F.col("__idf")).as("f_idf_sum"),
        F.sum(F.col("tf")).as("f_tf_sum"),
        F.count(F.lit(1)).as("f_n_hit"),
        F.first(F.col("dl")).cast("long").as("f_dl"))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("f_bm25").desc, F.col("id").asc)
    val lCols = labels.columns
    val lab = labels.select(F.col(lCols(0)).as("query_id"),
      F.col(lCols(1)).as("id"), F.col(lCols(2)).cast("double").as("label"))
    scored.withColumn("pool_rank", F.row_number().over(w))
      .filter(F.col("pool_rank") <= pool)
      .join(F.broadcast(nq), "query_id")
      .join(lab, Seq("query_id", "id"), "left")
      .withColumn("label", F.coalesce(F.col("label"), F.lit(0.0)))
      .withColumn("f_matched_frac",
        F.col("f_n_hit").cast("double") / F.col("f_n_qterms"))
      .select("query_id", "id", "pool_rank", "label", "f_bm25", "f_idf_sum",
        "f_tf_sum", "f_n_hit", "f_dl", "f_n_qterms", "f_matched_frac")
  }

  private def bm25TopKBatchImpl(
      idx: TextIndex,
      queries: DataFrame,
      k: Int,
      k1: Double,
      b: Double,
      restrict: Option[DataFrame]): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val qCols = queries.columns
    val q = queries
      .select(F.col(qCols(0)).as("query_id"),
        F.explode(F.col(qCols(1))).as("__qt"))
      .select(F.col("query_id"), F.lower(F.col("__qt")).as("term"))
      .distinct()
      .localCheckpoint(eager = false)
    val terms = q.select("term").distinct().as[String].collect().toSeq
    require(terms.nonEmpty, "bm25TopKBatch: no query terms")
    val qBuckets = terms.map(t => localTermBucket(t, idx.buckets)).distinct
    val matched = idx.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
      .filter(F.col("term").isin(terms: _*))
    // dfs per term over the matched postings — shared across queries
    // (df is a term property, not a query property)
    val dfs = matched.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    // corpus-level dfs above; the filter restricts CANDIDATES only
    // (the bm25ScoresFiltered contract, batch form)
    val candidates = restrict match {
      case Some(ok) => matched.join(ok, Seq("id"), "left_semi")
      case None => matched
    }
    val scored = candidates
      .join(F.broadcast(q), "term")
      .join(F.broadcast(dfs), "term")
      .crossJoin(F.broadcast(stats))
      .withColumn("__w", bm25Weight(k1, b))
      .repartition(F.col("query_id"))
      .groupBy(F.col("query_id"), F.col("id"))
      .agg(F.sum(F.col("__w")).as("score"),
        F.sum(F.col("tf")).as("tf_total"),
        F.count(F.lit(1)).as("n_terms_hit"))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("score").desc, F.col("id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "id", "score", "tf_total", "n_terms_hit")
  }

  /** Driver-side twin of [[termBucket]] (Spark's xxhash64 with its
    * default seed 42 over the UTF-8 bytes). */
  private[pipeline] def localTermBucket(term: String, buckets: Int): Long = {
    val bytes = term.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L)
    val m = h % buckets
    if (m < 0) m + buckets else m
  }

  // ---------------------------------------------------------------- //
  // Snippets (best-window extraction from the positional index)       //
  // ---------------------------------------------------------------- //

  /**
   * Best-window snippet spans from the POSITIONAL index: for every
   * document matching at least one query term, the token window of
   * width `window` covering the most DISTINCT query terms — ties
   * prefer the leftmost start (the deterministic serving rule, and
   * the exact rule the q_retrieval_snippet oracle replays). Candidate
   * starts are matched-term positions only: an optimal window can
   * always shift right until it is anchored on a hit, so the search
   * is exact. Returns (id, start, end, n_terms, n_hits) with `start`
   * a 0-based token offset, `end` = min(start + window, dl) and
   * `n_hits` the total hit positions inside the chosen window.
   *
   * Scale shape: the postings filter is map-side (partition-pruned on
   * a saved index when the caller pre-filters `__bucket`); one
   * shuffle groups each document's matched (term, positions) lists —
   * bounded by |query| lists of at-most-dl offsets — and the window
   * maximization is a per-document two-pointer kernel over the sorted
   * hit offsets (O(hits), map-side after the group).
   */
  def snippetSpans(
      index: DataFrame,
      queryTerms: Seq[String],
      window: Int): DataFrame = {
    require(queryTerms.nonEmpty, "snippetSpans: empty query")
    require(window >= 1, s"window must be >= 1, got $window")
    val q = queryTerms.map(_.toLowerCase).distinct
    val bestU = bestWindowUdf(window)
    index
      .filter(F.col("term").isin(q: _*))
      .groupBy(F.col("id"), F.col("dl"))
      .agg(F.collect_list(F.struct(F.col("term"), F.col("positions")))
        .as("__lists"))
      .withColumn("__best", bestU(F.col("dl"), F.col("__lists")))
      .select(F.col("id"),
        F.col("__best._1").as("start"), F.col("__best._2").as("end"),
        F.col("__best._3").as("n_terms"), F.col("__best._4").as("n_hits"))
  }

  /** The ONE best-window kernel (two-pointer over sorted hit offsets;
    * ties prefer the leftmost start) — [[snippetSpans]] and the batch
    * form replay the identical rule. */
  private def bestWindowUdf(window: Int) =
    F.udf((dl: Int, lists: Seq[Row]) => {
      // flatten to (pos, termIdx) sorted by pos
      val termIdx = scala.collection.mutable.HashMap.empty[String, Int]
      val hits = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      lists.foreach { r =>
        val t = r.getString(0)
        val ti = termIdx.getOrElseUpdate(t, termIdx.size)
        r.getSeq[Int](1).foreach(p => hits += ((p, ti)))
      }
      val sorted = hits.sortBy(_._1).toArray
      val counts = new Array[Int](termIdx.size)
      var distinct = 0
      var lo = 0
      var hi = 0
      var bestStart = 0
      var bestTerms = -1
      var bestHits = 0
      while (lo < sorted.length) {
        val start = sorted(lo)._1
        // grow the window to cover [start, start + window)
        while (hi < sorted.length && sorted(hi)._1 < start + window) {
          val ti = sorted(hi)._2
          if (counts(ti) == 0) distinct += 1
          counts(ti) += 1
          hi += 1
        }
        if (distinct > bestTerms) {
          bestTerms = distinct
          bestHits = hi - lo
          bestStart = start
        }
        // drop the anchor hit before advancing
        val ti = sorted(lo)._2
        counts(ti) -= 1
        if (counts(ti) == 0) distinct -= 1
        lo += 1
      }
      (bestStart, math.min(bestStart + window, dl), bestTerms, bestHits)
    })

  /** [[snippetSpans]] joined back to the documents and rendered: the
    * window's tokens re-joined with single spaces (the tokenization is
    * whitespace-normalizing, so the snippet is the normalized text
    * slice). Returns (id, start, end, n_terms, n_hits, snippet). */
  def snippets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      window: Int): DataFrame = {
    val index = buildIndex(docs, idCol, textCol)
    val spans = snippetSpans(index, queryTerms, window)
    val toks = docs.select(F.col(idCol).as("id"),
      terms(F.col(textCol)).as("__t"))
    spans.join(toks, "id")
      .select(F.col("id"), F.col("start"), F.col("end"),
        F.col("n_terms"), F.col("n_hits"),
        F.array_join(F.slice(F.col("__t"), F.col("start") + 1,
          F.col("end") - F.col("start")), " ").as("snippet"))
  }

  /**
   * Budgeted context assembly — the RAG serving tail: take ranked
   * hits in RANK order, attach each document's best-window snippet
   * ([[snippets]]), and keep the longest rank-prefix whose cumulative
   * snippet token count fits `budgetTokens` (greedy prefix fill —
   * deterministic and exactly replayable, unlike knapsack-style
   * packing; a hit whose snippet would overflow the budget stops the
   * fill, preserving rank order in the assembled context). `ranked`
   * is (rank, id) — any retrieval family's output plugs in: a ranked
   * document containing NO query term (possible for ANN/RRF inputs,
   * never for lexical ranks) stays in the prefix with an EMPTY
   * snippet and zero tokens charged — dropping it would break the
   * prefix contract and let later ranks leapfrog. Returns (rank, id,
   * start, end, n_tokens, cum_tokens, snippet) for the kept prefix,
   * rank-ordered.
   *
   * Scale shape: `ranked` is a top-k (bounded); the snippet pass is
   * the [[snippetSpans]] kernel restricted to the hit documents
   * (semi-join before tokenization), and the prefix cumsum is a
   * window over k rows.
   */
  def assembleContext(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ranked: DataFrame,
      queryTerms: Seq[String],
      window: Int,
      budgetTokens: Int): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    val hits = ranked.select(F.col("rank"), F.col("id"))
    val hitDocs = docs.join(
      F.broadcast(hits.select(F.col("id").as(idCol))), Seq(idCol), "left_semi")
    val sn = snippets(hitDocs, idCol, textCol, queryTerms, window)
    val w = Window.orderBy(F.col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits.join(sn, Seq("id"), "left")
      .withColumn("start", F.coalesce(F.col("start"), F.lit(0)))
      .withColumn("end", F.coalesce(F.col("end"), F.lit(0)))
      .withColumn("snippet", F.coalesce(F.col("snippet"), F.lit("")))
      .withColumn("n_tokens", F.col("end") - F.col("start"))
      .withColumn("cum_tokens", F.sum(F.col("n_tokens")).over(w))
      // prefix semantics: the fill STOPS at the first overflow (a
      // later smaller snippet must not leapfrog rank order)
      .withColumn("__over",
        F.min(F.when(F.col("cum_tokens") > budgetTokens, F.col("rank")))
          .over(Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .filter(F.col("__over").isNull || F.col("rank") < F.col("__over"))
      .select(F.col("rank"), F.col("id"), F.col("start"), F.col("end"),
        F.col("n_tokens"), F.col("cum_tokens"), F.col("snippet"))
  }

  /**
   * Batched context assembly — [[assembleContext]] over a MULTI-QUERY
   * serving batch (the [[bm25TopKBatch]] tail): `ranked` is
   * (query_id, rank, id) from any batched retrieval family, `queries`
   * is (query_id, terms array) — each query's snippets use its OWN
   * terms, and each query's prefix fill stops independently at its
   * first overflow. Returns (query_id, rank, id, start, end,
   * n_tokens, cum_tokens, snippet), rank-ordered per query.
   *
   * `tokenCost` optionally re-prices snippets in MODEL tokens (every
   * real RAG budget is a tokenizer budget): pass a Column function
   * (e.g. a learned-BPE count over the snippet text — see
   * [[graft.pipeline.Vocab.tokenizeBpe]]) and the prefix cumsum
   * charges that instead of the window token count. An absent or
   * empty snippet always charges 0 (the LEFT-join rule: a ranked doc
   * with no query-term hit stays in the prefix).
   *
   * Scale shape: the corpus-sized work is the hit-doc index build
   * (one grouping over the semi-joined docs); past it everything is
   * bounded serving data (≤ |queries|·k rows), riding exactly TWO
   * query_id exchanges — the snippet grouping's repartition and the
   * prefix window — with every bounded side broadcast (no join
   * shuffles); pinned in PlanShapeSpec. The union term list of a
   * serving batch is bounded and collected once; only hit documents
   * are tokenized (semi-join before buildIndex).
   */
  def assembleContextBatch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ranked: DataFrame,
      queries: DataFrame,
      window: Int,
      budgetTokens: Int,
      tokenCost: Option[Column => Column] = None): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    require(window >= 1, s"window must be >= 1, got $window")
    val spark = docs.sparkSession
    import spark.implicits._
    val qCols = queries.columns
    val q = queries
      .select(F.col(qCols(0)).as("query_id"),
        F.explode(F.col(qCols(1))).as("__qt"))
      .select(F.col("query_id"), F.lower(F.col("__qt")).as("term"))
      .distinct()
      .localCheckpoint(eager = false)
    // the union term list of a serving batch is bounded — one collect
    val allTerms = q.select("term").distinct().as[String].collect().toSeq
    require(allTerms.nonEmpty, "assembleContextBatch: no query terms")
    val hits = ranked.select(F.col("query_id"), F.col("rank"), F.col("id"))
      .localCheckpoint(eager = false)
    val hitDocs = docs.join(
      F.broadcast(hits.select(F.col("id").as(idCol)).distinct()),
      Seq(idCol), "left_semi")
      .localCheckpoint(eager = false)
    val idx = buildIndex(hitDocs, idCol, textCol)
      .filter(F.col("term").isin(allTerms: _*))
    val bestU = bestWindowUdf(window)
    val spans = idx.join(F.broadcast(q), "term")
      .repartition(F.col("query_id"))
      .groupBy(F.col("query_id"), F.col("id"), F.col("dl"))
      .agg(F.collect_list(F.struct(F.col("term"), F.col("positions")))
        .as("__lists"))
      .withColumn("__best", bestU(F.col("dl"), F.col("__lists")))
      .select(F.col("query_id"), F.col("id"),
        F.col("__best._1").as("start"), F.col("__best._2").as("end"))
    val toks = hitDocs.select(F.col(idCol).as("id"),
      terms(F.col(textCol)).as("__t"))
    // spans are bounded (≤ |queries|·k rows): broadcast them onto the
    // hit-doc token scan, and broadcast the rendered snippets into the
    // final join — shuffling either would re-exchange bounded data
    val sn = F.broadcast(spans).join(toks, "id")
      .select(F.col("query_id"), F.col("id"), F.col("start"), F.col("end"),
        F.array_join(F.slice(F.col("__t"), F.col("start") + 1,
          F.col("end") - F.col("start")), " ").as("snippet"))
    val w = Window.partitionBy(F.col("query_id")).orderBy(F.col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(F.col("query_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val joined = hits.join(F.broadcast(sn), Seq("query_id", "id"), "left")
      .withColumn("start", F.coalesce(F.col("start"), F.lit(0)))
      .withColumn("end", F.coalesce(F.col("end"), F.lit(0)))
      .withColumn("snippet", F.coalesce(F.col("snippet"), F.lit("")))
    val cost = tokenCost
      .map(f => F.when(F.col("snippet") === "", F.lit(0L))
        .otherwise(f(F.col("snippet")).cast("long")))
      .getOrElse((F.col("end") - F.col("start")).cast("long"))
    joined
      .withColumn("n_tokens", cost)
      .withColumn("cum_tokens", F.sum(F.col("n_tokens")).over(w))
      .withColumn("__over",
        F.min(F.when(F.col("cum_tokens") > budgetTokens, F.col("rank")))
          .over(wAll))
      .filter(F.col("__over").isNull || F.col("rank") < F.col("__over"))
      .select(F.col("query_id"), F.col("rank"), F.col("id"),
        F.col("start"), F.col("end"), F.col("n_tokens"),
        F.col("cum_tokens"), F.col("snippet"))
  }

  /**
   * Streaming RAG serving: a query STREAM (query_id, terms array)
   * answered per micro-batch against a frozen SAVED index — retrieval
   * ([[bm25TopKBatch]]) → snippets → budgeted context assembly
   * ([[assembleContextBatch]]), landed under the micro-batch's own
   * `__batch` partition with dynamic overwrite, so an at-least-once
   * replay rewrites exactly its own answers (effectively-once).
   *
   * Batches are STATELESS and queries independent, so the union of
   * all micro-batch outputs equals the one-shot batch composition
   * over the same queries — the streamed-twin contract
   * (`q_stream_rag` shares `q_pipeline_rag_batch`'s oracle). The sink
   * only READS the index (no heartbeat/lease: the maintenance
   * handshake governs index WRITERS; journal-aware reads stay
   * consistent under concurrent compaction).
   *
   * Index/corpus are resolved per micro-batch (a nightly
   * [[syncTextIndex]] is picked up on the next trigger). Returns the
   * writer — set trigger/checkpoint and `.start()`.
   */
  def ragStream(
      queries: DataFrame,
      indexPath: String,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      window: Int,
      budgetTokens: Int,
      outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    queries.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val qCols = batch.columns
        val q = batch.select(F.col(qCols(0)).as("query_id"),
          F.col(qCols(1)).as("terms")).localCheckpoint(eager = false)
        val idx = loadTextIndex(spark, indexPath)
        val ranked = bm25TopKBatch(idx, q, k)
          .select(F.col("query_id"), F.col("rank"), F.col("id"))
          .localCheckpoint(eager = false)
        assembleContextBatch(docs, idCol, textCol, ranked, q,
            window, budgetTokens)
          .withColumn("__batch", F.lit(batchId))
          .write.partitionBy("__batch")
          .option("partitionOverwriteMode", "dynamic").mode("overwrite")
          .parquet(outPath)
      }
      ()
    }

  /**
   * Deep pagination (the search_after cursor): the top-k documents
   * strictly AFTER the cursor (score, id) in (score DESC, id ASC)
   * order — page N+1 given page N's last row. Cursor pagination stays
   * O(k) per page where offset pagination re-ranks the whole prefix;
   * the returned `rank` is within-page (1-based).
   *
   * The cursor compare is exact: scores are deterministic per engine
   * and plan, so the caller feeds back the double it was handed
   * (never a re-computed or rounded one) and the page boundary cannot
   * drop or duplicate a document — page1 ∪ page2 ≡ top-2k, the
   * contract the gate pins.
   */
  def bm25TopKAfter(
      idx: TextIndex,
      queryTerms: Seq[String],
      k: Int,
      afterScore: Double,
      afterId: Long,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets = q.map(t => localTermBucket(t, idx.buckets)).distinct
    val pruned = idx.postings
      .filter(F.col("__bucket").isin(qBuckets.distinct: _*))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    val scored = bm25Scores(pruned, stats, q, k1, b)
      .filter(F.col("score") < afterScore ||
        (F.col("score") === afterScore && F.col("id") > afterId))
    rankTopK(scored, k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  /**
   * Boolean-structured BM25 (the Lucene should/must/must_not shape):
   * `should` and `must` terms all SCORE; a document qualifies only if
   * it contains EVERY `must` term and NO `mustNot` term. mustNot
   * documents are excluded before ranking (an anti-join on the
   * matched mustNot postings); the must constraint is a per-document
   * distinct-matched-term count equal to |must|.
   *
   * Scale shape: one extra bucket-pruned postings pass per clause
   * family (must count, mustNot ids), both joined back on id —
   * nothing corpus-sized beyond the probe itself.
   */
  def bm25TopKBoolean(
      idx: TextIndex,
      should: Seq[String],
      must: Seq[String],
      mustNot: Seq[String],
      k: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val scoreTerms = (should ++ must).map(_.toLowerCase).distinct
    require(scoreTerms.nonEmpty, "bm25TopKBoolean: no scoring terms")
    val mustL = must.map(_.toLowerCase).distinct
    val notL = mustNot.map(_.toLowerCase).distinct
    def prunedFor(terms: Seq[String]) = idx.postings
      .filter(F.col("__bucket").isin(
        terms.map(t => localTermBucket(t, idx.buckets)).distinct: _*))
      .filter(F.col("term").isin(terms: _*))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    var scored = bm25Scores(prunedFor(scoreTerms), stats, scoreTerms, k1, b)
    if (mustL.nonEmpty) {
      val ok = prunedFor(mustL)
        .groupBy("id")
        .agg(F.count_distinct(F.col("term")).as("__m"))
        .filter(F.col("__m") === mustL.size)
        .select("id")
      scored = scored.join(ok, Seq("id"), "left_semi")
    }
    if (notL.nonEmpty)
      scored = scored.join(prunedFor(notL).select("id").distinct(),
        Seq("id"), "left_anti")
    rankTopK(scored, k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  /**
   * Phrase-filtered BM25: rank by the query terms, qualify only
   * documents containing the EXACT phrase (>= 1 occurrence, via
   * [[phraseCount]]'s positional slot-shift — overlap-counting,
   * bucket-pruned to the phrase terms). The "must contain the quoted
   * phrase" search idiom.
   */
  def bm25TopKPhraseFiltered(
      idx: TextIndex,
      queryTerms: Seq[String],
      phrase: Seq[String],
      k: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    require(phrase.nonEmpty, "bm25TopKPhraseFiltered: empty phrase")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val p = phrase.map(_.toLowerCase)
    def prunedFor(terms: Seq[String]) = idx.postings
      .filter(F.col("__bucket").isin(
        terms.map(t => localTermBucket(t, idx.buckets)).distinct: _*))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    val scored = bm25Scores(prunedFor(q), stats, q, k1, b)
    val hasPhrase = phraseCount(prunedFor(p.distinct), p).select("id")
    rankTopK(scored.join(hasPhrase, Seq("id"), "left_semi"), k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  /**
   * Query-likelihood ranking with Dirichlet smoothing (Ponte & Croft's
   * language-model retrieval in the Zhai & Lafferty smoothed form) —
   * the classic probabilistic alternative to BM25:
   *
   *   P(q|d) ∝ Σ_{t ∈ q∩d} ln(1 + tf / (μ · cf_t / |C|))
   *            + |q| · ln(μ / (dl + μ))
   *
   * (the rank-equivalent decomposition: only MATCHED postings are
   * scanned; the document-length prior rides the per-doc group; the
   * rank-constant Σ ln P(t|C) is dropped). cf_t is the COLLECTION
   * frequency (Σ tf over the corpus) and |C| the exact corpus token
   * total — both derive the way BM25's dfs do: cf from the matched
   * postings at query time, |C| from the index's exact `dlSum`
   * (never a float mean). Documents matching no query term are
   * excluded (their ranking would be a pure shortest-document prior).
   *
   * Scale shape identical to [[bm25Scores]]: map-side postings
   * filter (partition-pruned on a saved index), broadcast cf/stats,
   * one per-document sum, TakeOrdered top-k.
   */
  def queryLikelihoodTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      mu: Double = 300.0): DataFrame = {
    val index = buildIndex(docs, idCol, textCol)
    val stats = index.select(F.col("id"), F.col("dl")).distinct()
      .agg(F.sum(F.col("dl")).cast("double").as("c_total"))
    rankTopK(qlScores(index, stats, queryTerms, mu), k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  /** [[queryLikelihoodTopK]] against a saved [[TextIndex]] —
    * bucket-pruned postings, exact `dlSum` as the collection total. */
  def queryLikelihoodTopKIndexed(
      idx: TextIndex,
      queryTerms: Seq[String],
      k: Int,
      mu: Double = 300.0): DataFrame = {
    require(idx.dlSum >= 0, "queryLikelihoodTopKIndexed: index lacks dlSum")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets = q.map(t => localTermBucket(t, idx.buckets)).distinct
    val pruned = idx.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
    val stats = Seq(idx.dlSum.toDouble).toDF("c_total")
    rankTopK(qlScores(pruned, stats, q, mu), k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"))
  }

  private def qlScores(
      index: DataFrame,
      stats: DataFrame,
      queryTerms: Seq[String],
      mu: Double): DataFrame = {
    val q = queryTerms.map(_.toLowerCase).distinct
    require(q.nonEmpty, "qlScores: empty query")
    val matched = index.filter(F.col("term").isin(q: _*))
    // collection frequencies from the matched postings (the df rule)
    val cfs = matched.groupBy("term")
      .agg(F.sum(F.col("tf")).cast("double").as("cf"))
    // the document-length prior multiplies the IN-CORPUS query term
    // count (the standard OOV convention: a term with P(t|C) = 0 has
    // no smoothed probability and drops from the query — counting it
    // in the prior would re-weight documents by length for a term no
    // document can match). Derived in-plan (one broadcast row), no
    // extra action.
    val nq = cfs.agg(F.count(F.lit(1)).cast("double").as("n_q"))
    matched
      .join(F.broadcast(cfs), "term")
      .crossJoin(F.broadcast(stats))
      .crossJoin(F.broadcast(nq))
      .withColumn("__w",
        F.log(F.lit(1.0) +
          F.col("tf") / (F.lit(mu) * F.col("cf") / F.col("c_total"))))
      .groupBy(F.col("id"), F.col("dl"), F.col("n_q"))
      .agg(F.sum(F.col("__w")).as("__sum"),
        F.sum(F.col("tf")).as("tf_total"),
        F.count(F.lit(1)).as("n_terms_hit"))
      .withColumn("score",
        F.col("__sum") + F.col("n_q") *
          F.log(F.lit(mu) / (F.col("dl") + F.lit(mu))))
      .select("id", "score", "tf_total", "n_terms_hit")
  }

  /**
   * Facet panel over the MATCHED set (not the top-k): for each value
   * of `facetCol` among documents matching >= 1 query term, the
   * matched-document count — what a search UI renders next to the
   * results. Returns (facet value column, n_docs) for the `topN` most
   * frequent values, ties by value.
   *
   * Scale shape: the postings probe partition-prunes to the query
   * terms' buckets (a saved [[TextIndex]]); the matched-id set
   * semi-joins the document table (broadcast when small, and the
   * facet column alone is read thanks to column pruning); one grouped
   * count. Counts are EXACT integers — the panel replays in SQL
   * verbatim. For corpus-scale facet cardinalities compose the
   * matched semi-join with the `topk_agg` sketch instead.
   */
  def facetCounts(
      idx: TextIndex,
      queryTerms: Seq[String],
      docs: DataFrame,
      idCol: String,
      facetCol: String,
      topN: Int): DataFrame = {
    require(queryTerms.nonEmpty, "facetCounts: empty query")
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets = q.map(t => localTermBucket(t, idx.buckets)).distinct
    val ids = idx.postings
      .filter(F.col("__bucket").isin(qBuckets: _*))
      .filter(F.col("term").isin(q: _*))
      .select(F.col("id").as(idCol)).distinct()
    docs.join(ids, Seq(idCol), "left_semi")
      .groupBy(F.col(facetCol))
      .agg(F.count(F.lit(1)).as("n_docs"))
      .orderBy(F.col("n_docs").desc, F.col(facetCol).asc)
      .limit(topN)
  }

  // ---------------------------------------------------------------- //
  // Phrase matching                                                   //
  // ---------------------------------------------------------------- //

  /**
   * Exact phrase occurrences per document from the POSITIONAL index:
   * (id, n_occurrences), documents with ≥ 1 occurrence only.
   *
   * A start offset s matches iff position s + i holds phrase term i
   * for every i — counted by exploding each phrase term's positions
   * shifted by -i and keeping (id, start) groups that collected all
   * |phrase| offsets. Overlapping occurrences count (unlike a regex
   * scan). One shuffle on (id, start); the postings filter is
   * map-side.
   */
  def phraseCount(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseCount: empty phrase")
    val p = phrase.map(_.toLowerCase)
    val n = p.length
    // one filtered slice per phrase slot i: (id, start = pos - i)
    val slots = p.zipWithIndex.map { case (term, i) =>
      index.filter(F.col("term") === term)
        .select(F.col("id"), F.explode(F.col("positions")).as("__p"))
        .select(F.col("id"), (F.col("__p") - F.lit(i)).as("start"),
          F.lit(i).as("__slot"))
    }
    slots.reduce(_ union _)
      .filter(F.col("start") >= 0)
      .groupBy("id", "start")
      // distinct slots guard the repeated-term phrase ("a a"): the same
      // (id, start) can only be produced once per slot, so matching
      // means all n slots reported in.
      .agg(F.countDistinct(F.col("__slot")).as("__hit"))
      .filter(F.col("__hit") === n)
      .groupBy("id")
      .agg(F.count(F.lit(1)).as("n_occurrences"))
  }

  // ---------------------------------------------------------------- //
  // Pseudo-relevance feedback (query expansion)                       //
  // ---------------------------------------------------------------- //

  /**
   * Pseudo-relevance-feedback expansion terms (the RM1 relevance-model
   * weight without the query-likelihood factor — the deterministic
   * PRF core): run BM25 with the original query, take the top
   * `fbDocs` feedback documents, and weight every term they contain by
   *
   *   w(t) = Σ_{d ∈ feedback} tf(t, d) / dl(d),
   *
   * excluding the original query terms; the `fbTerms` heaviest terms
   * (ties by term asc) come back as a driver-side list (bounded —
   * this is per-query serving state, the bm25TopKBatch collect rule).
   *
   * Scale shape: the feedback probe is the ordinary BM25 probe; the
   * candidate pass scans postings with a broadcast fb-id semi-join
   * (map-side filter; the only shuffle is the |vocab-of-10-docs|-sized
   * term group).
   */
  def prfExpansionTerms(
      index: DataFrame,
      stats: DataFrame,
      queryTerms: Seq[String],
      fbDocs: Int = 10,
      fbTerms: Int = 5,
      k1: Double = DefaultK1,
      b: Double = DefaultB): Seq[String] = {
    require(fbDocs >= 1, s"fbDocs must be >= 1, got $fbDocs")
    require(fbTerms >= 1, s"fbTerms must be >= 1, got $fbTerms")
    val spark = index.sparkSession
    import spark.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val fb = rankTopK(bm25Scores(index, stats, q, k1, b), fbDocs)
      .select(F.col("id"))
    index.join(F.broadcast(fb), "id")
      .filter(!F.col("term").isin(q: _*))
      .groupBy(F.col("term"))
      .agg(F.sum(F.col("tf").cast("double") / F.col("dl")).as("__w"))
      .orderBy(F.col("__w").desc, F.col("term").asc)
      .limit(fbTerms)
      .select("term").as[String].collect().toSeq
  }

  /** BM25 with RM3-style pseudo-relevance feedback: the original
    * query unioned with [[prfExpansionTerms]]'s expansion, re-ranked
    * in one more probe (the standard two-pass PRF serving shape —
    * feedback probe, expansion, final probe). Returns the final
    * ranking plus the expansion terms as a constant array column
    * (serving systems log them). */
  def bm25TopKPrf(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      fbDocs: Int = 10,
      fbTerms: Int = 5,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    // three jobs touch the index (feedback probe, candidate group,
    // final probe) — pin one materialization across them
    val index = buildIndex(docs, idCol, textCol)
      .localCheckpoint(eager = false)
    bm25TopKPrfImpl(index, corpusStats(index), queryTerms, k, fbDocs,
      fbTerms, k1, b)
  }

  /** [[bm25TopKPrf]] over a saved [[TextIndex]]: the feedback and
    * final probes partition-prune to their term buckets; only the
    * candidate pass (terms OF the feedback docs — unknowable in
    * advance) scans all buckets, map-side filtered on the broadcast
    * fb ids. */
  def bm25TopKPrfIndexed(
      idx: TextIndex,
      queryTerms: Seq[String],
      k: Int,
      fbDocs: Int = 10,
      fbTerms: Int = 5,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    import idx.postings.sparkSession.implicits._
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    bm25TopKPrfImpl(idx.postings, stats, queryTerms, k, fbDocs, fbTerms,
      k1, b)
  }

  private def bm25TopKPrfImpl(
      index: DataFrame,
      stats: DataFrame,
      queryTerms: Seq[String],
      k: Int,
      fbDocs: Int,
      fbTerms: Int,
      k1: Double,
      b: Double): DataFrame = {
    val q = queryTerms.map(_.toLowerCase).distinct
    val expansion = prfExpansionTerms(index, stats, q, fbDocs, fbTerms,
      k1, b)
    val expanded = q ++ expansion
    rankTopK(bm25Scores(index, stats, expanded, k1, b), k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("tf_total"), F.col("n_terms_hit"),
        F.typedLit(expansion).as("expansion"))
  }

  // ---------------------------------------------------------------- //
  // Proximity-aware ranking                                           //
  // ---------------------------------------------------------------- //

  /**
   * Pairwise min-distance proximity from the POSITIONAL index: for
   * every document matching ≥ 1 query term,
   *
   *   prox(d) = Σ_{t1 < t2 present in d} 1 / (1 + minDist(t1, t2)),
   *
   * minDist the smallest token-offset gap between any occurrence of
   * t1 and any of t2 (adjacent terms contribute 1/2, a 10-token gap
   * ~1/11; single-term documents score 0). The classic
   * pair-distance proximity accumulator (Rasolofo & Savoy's 1/d²
   * family with the gentler 1/(1+d) decay).
   *
   * Scale shape: the postings filter is map-side (partition-pruned on
   * a saved index when the caller pre-filters `__bucket`); one
   * shuffle groups each doc's ≤ |query| (term, positions) lists, and
   * the pairwise min-gap is a two-pointer merge over sorted offsets —
   * O(|query|² · occurrences) per doc, map-side after the group.
   */
  def proximityScores(index: DataFrame, queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "proximityScores: empty query")
    val q = queryTerms.map(_.toLowerCase).distinct
    index
      .filter(F.col("term").isin(q: _*))
      .groupBy(F.col("id"))
      .agg(F.collect_list(F.struct(F.col("term"), F.col("positions")))
        .as("__lists"))
      .select(F.col("id"), proximityUdf(F.col("__lists")).as("prox"))
  }

  /** The ONE pairwise min-distance kernel (two-pointer merge over each
    * pair of sorted position lists) — [[proximityScores]] and the
    * fused [[bm25TopKProximity]] aggregate replay the identical rule. */
  private def proximityUdf =
    F.udf((lists: Seq[Row]) => {
      val arr = lists.map(r =>
        (r.getString(0), r.getSeq[Int](1).toArray)).sortBy(_._1).toArray
      var s = 0.0
      var i = 0
      while (i < arr.length) {
        var j = i + 1
        while (j < arr.length) {
          val a = arr(i)._2
          val b = arr(j)._2
          var ai = 0
          var bi = 0
          var best = Int.MaxValue
          while (ai < a.length && bi < b.length) {
            val d = math.abs(a(ai) - b(bi))
            if (d < best) best = d
            if (a(ai) < b(bi)) ai += 1 else bi += 1
          }
          if (best != Int.MaxValue) s += 1.0 / (1.0 + best)
          j += 1
        }
        i += 1
      }
      s
    })

  /**
   * Proximity-boosted BM25 top-k: score = bm25 + lambdaProx · prox —
   * the most common relevance upgrade on a positional index (documents
   * where the query terms appear NEAR each other outrank equal-bm25
   * documents where they are scattered; lambdaProx = 0 degenerates to
   * plain [[bm25TopK]] exactly).
   *
   * One exchange for the per-document work: the matched postings are
   * repartitioned by id once, and both the bm25 sum and the proximity
   * group ride that partitioning (the gapFill contract); the proximity
   * join is id-aligned on the same exchange. Returns
   * (rank, id, score, prox, n_terms_hit).
   */
  def bm25TopKProximity(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      lambdaProx: Double = 0.5,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val index = buildIndex(docs, idCol, textCol)
    bm25TopKProximityImpl(index, corpusStats(index), queryTerms, k,
      lambdaProx, k1, b)
  }

  /** [[bm25TopKProximity]] over a saved [[TextIndex]] — the serving
    * form: the postings scan partition-prunes to the query-term
    * buckets; stats are the saved exact (nDocs, avgdl). */
  def bm25TopKProximityIndexed(
      idx: TextIndex,
      queryTerms: Seq[String],
      k: Int,
      lambdaProx: Double = 0.5,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    import idx.postings.sparkSession.implicits._
    val q = queryTerms.map(_.toLowerCase).distinct
    val qBuckets = q.map(t => localTermBucket(t, idx.buckets)).distinct
    val pruned = idx.postings.filter(F.col("__bucket").isin(qBuckets: _*))
    val stats = Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
    bm25TopKProximityImpl(pruned, stats, queryTerms, k, lambdaProx, k1, b)
  }

  private def bm25TopKProximityImpl(
      index: DataFrame,
      stats: DataFrame,
      queryTerms: Seq[String],
      k: Int,
      lambdaProx: Double,
      k1: Double,
      b: Double): DataFrame = {
    require(lambdaProx >= 0.0, s"lambdaProx must be >= 0, got $lambdaProx")
    val q = queryTerms.map(_.toLowerCase).distinct
    // ONE fused per-document aggregation carries the bm25 sum AND the
    // (term, positions) lists the proximity kernel consumes — a
    // separate proximityScores group would recompute the matched scan
    // and pay a second id exchange (plus a join); pinned in
    // PlanShapeSpec. Formula parity: the weight is the shared
    // bm25Weight builder, the kernel the shared proximityUdf.
    val matched = index.filter(F.col("term").isin(q: _*))
    val dfs = matched.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    val combined = matched
      .join(F.broadcast(dfs), "term")
      .crossJoin(F.broadcast(stats))
      .withColumn("__w", bm25Weight(k1, b))
      .groupBy("id")
      .agg(F.sum(F.col("__w")).as("__bm25"),
        F.count(F.lit(1)).as("n_terms_hit"),
        F.collect_list(F.struct(F.col("term"), F.col("positions")))
          .as("__lists"))
      .withColumn("prox", proximityUdf(F.col("__lists")))
      .withColumn("score",
        F.col("__bm25") + F.lit(lambdaProx) * F.col("prox"))
    rankTopK(combined, k)
      .select(F.col("rank"), F.col("id"), F.col("score"),
        F.col("prox"), F.col("n_terms_hit"))
  }

  // ---------------------------------------------------------------- //
  // Reciprocal-rank fusion                                            //
  // ---------------------------------------------------------------- //

  /**
   * Fuse ranked lists by reciprocal rank: each input holds (id, rank)
   * with rank 1-based; the fused score of a document is
   * Σ_lists 1 / (kRrf + rank), missing-from-a-list contributing 0.
   * Returns (rank, id, rrf_score, n_lists) for the fused top-k.
   *
   * Scale: a union + one groupBy on id; input lists are top-k's and
   * therefore tiny, so Spark broadcasts/locally sorts — no corpus
   * touch at fuse time.
   */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    val tagged = rankings.map(_.select(
      F.col("id"),
      (F.lit(1.0) / (F.lit(kRrf.toDouble) + F.col("rank"))).as("__c")))
    val scored = tagged.reduce(_ union _)
      .groupBy("id")
      .agg(F.sum(F.col("__c")).as("score"), F.count(F.lit(1)).as("n_lists"))
    rankTopK(scored, k)
      .select(F.col("rank"), F.col("id"),
        F.col("score").as("rrf_score"), F.col("n_lists"))
  }

  /**
   * Reciprocal-rank fusion over BATCHED rankings — the multi-query
   * serving form of [[rrfFuse]]: each input is any ANN/retrieval
   * family's (query_id, rank, neighbor_id) output; per (query,
   * neighbor), score = sum over lists of 1/(kRrf + rank). Returns
   * (query_id, rank, neighbor_id, rrf_score, n_lists) top-`k` per
   * query, ties by neighbor_id.
   *
   * Number discipline: the per-pair score sums <= |rankings| doubles
   * — profile-identical neighbors can land 1 ulp apart depending on
   * union merge order, so pin MEMBERSHIP and the strictly-separated
   * head (a neighbor ranked 1 in every list beats any other profile
   * by construction), never marginal orderings.
   *
   * Scale shape: one union of top-k tables (each |queries| x k), one
   * grouped sum, one per-query window — nothing corpus-sized.
   */
  def rrfFusePerQuery(
      rankings: Seq[DataFrame],
      k: Int,
      kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFusePerQuery: no rankings")
    val tagged = rankings.map(_.select(
      F.col("query_id"), F.col("neighbor_id"),
      (F.lit(1.0) / (F.lit(kRrf.toDouble) + F.col("rank"))).as("__c")))
    val scored = tagged.reduce(_ unionByName _)
      .repartition(F.col("query_id"))
      .groupBy(F.col("query_id"), F.col("neighbor_id"))
      .agg(F.sum(F.col("__c")).as("rrf_score"), F.count(F.lit(1)).as("n_lists"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col("query_id"))
      .orderBy(F.col("rrf_score").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "rrf_score", "n_lists")
  }

  /**
   * Score-normalized hybrid fusion (CombSUM over min-max-normalized
   * scores — Fox & Shaw's combination, Vogt & Cottrell's weighting):
   * each input is a k-bounded ranked list (id, score) from any
   * retrieval family (BM25, cosine, proximity, ...); its scores
   * min-max normalize over ITS OWN list to [0, 1] (a degenerate
   * all-equal list normalizes to 1.0), then
   *
   *   fused(d) = Σ_i w_i * norm_i(d),   missing-from-list → 0.
   *
   * Score fusion complements [[rrfFuse]] (rank fusion): RRF discards
   * score magnitudes (robust, scale-free); CombSUM keeps them (a
   * document barely inside one list but dominant in another wins).
   * Returns (rank, id, fused_score, n_lists), ties by id.
   *
   * Number discipline: the per-document fused sum has <= |rankings|
   * addends — with the common two-list (lexical + semantic) setup the
   * sum is 2 doubles, exactly commutative, so union order cannot
   * perturb it (the q_retrieval_rrf argument).
   *
   * Scale shape: inputs are top-k serving lists — 1-row min/max
   * aggregates broadcast back, one union + one grouped sum; nothing
   * corpus-sized.
   */
  def fuseScoresMinMax(
      rankings: Seq[(DataFrame, Double)], k: Int): DataFrame = {
    require(rankings.nonEmpty, "fuseScoresMinMax: no rankings")
    val tagged = rankings.map { case (df, wgt) =>
      val s = df.select(F.col("id"), F.col("score").cast("double").as("__s"))
      val mm = s.agg(F.min(F.col("__s")).as("__mn"),
        F.max(F.col("__s")).as("__mx"))
      s.crossJoin(F.broadcast(mm))
        .select(F.col("id"),
          (F.lit(wgt) * F.when(F.col("__mx") > F.col("__mn"),
            (F.col("__s") - F.col("__mn")) / (F.col("__mx") - F.col("__mn")))
            .otherwise(F.lit(1.0))).as("__c"))
    }
    val scored = tagged.reduce(_ unionByName _)
      .groupBy("id")
      .agg(F.sum(F.col("__c")).as("score"), F.count(F.lit(1)).as("n_lists"))
    rankTopK(scored, k)
      .select(F.col("rank"), F.col("id"),
        F.col("score").as("fused_score"), F.col("n_lists"))
  }
}
