package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Benchmark decontamination: flag training documents that share word
 * n-grams with an evaluation/benchmark set — the standard guard
 * against test-set leakage in training corpora (the GPT-3-style
 * 13-gram overlap check, with n and the overlap threshold as knobs).
 *
 * Scale shape: the benchmark side is eval-set sized (thousands of
 * documents) — its distinct n-grams are BROADCAST, so the corpus is
 * scanned exactly once, exploded to distinct-per-document n-grams,
 * and filtered by a broadcast hash join; only matching (doc, ngram)
 * rows reach the per-document count shuffle. Nothing ever shuffles
 * the corpus text itself.
 *
 * N-gram semantics: lowercase, split on whitespace, drop empties,
 * consecutive n-word windows, distinct per document — a construction
 * any SQL engine reproduces exactly (the oracle does, in DuckDB).
 * [[wordNgrams]] is the Column-lambda reference form; the join path
 * uses a one-pass JVM hash kernel with identical gram boundaries.
 */
object Decontaminate {

  /** Distinct lowercase word n-grams of `text` as an array column;
    * empty array when the document has fewer than n words. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    // bind the split once: words is referenced from count and from
    // every slice (interpreted higher-order exprs, no CSE — Let.bind)
    Let.bind(F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), "\\s+"),
        w => F.length(w) > 0)) { words =>
      val count = F.size(words) - (n - 1)
      // sequence(1, 0) yields a DESCENDING [1, 0], not empty — short
      // documents must short-circuit to an empty array explicitly
      F.array_distinct(
        F.when(count > 0,
          F.transform(
            F.sequence(F.lit(1), count),
            i => F.array_join(F.slice(words, i, F.lit(n)), " ")))
          .otherwise(F.typedlit(Seq.empty[String])))
    }
  }

  /** Distinct 64-bit hashes of a document's word n-grams: the gram
    * STRINGS never leave their source row — only 8-byte hashes are
    * exploded, broadcast, and joined, which keeps the benchmark
    * broadcast and the probe columns small at corpus scale. Both sides
    * of the contamination join use the same hash, so any deterministic
    * 64-bit hash works; a one-pass JVM kernel (FNV-1a word hashes from
    * a single char scan, order-sensitive window combine, sort+dedup)
    * avoids allocating a gram string per window, which dominated the
    * Column-lambda form. (A 64-bit collision would overcount by one
    * n-gram with probability ~|grams|^2 / 2^64 — negligible.) */
  private[pipeline] def ngramHashKernel(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val len = s.length
    // FNV-1a over the chars of each \s+-delimited word (matches the
    // regex-split semantics of wordNgrams: \s = [ \t\n\x0B\f\r])
    var wh = new Array[Long](math.max(16, len / 6))
    var wc = 0
    var h = 0xcbf29ce484222325L
    var inWord = false
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (ws) {
        if (inWord) {
          if (wc == wh.length) wh = java.util.Arrays.copyOf(wh, wh.length * 2)
          wh(wc) = h; wc += 1; h = 0xcbf29ce484222325L; inWord = false
        }
      } else {
        h = (h ^ c.toInt) * 0x100000001b3L
        inWord = true
      }
      i += 1
    }
    if (inWord) {
      if (wc == wh.length) wh = java.util.Arrays.copyOf(wh, wh.length + 1)
      wh(wc) = h; wc += 1
    }
    val cnt = wc - (n - 1)
    if (cnt <= 0) return Array.emptyLongArray
    val grams = new Array[Long](cnt)
    var j = 0
    while (j < cnt) {
      var g = 0x9e3779b97f4a7c15L
      var k = 0
      while (k < n) { g = (g ^ wh(j + k)) * 0x100000001b3L; k += 1 }
      grams(j) = g
      j += 1
    }
    java.util.Arrays.sort(grams)
    // in-place dedup of the sorted run (distinct-per-document semantics)
    var out = 1
    j = 1
    while (j < cnt) {
      if (grams(j) != grams(out - 1)) { grams(out) = grams(j); out += 1 }
      j += 1
    }
    if (out == cnt) grams else java.util.Arrays.copyOf(grams, out)
  }

  private def wordNgramHashes(text: Column, n: Int): Column = {
    val u = F.udf((t: String) => ngramHashKernel(t, n))
    u(text)
  }

  /** Collect the benchmark's distinct gram hashes as one sorted array.
    * The benchmark is eval-set-sized by definition, and these are the
    * exact rows a broadcast hash join would ship to the driver anyway —
    * collecting them explicitly (one Spark job at call time) lets the
    * corpus pass become map-only. */
  private def collectBenchHashes(
      benchmark: DataFrame, benchTextCol: String, n: Int): Array[Long] = {
    val spark = benchmark.sparkSession
    import spark.implicits._
    val hashes = benchmark
      .select(F.explode(wordNgramHashes(F.col(benchTextCol), n)).as("__g"))
      .distinct()
      .as[Long]
      .collect()
    java.util.Arrays.sort(hashes)
    hashes
  }

  /** Per-gram overlap count column: binary search of each document gram
    * in the broadcast sorted benchmark set — a single corpus scan with
    * zero shuffles. */
  private def overlapCountColumn(
      docs: DataFrame, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int): Column = {
    val bc = docs.sparkSession.sparkContext
      .broadcast(collectBenchHashes(benchmark, benchTextCol, n))
    val countU = F.udf((t: String) => {
      val grams = ngramHashKernel(t, n)
      val set = bc.value
      var c = 0L
      var i = 0
      while (i < grams.length) {
        if (java.util.Arrays.binarySearch(set, grams(i)) >= 0) c += 1
        i += 1
      }
      c
    })
    countU(F.col(textCol))
  }

  /**
   * Per-document contamination counts against a benchmark corpus:
   * returns `docs`' id column plus `overlap_ngrams` (distinct document
   * n-grams that appear anywhere in the benchmark) and `contaminated`
   * (overlap >= minOverlap). Documents with NULL or sub-n-word text
   * have zero overlap and are not contaminated.
   *
   * Map-only: the benchmark's distinct gram hashes are collected
   * (driver-sized — see [[collectBenchHashes]]) and broadcast as a
   * sorted `Array[Long]`; the corpus is scanned exactly once with a
   * binary-search membership probe per gram. No explode, no join, no
   * shuffle of anything corpus-sized. Triggers one Spark job at call
   * time to build the benchmark set. [[contaminationFlagsJoin]] is the
   * fully-lazy equivalent, spec-pinned to produce identical results.
   */
  def contaminationFlags(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8,
      minOverlap: Int = 1): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    docs.select(F.col(idCol),
      overlapCountColumn(docs, textCol, benchmark, benchTextCol, n)
        .as("overlap_ngrams"))
      .select(F.col(idCol), F.col("overlap_ngrams"),
        (F.col("overlap_ngrams") >= minOverlap).as("contaminated"))
  }

  /** Join-based contamination flags: same semantics as
    * [[contaminationFlags]] with no driver-side action — the benchmark
    * grams stay in-plan behind a broadcast hash join. Costs an explode
    * of the corpus grams, a per-document count shuffle, and a
    * corpus-wide left join; prefer the map-only default unless the
    * call site cannot tolerate an eager job. */
  def contaminationFlagsJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8,
      minOverlap: Int = 1): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val benchGrams = benchmark
      .select(F.explode(wordNgramHashes(F.col(benchTextCol), n)).as("__g"))
      .distinct()
    val docGrams = docs.select(F.col(idCol),
      F.explode(wordNgramHashes(F.col(textCol), n)).as("__g"))
    val overlaps = docGrams
      .join(F.broadcast(benchGrams), "__g")
      .groupBy(F.col(idCol))
      .agg(F.count(F.lit(1)).as("overlap_ngrams"))
    docs.select(F.col(idCol))
      .join(overlaps, Seq(idCol), "left")
      .select(F.col(idCol),
        F.coalesce(F.col("overlap_ngrams"), F.lit(0L)).as("overlap_ngrams"),
        (F.coalesce(F.col("overlap_ngrams"), F.lit(0L)) >= minOverlap).as("contaminated"))
  }

  /**
   * WHICH benchmark item leaked — the audit trail behind
   * [[contaminationFlags]] (the flag says drop; this says to whom and
   * how strongly): one row per (document, benchmark item) pair
   * sharing at least `minOverlap` DISTINCT word n-grams, with the
   * shared-gram count. The benchmark side explodes per-ITEM hashes
   * (still eval-set-sized) and broadcasts; the per-pair count shuffle
   * carries only contaminated-sliver rows.
   */
  def contaminationSources(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      n: Int = 8,
      minOverlap: Int = 1): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val benchGrams = benchmark
      .select(F.col(benchIdCol).as("bench_id"),
        F.explode(wordNgramHashes(F.col(benchTextCol), n)).as("__g"))
      .distinct()
    val docGrams = docs.select(F.col(idCol),
      F.explode(wordNgramHashes(F.col(textCol), n)).as("__g"))
    docGrams
      .join(F.broadcast(benchGrams), "__g")
      .groupBy(F.col(idCol), F.col("bench_id"))
      .agg(F.count(F.lit(1)).as("shared_ngrams"))
      .filter(F.col("shared_ngrams") >= minOverlap)
  }

  /** Drop contaminated documents: a map-only filter on the broadcast
    * overlap count — keeps every `docs` column, no join. */
  def dropContaminated(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8,
      minOverlap: Int = 1): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    docs.filter(
      overlapCountColumn(docs, textCol, benchmark, benchTextCol, n) < minOverlap)
  }

  /**
   * Semantic (embedding-space) decontamination: flag corpus rows whose
   * embedding is within `threshold` cosine of ANY benchmark row —
   * the paraphrase-robust complement to the n-gram overlap above
   * (verbatim-overlap checks miss reworded eval items; embedding
   * proximity is how recent model reports audit that gap). Returns
   * (idCol, contaminated BOOLEAN) for every corpus row.
   *
   * Scale shape: the CORPUS carries the IVF index (built once,
   * persistable via [[Similarity.IvfIndex.save]]); the benchmark is
   * the small side and broadcasts through
   * [[Similarity.ivfRadiusPairs]]. No all-pairs join at either end.
   * Recall follows the IVF probe dial, with the floor that matters:
   * an exact copy of a benchmark row is ALWAYS flagged (identical
   * vectors share the probe's first cell).
   */
  def semanticContaminationFlags(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      benchmark: DataFrame,
      benchVecCol: String,
      threshold: Double = 0.97,
      nlist: Int = 64,
      probeMass: Double = 0.45): DataFrame =
    semanticContaminationFlagsIndexed(
      Similarity.buildIvfIndex(
        docs.filter(F.col(vecCol).isNotNull), idCol, vecCol, nlist),
      docs, idCol, benchmark, benchVecCol, threshold, probeMass)

  /**
   * [[semanticContaminationFlags]] against a PREBUILT corpus index —
   * the nightly shape: build the IVF index once
   * ([[Similarity.buildIvfIndex]] + `IvfIndex.save`), then audit each
   * new benchmark release with `Similarity.loadIvfIndex` + this,
   * never re-clustering the corpus. The index's `neighbor_id` column
   * must hold `docs`' `idCol` values.
   */
  def semanticContaminationFlagsIndexed(
      index: Similarity.IvfIndex,
      docs: DataFrame,
      idCol: String,
      benchmark: DataFrame,
      benchVecCol: String,
      threshold: Double = 0.97,
      probeMass: Double = 0.45): DataFrame = {
    val bench = benchmark.filter(F.col(benchVecCol).isNotNull)
      .select(F.monotonically_increasing_id().as("__bid"),
        F.col(benchVecCol).as("__bv"))
    val hits = Similarity
      .ivfRadiusPairs(index, bench, "__bid", "__bv", threshold,
        probeMass = probeMass)
      .select(F.col("neighbor_id").as(idCol)).distinct()
      .withColumn("__hit", F.lit(1))
    docs.select(F.col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(F.col(idCol), F.col("__hit").isNotNull.as("contaminated"))
  }

  /** Drop semantically contaminated documents (all `docs` columns
    * kept; one anti-join against the flagged-id set). */
  def dropSemanticContaminated(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      benchmark: DataFrame,
      benchVecCol: String,
      threshold: Double = 0.97,
      nlist: Int = 64,
      probeMass: Double = 0.45): DataFrame = {
    val flagged = semanticContaminationFlags(
      docs, idCol, vecCol, benchmark, benchVecCol, threshold, nlist, probeMass)
      .filter(F.col("contaminated")).select(idCol)
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  /**
   * Train/test leakage MATRIX — the eval-hygiene audit over an already
   * split corpus: for every ordered split pair (a < b), the number of
   * distinct n-gram contents the two splits share and the number of
   * documents on each side carrying at least one shared gram. A
   * nonzero row is the "your test set leaks into training" report,
   * per pair, before any model ever sees the data.
   *
   * Scale shape: one distinct (split, id, gram) projection; every
   * join keys on the gram, and the split dimension is tiny, so
   * per-gram fanout is bounded by |splits| — never all-pairs, the
   * [[contaminationSources]] discipline applied between splits.
   * Returns (split_a, split_b, shared_grams, leaked_docs_a,
   * leaked_docs_b), pairs with zero shared grams omitted.
   */
  def splitLeakageMatrix(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      splitCol: String,
      n: Int = 8): DataFrame =
    // grams hash to xxhash64 BEFORE the distinct (the
    // [[buildLeakageIndex]] shape): the corpus-scale distinct and both
    // matrix joins then move 8-byte keys instead of n-token strings.
    // Distinct-hash counts equal distinct-gram counts absent 64-bit
    // collisions (~n²/2^65) — the same argument the
    // `q_split_leakage_incremental` gate already pins for the index
    // form against this operator's full-text oracle.
    leakageMatrixFrom(
      docs.select(F.col(splitCol).as("__sp"), F.col(idCol).as("__id"),
          F.explode(wordNgrams(F.col(textCol), n)).as("__g"))
        .select(F.col("__sp"), F.col("__id"),
          F.xxhash64(F.col("__g")).as("gram"))
        .distinct())

  /**
   * Persistable per-split gram signature index for the NIGHTLY form of
   * the leakage audit: one row per distinct (split, id, gram_h) with
   * `gram_h = xxhash64(gram)` — 8 bytes per gram instead of the n-token
   * string, the [[graft.pipeline.Dedup.buildChunkIndex]] discipline.
   * Persist/append with [[graft.pipeline.Dedup.saveSignatureIndex]];
   * takedowns work through `removeFromSavedIndex(indexIdCol = "id")`.
   */
  def buildLeakageIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      splitCol: String,
      n: Int = 8): DataFrame =
    docs.select(F.col(splitCol).as("split"), F.col(idCol).as("id"),
        F.explode(wordNgrams(F.col(textCol), n)).as("__g"))
      .select(F.col("split"), F.col("id"), F.xxhash64(F.col("__g")).as("gram_h"))
      .distinct()

  /** The leakage matrix recomputed from a [[buildLeakageIndex]] frame —
    * equal to [[splitLeakageMatrix]] over the same corpus absent 64-bit
    * gram-hash collisions (~n²/2^65, the repo's xxhash64 argument). */
  def leakageMatrixFromIndex(index: DataFrame): DataFrame =
    leakageMatrixFrom(
      index.select(F.col("split").as("__sp"), F.col("id").as("__id"),
        F.col("gram_h").as("gram")).distinct())

  /**
   * Incremental (nightly-delta) leakage audit: tokenize ONLY the fresh
   * batch, append its (split, id, gram_h) projection to the saved
   * index, and recompute the matrix from the index — history text is
   * never re-read, re-tokenized, or re-shuffled as strings (the
   * [[graft.pipeline.Dedup.incrementalChunkOverlap]] discipline). The
   * matrix joins run over 8-byte hashed rows, so even the recompute is
   * far cheaper than the full-text form; equal to a full
   * [[splitLeakageMatrix]] recompute on the grown corpus (the
   * `q_split_leakage_incremental` gate pins it against the full-text
   * oracle). Leakage is corpus-global — a new doc can leak against ALL
   * history — so the matrix genuinely needs the whole index; the
   * saving is tokenization + string shuffles, which dominate at crawl
   * scale.
   */
  def incrementalSplitLeakage(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      textCol: String,
      splitCol: String,
      n: Int = 8): DataFrame = {
    val delta = buildLeakageIndex(fresh, idCol, textCol, splitCol, n)
    // the flat-index sibling lock: a takedown promote racing this
    // append would otherwise swap the directory out from under it and
    // lose the delta
    Maintenance.withSiblingLock(spark, path) {
      graft.pipeline.Dedup.saveSignatureIndex(delta, path, mode = "append")
    }
    leakageMatrixFromIndex(graft.pipeline.Dedup.loadSignatureIndex(spark, path))
  }

  // ---------------------------------------------------------------- //
  // Stateful (delta-bounded) leakage audit                            //
  // ---------------------------------------------------------------- //

  /**
   * The TRULY incremental leakage audit: instead of recomputing the
   * matrix over the whole gram index each night
   * ([[incrementalSplitLeakage]] — whose matrix recompute still
   * shuffles the full index and measures no faster than the full-text
   * form at bench scale), maintain the audit's sufficient statistics
   * and touch history only with DELTA-bounded broadcast probes:
   *
   *   - `grams`    (split, id, gram_h): the append-only probe table;
   *   - `memb`     (split, gram_h): distinct gram-split memberships —
   *     a gram's membership is set-once under append-only corpora, so
   *     a pair (a, b) gains a shared gram exactly when the SECOND
   *     membership appears;
   *   - `docleaks` (id, own, other): documents known to share >= 1
   *     gram with another split (bounded by docs × splits);
   *   - `shared`   (split_a, split_b, shared_grams): per-batch count
   *     DELTAS (the TextIndex stats-row discipline — sums are
   *     invariant under folding and replays overwrite their own row).
   *
   * A nightly update tokenizes ONLY the delta, finds new memberships
   * by one anti-join, lights up existing documents with ONE map-side
   * scan of `grams` against the BROADCAST new memberships, new
   * documents with one map-side scan of `memb` against the broadcast
   * delta, and computes shared-gram increments over new-membership
   * grams only. Nothing corpus-sized shuffles.
   *
   * Every table is `__batch`-stamped: an update with a real `batchId`
   * computes against state EXCLUDING its own batch and
   * dynamic-overwrites exactly its own partitions, so a crashed
   * nightly is simply re-run with the same id (effectively-once).
   * Matrix reads BETWEEN a failed night and its re-run may see a
   * partially-written batch (e.g. shared deltas landed, doc-leaks not)
   * — re-run the night before trusting the matrix; the re-run
   * converges regardless. Single-maintainer (the [[Maintenance]]
   * lock). Append-only corpora and stable split labels; takedowns =
   * re-init.
   */
  def initLeakageState(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      splitCol: String,
      n: Int = 8): DataFrame = Maintenance.withLock(spark, path) {
    val dg = buildLeakageIndex(docs, idCol, textCol, splitCol, n)
      .localCheckpoint(eager = false)
    val memb = dg.select("split", "gram_h").distinct()
      .localCheckpoint(eager = false)
    val dl = dg
      .join(memb.select(F.col("gram_h"), F.col("split").as("other")), "gram_h")
      .filter(F.col("split") =!= F.col("other"))
      .select(F.col("id"), F.col("split").as("own"), F.col("other"))
      .distinct()
    val shared = memb.select(F.col("gram_h"), F.col("split").as("split_a"))
      .join(memb.select(F.col("gram_h"), F.col("split").as("split_b")), "gram_h")
      .filter(F.col("split_a") < F.col("split_b"))
      .groupBy("split_a", "split_b")
      .agg(F.count(F.lit(1)).as("shared_grams"))
    def w(df: DataFrame, name: String): Unit =
      df.withColumn("__batch", F.lit(-1L))
        .write.partitionBy("__batch").mode("overwrite")
        .parquet(s"$path/$name")
    w(dg, "grams"); w(memb, "memb"); w(dl, "docleaks"); w(shared, "shared")
    leakageMatrixFromState(spark, path)
  }

  /** One nightly delta. `batchId` must be fresh and monotone (the
    * scheduler's run number); re-running a failed night with the SAME
    * id converges (own-batch rows are excluded from every read and
    * overwritten by every write). Returns the updated matrix. */
  def updateLeakageState(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      textCol: String,
      splitCol: String,
      batchId: Long,
      n: Int = 8): DataFrame = Maintenance.withLock(spark, path) {
    require(batchId >= 0L, s"batchId must be >= 0, got $batchId")
    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$path/$name")
        .withColumn("__batch", F.col("__batch").cast("long"))
        .filter(F.col("__batch") =!= batchId)
    val dgD = buildLeakageIndex(fresh, idCol, textCol, splitCol, n)
      .localCheckpoint(eager = true)
    if (dgD.isEmpty) leakageMatrixFromState(spark, path) else {
    val membOld = tbl("memb").select("split", "gram_h")
    val ng = dgD.select("split", "gram_h").distinct()
      .join(membOld, Seq("split", "gram_h"), "left_anti")
      .localCheckpoint(eager = true)
    // existing (and delta) docs lit up by NEW memberships: one
    // map-side scan of the probe table against the broadcast NG
    val hitA = tbl("grams").select("split", "id", "gram_h").unionByName(dgD)
      .join(F.broadcast(
        ng.select(F.col("gram_h"), F.col("split").as("other"))), "gram_h")
      .filter(F.col("split") =!= F.col("other"))
      .select(F.col("id"), F.col("split").as("own"), F.col("other"))
    // delta docs vs OLD memberships: one map-side scan of memb
    val hitB = membOld
      .select(F.col("gram_h"), F.col("split").as("other"))
      .join(F.broadcast(dgD.select(F.col("gram_h"), F.col("id"),
        F.col("split").as("own"))), "gram_h")
      .filter(F.col("own") =!= F.col("other"))
      .select("id", "own", "other")
    val newLeaks = hitA.unionByName(hitB).distinct()
      .join(tbl("docleaks").select("id", "own", "other"),
        Seq("id", "own", "other"), "left_anti")
      .localCheckpoint(eager = true)
    // shared-gram increments: a pair gains gram g iff g's SECOND side
    // appeared — i.e. at least one side of the pair is a new
    // membership (both-new covers two memberships landing in one
    // delta). NG-bounded self-join; per-gram rows <= |splits|.
    val tagged = ng
      .select(F.col("gram_h"), F.col("split"), F.lit(true).as("__new"))
      .unionByName(membOld
        .join(F.broadcast(ng.select("gram_h").distinct()), "gram_h")
        .select(F.col("gram_h"), F.col("split"), F.lit(false).as("__new")))
    val inc = tagged
      .select(F.col("gram_h"), F.col("split").as("split_a"),
        F.col("__new").as("__na"))
      .join(tagged.select(F.col("gram_h"), F.col("split").as("split_b"),
        F.col("__new").as("__nb")), "gram_h")
      .filter(F.col("split_a") < F.col("split_b"))
      .filter(F.col("__na") || F.col("__nb"))
      .groupBy("split_a", "split_b")
      .agg(F.count(F.lit(1)).as("shared_grams"))
      .localCheckpoint(eager = true)
    def w(df: DataFrame, name: String): Unit =
      df.withColumn("__batch", F.lit(batchId))
        .write.partitionBy("__batch")
        .option("partitionOverwriteMode", "dynamic").mode("overwrite")
        .parquet(s"$path/$name")
    w(dgD, "grams"); w(ng, "memb"); w(newLeaks, "docleaks"); w(inc, "shared")
    leakageMatrixFromState(spark, path)
  } }

  /**
   * Fold the leakage state's retired nightly partitions into the
   * `__batch=-1` base layer — the small-file reclaim for long-lived
   * audits (each night adds one partition per table). Every fold is
   * semantics-invariant: grams/memb/docleaks are DISTINCT row sets and
   * `shared` rows are summable deltas, so the folded state yields a
   * bit-identical matrix. Static rewrite per table (tiny relative to
   * the corpus — the tables hold hashes and ids, never text);
   * single-maintainer via the [[Maintenance]] lock; run it between
   * nightly updates, not concurrently with one. Batch ids retire at
   * fold time, so re-running an ALREADY-FOLDED night with its old id
   * would double rows — fold only nights whose success is confirmed,
   * and keep batch ids monotone afterwards (the watermark is the max
   * folded id, returned for the caller's scheduler).
   */
  def compactLeakageState(
      spark: org.apache.spark.sql.SparkSession, path: String): Long =
    Maintenance.withLock(spark, path) {
      var maxFolded = -1L
      Seq("grams", "memb", "docleaks", "shared").foreach { name =>
        val cur = spark.read.parquet(s"$path/$name")
          .withColumn("__batch", F.col("__batch").cast("long"))
        val ids = cur.select("__batch").distinct()
          .collect().map(_.getLong(0))
        maxFolded = math.max(maxFolded, ids.foldLeft(-1L)(_ max _))
        if (ids.length > 1) {
          val folded = cur.drop("__batch")
            .localCheckpoint(eager = true) // source dirs are rewritten
          folded.withColumn("__batch", F.lit(-1L))
            .write.partitionBy("__batch").mode("overwrite")
            .parquet(s"$path/$name")
        }
      }
      maxFolded
    }

  /** The matrix from the maintained statistics: shared counts are the
    * fold of the per-batch deltas; leaked counts one aggregate over
    * the (docs × splits)-bounded docleaks table. Output and pair
    * omission rules identical to [[splitLeakageMatrix]]. */
  def leakageMatrixFromState(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val shared = spark.read.parquet(s"$path/shared")
      .groupBy("split_a", "split_b")
      .agg(F.sum("shared_grams").as("shared_grams"))
      .filter(F.col("shared_grams") > 0)
    val dl = spark.read.parquet(s"$path/docleaks")
      .select("id", "own", "other").distinct()
    val la = dl.filter(F.col("own") < F.col("other"))
      .groupBy(F.col("own").as("split_a"), F.col("other").as("split_b"))
      .agg(F.count(F.lit(1)).as("leaked_docs_a"))
    val lb = dl.filter(F.col("own") > F.col("other"))
      .groupBy(F.col("other").as("split_a"), F.col("own").as("split_b"))
      .agg(F.count(F.lit(1)).as("leaked_docs_b"))
    shared
      .join(la, Seq("split_a", "split_b"))
      .join(lb, Seq("split_a", "split_b"))
  }

  private def leakageMatrixFrom(docGrams: DataFrame): DataFrame = {
    val dg = docGrams.localCheckpoint(eager = false)
    val sg = dg.select(F.col("__sp"), F.col("gram")).distinct()
      .localCheckpoint(eager = false)
    // ONE gram join carries both directions (the old form ran the
    // corpus-side join twice, once per side): a row "doc of __sp whose
    // gram also lives in __o" belongs to the ordered pair
    // (least, greatest) — as the a-side when __sp < __o, the b-side
    // otherwise. Shared grams count off the a-side rows (a shared gram
    // necessarily appears in >= 1 a-doc).
    val t = dg
      .join(sg.select(F.col("__sp").as("__o"), F.col("gram")), Seq("gram"))
      .filter(F.col("__sp") =!= F.col("__o"))
      .select(F.least(F.col("__sp"), F.col("__o")).as("split_a"),
        F.greatest(F.col("__sp"), F.col("__o")).as("split_b"),
        (F.col("__sp") < F.col("__o")).as("__isA"),
        F.col("__id"), F.col("gram"))
      .localCheckpoint(eager = false)
    val shared = t.filter(F.col("__isA"))
      .select(F.col("split_a"), F.col("split_b"), F.col("gram"))
      .distinct()
      .groupBy(F.col("split_a"), F.col("split_b"))
      .agg(F.count(F.lit(1)).as("shared_grams"))
    val leakedA = t.filter(F.col("__isA"))
      .select(F.col("split_a"), F.col("split_b"), F.col("__id"))
      .distinct()
      .groupBy(F.col("split_a"), F.col("split_b"))
      .agg(F.count(F.lit(1)).as("leaked_docs_a"))
    val leakedB = t.filter(!F.col("__isA"))
      .select(F.col("split_a"), F.col("split_b"), F.col("__id"))
      .distinct()
      .groupBy(F.col("split_a"), F.col("split_b"))
      .agg(F.count(F.lit(1)).as("leaked_docs_b"))
    shared
      .join(leakedA, Seq("split_a", "split_b"))
      .join(leakedB, Seq("split_a", "split_b"))
  }

  /**
   * Corpus NOVELTY scoring vs a reference corpus — the dataset-
   * analysis metric for "how much of this new crawl is genuinely new
   * text": per document, the fraction of its distinct word `n`-grams
   * absent from the reference's distinct-gram set. An exact copy of
   * reference text scores 0; fully fresh text scores 1.
   *
   * Returns (id, total_grams, unseen_grams, novelty) for every
   * document with at least one gram (shorter docs have no n-gram
   * signal and drop). novelty is ONE division of exact longs —
   * deterministic cross-engine.
   *
   * Scale shape: both sides explode to distinct 8-byte xxhash64 gram
   * keys (strings never leave their rows — the contamination-join
   * discipline); the membership probe is a hash join on those keys
   * and the rollup groups by document. At 100 TB the reference gram
   * set is the big side: it never broadcasts, and the join shuffles
   * only (hash, id) pairs.
   */
  def noveltyScores(
      docs: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame =
    noveltyScoresIndexed(docs, buildNoveltyIndex(reference, textCol, n),
      idCol, textCol, n)

  /** The reference side of [[noveltyScores]] as a PERSISTED table:
    * one `gram_hash` column of distinct xxhash64 gram keys. Save as
    * plain parquet; at 100 TB this is the big side of the novelty
    * join and building it once per reference release is the point. */
  def buildNoveltyIndex(
      reference: DataFrame,
      textCol: String,
      n: Int = 8): DataFrame =
    reference
      .filter(F.col(textCol).isNotNull)
      .select(F.explode(wordNgrams(F.col(textCol), n)).as("__g"))
      .select(F.xxhash64(F.col("__g")).as("gram_hash"))
      .distinct()

  /** [[noveltyScores]] against a prebuilt [[buildNoveltyIndex]]
    * table (loaded from parquet for nightly/streaming use). */
  def noveltyScoresIndexed(
      docs: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val refGrams = index
      .select(F.col("gram_hash").as("__h"))
      .distinct()
      .withColumn("__seen", F.lit(1))
    val docGrams = docs
      .filter(F.col(textCol).isNotNull)
      .select(F.col(idCol).as("id"),
        F.explode(wordNgrams(F.col(textCol), n)).as("__g"))
      .select(F.col("id"), F.xxhash64(F.col("__g")).as("__h"))
      .distinct()
    docGrams.join(refGrams, Seq("__h"), "left")
      .groupBy(F.col("id"))
      .agg(
        F.count(F.lit(1)).as("total_grams"),
        F.sum(F.when(F.col("__seen").isNull, 1L).otherwise(0L))
          .as("unseen_grams"))
      .withColumn("novelty",
        F.col("unseen_grams").cast("double") /
          F.col("total_grams").cast("double"))
  }

  /** Streaming novelty: each micro-batch scores against the persisted
    * reference gram index and dynamic-overwrites its own `__batch`
    * partition of the score table — stateless, replay-idempotent (the
    * streamChunkOverlap protocol). */
  def noveltyStream(
      stream: DataFrame,
      indexPath: String,
      outPath: String,
      idCol: String,
      textCol: String,
      n: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val scores = noveltyScoresIndexed(batch,
          spark.read.parquet(indexPath), idCol, textCol, n)
        if (!scores.isEmpty)
          scores.withColumn("__batch", F.lit(batchId))
            .repartition(1)
            .write.partitionBy("__batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(outPath)
        ()
    }
}
