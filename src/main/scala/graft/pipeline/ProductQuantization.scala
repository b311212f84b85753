package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/**
 * Product quantization (PQ) for embedding similarity at corpus scale:
 * each vector is split into `m` subspaces of `dim/m` dims; every
 * subspace gets its own small k-means codebook (`ksub` centroids), and
 * a vector is stored as `m` one-byte codes plus its exact norm — a
 * 64-dim float vector (256 B) compresses to 8 B of codes. Queries
 * score the code table with asymmetric distance computation (ADC): a
 * per-query lookup table of sub-dot-products, so scoring a corpus row
 * is `m` table lookups instead of `dim` multiplies, over a table that
 * is dim*4/m times smaller than the embeddings — the difference
 * between scanning 100 TB of vectors and scanning ~3 TB of codes.
 *
 * Training reuses the deterministic seeded-Lloyd shape of
 * [[Similarity]]'s IVF k-means: hash-ordered seeds, and ONE
 * constant-width aggregation pass per iteration for ALL subspaces
 * (explode to (subspace, subvector), group by (subspace, code), sum
 * via [[VectorAgg.vec_sum]]) — only m*ksub aggregated rows ever reach
 * the driver, and plan width is independent of both dim and m.
 *
 * Recall < 1 by design; [[pqTopKReranked]] re-scores an ADC candidate
 * pool with exact cosine on the original vectors, the standard
 * recall-recovery step. Measure against [[Similarity.bruteForceTopK]].
 */
object ProductQuantization {

  /** Trained PQ codebooks: `centroids(sub)(code)` is the sub-centroid
    * vector for `code` in subspace `sub`. */
  final case class PqCodebooks(
      m: Int,
      subDim: Int,
      centroids: Array[Array[Array[Float]]]) {
    def ksub: Int = centroids.headOption.map(_.length).getOrElse(0)
  }

  /** Persist codebooks as (sub, code, centroid) rows — m*ksub rows. */
  def savePqCodebooks(cb: PqCodebooks, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      (book, sub) <- cb.centroids.zipWithIndex
      (cent, code) <- book.zipWithIndex
    } yield (sub, code, cent)
    rows.toSeq.toDF("sub", "code", "centroid")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Reload codebooks written by [[savePqCodebooks]]. */
  def loadPqCodebooks(spark: SparkSession, path: String): PqCodebooks = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .orderBy("sub", "code")
      .select("sub", "code", "centroid")
      .as[(Int, Int, Array[Float])].collect()
    val m = if (rows.isEmpty) 0 else rows.map(_._1).max + 1
    val books = Array.tabulate(m) { sub =>
      rows.filter(_._1 == sub).sortBy(_._2).map(_._3)
    }
    val subDim = books.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)
    PqCodebooks(m, subDim, books)
  }

  private def nearestSub(cb: Array[Array[Float]], v: Array[Float], off: Int, subDim: Int): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      var d = 0.0
      var i = 0
      val cc = cb(c)
      while (i < subDim) {
        val x = if (off + i < v.length) v(off + i) else 0.0f
        val t = cc(i) - x
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /**
   * Train PQ codebooks over the corpus. `dim % m == 0` is required
   * (standard PQ); `ksub <= 256` so codes fit one byte each. Seeds are
   * the first `ksub` vectors in hash order (deterministic), sliced per
   * subspace; each Lloyd iteration is a single constant-width
   * aggregation over the exploded (subspace, subvector) pairs.
   */
  def trainPq(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      ksub: Int = 16,
      iterations: Int = 2): PqCodebooks = {
    require(ksub >= 1 && ksub <= 256, s"ksub must be in [1, 256], got $ksub")
    val spark = corpus.sparkSession
    import spark.implicits._
    val seeds: Array[Array[Float]] = corpus
      .filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol), F.col(vecCol))
      .orderBy(F.abs(F.hash(F.col(idCol))), F.col(idCol))
      .limit(ksub)
      .select(F.col(vecCol)).as[Array[Float]].collect()
    if (seeds.isEmpty) return PqCodebooks(m, 0, Array.empty)
    val dim = seeds.map(_.length).groupBy(identity)
      .maxBy { case (d, g) => (g.length, d) }._1
    require(dim % m == 0, s"embedding dim $dim must be divisible by m=$m")
    val subDim = dim / m
    val goodSeeds = seeds.filter(_.length == dim)
    var books: Array[Array[Array[Float]]] = Array.tabulate(m) { sub =>
      goodSeeds.map(v => java.util.Arrays.copyOfRange(v, sub * subDim, (sub + 1) * subDim))
    }
    for (_ <- 1 to iterations) {
      val bB = spark.sparkContext.broadcast(books)
      val assignU = F.udf((sub: Int, v: Array[Float]) =>
        if (v == null) -1 else nearestSub(bB.value(sub), v, 0, v.length))
      // one exploded pass: (subspace, subvector) rows, constant-width agg
      val subs = corpus
        .filter(F.size(F.col(vecCol)) === dim)
        .select(F.posexplode(F.transform(
          F.sequence(F.lit(0), F.lit(m - 1)),
          j => F.slice(F.col(vecCol), j * subDim + 1, F.lit(subDim))))
          .as(Seq("__sub", "__sv")))
      val means = subs
        .select(F.col("__sub"), assignU(F.col("__sub"), F.col("__sv")).as("__c"),
                F.col("__sv"))
        .groupBy(F.col("__sub"), F.col("__c"))
        .agg(F.count(F.lit(1)).cast("double").as("__n"),
             VectorAgg.vec_sum(F.col("__sv")).as("__s"))
        .collect()
      val next = books.map(_.map(_.clone()))
      means.foreach { row =>
        val sub = row.getInt(0)
        val c = row.getInt(1)
        val n = row.getDouble(2)
        if (c >= 0 && n > 0 && !row.isNullAt(3)) {
          val sArr = row.getSeq[Double](3)
          var d = 0
          while (d < subDim) { next(sub)(c)(d) = (sArr(d) / n).toFloat; d += 1 }
        }
      }
      books = next
      bB.destroy()
    }
    PqCodebooks(m, subDim, books)
  }

  /**
   * Encode the corpus against trained codebooks: returns
   * (`neighbor_id`, `__code` BINARY of m bytes, `__norm` exact L2 norm
   * of the original vector). This is the table a 100 TB deployment
   * persists and scans — dim*4/m times smaller than the embeddings.
   * NULL or ragged-length vectors encode to NULL codes (and drop out
   * of scoring), never an error.
   */
  def pqEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cb: PqCodebooks): DataFrame = {
    val spark = corpus.sparkSession
    val bB = spark.sparkContext.broadcast(cb)
    val dim = cb.m * cb.subDim
    val encU = F.udf((v: Array[Float]) => {
      val b = bB.value
      if (v == null || v.length != b.m * b.subDim) null
      else {
        val codes = new Array[Byte](b.m)
        var sub = 0
        while (sub < b.m) {
          codes(sub) = nearestSub(b.centroids(sub), v, sub * b.subDim, b.subDim).toByte
          sub += 1
        }
        codes
      }
    })
    val normU = F.udf((v: Array[Float]) => {
      val r: java.lang.Double =
        if (v == null) null
        else {
          var s = 0.0
          var i = 0
          while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
          java.lang.Double.valueOf(math.sqrt(s))
        }
      r
    })
    corpus.select(
      F.col(idCol).as("neighbor_id"),
      encU(F.col(vecCol)).as("__code"),
      normU(F.col(vecCol)).as("__norm"))
  }

  /** Approximate top-k by ADC over an encoded corpus: each query
    * precomputes an m*ksub lookup table of sub-dot-products; scoring a
    * corpus row is m byte-indexed lookups. Queries are broadcast, so
    * the code table is scanned exactly once with no shuffle. */
  def pqTopKEncoded(
      cb: PqCodebooks,
      encoded: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val spark = encoded.sparkSession
    val bB = spark.sparkContext.broadcast(cb)
    val lutU = F.udf((v: Array[Float]) => {
      val b = bB.value
      if (v == null || v.length != b.m * b.subDim) null
      else {
        val ks = b.ksub
        val lut = new Array[Float](b.m * ks)
        var sub = 0
        while (sub < b.m) {
          var c = 0
          while (c < ks) {
            val cc = b.centroids(sub)(c)
            var s = 0.0f
            var i = 0
            while (i < b.subDim) { s += cc(i) * v(sub * b.subDim + i); i += 1 }
            lut(sub * ks + c) = s
            c += 1
          }
          sub += 1
        }
        lut
      }
    })
    val qnormU = F.udf((v: Array[Float]) => {
      val r: java.lang.Double =
        if (v == null) null
        else {
          var s = 0.0
          var i = 0
          while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
          java.lang.Double.valueOf(math.sqrt(s))
        }
      r
    })
    val ks = cb.ksub
    val adcU = F.udf((codes: Array[Byte], lut: Seq[Float]) => {
      val r: java.lang.Double =
        if (codes == null || lut == null) null
        else {
          var s = 0.0
          var sub = 0
          while (sub < codes.length) {
            s += lut(sub * ks + (codes(sub) & 0xFF))
            sub += 1
          }
          java.lang.Double.valueOf(s)
        }
      r
    })
    val q = queries.select(F.col(idCol).as("query_id"),
      lutU(F.col(vecCol)).as("__lut"), qnormU(F.col(vecCol)).as("__qn"))
    val scored = encoded.crossJoin(F.broadcast(q))
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .withColumn("cos",
        adcU(F.col("__code"), F.col("__lut")) / (F.col("__qn") * F.col("__norm")))
      .filter(F.col("cos").isNotNull)
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Convenience: train + encode + ADC query in one call. At scale,
    * [[trainPq]] + [[pqEncode]] once, persist, [[pqTopKEncoded]] per
    * query batch. */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 8,
      ksub: Int = 16,
      iterations: Int = 2): DataFrame = {
    val cb = trainPq(corpus, idCol, vecCol, m, ksub, iterations)
    pqTopKEncoded(cb, pqEncode(corpus, idCol, vecCol, cb), queries, idCol, vecCol, k)
  }

  // ------------------------------------------------------------ IVF-PQ

  /** IVF-PQ index: k-means cells (coarse quantizer) + PQ codebooks
    * trained on RESIDUALS from the cell centroid — the classic
    * inverted-file-with-product-quantization layout. `encoded` is
    * (neighbor_id, __cell, __code, __norm): at scale this is the only
    * table a query scans, it partitions by cell, and a query batch
    * touches nprobe/nlist of it. */
  final case class IvfPqIndex(
      centroids: Array[Array[Float]],
      cb: PqCodebooks,
      encoded: DataFrame) {
    /** Persist: the code table parquet PARTITIONED BY cell (query
      * batches partition-prune to their nprobe cells), the coarse
      * centroids, and the PQ codebooks as side tables. */
    def save(path: String): Unit = {
      val spark = encoded.sparkSession
      import spark.implicits._
      // cluster each cell into one task first (the SketchView lesson:
      // tasks x nlist small files otherwise); base build lands under
      // __batch=-1 — the batch-stamped cell-table protocol, so
      // streaming appends are replay-idempotent per micro-batch
      CellTable.writeBase(encoded, s"$path/encoded")
      centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
        .toDF("cell", "centroid")
        .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
      savePqCodebooks(cb, spark, s"$path/codebooks")
    }
  }

  /** Reload an index written by [[IvfPqIndex.save]]. */
  def loadIvfPq(spark: SparkSession, path: String): IvfPqIndex = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").select("centroid").as[Array[Float]].collect()
    val cb = loadPqCodebooks(spark, s"$path/codebooks")
    val encoded = CellTable.readVisible(spark, s"$path/encoded", "__cell")
      .withColumn("__cell", F.col("__cell").cast("int"))
      .select("neighbor_id", "__cell", "__code", "__norm")
    IvfPqIndex(centroids, cb, encoded)
  }

  /** Measure the coarse probe's mass→recall curve
    * ([[Similarity.calibrateIvfProbe]] on the code table): cells are
    * probed by coarse-centroid distance with [[ivfPqTopK]]'s exact
    * stopping rule, sizes from the ENCODED table (what a probe
    * scans). Needs the raw corpus (the code table stores codes, not
    * vectors) — build-time cost, like the codebook training itself.
    * Cell membership bounds recall here too: the rerank pool only
    * reorders WITHIN probed cells, so the curve is exact when
    * `poolSize` covers the probed candidates and optimistic by the
    * PQ-ordering loss below that (measured: pool 4000 → rerank
    * recall 1.0 within probed cells at sf0.1). */
  def calibrateIvfPqProbe(
      index: IvfPqIndex,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nSample: Int = 64,
      minProbe: Int = 4,
      grid: Seq[Double] = Similarity.DefaultCalibrationGrid)
      : Similarity.ProbeCalibration = {
    val spark = corpus.sparkSession
    val cB = spark.sparkContext.broadcast(index.centroids)
    val assignU = F.udf((v: Array[Float]) =>
      Similarity.nearestCentroid(cB.value, v))
    val assigned = corpus.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"),
        assignU(F.col(vecCol)).as("__cell"))
    val sizes = new Array[Long](index.centroids.length)
    index.encoded.groupBy(F.col("__cell")).agg(F.count(F.lit(1)).as("__n"))
      .collect().foreach { r =>
        val c = r.getInt(0)
        if (c >= 0 && c < sizes.length) sizes(c) = r.getLong(1)
      }
    val total = sizes.sum
    Similarity.calibrateProbe(assigned, k, nSample, grid,
      (v, m) => Similarity.nearestCentroidsByMass(index.centroids, sizes,
        total, v, minProbe, m))
  }

  /** [[ivfPqTopK]] with the mass solved from a requested recall
    * target via the measured curve. */
  def ivfPqTopKTarget(
      index: IvfPqIndex,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      targetRecall: Double,
      cal: Similarity.ProbeCalibration,
      nprobe: Int = 4,
      poolSize: Int = 50): DataFrame =
    ivfPqTopK(index, corpus, queries, idCol, vecCol, k, nprobe, poolSize,
      probeMass = cal.massFor(targetRecall))

  /** Build an IVF-PQ index: train the coarse cells, subtract each
    * vector's cell centroid, train PQ on the residuals, encode. */
  def buildIvfPq(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iterations: Int = 2): IvfPqIndex = {
    val spark = corpus.sparkSession
    val ivf = Similarity.buildIvfIndex(corpus, idCol, vecCol, nlist, iterations)
    val cB = spark.sparkContext.broadcast(ivf.centroids)
    val resU = F.udf((cell: Int, v: Array[Float]) => {
      if (v == null || cell < 0) null
      else {
        val c = cB.value(cell)
        val r = new Array[Float](v.length)
        var i = 0
        while (i < v.length) {
          r(i) = v(i) - (if (i < c.length) c(i) else 0.0f)
          i += 1
        }
        r
      }
    })
    val residuals = ivf.assigned
      .select(F.col("neighbor_id").as(idCol),
              resU(F.col("__cell"), F.col("__cv")).as(vecCol),
              F.col("__cell"), F.col("__cv"))
    val cb = trainPq(residuals.select(F.col(idCol), F.col(vecCol)),
      idCol, vecCol, m, ksub, iterations)
    val enc = pqEncode(residuals.select(F.col(idCol), F.col(vecCol)), idCol, vecCol, cb)
      .select(F.col("neighbor_id"), F.col("__code"))
    val normU = F.udf((v: Array[Float]) => {
      val r: java.lang.Double =
        if (v == null) null
        else {
          var s = 0.0
          var i = 0
          while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
          java.lang.Double.valueOf(math.sqrt(s))
        }
      r
    })
    val encoded = residuals
      .select(F.col(idCol).as("neighbor_id"), F.col("__cell"),
              normU(F.col("__cv")).as("__norm"))
      .join(enc, "neighbor_id")
      .select("neighbor_id", "__cell", "__code", "__norm")
    IvfPqIndex(ivf.centroids, cb, encoded)
  }

  /**
   * Nightly IVF-PQ maintenance — the code-table sibling of
   * [[Similarity.appendToIvfIndex]]: assign a fresh vector batch to
   * the SAVED index's FROZEN coarse centroids, encode each residual
   * with the FROZEN codebooks (one map-only pass, both tables
   * broadcast), and append the rows under the touched cell partitions
   * of `path/encoded` — the corpus index grows without re-training
   * either quantizer and without rewriting history. NULL/ragged
   * vectors are skipped. Returns the reloaded index over the grown
   * table. Re-train when drift telemetry says so — appends never do.
   */
  def appendToIvfPq(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      vecCol: String): IvfPqIndex =
    appendBatchToIvfPq(spark, path, fresh, idCol, vecCol, batchId = -1L)

  /** One (batch or micro-batch) code-table append. `batchId = -1` is
    * batch maintenance (pure file-adds); a real micro-batch id writes
    * its own `(__cell, __batch)` partitions with dynamic overwrite and
    * honors the maintenance watermark — the
    * [[graft.pipeline.Retrieval.appendBatchToTextIndex]] protocol. */
  private[graft] def appendBatchToIvfPq(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      vecCol: String,
      batchId: Long): IvfPqIndex = {
    if (batchId >= 0L &&
        batchId <= CellTable.readMaintainedThrough(spark, path))
      return loadIvfPq(spark, path)
    val idx = loadIvfPq(spark, path)
    val cB = spark.sparkContext.broadcast(idx.centroids)
    val bB = spark.sparkContext.broadcast(idx.cb)
    val encU = F.udf((v: Array[Float]) => {
      val b = bB.value
      if (v == null || v.length != b.m * b.subDim) None
      else {
        val cell = Similarity.nearestCentroid(cB.value, v)
        val cc = cB.value(cell)
        val res = new Array[Float](v.length)
        var i = 0
        var n2 = 0.0
        while (i < v.length) {
          res(i) = v(i) - (if (i < cc.length) cc(i) else 0.0f)
          n2 += v(i).toDouble * v(i).toDouble
          i += 1
        }
        val codes = new Array[Byte](b.m)
        var sub = 0
        while (sub < b.m) {
          codes(sub) = nearestSub(b.centroids(sub), res, sub * b.subDim, b.subDim).toByte
          sub += 1
        }
        Some((cell, codes, math.sqrt(n2)))
      }
    })
    val enc = fresh
      .select(F.col(idCol).as("neighbor_id"), encU(F.col(vecCol)).as("__e"))
      .filter(F.col("__e").isNotNull)
      .select(F.col("neighbor_id"), F.col("__e._1").as("__cell"),
        F.col("__e._2").as("__code"), F.col("__e._3").as("__norm"))
      .localCheckpoint(eager = false)
    // all-empty batches write nothing and must not clear a sentinel
    if (!enc.isEmpty)
      CellTable.appendBatch(spark, s"$path/encoded", enc, batchId)
    loadIvfPq(spark, path)
  }

  /** Fold a saved IVF-PQ code table's retired micro-batches into the
    * base `__batch=-1` layer — [[Similarity.compactIvfIndex]]'s
    * code-table sibling (same staged-fold + journal + watermark
    * protocol). Returns the reloaded index. */
  def compactIvfPq(spark: SparkSession, path: String): IvfPqIndex = {
    CellTable.compact(spark, path, s"$path/encoded")
    loadIvfPq(spark, path)
  }

  /** Auto-compaction policy hook: [[compactIvfPq]] iff the code table
    * holds more than `maxFilesPerCell` files per cell (one cheap
    * directory listing below the dial) — the
    * [[Similarity.maybeCompactIvfIndex]] dial for the PQ layout.
    * Returns true iff a compaction ran. */
  def maybeCompactIvfPq(
      spark: SparkSession, path: String, maxFilesPerCell: Int = 4): Boolean =
    CellTable.maybeCompact(spark, path, s"$path/encoded", maxFilesPerCell)

  /**
   * Continuous IVF-PQ maintenance: a foreachBatch sink encoding each
   * micro-batch with the frozen geometry and landing it under its own
   * `__batch` partitions with dynamic overwrite — replay-idempotent
   * (effectively-once), [[Similarity.streamToIvfIndex]]'s code-table
   * sibling. One streaming writer per path; removals require the
   * writer stopped and advance the watermark so a crash-replay of an
   * already-mutated micro-batch no-ops. Returns the writer — set
   * trigger/checkpoint and `.start()`.
   */
  def streamToIvfPq(
      stream: DataFrame,
      path: String,
      idCol: String,
      vecCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        Maintenance.heartbeat(batch.sparkSession, path)
        Maintenance.requireNoExclusiveMaintenance(batch.sparkSession, path)
        appendBatchToIvfPq(batch.sparkSession, path, batch, idCol,
          vecCol, batchId)
        ()
    }

  /** Takedown removal from a saved IVF-PQ code table — the
    * [[Similarity.removeFromIvfIndex]] pass over `path/encoded`
    * (touched-cell dynamic overwrite, emptied cell dirs deleted).
    * Works identically for plain and OPQ indexes: the rotation never
    * touches ids. Returns the reloaded index. */
  def removeFromIvfPq(
      spark: SparkSession,
      path: String,
      ids: DataFrame,
      idCol: String): IvfPqIndex = {
    Similarity.removeFromCellTable(spark, path, s"$path/encoded", ids, idCol)
    loadIvfPq(spark, path)
  }

  /** [[streamToIvfPq]] through a saved OPQ rotation: each micro-batch
    * rotates into index space first (rotation loaded ONCE at writer
    * build — it is frozen with the rest of the geometry), then rides
    * the same replay-idempotent `__batch` protocol. */
  def streamToOpqIvfPq(
      stream: DataFrame,
      path: String,
      idCol: String,
      vecCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val rotation = spark.read.parquet(s"$path/rotation")
      .orderBy("i").select("row").as[Array[Float]].collect()
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        Maintenance.heartbeat(batch.sparkSession, path)
        Maintenance.requireNoExclusiveMaintenance(batch.sparkSession, path)
        appendBatchToIvfPq(batch.sparkSession, path,
          batch.withColumn(vecCol,
            rotateCol(batch.sparkSession, rotation, F.col(vecCol))),
          idCol, vecCol, batchId)
        ()
    }
  }

  /** [[appendToIvfPq]] through a saved OPQ rotation: the fresh batch
    * rotates into index space first (the rotation is frozen with the
    * rest of the geometry). */
  def appendToOpqIvfPq(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      vecCol: String): OpqIvfPqIndex = {
    import spark.implicits._
    // only the rotation is needed here — loading the whole index just
    // to discard it would triple the per-append parquet reads
    val rotation = spark.read.parquet(s"$path/rotation")
      .orderBy("i").select("row").as[Array[Float]].collect()
    val rotated = fresh.withColumn(vecCol,
      rotateCol(spark, rotation, F.col(vecCol)))
    OpqIvfPqIndex(rotation,
      appendToIvfPq(spark, path, rotated, idCol, vecCol))
  }

  /**
   * Query an IVF-PQ index: each query probes its `nprobe` nearest
   * cells; within a cell, dot(q, x) decomposes as dot(q, centroid) +
   * dot(q, residual), the second term read from the query's ADC
   * lookup table (cell-independent, built once per query against the
   * residual codebooks). Candidates from the code scan are reranked
   * with exact cosine over the original vectors.
   */
  def ivfPqTopK(
      index: IvfPqIndex,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 4,
      poolSize: Int = 50,
      probeMass: Double = 0.0): DataFrame = {
    require(probeMass >= 0.0 && probeMass <= 1.0,
      s"probeMass must be in [0, 1], got $probeMass")
    val spark = index.encoded.sparkSession
    val cB = spark.sparkContext.broadcast(index.centroids)
    val bB = spark.sparkContext.broadcast(index.cb)
    // probeMass > 0: distance-ordered cells until they cover that
    // corpus-mass fraction (the [[Similarity.ivfTopKIndexed]] dial —
    // a fixed nprobe's recall decays as the corpus outgrows the cell
    // count). Cell sizes are one bounded nlist-row aggregate.
    val sizesB =
      if (probeMass == 0.0) null
      else {
        val sizes = new Array[Long](index.centroids.length)
        index.encoded.groupBy(F.col("__cell")).agg(F.count(F.lit(1)).as("__n"))
          .collect().foreach { r =>
            val c = r.getInt(0)
            if (c >= 0 && c < sizes.length) sizes(c) = r.getLong(1)
          }
        spark.sparkContext.broadcast((sizes, sizes.sum))
      }
    // (cell, dot(q, centroid)) pairs for the probed cells
    val probeU = F.udf((v: Array[Float]) => {
      if (v == null) null
      else {
        val cs = cB.value
        val ordered = cs.indices.map { c =>
          var d = 0.0
          var dot = 0.0
          var i = 0
          val cc = cs(c)
          val n = math.min(cc.length, v.length)
          while (i < n) {
            val t = cc(i) - v(i)
            d += t * t
            dot += cc(i).toDouble * v(i).toDouble
            i += 1
          }
          (c, d, dot)
        }.sortBy(_._2)
        val picked =
          if (sizesB == null) ordered.take(nprobe)
          else {
            val (sizes, total) = sizesB.value
            val want = math.ceil(probeMass * total).toLong
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Int, Double, Double)]
            var acc = 0L
            var i = 0
            while (i < ordered.length && (out.length < nprobe || acc < want)) {
              val e = ordered(i)
              out += e
              acc += (if (e._1 < sizes.length) sizes(e._1) else 0L)
              i += 1
            }
            out.toSeq
          }
        picked.map(t => (t._1, t._3))
      }
    })
    val lutU = F.udf((v: Array[Float]) => {
      val b = bB.value
      if (v == null || v.length != b.m * b.subDim) null
      else {
        val ks = b.ksub
        val lut = new Array[Float](b.m * ks)
        var sub = 0
        while (sub < b.m) {
          var c = 0
          while (c < ks) {
            val cc = b.centroids(sub)(c)
            var s = 0.0f
            var i = 0
            while (i < b.subDim) { s += cc(i) * v(sub * b.subDim + i); i += 1 }
            lut(sub * ks + c) = s
            c += 1
          }
          sub += 1
        }
        lut
      }
    })
    val qnormU = F.udf((v: Array[Float]) => {
      val r: java.lang.Double =
        if (v == null) null
        else {
          var s = 0.0
          var i = 0
          while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
          java.lang.Double.valueOf(math.sqrt(s))
        }
      r
    })
    val ks = index.cb.ksub
    val adcU = F.udf((codes: Array[Byte], lut: Seq[Float], cellDot: Double) => {
      val r: java.lang.Double =
        if (codes == null || lut == null) null
        else {
          var s = cellDot
          var sub = 0
          while (sub < codes.length) {
            s += lut(sub * ks + (codes(sub) & 0xFF))
            sub += 1
          }
          java.lang.Double.valueOf(s)
        }
      r
    })
    val q = queries.select(F.col(idCol).as("query_id"),
        lutU(F.col(vecCol)).as("__lut"), qnormU(F.col(vecCol)).as("__qn"),
        F.explode(probeU(F.col(vecCol))).as("__probe"))
      .select(F.col("query_id"), F.col("__lut"), F.col("__qn"),
        F.col("__probe._1").as("__cell"), F.col("__probe._2").as("__cdot"))
    val pool = index.encoded.join(F.broadcast(q), "__cell")
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .withColumn("cos",
        adcU(F.col("__code"), F.col("__lut"), F.col("__cdot"))
          / (F.col("__qn") * F.col("__norm")))
      .filter(F.col("cos").isNotNull)
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    val cand = pool.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= poolSize)
      .select(F.col("query_id"), F.col("neighbor_id"))
    val qv = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"))
    val cv = corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"))
    // broadcast the BOUNDED pool (|queries| * poolSize rows) onto the
    // corpus-side vector join explicitly: leaving it to AQE means one
    // statistics miss away from shuffling the whole corpus behind a
    // few thousand candidate rows
    val exact = F.broadcast(cand.join(F.broadcast(qv), "query_id"))
      .join(cv, "neighbor_id")
      .withColumn("cos", Similarity.cosine(F.col("__qv"), F.col("__cv")))
    val w2 = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    exact.withColumn("rank", F.row_number().over(w2))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  // ------------------------------------------------------------ OPQ

  /**
   * Train an OPQ rotation (Ge et al. 2014, "Optimized Product
   * Quantization", the non-parametric alternation): an ORTHOGONAL
   * d×d matrix R such that PQ codebooks trained on R·x quantize with
   * lower error than on x — the rotation redistributes correlated /
   * imbalanced variance across the m subspaces that plain PQ slices
   * blindly. Alternation: (1) train PQ on the rotated sample,
   * (2) R ← U·Vᵀ from the SVD of Σᵢ ŷᵢ xᵢᵀ (orthogonal Procrustes
   * against the reconstructions ŷ), repeat. Each step is
   * non-increasing in quantization error.
   *
   * Runs DRIVER-SIDE on a deterministic hash-ordered sample of at
   * most `sampleSize` vectors (the bounded-collect discipline: OPQ
   * training sets are conventionally ~10⁵ vectors; d×d SVDs are
   * microseconds at embedding dims). Rotation is orthogonal, so it
   * PRESERVES dot products, norms, cosines and cell geometry — only
   * the PQ code fidelity changes. Returns R as d rows of d floats;
   * identity when the sample is empty.
   */
  def trainOpqRotation(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      ksub: Int = 16,
      opqIters: Int = 8,
      lloydIters: Int = 4,
      sampleSize: Int = 65536): Array[Array[Float]] = {
    require(ksub >= 1 && ksub <= 256, s"ksub must be in [1, 256], got $ksub")
    val spark = corpus.sparkSession
    import spark.implicits._
    val raw: Array[Array[Float]] = corpus
      .filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol), F.col(vecCol))
      .orderBy(F.abs(F.hash(F.col(idCol))), F.col(idCol))
      .limit(sampleSize)
      .select(F.col(vecCol)).as[Array[Float]].collect()
    if (raw.isEmpty) return Array.empty
    val dim = raw.map(_.length).groupBy(identity)
      .maxBy { case (d, g) => (g.length, d) }._1
    require(dim % m == 0, s"embedding dim $dim must be divisible by m=$m")
    val sample = raw.filter(_.length == dim)
    val subDim = dim / m

    import breeze.linalg.{DenseMatrix, svd}
    // X: n×d, rows are vectors
    val n = sample.length
    val X = DenseMatrix.tabulate(n, dim)((i, j) => sample(i)(j).toDouble)
    var r = DenseMatrix.eye[Double](dim)

    // per-subspace Lloyd over the rotated sample — plain driver loops
    def localBooks(y: DenseMatrix[Double]): Array[Array[Array[Double]]] = {
      Array.tabulate(m) { sub =>
        val off = sub * subDim
        val k = math.min(ksub, n)
        val cents = Array.tabulate(k)(c =>
          Array.tabulate(subDim)(j => y(c, off + j)))
        var it = 0
        while (it < lloydIters) {
          val sums = Array.fill(k, subDim)(0.0)
          val cnts = new Array[Long](k)
          var i = 0
          while (i < n) {
            var best = 0; var bd = Double.MaxValue
            var c = 0
            while (c < k) {
              var d2 = 0.0; var j = 0
              while (j < subDim) {
                val t = cents(c)(j) - y(i, off + j); d2 += t * t; j += 1
              }
              if (d2 < bd) { bd = d2; best = c }
              c += 1
            }
            var j = 0
            while (j < subDim) { sums(best)(j) += y(i, off + j); j += 1 }
            cnts(best) += 1
            i += 1
          }
          var c = 0
          while (c < k) {
            if (cnts(c) > 0) {
              var j = 0
              while (j < subDim) { cents(c)(j) = sums(c)(j) / cnts(c); j += 1 }
            }
            c += 1
          }
          it += 1
        }
        cents
      }
    }

    var iter = 0
    while (iter < opqIters) {
      val y = X * r.t // rows: yᵢ = R·xᵢ
      val books = localBooks(y)
      // reconstructions ŷᵢ: concatenated nearest sub-centroids
      val yhat = DenseMatrix.zeros[Double](n, dim)
      var i = 0
      while (i < n) {
        var sub = 0
        while (sub < m) {
          val off = sub * subDim
          val cents = books(sub)
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d2 = 0.0; var j = 0
            while (j < subDim) {
              val t = cents(c)(j) - y(i, off + j); d2 += t * t; j += 1
            }
            if (d2 < bd) { bd = d2; best = c }
            c += 1
          }
          var j = 0
          while (j < subDim) { yhat(i, off + j) = books(sub)(best)(j); j += 1 }
          sub += 1
        }
        i += 1
      }
      // Procrustes: min_R ||X·Rᵀ − Ŷ|| → R = U·Vᵀ, U·S·Vᵀ = svd(Ŷᵀ·X)
      val s = svd(yhat.t * X)
      r = s.U * s.Vt
      iter += 1
    }
    Array.tabulate(dim)(i => Array.tabulate(dim)(j => r(i, j).toFloat))
  }

  /** `rotation · v` as a Column — map-only, NULL/ragged input → NULL
    * (the malformed-input discipline). An empty rotation (untrained:
    * empty corpus) passes vectors through unchanged. */
  def rotateCol(
      spark: SparkSession,
      rotation: Array[Array[Float]],
      vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val rB = spark.sparkContext.broadcast(rotation)
    val rotU = F.udf((v: Array[Float]) => {
      val r = rB.value
      if (v == null) null
      else if (r.length == 0) v
      else if (v.length != r.length) null
      else {
        val out = new Array[Float](r.length)
        var i = 0
        while (i < r.length) {
          val row = r(i)
          var s = 0.0
          var j = 0
          while (j < row.length) { s += row(j).toDouble * v(j); j += 1 }
          out(i) = s.toFloat
          i += 1
        }
        out
      }
    })
    rotU(vec)
  }

  /** OPQ-rotated IVF-PQ: the rotation is part of the index — corpus
    * and queries are rotated into the SAME space before any cell or
    * code math, and since R is orthogonal every distance/cosine is
    * preserved, so cell recall is untouched while the PQ codes (and
    * with them the ADC candidate ordering) get the full OPQ fidelity
    * gain. What that buys at 100 TB: the exact-rerank pool can shrink
    * (pool rows are the only ones that ever touch real vectors). */
  final case class OpqIvfPqIndex(
      rotation: Array[Array[Float]], index: IvfPqIndex) {
    def save(path: String): Unit = {
      val spark = index.encoded.sparkSession
      import spark.implicits._
      index.save(path)
      rotation.zipWithIndex.map { case (row, i) => (i, row) }.toSeq
        .toDF("i", "row")
        .repartition(1).write.mode("overwrite").parquet(s"$path/rotation")
    }
  }

  /** Reload an index written by [[OpqIvfPqIndex.save]]. */
  def loadOpqIvfPq(spark: SparkSession, path: String): OpqIvfPqIndex = {
    import spark.implicits._
    val rotation = spark.read.parquet(s"$path/rotation")
      .orderBy("i").select("row").as[Array[Float]].collect()
    OpqIvfPqIndex(rotation, loadIvfPq(spark, path))
  }

  private val ManagedDirs = Seq("encoded", "centroids", "codebooks", "rotation")

  /**
   * Zero-downtime re-train for the PQ family —
   * [[Similarity.retrainIvfIndex]]'s staged-swap protocol, with one
   * difference: PQ codes are LOSSY, so the retrain trains from the
   * caller's `corpus` (the source vectors), not the index's own
   * contents. Stage the whole new geometry, journal, swap; a stale
   * `rotation` dir after an OPQ → plain retrain is DELETED (it would
   * silently rotate queries against unrotated codes otherwise). Lock
   * held; writer lease enforced; stream-batch replays suppressed.
   */
  def retrainIvfPq(
      spark: SparkSession,
      path: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iterations: Int = 2): IvfPqIndex =
      Maintenance.withExclusiveLock(spark, path) {
    val priorCal = Similarity.loadCalibrationMeta(spark, path)
    retrainPqLocked(spark, path) { staging =>
      buildIvfPq(corpus, idCol, vecCol, nlist, m, ksub, iterations)
        .save(staging)
    }
    // a calibrated index recalibrates in place over the SAME corpus
    // the rebuild used (recalibrate wherever you retrain)
    priorCal.foreach { case (c, _, _) =>
      val idx = loadIvfPq(spark, path)
      val cal = calibrateIvfPqProbe(idx, corpus, idCol, vecCol, c.k)
      Similarity.saveCalibration(spark, path, cal,
        cells = idx.centroids.length)
    }
    loadIvfPq(spark, path)
  }

  /** [[retrainIvfPq]]'s OPQ form: trains a fresh rotation too (the
    * staged swap replaces the rotation dir alongside the geometry). */
  def retrainOpqIvfPq(
      spark: SparkSession,
      path: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iterations: Int = 2,
      opqIters: Int = 8): OpqIvfPqIndex =
      Maintenance.withExclusiveLock(spark, path) {
    val priorCal = Similarity.loadCalibrationMeta(spark, path)
    retrainPqLocked(spark, path) { staging =>
      buildOpqIvfPq(corpus, idCol, vecCol, nlist, m, ksub, iterations,
        opqIters).save(staging)
    }
    // recalibrate in ROTATED space — the probe runs there (queries are
    // rotated before cell selection), so the replayed rule must too
    priorCal.foreach { case (c, _, _) =>
      val idx = loadOpqIvfPq(spark, path)
      val rotated = corpus.withColumn(vecCol,
        rotateCol(spark, idx.rotation, F.col(vecCol)))
      val cal = calibrateIvfPqProbe(idx.index, rotated, idCol, vecCol, c.k)
      Similarity.saveCalibration(spark, path, cal,
        cells = idx.index.centroids.length)
    }
    loadOpqIvfPq(spark, path)
  }

  private def retrainPqLocked(
      spark: SparkSession, path: String)(stage: String => Unit): Unit = {
    // writer-exclusivity (lease + marker) is the caller's
    // withExclusiveLock
    StagedSwap.recoverLocked(spark, path, ManagedDirs)
    CellTable.recover(spark, s"$path/encoded")
    StagedSwap.suppressStreamReplays(spark, path, s"$path/encoded")
    StagedSwap.run(spark, path, ManagedDirs, () => (), () => ()) { staging =>
      stage(staging)
      // an empty corpus stages NO encoded dir (zero-row partitioned
      // writes land nothing) and the swap would delete the live one —
      // refuse before the marker commits (live index stays intact)
      val fs = new org.apache.hadoop.fs.Path(staging)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(new org.apache.hadoop.fs.Path(s"$staging/encoded")),
        s"retrain: nothing staged at $staging/encoded (empty corpus?)")
    }
    // fresh coarse cells invalidate any measured mass->recall curve
    Similarity.dropCalibration(spark, path)
  }

  /** Crash repair for [[retrainIvfPq]]/[[retrainOpqIvfPq]]. */
  def recoverRetrain(spark: SparkSession, path: String): Unit =
    Maintenance.withLock(spark, path) {
      StagedSwap.recoverLocked(spark, path, ManagedDirs)
    }

  /** Train the rotation, rotate the corpus, build the IVF-PQ index in
    * rotated space. */
  def buildOpqIvfPq(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iterations: Int = 2,
      opqIters: Int = 8,
      sampleSize: Int = 65536): OpqIvfPqIndex = {
    val rotation = trainOpqRotation(
      corpus, idCol, vecCol, m, ksub, opqIters = opqIters,
      sampleSize = sampleSize)
    val spark = corpus.sparkSession
    val rotated = corpus.withColumn(vecCol,
      rotateCol(spark, rotation, F.col(vecCol)))
    OpqIvfPqIndex(rotation,
      buildIvfPq(rotated, idCol, vecCol, nlist, m, ksub, iterations))
  }

  /** [[ivfPqTopK]] through the rotation: queries AND the rerank-side
    * corpus vectors are rotated into index space (orthogonality makes
    * the exact rerank cosines equal the unrotated ones up to float
    * rounding). */
  def opqIvfPqTopK(
      index: OpqIvfPqIndex,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 4,
      poolSize: Int = 50,
      probeMass: Double = 0.0): DataFrame = {
    val spark = index.index.encoded.sparkSession
    def rot(df: DataFrame) = df.withColumn(vecCol,
      rotateCol(spark, index.rotation, F.col(vecCol)))
    ivfPqTopK(index.index, rot(corpus), rot(queries), idCol, vecCol, k,
      nprobe, poolSize, probeMass)
  }

  /**
   * ADC candidates + exact rerank: take `poolSize` candidates per
   * query by ADC score, re-attach the original vectors (a join on the
   * small candidate id set), re-score with exact cosine, keep top-k.
   * The standard recall-recovery step — the corpus is still scanned as
   * codes; only |queries| * poolSize rows ever touch real vectors.
   */
  def pqTopKReranked(
      cb: PqCodebooks,
      encoded: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      poolSize: Int = 50): DataFrame = {
    val pool = pqTopKEncoded(cb, encoded, queries, idCol, vecCol, poolSize)
      .select(F.col("query_id"), F.col("neighbor_id"))
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"))
    val c = corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"))
    // explicit broadcast of the bounded pool — the corpus side of the
    // rerank join must stay shuffle-free without relying on AQE
    val exact = F.broadcast(pool.join(F.broadcast(q), "query_id"))
      .join(c, "neighbor_id")
      .withColumn("cos", Similarity.cosine(F.col("__qv"), F.col("__cv")))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    exact.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Measure the pool → recall@k curve of a flat PQ code table
    * ([[BinaryQuant.calibratePool]] on the ADC family): the coarse
    * ranking IS [[pqTopKEncoded]] run to the grid's maximum pool —
    * the identical rule the probe replays. */
  def calibratePqPool(
      cb: PqCodebooks,
      encoded: DataFrame,
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
    val ranks = pqTopKEncoded(cb, encoded, sample, idCol, vecCol, grid.max)
      .select(F.col("query_id").cast("long").as("query_id"),
        F.col("neighbor_id").cast("long").as("neighbor_id"),
        F.col("rank").cast("long").as("__pr"))
      .join(truth, Seq("query_id", "neighbor_id"))
      .select(F.col("__pr")).collect().map(_.getLong(0)).toSeq
    Similarity.poolCurveFromRanks(ranks, truth.count(), k, grid)
  }

  /** [[pqTopKReranked]] with the pool solved from a requested recall
    * target via the measured curve. */
  def pqTopKTarget(
      cb: PqCodebooks,
      encoded: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      targetRecall: Double,
      cal: Similarity.PoolCalibration): DataFrame =
    pqTopKReranked(cb, encoded, corpus, queries, idCol, vecCol, k,
      poolSize = math.max(cal.poolFor(targetRecall), k))

  /** Metadata-filtered [[pqTopKReranked]]: the allowed-id semi-join
    * lands on the ENCODED table before the ADC scan (pre-filter, the
    * [[Similarity.ivfTopKFilteredIndexed]] strategy) — the scan then
    * reads only allowed codes and the pool fills with allowed
    * candidates, where post-filtering a top-k would under-fill k.
    * Selectivity compensation is the `poolSize` dial here (the pool
    * is already filtered, so recall tracks poolSize / |allowed|). */
  def pqTopKRerankedFiltered(
      cb: PqCodebooks,
      encoded: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      allowed: DataFrame,
      k: Int,
      poolSize: Int = 50): DataFrame = {
    val aCol = allowed.columns.head
    val ok = allowed.select(F.col(aCol).as("neighbor_id")).distinct()
    pqTopKReranked(cb, encoded.join(ok, Seq("neighbor_id"), "left_semi"),
      corpus, queries, idCol, vecCol, k, poolSize)
  }
}
