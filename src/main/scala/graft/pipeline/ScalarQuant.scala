package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/**
 * Int8 scalar quantization (SQ8) for approximate nearest-neighbor
 * search — the standard middle rung of the quantization ladder this
 * repo ships (float32 brute force → SQ8 (4x) → PQ (codebooks, ~32x)
 * → binary (64x)): each dimension is affinely mapped to one byte, so
 * a 64-dim float32 vector (256 B) stores as 64 B, and the coarse scan
 * reads 1/4 the bytes with near-exact angular order.
 *
 * Training is per-dimension mean ± `sigma`·std bounds (ONE
 * constant-width aggregate — two [[VectorAgg.vec_sum]] buffers, so
 * the shuffle carries 2·dim doubles per partition regardless of
 * corpus size; the classic min/max trainer is outlier-fragile and
 * would need a dedicated min/max aggregate for no robustness gain).
 * Values outside the bounds clamp — with sigma = 3 that is < 0.3% of
 * mass per dimension for roughly-normal coordinates.
 *
 * Scoring is asymmetric (query stays float): the approximate dot is
 *
 *   dot(q, v̂) = Σ_d q_d·(lo_d + code_d·step_d)
 *             = Σ_d q_d·lo_d  +  Σ_d (q_d·step_d)·code_d,
 *
 * a per-query constant plus a per-query factor table over the codes —
 * the SQ analogue of PQ's ADC lookup. Approximate cosine divides by
 * the EXACT stored row norm (norms are cheap and exact; only the
 * direction is quantized). The coarse pass ships (query, neighbor,
 * approx) triples; a bounded pool reranks with exact cosine — with
 * `poolSize >= |corpus|` the result is EXACTLY brute force (the
 * [[BinaryQuant]] contract: quantization only orders the pool).
 */
object ScalarQuant {

  /** Trained per-dimension affine bounds: value ≈ lo + code·step. */
  final case class Sq8Model(lo: Array[Double], step: Array[Double]) {
    def dim: Int = lo.length
  }

  /** One aggregate over the corpus: per-dimension mean ± sigma·std.
    * Constant-dimension degenerate case (std = 0) gets a tiny span so
    * codes stay well-defined. */
  def train(
      corpus: DataFrame,
      vecCol: String,
      sigma: Double = 3.0): Sq8Model = {
    require(sigma > 0, s"sigma must be positive, got $sigma")
    val nonNull = corpus.filter(F.col(vecCol).isNotNull)
    val dimRow = nonNull.select(F.size(F.col(vecCol)).as("d")).limit(1).collect()
    require(dimRow.nonEmpty, "ScalarQuant.train: no non-null vectors")
    val dim = dimRow.head.getInt(0)
    // pre-project the cast array ONCE: higher-order transforms run
    // interpreted with no CSE, so referencing the expression from both
    // vec_sums would compute it twice per row (the Let.bind rule)
    val fixed = nonNull.filter(F.size(F.col(vecCol)) === dim)
      .select(F.transform(F.col(vecCol), _.cast("double")).as("__d"))
    val row = fixed.agg(
      F.count(F.lit(1)).as("n"),
      VectorAgg.vec_sum(F.col("__d")).as("sx"),
      VectorAgg.vec_sum(F.transform(F.col("__d"), x => x * x)).as("sxx"))
      .collect().head
    val n = math.max(row.getLong(0), 1L).toDouble
    val sx = row.getSeq[Double](1).toArray
    val sxx = row.getSeq[Double](2).toArray
    val lo = new Array[Double](dim)
    val step = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      val mean = sx(d) / n
      val variance = math.max(sxx(d) / n - mean * mean, 0.0)
      val std = math.sqrt(variance)
      val half = math.max(sigma * std, 1e-9)
      lo(d) = mean - half
      step(d) = 2.0 * half / 255.0
      d += 1
    }
    Sq8Model(lo, step)
  }

  private def encodeUdf(mB: org.apache.spark.broadcast.Broadcast[Sq8Model]) =
    F.udf((v: Seq[Float]) => {
      val m = mB.value
      if (v == null || v.length != m.dim) null
      else {
        val out = new Array[Byte](m.dim)
        var d = 0
        while (d < m.dim) {
          val c = math.rint((v(d) - m.lo(d)) / m.step(d)).toInt
          out(d) = math.max(0, math.min(255, c)).toByte
          d += 1
        }
        out
      }
    })

  /** Encode the corpus: (id, code BINARY of dim bytes, norm — the
    * EXACT float-vector L2 norm). This is the table a deployment
    * persists and coarse-scans (1/4 the embedding bytes). NULL or
    * ragged vectors encode to NULL and drop out of scoring. */
  def encode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      model: Sq8Model): DataFrame = {
    val spark = corpus.sparkSession
    val mB = spark.sparkContext.broadcast(model)
    val encU = encodeUdf(mB)
    val normU = F.udf((v: Seq[Float]) => {
      val r: java.lang.Double =
        if (v == null) null
        else {
          var s = 0.0
          var i = 0
          while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
          java.lang.Double.valueOf(math.sqrt(s))
        }
      r
    })
    corpus.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).cast("long").as("id"),
        encU(F.col(vecCol)).as("code"),
        normU(F.col(vecCol)).as("norm"))
      .filter(F.col("code").isNotNull)
  }

  /** Persist. Layout: BATCH-STAMPED code leaves
    * (`codes/__batch=-1/part-*.parquet` for the base build and batch
    * appends; a streaming micro-batch owns `codes/__batch=<id>` and
    * overwrites exactly its own leaf on replay) with the `_sq8.json`
    * bounds INSIDE the codes dir — underscore files are invisible to
    * Spark's data listing, and co-locating model + codes makes every
    * rewrite one atomic directory promotion: a codes table can never
    * outlive or predate the bounds it was encoded with. Pre-stamp
    * (flat) indexes still load; [[streamToSq8Index]] requires the
    * stamped layout ([[migrateSq8Index]] converts in place). */
  def saveSq8Index(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      sigma: Double = 3.0): Sq8Model = {
    val spark = corpus.sparkSession
    val model = train(corpus, vecCol, sigma)
    // clear a prior index whole (a leftover stream leaf under a fresh
    // base would resurrect rows the new model never encoded)
    val root = new org.apache.hadoop.fs.Path(s"$path/codes")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    encode(corpus, idCol, vecCol, model)
      .write.mode("overwrite").parquet(s"$path/codes/__batch=-1")
    writeModel(spark, s"$path/codes", model)
    model
  }

  private def writeModel(
      spark: SparkSession, codesDir: String, model: Sq8Model): Unit = {
    val p = new org.apache.hadoop.fs.Path(codesDir, "_sq8.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val json = s"""{"lo":[${model.lo.map(_.toString).mkString(",")}],""" +
      s""""step":[${model.step.map(_.toString).mkString(",")}]}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Reload the bounds + codes written by [[saveSq8Index]]. Reads the
    * bounds from `codes/_sq8.json`, falling back to the legacy
    * root-level `_sq8.json` for indexes saved before the co-located
    * layout. */
  def loadSq8Index(
      spark: SparkSession, path: String): (Sq8Model, DataFrame) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inCodes = new org.apache.hadoop.fs.Path(s"$path/codes", "_sq8.json")
    val p = if (fs.exists(inCodes)) inCodes
      else new org.apache.hadoop.fs.Path(path, "_sq8.json")
    val in = fs.open(p)
    val raw =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, "UTF-8")
      } finally in.close()
    def arr(key: String): Array[Double] = {
      val i = raw.indexOf("\"" + key + "\"")
      require(i >= 0, s"$p: missing $key")
      val a = raw.indexOf('[', i)
      val b = raw.indexOf(']', a)
      raw.substring(a + 1, b).split(',').map(_.trim.toDouble)
    }
    val codes = spark.read.parquet(s"$path/codes")
    // the batch stamp is invisible to readers (probes scan all leaves)
    val slim = if (codes.columns.contains("__batch")) codes.drop("__batch")
      else codes
    (Sq8Model(arr("lo"), arr("step")), slim)
  }

  /** True iff the codes dir uses the batch-stamped leaf layout. */
  private def isStamped(
      fs: org.apache.hadoop.fs.FileSystem,
      codesDir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(codesDir) && fs.listStatus(codesDir).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("__batch="))

  /** Convert a pre-stamp flat codes dir to the batch-stamped layout in
    * place (each flat part file MOVES under `__batch=-1` — renames, no
    * data pass). Run it once before attaching [[streamToSq8Index]] to
    * an old index; a flat file landing beside stamped leaves would
    * break partition discovery (mixed directory depth). */
  def migrateSq8Index(spark: SparkSession, path: String): Unit =
      Maintenance.withLock(spark, path) {
    val codesDir = new org.apache.hadoop.fs.Path(s"$path/codes")
    val fs = codesDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(codesDir, "__batch=-1")
    if (!fs.exists(base)) fs.mkdirs(base)
    fs.listStatus(codesDir).foreach { st =>
      if (st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        fs.rename(st.getPath, new org.apache.hadoop.fs.Path(base,
          st.getPath.getName))
    }
  }

  /** Coarse + rerank against a code table ([[binaryTopKIndexed]]'s
    * shape with the ADC-style factor table as the coarse score).
    * Returns (query_id, rank, neighbor_id, cos); self-pairs excluded;
    * `poolSize >= |corpus|` is exactly brute force. */
  def sq8TopKIndexed(
      model: Sq8Model,
      codes: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      poolSize: Int = 1000): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(poolSize >= k, s"poolSize ($poolSize) must be >= k ($k)")
    val spark = codes.sparkSession
    val mB = spark.sparkContext.broadcast(model)
    val prepU = prepUdf(mB)
    val q = queries.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).cast("long").as("query_id"),
        F.col(vecCol).as("__qv"), prepU(F.col(vecCol)).as("__p"))
      .filter(F.col("__p").isNotNull)
    val pool = coarseRanked(codes, q.select(F.col("query_id"), F.col("__p")))
      .filter(F.col("__pr") <= poolSize)
      .select("query_id", "neighbor_id")
    val c = corpus.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).cast("long").as("neighbor_id"),
        F.col(vecCol).as("__cv"))
    val withVecs = c.join(F.broadcast(pool), "neighbor_id")
      .join(F.broadcast(q.select(F.col("query_id"), F.col("__qv"))), "query_id")
      .withColumn("cos", Similarity.cosine(F.col("__qv"), F.col("__cv")))
    val wK = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    withVecs.withColumn("rank", F.row_number().over(wK))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** The ONE coarse-ranking builder (ADC approx desc, neighbor_id
    * asc) — probes and pool calibration replay the identical rule.
    * `q` is (query_id, __p) from the per-query prep; returns
    * (query_id, neighbor_id, __pr). */
  private def coarseRanked(codes: DataFrame, q: DataFrame): DataFrame = {
    val approxU = F.udf((code: Array[Byte], c: Double, f: Seq[Double],
        qn: Double, norm: Double) => {
      var dot = c
      var d = 0
      while (d < code.length) { dot += f(d) * (code(d) & 0xFF); d += 1 }
      val den = qn * norm
      if (den == 0.0) 0.0 else dot / den
    })
    val slim = codes
      .select(F.col("id").as("neighbor_id"), F.col("code"), F.col("norm"))
      .crossJoin(F.broadcast(q))
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        approxU(F.col("code"), F.col("__p._1"), F.col("__p._2"),
          F.col("__p._3"), F.col("norm")).as("approx"))
    val wPool = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("approx").desc, F.col("neighbor_id").asc)
    slim.withColumn("__pr", F.row_number().over(wPool))
      .select("query_id", "neighbor_id", "__pr")
  }

  /** Per-query ADC prep (C = Σ q_d·lo_d, factor table, |q|) — shared
    * by the probe and the calibration so their coarse scores are
    * bit-identical. */
  private def prepUdf(mB: org.apache.spark.broadcast.Broadcast[Sq8Model]) =
    F.udf((qv: Seq[Float]) => {
      val m = mB.value
      if (qv == null || qv.length != m.dim) null
      else {
        var c = 0.0
        var qn = 0.0
        val f = new Array[Double](m.dim)
        var d = 0
        while (d < m.dim) {
          c += qv(d).toDouble * m.lo(d)
          f(d) = qv(d).toDouble * m.step(d)
          qn += qv(d).toDouble * qv(d)
          d += 1
        }
        (c, f, math.sqrt(qn))
      }
    })

  /** Measure the pool → recall@k curve of an SQ8 code table
    * ([[BinaryQuant.calibratePool]] on the ADC family): one bounded
    * brute-force truth pass + one coarse ranking of the sample. */
  def calibratePool(
      model: Sq8Model,
      codes: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nSample: Int = 64,
      grid: Seq[Int] = Similarity.DefaultPoolGrid)
      : Similarity.PoolCalibration = {
    val spark = codes.sparkSession
    val sample = Similarity.poolCalibrationSample(corpus, idCol, vecCol, nSample)
    val truth = Similarity.bruteForceTopK(corpus, sample, idCol, vecCol, k)
      .select(F.col("query_id").cast("long").as("query_id"),
        F.col("neighbor_id").cast("long").as("neighbor_id"))
      .localCheckpoint(eager = false)
    val mB = spark.sparkContext.broadcast(model)
    val q = sample.select(F.col(idCol).cast("long").as("query_id"),
        prepUdf(mB)(F.col(vecCol)).as("__p"))
      .filter(F.col("__p").isNotNull)
    val ranks = coarseRanked(codes, q)
      .join(truth, Seq("query_id", "neighbor_id"))
      .select(F.col("__pr").cast("long")).collect().map(_.getLong(0)).toSeq
    Similarity.poolCurveFromRanks(ranks, truth.count(), k, grid)
  }

  /** Measure-and-persist the pool curve of a SAVED SQ8 index —
    * [[Similarity.recalibrateIvfIndex]]'s pool sibling (the curve
    * lands at `<path>/_pool_calibration.json`; a retrain refreshes it
    * in place when present). `corpus` supplies the float vectors for
    * the brute-force truth pass (codes are lossy). */
  def recalibrateSq8Pool(
      spark: SparkSession,
      path: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nSample: Int = 64,
      grid: Seq[Int] = Similarity.DefaultPoolGrid)
      : Similarity.PoolCalibration = {
    val (model, codes) = loadSq8Index(spark, path)
    val cal = calibratePool(model, codes, corpus, idCol, vecCol, k,
      nSample, grid)
    Similarity.savePoolCalibration(spark, path, cal,
      n = codes.count())
    cal
  }

  /** [[sq8TopKIndexed]] with the pool solved from a requested recall
    * target via the measured curve. */
  def sq8TopKTarget(
      model: Sq8Model,
      codes: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      targetRecall: Double,
      cal: Similarity.PoolCalibration): DataFrame =
    sq8TopKIndexed(model, codes, corpus, queries, idCol, vecCol, k,
      poolSize = math.max(cal.poolFor(targetRecall), k))

  /** One-shot convenience: train + encode + probe in one call. */
  def sq8TopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      poolSize: Int = 1000,
      sigma: Double = 3.0): DataFrame = {
    val model = train(corpus, vecCol, sigma)
    sq8TopKIndexed(model, encode(corpus, idCol, vecCol, model),
      corpus, queries, idCol, vecCol, k, poolSize)
  }

  // ---------------------------------------------------------------- //
  // Maintenance lifecycle (the flat-index protocols applied to SQ8)   //
  // ---------------------------------------------------------------- //

  /** Nightly append: encode a fresh batch with the SAVED bounds and
    * file-add it to the codes table (one shuffle-free pass over the
    * batch; the TB-scale history is never touched). The frozen bounds
    * clamp drifted coordinates — watch [[clipFraction]] and let
    * [[maybeRetrainSq8Index]] fire the staged rebuild when the
    * distribution has genuinely moved. Re-ingesting an already-encoded
    * id is the caller's responsibility (append-only index rule).
    * Returns the reloaded (model, codes). */
  def appendToSq8Index(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      vecCol: String): (Sq8Model, DataFrame) = {
    val (model, _) = loadSq8Index(spark, path)
    val batch = encode(fresh, idCol, vecCol, model)
    if (!batch.isEmpty) {
      val codesDir = new org.apache.hadoop.fs.Path(s"$path/codes")
      val fs = codesDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // stamped layout: file-adds land in the base leaf; a pre-stamp
      // flat index keeps its flat layout until migrateSq8Index runs
      // (a flat file BESIDE stamped leaves breaks discovery)
      val dest = if (isStamped(fs, codesDir)) s"$path/codes/__batch=-1"
        else s"$path/codes"
      batch.write.mode("append").parquet(dest)
    }
    loadSq8Index(spark, path)
  }

  /**
   * Continuous SQ8 maintenance: a foreachBatch sink that encodes each
   * micro-batch with the SAVED bounds and overwrites exactly its own
   * `codes/__batch=<id>` leaf — a replayed micro-batch (at-least-once
   * delivery) replaces its own files, so the index stays correct
   * effectively-once; the [[Similarity.streamToIvfIndex]] protocol on
   * the flat ADC family. The `_maintained_through` watermark makes a
   * crash-replay of a removal/retrain-mutated micro-batch a no-op.
   * One streaming writer per path; the sink heartbeats the writer
   * lease and refuses inside a writer-exclusive maintenance window.
   * Requires the batch-stamped layout ([[migrateSq8Index]] for
   * pre-stamp indexes). Returns the writer — set trigger/checkpoint
   * and `.start()`.
   */
  def streamToSq8Index(
      stream: DataFrame,
      path: String,
      idCol: String,
      vecCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        Maintenance.heartbeat(spark, path)
        Maintenance.requireNoExclusiveMaintenance(spark, path)
        // a micro-batch at or below the maintenance watermark was
        // already MUTATED by a removal/retrain after it committed: its
        // replay must write nothing or taken-down rows would resurrect
        if (batchId >= 0L &&
            batchId <= CellTable.readMaintainedThrough(spark, path)) ()
        else {
          val codesDir = new org.apache.hadoop.fs.Path(s"$path/codes")
          val fs = codesDir.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          require(isStamped(fs, codesDir),
            s"streamToSq8Index: $path/codes is a pre-stamp flat layout — " +
              "run migrateSq8Index once before attaching the sink")
          val (model, _) = loadSq8Index(spark, path)
          val enc = encode(batch, idCol, vecCol, model)
          if (!enc.isEmpty)
            enc.write.mode("overwrite")
              .parquet(s"$path/codes/__batch=$batchId")
        }
        ()
    }

  /** Advance the maintenance watermark past every on-disk stream leaf
    * BEFORE a mutation rewrites them into the base layer — an
    * unsuppressed crash-replay would resurrect removed rows (or
    * duplicate retrained ones). */
  private def suppressStreamReplays(
      spark: SparkSession, path: String): Unit = {
    val codesDir = new org.apache.hadoop.fs.Path(s"$path/codes")
    val fs = codesDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!isStamped(fs, codesDir)) return
    val ids = fs.listStatus(codesDir).toSeq.collect {
      case st if st.isDirectory &&
        st.getPath.getName.startsWith("__batch=") =>
        st.getPath.getName.stripPrefix("__batch=").toLong
    }.filter(_ >= 0L)
    if (ids.nonEmpty) {
      val prior = CellTable.readMaintainedThrough(spark, path)
      CellTable.writeMaintainedThrough(spark, path,
        math.max(prior, ids.max))
    }
  }

  /** Takedown removal — the [[Dedup.removeFromSavedIndex]] protocol:
    * anti-join rewrite of the codes table into a staging dir (with the
    * bounds manifest copied in — model and codes swap as ONE unit),
    * then an atomic-ish directory promotion; a crash before the swap
    * leaves the original intact. Writer-exclusive (lock + lease +
    * marker: the rewrite folds every stream leaf into the base layer,
    * so crash-replays are suppressed via the watermark first and a
    * live writer is refused). */
  def removeFromSq8Index(
      spark: SparkSession,
      path: String,
      ids: DataFrame,
      idCol: String): (Sq8Model, DataFrame) =
      Maintenance.withExclusiveLock(spark, path) {
    suppressStreamReplays(spark, path)
    val (model, codes) = loadSq8Index(spark, path)
    val del = ids.select(F.col(idCol).cast("long").as("id")).distinct()
    val tmp = s"$path/codes__takedown"
    codes.join(F.broadcast(del), Seq("id"), "left_anti")
      .write.mode("overwrite").parquet(s"$tmp/__batch=-1")
    writeModel(spark, tmp, model)
    graft.sources.Compaction.promote(spark, tmp, s"$path/codes")
    loadSq8Index(spark, path)
  }

  /** Small-file reclaim for a long-appended/streamed codes table:
    * rewrite every leaf into `targetFiles` base files via the same
    * writer-exclusive staged promotion (stream leaves fold into the
    * base layer; their replays are watermark-suppressed). */
  def compactSq8Index(
      spark: SparkSession,
      path: String,
      targetFiles: Int = 8): (Sq8Model, DataFrame) =
      Maintenance.withExclusiveLock(spark, path) {
    suppressStreamReplays(spark, path)
    val (model, codes) = loadSq8Index(spark, path)
    val tmp = s"$path/codes__compact"
    codes.repartition(targetFiles).write.mode("overwrite")
      .parquet(s"$tmp/__batch=-1")
    writeModel(spark, tmp, model)
    graft.sources.Compaction.promote(spark, tmp, s"$path/codes")
    loadSq8Index(spark, path)
  }

  /** Auto-compaction dial — [[Similarity.maybeCompactIvfIndex]] on the
    * codes table: rewrite when appends/stream leaves have left more
    * than `maxFiles` parquet files. Returns true iff a fold ran. */
  def maybeCompactSq8Index(
      spark: SparkSession,
      path: String,
      maxFiles: Int = 16,
      targetFiles: Int = 8): Boolean = {
    val root = new org.apache.hadoop.fs.Path(s"$path/codes")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    def dataFiles(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).map { st =>
        if (st.isDirectory) dataFiles(st.getPath)
        else if (!st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".")) 1
        else 0
      }.sum
    if (dataFiles(root) <= maxFiles) false
    else { compactSq8Index(spark, path, targetFiles); true }
  }

  /** Bounds-staleness telemetry: the fraction of a fresh batch's
    * coordinates that CLAMP at the trained mean±sigma·std bounds.
    * At train time this is < ~0.3% per dimension (sigma = 3, roughly
    * normal coordinates); a drifted distribution pushes mass outside
    * the frozen bounds and every clamped coordinate is quantization
    * error the rerank pool has to absorb — the SQ8 analogue of the
    * IVF cell-occupancy PSI dial. One bounded pass over the batch. */
  def clipFraction(
      model: Sq8Model,
      batch: DataFrame,
      vecCol: String): Double = {
    val spark = batch.sparkSession
    val mB = spark.sparkContext.broadcast(model)
    val clipU = F.udf((v: Seq[Float]) => {
      val m = mB.value
      if (v == null || v.length != m.dim) null
      else {
        var clipped = 0
        var d = 0
        while (d < m.dim) {
          val x = v(d).toDouble
          if (x < m.lo(d) || x > m.lo(d) + 255.0 * m.step(d)) clipped += 1
          d += 1
        }
        (clipped, m.dim)
      }
    })
    val r = batch.filter(F.col(vecCol).isNotNull)
      .select(clipU(F.col(vecCol)).as("__c"))
      .filter(F.col("__c").isNotNull)
      .agg(F.sum(F.col("__c._1")).cast("double"),
        F.sum(F.col("__c._2")).cast("double")).head()
    if (r.isNullAt(1) || r.getDouble(1) == 0.0) 0.0
    else r.getDouble(0) / r.getDouble(1)
  }

  /** Staged-swap retrain: fresh bounds trained over `corpus` (the
    * float vectors — codes are lossy, so the rebuild source is the
    * caller's embedding table, the [[ProductQuantization.retrainIvfPq]]
    * contract), encoded into a staging dir WITH the new bounds
    * manifest, promoted atomically. A crash before the promotion
    * leaves the old index fully live. */
  def retrainSq8Index(
      spark: SparkSession,
      path: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      sigma: Double = 3.0): Sq8Model =
      Maintenance.withExclusiveLock(spark, path) {
    // the rebuilt base layer ABSORBS every stream leaf's rows — their
    // crash-replays must write nothing afterwards
    suppressStreamReplays(spark, path)
    val priorPool = Similarity.loadPoolCalibration(spark, path)
    val model = train(corpus, vecCol, sigma)
    val tmp = s"$path/codes__retrain"
    val staged = encode(corpus, idCol, vecCol, model)
    staged.write.mode("overwrite").parquet(s"$tmp/__batch=-1")
    writeModel(spark, tmp, model)
    graft.sources.Compaction.promote(spark, tmp, s"$path/codes")
    // fresh bounds reorder the coarse scan: a measured pool curve is
    // stale — drop it, and recalibrate in place when one existed
    // (recalibrate wherever you retrain, the pool form)
    Similarity.dropPoolCalibration(spark, path)
    priorPool.foreach(c =>
      recalibrateSq8Pool(spark, path, corpus, idCol, vecCol, c.k))
    // drop a legacy root-level manifest so the stale bounds can never
    // shadow the co-located ones on a mixed-layout index
    val legacy = new org.apache.hadoop.fs.Path(path, "_sq8.json")
    val fs = legacy.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(legacy, false)
    model
  }

  /** Drift-dialed retrain — [[Similarity.maybeRetrainIvfIndex]] on the
    * SQ8 family with [[clipFraction]] as the staleness measure: at or
    * above `clipThreshold` the staged [[retrainSq8Index]] runs over
    * `corpus`; below it the only cost is one bounded pass over the
    * fresh batch. Append first, then maybeRetrain, so a fired rebuild
    * absorbs the fresh rows. Returns (retrained, clip_fraction). */
  def maybeRetrainSq8Index(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      clipThreshold: Double = 0.05,
      sigma: Double = 3.0): (Boolean, Double) = {
    val (model, _) = loadSq8Index(spark, path)
    val f = clipFraction(model, fresh, vecCol)
    if (f < clipThreshold) (false, f)
    else {
      retrainSq8Index(spark, path, corpus, idCol, vecCol, sigma)
      (true, f)
    }
  }
}
