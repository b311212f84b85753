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

  /** Persist (codes flat parquet + `_sq8.json` bounds). The codes
    * table is flat id-bearing rows — the
    * [[Dedup.removeFromSavedIndex]] takedown family applies. */
  def saveSq8Index(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      sigma: Double = 3.0): Sq8Model = {
    val spark = corpus.sparkSession
    val model = train(corpus, vecCol, sigma)
    encode(corpus, idCol, vecCol, model)
      .write.mode("overwrite").parquet(s"$path/codes")
    val p = new org.apache.hadoop.fs.Path(path, "_sq8.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val json = s"""{"lo":[${model.lo.map(_.toString).mkString(",")}],""" +
      s""""step":[${model.step.map(_.toString).mkString(",")}]}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    model
  }

  /** Reload the bounds + codes written by [[saveSq8Index]]. */
  def loadSq8Index(
      spark: SparkSession, path: String): (Sq8Model, DataFrame) = {
    val p = new org.apache.hadoop.fs.Path(path, "_sq8.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
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
      require(i >= 0, s"$path/_sq8.json: missing $key")
      val a = raw.indexOf('[', i)
      val b = raw.indexOf(']', a)
      raw.substring(a + 1, b).split(',').map(_.trim.toDouble)
    }
    (Sq8Model(arr("lo"), arr("step")), spark.read.parquet(s"$path/codes"))
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
    // per-query precompute: C = Σ q_d·lo_d, f_d = q_d·step_d, |q|
    val prepU = F.udf((qv: Seq[Float]) => {
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
    val approxU = F.udf((code: Array[Byte], c: Double, f: Seq[Double],
        qn: Double, norm: Double) => {
      var dot = c
      var d = 0
      while (d < code.length) { dot += f(d) * (code(d) & 0xFF); d += 1 }
      val den = qn * norm
      if (den == 0.0) 0.0 else dot / den
    })
    val q = queries.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).cast("long").as("query_id"),
        F.col(vecCol).as("__qv"), prepU(F.col(vecCol)).as("__p"))
      .filter(F.col("__p").isNotNull)
    val slim = codes
      .select(F.col("id").as("neighbor_id"), F.col("code"), F.col("norm"))
      .crossJoin(F.broadcast(q.select(F.col("query_id"), F.col("__p"))))
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        approxU(F.col("code"), F.col("__p._1"), F.col("__p._2"),
          F.col("__p._3"), F.col("norm")).as("approx"))
    val wPool = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("approx").desc, F.col("neighbor_id").asc)
    val pool = slim.withColumn("__pr", F.row_number().over(wPool))
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
}
