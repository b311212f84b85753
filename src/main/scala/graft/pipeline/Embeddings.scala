package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/**
 * Embedding-column utilities: normalization, storage quantization,
 * matryoshka truncation, and a one-pass distributed PCA. Vectors are
 * plain `array<float|double>` columns (the repo-wide convention — see
 * [[Similarity]]); everything here is either a pure Column expression
 * (codegen'd, map-only) or a constant-width aggregate in the
 * [[VectorAgg]] k-means-wide shape, so nothing grows with corpus size
 * except one d- or d²-wide summary row.
 */
object Embeddings {

  /** Sum of squares as a double, computed left-to-right (the same
    * sequential fold DuckDB's list_sum performs — kept that way so
    * cross-engine checks can replay it exactly). */
  private def sumSq(vec: Column): Column =
    F.aggregate(vec, F.lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))

  /**
   * L2-normalize to unit length, elementwise in double. Zero vectors
   * (and NULLs) map to NULL — a zero embedding is a malformed row, and
   * NULL-not-error is the repo-wide discipline.
   */
  def l2Normalize(vec: Column): Column = {
    val n = F.sqrt(sumSq(vec))
    F.when(vec.isNotNull && n > 0.0,
      F.transform(vec, x => x.cast("double") / n))
  }

  /**
   * Matryoshka truncation: keep the leading `dim` coordinates and
   * re-normalize — the standard cheap-retrieval trick for models
   * trained with nested-dropout objectives. NULL when the input is
   * shorter than `dim`.
   */
  def truncateNormalize(vec: Column, dim: Int): Column = {
    require(dim > 0, s"dim must be positive, got $dim")
    F.when(vec.isNotNull && F.size(vec) >= dim,
      l2Normalize(F.slice(vec, 1, dim)))
  }

  /**
   * Symmetric int8 storage quantization: one scale per vector
   * (max-abs / 127), codes in [-127, 127]. Shrinks an f32 corpus 4×
   * for ANN candidate stages; [[dequantInt8]] reconstructs with
   * per-element error <= scale/2. All-zero vectors get scale 0 and
   * all-zero codes. Returns struct(scale double, codes array<tinyint>).
   */
  def quantizeInt8(vec: Column): Column = {
    val maxAbs = F.aggregate(vec, F.lit(0.0),
      (acc, x) => F.greatest(acc, F.abs(x.cast("double"))))
    val scale = maxAbs / 127.0
    F.when(vec.isNotNull, F.struct(
      scale.as("scale"),
      F.transform(vec, x =>
        F.when(scale === 0.0, F.lit(0).cast("tinyint"))
          .otherwise(F.round(x.cast("double") / scale, 0).cast("tinyint")))
        .as("codes")))
  }

  /** Reconstruct doubles from [[quantizeInt8]] output. */
  def dequantInt8(q: Column): Column =
    F.when(q.isNotNull,
      F.transform(q.getField("codes"),
        c => c.cast("double") * q.getField("scale")))

  // ---------------------------------------------------------------- PCA

  /**
   * PCA model: column means, top-k principal components (rows of
   * `components`, each length d, orthonormal), and their eigenvalues
   * (variance explained, descending).
   */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def k: Int = components.length
    def dim: Int = mean.length

    /** Persist as a small parquet table (one row per component, row -1
      * is the mean with eigenvalues packed as NaN). */
    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      val rows = (-1, mean.toSeq, Double.NaN) +:
        components.indices.map(i => (i, components(i).toSeq, eigenvalues(i)))
      rows.toDF("row_idx", "values", "eigenvalue")
        .repartition(1).write.mode("overwrite").parquet(path)
    }
  }

  def loadPca(spark: SparkSession, path: String): PcaModel = {
    val rows = spark.read.parquet(path)
      .orderBy("row_idx").collect()
    val mean = rows.head.getSeq[Double](1).toArray
    val comps = rows.tail.map(_.getSeq[Double](1).toArray)
    val evs = rows.tail.map(_.getDouble(2))
    PcaModel(mean, comps, evs)
  }

  /**
   * Fit PCA with ONE distributed pass: a constant-width aggregate of
   * (n, Σx, Σ flattened xxᵀ) — the [[VectorAgg.vec_sum]] shape, d²+d
   * doubles per partial buffer, map-side combined, one row collected —
   * then a driver-side cyclic-Jacobi eigendecomposition of the d×d
   * covariance. d is the EMBEDDING width (driver cost O(d³), buffer
   * O(d²)): fine through d ≈ 2k, which covers embedding practice;
   * corpus size only affects the scan.
   *
   * NULL vectors are skipped. Covariance is the population form
   * (divide by n), matching the eigenvalue/variance checks downstream.
   */
  def fitPca(df: DataFrame, vec: Column, k: Int): PcaModel = {
    require(k > 0, s"k must be positive, got $k")
    val v = F.transform(vec, _.cast("double"))
    val outer = F.flatten(F.transform(v, x => F.transform(v, y => x * y)))
    val row = df.filter(vec.isNotNull)
      .agg(
        F.count(F.lit(1)).as("n"),
        VectorAgg.vec_sum(v).as("sx"),
        VectorAgg.vec_sum(outer).as("sxx"))
      .collect().head
    val n = row.getLong(0).toDouble
    require(n > 0, "fitPca: no non-null vectors")
    val sx = row.getSeq[Double](1).toArray
    val sxx = row.getSeq[Double](2).toArray
    val d = sx.length
    require(k <= d, s"k=$k exceeds embedding dim $d")
    val mean = sx.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        cov(i)(j) = sxx(i * d + j) / n - mean(i) * mean(j)
        j += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(i => -evals(i)).take(k)
    PcaModel(mean,
      order.map(i => evecs(i)).toArray,
      order.map(i => math.max(evals(i), 0.0)).toArray)
  }

  /**
   * Project onto the model's components: output is array<double> of
   * length k, y_j = (x - mean) · c_j. Pure Column expression over a
   * broadcast-lite model (the components ride the plan as literals —
   * d*k doubles, KBs), so projection is map-only at any corpus size.
   */
  def pcaProject(vec: Column, model: PcaModel): Column = {
    val d = model.dim
    val meanLit = F.typedlit(model.mean.toSeq)
    val compLit = F.typedlit(model.components.map(_.toSeq).toSeq)
    val centered = F.transform(vec, (x, i) =>
      x.cast("double") - F.element_at(meanLit, i + 1))
    F.when(vec.isNotNull && F.size(vec) === d,
      F.transform(compLit, c =>
        F.aggregate(
          F.zip_with(centered, c, (a, b) => a * b),
          F.lit(0.0), (acc, x) => acc + x)))
  }

  /**
   * PCA-WHITENED projection: `y_j = (x - mean)·c_j / sqrt(λ_j + eps)`
   * — decorrelated, unit-variance coordinates (over the fitting
   * corpus), the standard pre-transform before similarity search or
   * linear probing when raw dimensions have wildly uneven variance.
   * Same map-only shape as [[pcaProject]]: the k scale factors ride
   * the plan as literals next to the components. `eps` guards
   * near-zero eigenvalues (a degenerate direction whitens to ~0, not
   * to a blown-up axis).
   */
  def pcaWhiten(vec: Column, model: PcaModel, eps: Double = 1e-9): Column = {
    require(eps > 0.0, s"eps must be positive, got $eps")
    val d = model.dim
    val meanLit = F.typedlit(model.mean.toSeq)
    val compLit = F.typedlit(model.components.map(_.toSeq).toSeq)
    val sclLit = F.typedlit(
      model.eigenvalues.map(ev => 1.0 / math.sqrt(ev + eps)).toSeq)
    val centered = F.transform(vec, (x, i) =>
      x.cast("double") - F.element_at(meanLit, i + 1))
    F.when(vec.isNotNull && F.size(vec) === d,
      F.transform(compLit, (c, j) =>
        F.aggregate(
          F.zip_with(centered, c, (a, b) => a * b),
          F.lit(0.0), (acc, x) => acc + x) * F.element_at(sclLit, j + 1)))
  }

  /**
   * Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
   * (eigenvalues, eigenvectors as ROWS). Classic textbook form:
   * sweep all (p,q) pairs, rotate away the off-diagonal mass, stop
   * when the off-diagonal Frobenius norm is below 1e-12 of the
   * diagonal scale (or 64 sweeps).
   */
  private[pipeline] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    val scale = math.max(1e-300,
      (0 until d).map(i => math.abs(a(i)(i))).foldLeft(0.0)(math.max))
    var sweep = 0
    while (sweep < 64 && offDiag() > 1e-24 * scale * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val evals = Array.tabulate(d)(i => a(i)(i))
    // eigenvectors are COLUMNS of v; return as rows
    val evecs = Array.tabulate(d)(j => Array.tabulate(d)(i => v(i)(j)))
    (evals, evecs)
  }
}
