package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Trainable linear quality filter — the CCNet/LLaMA-style curation
 * step the heuristic scorers can't replace: hashed bag-of-words
 * features + logistic regression, trained on weak labels (a trusted
 * subset, a language flag, an upstream heuristic) and applied as a
 * map-only probability column over the corpus.
 *
 * Shape at 100 TB: training runs on a (usually sampled) labeled slice
 * — Spark ML's LBFGS aggregates gradients tree-wise, so the training
 * shuffle carries coefficient-sized vectors, never text. The learned
 * model is exported as ONE dense coefficient array (`dim` doubles, a
 * few MB at the default 2^18 buckets) and broadcast; scoring is one
 * deterministic murmur3 hash + dot product per document — no shuffle,
 * no MLlib machinery on the scoring path, stream-capable.
 */
object QualityClassifier {

  /** Portable trained model: hashed-TF dimensionality + dense weights.
    * Plain case class so it serializes into closures/broadcasts and
    * persists anywhere (a parquet row, a JSON blob). */
  case class Model(dim: Int, coefficients: Array[Double], intercept: Double)

  private def tokensCol(textCol: Column): Column =
    F.filter(F.split(textCol, "\\s+"), t => F.length(t) > 0)

  /**
   * Train on `labelCol` (boolean or 0/1 numeric; NULL rows are
   * dropped). Deterministic given fixed data and parameters (LBFGS +
   * murmur3 hashing). Returns the exported dense model.
   */
  def train(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      dim: Int = 1 << 18,
      maxIter: Int = 20,
      regParam: Double = 1e-4): Model = {
    require(dim > 0, s"dim must be positive, got $dim")
    val labeled = docs
      .select(tokensCol(F.col(textCol)).as("__toks"),
        F.col(labelCol).cast("double").as("label"))
      .filter(F.col("label").isNotNull && F.col("__toks").isNotNull)
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("__toks").setOutputCol("features").setNumFeatures(dim)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
    val model = lr.fit(tf.transform(labeled))
    Model(dim, model.coefficients.toArray, model.intercept)
  }

  /**
   * Map-only scoring: adds `outCol` = P(label = 1 | text) under the
   * broadcast model. Hashing replicates `HashingTF` exactly
   * (murmur3_x86_32 of the UTF-8 token, seed 42, non-negative mod) so
   * scores equal what `model.transform` would produce. NULL text →
   * NULL score. Works on batch and streaming DataFrames (stateless).
   */
  def score(
      docs: DataFrame,
      textCol: String,
      model: Model,
      outCol: String = "quality_prob"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val sep = java.util.regex.Pattern.compile("\\s+")
    val scoreU = F.udf((t: String) => {
      if (t == null) None
      else {
        val m = bc.value
        var z = m.intercept
        // per-token counts fold straight into the dot product: the
        // hashed-TF vector is sum of one-hot buckets
        sep.split(t).foreach { w =>
          if (w.nonEmpty) {
            // HashingTF term hashing: murmur3_x86_32 via hashUnsafeBytes2
            // (NOT UTF8String.hashCode, which is plain hashUnsafeBytes)
            // of the UTF-8 bytes with seed 42, then non-negative mod
            val u = org.apache.spark.unsafe.types.UTF8String.fromString(w)
            val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
              .hashUnsafeBytes2(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42)
            // plain non-negative mod: a hand-built Model need not have
            // a power-of-two dim, so no mask shortcut here
            val idx = ((h % m.dim) + m.dim) % m.dim
            z += m.coefficients(idx)
          }
        }
        Some(1.0 / (1.0 + math.exp(-z)))
      }
    })
    docs.withColumn(outCol, scoreU(F.col(textCol)))
  }

  /** Convenience: train on the labeled slice, score the full corpus. */
  def trainAndScore(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      dim: Int = 1 << 18,
      maxIter: Int = 20,
      regParam: Double = 1e-4,
      outCol: String = "quality_prob"): DataFrame =
    score(docs, textCol, train(docs, textCol, labelCol, dim, maxIter, regParam), outCol)
}
