package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/**
 * DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
 * score raw documents by the log-likelihood ratio of a TARGET domain
 * versus the RAW corpus under hashed n-gram (unigram + bigram) bag
 * models, then keep the highest-ratio documents. The standard recipe
 * for "find more data that looks like my target domain" at corpus
 * scale.
 *
 * Scale shape: each corpus contributes ONE map-side-combined
 * bucket-count aggregate bounded by `dim` rows (features hash into a
 * fixed bucket space — the corpus itself never shuffles); the two
 * smoothed distributions collapse into a single broadcast log-ratio
 * array, and scoring is a stateless map-only scan (batch or
 * streaming). Selection composes with the deterministic md5-order
 * sampling family ([[Sampling]]).
 */
object Dsir {

  /** Per-bucket log(p_target / p_raw); `dim` fixes the hash space. */
  final case class Model(logRatio: Array[Double], dim: Int)

  /** Hashed unigram + bigram feature buckets of one document —
    * HashingTF-compatible murmur3 seed-42 hashing, like
    * [[QualityClassifier]], so the same text always lands in the same
    * buckets. */
  private def bucketsOf(t: String, dim: Int): Array[Int] = {
    val toks = t.split("\\s+").filter(_.nonEmpty)
    val out = new Array[Int](if (toks.length == 0) 0 else toks.length * 2 - 1)
    var i = 0
    def bucket(s: String): Int = {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes2(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42)
      ((h % dim) + dim) % dim
    }
    while (i < toks.length) {
      out(i) = bucket(toks(i))
      if (i + 1 < toks.length) out(toks.length + i) = bucket(toks(i) + " " + toks(i + 1))
      i += 1
    }
    out
  }

  /** One bounded aggregate: (bucket, count) over a corpus, at most
    * `dim` rows out. */
  private def bucketCounts(df: DataFrame, textCol: String, dim: Int): DataFrame = {
    val featU = F.udf((t: String) =>
      if (t == null) Array.empty[Int] else bucketsOf(t, dim))
    df.select(F.explode(featU(F.col(textCol))).as("__b"))
      .groupBy(F.col("__b")).agg(F.count(F.lit(1)).as("__c"))
  }

  /**
   * Fit the importance model: hashed-feature counts of `target` and
   * `raw`, Laplace-smoothed to probabilities, collapsed to one
   * log-ratio array. Driver memory is exactly `dim` doubles.
   */
  def learn(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      dim: Int = 1 << 14): Model = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    def dist(df: DataFrame): Array[Double] = {
      val counts = new Array[Long](dim)
      bucketCounts(df, textCol, dim).collect().foreach { r =>
        counts(r.getInt(0)) = r.getLong(1)
      }
      val total = counts.sum.toDouble + dim // +1 smoothing mass per bucket
      counts.map(c => (c + 1).toDouble / total)
    }
    val pT = dist(target)
    val pR = dist(raw)
    Model(Array.tabulate(dim)(i => math.log(pT(i)) - math.log(pR(i))), dim)
  }

  /** Map-only scoring: mean per-feature log-likelihood ratio (length
    * normalization keeps scores comparable across document sizes).
    * NULL or token-less text → NULL score. Stateless — batch or
    * streaming. */
  def score(
      docs: DataFrame,
      textCol: String,
      model: Model,
      outCol: String = "dsir_score"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val scoreU = F.udf((t: String) => {
      if (t == null) None
      else {
        val m = bc.value
        val bs = bucketsOf(t, m.dim)
        if (bs.isEmpty) None
        else {
          var s = 0.0
          var i = 0
          while (i < bs.length) { s += m.logRatio(bs(i)); i += 1 }
          Some(s / bs.length)
        }
      }
    })
    docs.withColumn(outCol, scoreU(F.col(textCol)))
  }
}
