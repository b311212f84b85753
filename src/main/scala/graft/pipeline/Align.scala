package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Gale–Church sentence alignment (Gale & Church 1993, "A Program for
 * Aligning Sentences in Bilingual Corpora") — the classic length-based
 * DP that turns document-level bitext (what margin mining emits) into
 * the sentence-level pairs translation models train on.
 *
 * Costs are the published ones: a bead-type prior (1:1 free; 1:0/0:1
 * 450; 2:1/1:2 230; 2:2 440 centinats) plus a length-mismatch cost
 * −100·ln(2·(1−Φ(|δ|))) with δ = (l₂ − l₁·c)/√((l₁+l₂)·s²/2), c = 1,
 * s² = 6.8 (character lengths). Deterministic double math; ties break
 * to the earlier bead type in the fixed table order.
 *
 * Scale shape: the DP is per document pair — a map-only UDF over the
 * paired corpus, O(n·m) per pair bounded by `maxSentences` (longer
 * pairs emit NULL rather than running away; align chunks upstream).
 */
object Align {

  private val C = 1.0
  private val S2 = 6.8
  /** (srcTake, tgtTake, penalty) in the published order. */
  private val Beads: Array[(Int, Int, Double)] = Array(
    (1, 1, 0.0), (1, 0, 450.0), (0, 1, 450.0),
    (2, 1, 230.0), (1, 2, 230.0), (2, 2, 440.0))

  /** Abramowitz–Stegun 7.1.26 erf — deterministic, ~1e-7 absolute. */
  private def erf(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) *
      t - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    if (x >= 0) y else -y
  }

  private def normCdf(z: Double): Double = 0.5 * (1.0 + erf(z / math.sqrt(2.0)))

  /** −100·ln(2·(1−Φ(|δ|))), floored against log(0). */
  private def lengthCost(l1: Int, l2: Int): Double = {
    if (l1 == 0 && l2 == 0) return 0.0
    val mean = (l1 + l2) / 2.0
    val delta = (l2 - l1 * C) / math.sqrt(mean * S2)
    val p = math.max(2.0 * (1.0 - normCdf(math.abs(delta))), 1e-300)
    -100.0 * math.log(p)
  }

  /**
   * Align two sentence-length sequences; returns beads as
   * (srcStart, srcLen, tgtStart, tgtLen) in document order. Pure
   * function — the spec drives it directly with the published
   * worked-example shapes.
   */
  def galeChurch(src: Array[Int], tgt: Array[Int]): Array[(Int, Int, Int, Int)] = {
    val n = src.length; val m = tgt.length
    val cost = Array.fill(n + 1, m + 1)(Double.PositiveInfinity)
    val back = Array.fill[Int](n + 1, m + 1)(-1)
    cost(0)(0) = 0.0
    var i = 0
    while (i <= n) {
      var j = 0
      while (j <= m) {
        if (cost(i)(j) != Double.PositiveInfinity) {
          var b = 0
          while (b < Beads.length) {
            val (di, dj, pen) = Beads(b)
            if (i + di <= n && j + dj <= m) {
              val l1 = (i until i + di).map(src).sum
              val l2 = (j until j + dj).map(tgt).sum
              val nc = cost(i)(j) + pen + lengthCost(l1, l2)
              // strict < keeps the earliest bead type on ties
              if (nc < cost(i + di)(j + dj)) {
                cost(i + di)(j + dj) = nc
                back(i + di)(j + dj) = b
              }
            }
            b += 1
          }
        }
        j += 1
      }
      i += 1
    }
    // walk back from (n, m)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
    var (ci, cj) = (n, m)
    while (ci > 0 || cj > 0) {
      val b = back(ci)(cj)
      require(b >= 0, s"unreachable DP cell ($ci,$cj)")
      val (di, dj, _) = Beads(b)
      out += ((ci - di, di, cj - dj, dj))
      ci -= di; cj -= dj
    }
    out.reverseIterator.toArray
  }

  /**
   * Align paired documents sentence-by-sentence: split both sides
   * with [[TextFunctions.split_sentences]], run the per-pair DP, and
   * explode one row per bead: (id, bead, src_start, src_len,
   * tgt_start, tgt_len). Pairs beyond `maxSentences` on either side
   * are dropped (NULL discipline — align chunks upstream).
   */
  def alignSentences(
      pairs: DataFrame,
      idCol: String,
      srcCol: String,
      tgtCol: String,
      maxSentences: Int = 512): DataFrame = {
    val u = F.udf { (src: Seq[String], tgt: Seq[String]) =>
      if (src == null || tgt == null ||
          src.length > maxSentences || tgt.length > maxSentences) null
      else galeChurch(src.map(_.length).toArray, tgt.map(_.length).toArray)
    }
    val split = (c: Column) => TextFunctions.split_sentences(c)
    pairs
      .filter(F.col(srcCol).isNotNull && F.col(tgtCol).isNotNull)
      .select(F.col(idCol),
        u(split(F.col(srcCol)), split(F.col(tgtCol))).as("__beads"))
      .filter(F.col("__beads").isNotNull)
      .select(F.col(idCol), F.posexplode(F.col("__beads")).as(Seq("bead", "__b")))
      .select(F.col(idCol), F.col("bead"),
        F.col("__b._1").as("src_start"), F.col("__b._2").as("src_len"),
        F.col("__b._3").as("tgt_start"), F.col("__b._4").as("tgt_len"))
  }
}
