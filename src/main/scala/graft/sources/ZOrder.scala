package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Z-order (Morton-curve) data layout: interleave the bits of several
 * scaled key columns into one sort key, then range-partition and sort
 * the write by it. Files then hold rows that are close in EVERY key
 * dimension, so parquet column min/max statistics become selective for
 * filters on ANY of the keys — the layout that makes "WHERE user_id
 * BETWEEN ... AND ts BETWEEN ..." skip most of a 100 TB table when
 * only one of those columns could be the partition key.
 *
 * The z-value is pure codegen'd Column arithmetic (shiftleft /
 * bitwise OR on longs — no UDF in the write path): each column is
 * rank-scaled to [0, 2^bits) via percent_rank so skewed domains spread
 * evenly, then bit b of dimension d lands at position b * ndims + d.
 */
object ZOrder {

  /** Interleave pre-scaled integer columns (each already in
    * [0, 2^bits)) into a single long z-value. bits * cols.size must be
    * <= 63. */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "need at least one column")
    require(bits * cols.size <= 63,
      s"${cols.size} dims x $bits bits exceeds a long")
    val ndims = cols.size
    val pieces = for {
      (c, d) <- cols.zipWithIndex
      b <- 0 until bits
    } yield F.shiftleft(
      F.shiftright(c, b).bitwiseAND(F.lit(1L)), b * ndims + d)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Rank-scale an arbitrary orderable column to [0, 2^bits) longs.
    * Percent-rank equalizes skewed domains (a hot key range cannot
    * monopolize one z-prefix); ties share a slot, which only blurs —
    * never breaks — locality. */
  def rankScaled(c: Column, bits: Int): Column =
    F.least(
      (F.percent_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy(c)) *
        (1L << bits)).cast("long"),
      F.lit((1L << bits) - 1))

  /**
   * Write `df` z-ordered by `keyCols` into `numFiles` parquet files at
   * `path`. The global sort by z-value is ONE range exchange (sampled
   * boundaries), the same cost as any repartitionByRange write.
   *
   * NOTE on the rank pass: percent_rank over the whole frame is a
   * single-partition window — fine up to ~10^8 rows per dimension. At
   * true 100 TB scale use [[writeZOrderedScalable]] (approx-quantile
   * boundaries + broadcast binary search, no global window); the
   * interleave and the write path are identical.
   */
  def writeZOrdered(
      df: DataFrame,
      keyCols: Seq[String],
      path: String,
      numFiles: Int = 64,
      bits: Int = 16): Unit = {
    val scaled = keyCols.zipWithIndex.foldLeft(df) { case (d, (k, i)) =>
      d.withColumn(s"__z$i", rankScaled(F.col(k), bits))
    }
    interleaveAndWrite(scaled, keyCols.size, bits, numFiles, path)
  }

  /**
   * [[writeZOrdered]] without the single-partition rank window — the
   * 100 TB form. One `percentile_approx` pass over ALL dimensions
   * computes the `2^bits - 1` quantile boundaries per dimension (a
   * bounded dims × (2^bits − 1)-double collect), then a broadcast
   * binary search maps each value to its bucket: map-only scaling, the
   * same even spread under skew that percent_rank gives (quantile
   * boundaries ARE the rank grid, up to sketch accuracy — blurred
   * locality only, never broken). Numeric / castable-to-double
   * dimensions only; NULLs land in bucket 0.
   */
  def writeZOrderedScalable(
      df: DataFrame,
      keyCols: Seq[String],
      path: String,
      numFiles: Int = 64,
      bits: Int = 12,
      accuracy: Int = 10000): Unit = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(bits * keyCols.size <= 63,
      s"${keyCols.size} dims x $bits bits exceeds a long")
    val n = 1 << bits
    val qs = F.array((1 until n).map(i => F.lit(i.toDouble / n)): _*)
    // one aggregate row: boundaries for every dimension at once —
    // bounded at dims x (2^bits - 1) doubles
    val row = df
      .agg(F.percentile_approx(F.col(keyCols.head).cast("double"), qs,
          F.lit(accuracy)).as("q0"),
        keyCols.tail.zipWithIndex.map { case (k, i) =>
          F.percentile_approx(F.col(k).cast("double"), qs,
            F.lit(accuracy)).as(s"q${i + 1}")
        }: _*)
      .collect()(0)
    val bounds: Array[Array[Double]] = keyCols.indices.map { i =>
      if (row.isNullAt(i)) Array.empty[Double]
      else row.getSeq[Double](i).toArray
    }.toArray
    val bc = df.sparkSession.sparkContext.broadcast(bounds)
    val cap = (n - 1).toLong
    val scaled = keyCols.zipWithIndex.foldLeft(df) { case (d, (k, i)) =>
      val u = F.udf { (v: java.lang.Double) =>
        if (v == null) 0L
        else {
          val a = bc.value(i)
          if (a.isEmpty) 0L
          else {
            val p = java.util.Arrays.binarySearch(a, v.doubleValue())
            val b = if (p >= 0) p + 1 else -(p + 1)
            math.min(b.toLong, cap)
          }
        }
      }
      d.withColumn(s"__z$i", u(F.col(k).cast("double")))
    }
    interleaveAndWrite(scaled, keyCols.size, bits, numFiles, path)
  }

  private def interleaveAndWrite(
      scaled: DataFrame, ndims: Int, bits: Int, numFiles: Int,
      path: String): Unit =
    scaled
      .withColumn("__z", interleaveBits(
        (0 until ndims).map(i => F.col(s"__z$i")), bits))
      .drop((0 until ndims).map(i => s"__z$i"): _*)
      .repartitionByRange(numFiles, F.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
