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
   * true 100 TB scale swap `rankScaled` for a fixed affine scaling from
   * known domain bounds (or an approx-quantile histogram): the
   * interleave and the write path stay identical.
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
    scaled
      .withColumn("__z", interleaveBits(
        keyCols.indices.map(i => F.col(s"__z$i")), bits))
      .drop(keyCols.indices.map(i => s"__z$i"): _*)
      .repartitionByRange(numFiles, F.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
