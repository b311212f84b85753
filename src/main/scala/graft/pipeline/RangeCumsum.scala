package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/**
 * Corpus-scale running sums over a global order WITHOUT the
 * single-partition global window Spark's `Window.orderBy` degrades to:
 * rows route into range buckets (bounds from approx quantiles — one
 * tiny driver action at call time, the bloomPrune precedent), the
 * within-bucket window cumsum runs per bucket in parallel, and the
 * <= `buckets` per-bucket totals get prefix offsets broadcast back.
 *
 * Bucketing only routes execution: the strict `bound < v` comparison
 * keeps equal order-keys in one bucket, so the result is independent
 * of the bounds. The order column must be UNIQUE per row (pre-group
 * ties first, as [[Drift.ksStatistic]] does) — within a bucket, ties
 * would otherwise take row-order-dependent partial sums.
 */
private[pipeline] object RangeCumsum {

  /** Appends one inclusive running-sum column per (expr, alias), summed
    * in ascending `orderCol` order. `orderCol` must be numeric-ish
    * (castable to double for the bucket bounds) and unique. */
  def inclusive(
      df: DataFrame,
      orderCol: Column,
      sums: Seq[(Column, String)],
      buckets: Int = 64): DataFrame = {
    require(sums.nonEmpty, "need at least one sum column")
    val base = df.withColumn("__rc_v", orderCol)
      .withColumn("__rc_vd", orderCol.cast("double"))
      .localCheckpoint(eager = false)
    val nb = math.max(1, buckets)
    val bounds: Seq[Double] =
      if (nb == 1) Nil
      else {
        val probs = (1 until nb).map(_.toDouble / nb).toArray
        val row = base.agg(F.percentile_approx(
          F.col("__rc_vd"), F.lit(probs), F.lit(10000)).as("q")).first()
        if (row.isNullAt(0)) Nil else row.getSeq[Double](0).distinct.sorted
      }
    val in = sums.zipWithIndex.map { case ((c, _), i) => (c, s"__rc_s$i") }
    val withIn = in.foldLeft(base) { case (d, (c, n)) => d.withColumn(n, c) }
    val bucketed =
      if (bounds.isEmpty) withIn.withColumn("__rc_bk", F.lit(0))
      else {
        val bLit = F.array(bounds.map(F.lit(_)): _*)
        withIn.withColumn("__rc_bk",
          F.size(F.filter(bLit, c => c < F.col("__rc_vd"))))
      }
    val wIn = Window.partitionBy(F.col("__rc_bk")).orderBy(F.col("__rc_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = in.zip(sums).foldLeft(bucketed) {
      case (d, ((_, n), (_, alias))) =>
        d.withColumn(s"__rc_f__$alias", F.sum(F.col(n)).over(wIn))
    }
    // <= `buckets` rows: cross-bucket prefix offsets (tiny window)
    val wOff = Window.orderBy(F.col("__rc_bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offAggs = in.map { case (_, n) => F.sum(F.col(n)).as(s"__rc_t$n") }
    val offsets0 = bucketed.groupBy(F.col("__rc_bk"))
      .agg(offAggs.head, offAggs.tail: _*)
    val offsets = in.zip(sums).foldLeft(offsets0) {
      case (d, ((_, n), (_, alias))) =>
        d.withColumn(s"__rc_o__$alias",
          F.coalesce(F.sum(F.col(s"__rc_t$n")).over(wOff), F.lit(0L)))
    }.select(F.col("__rc_bk") +:
      sums.map { case (_, alias) => F.col(s"__rc_o__$alias") }: _*)
    val joined = within.join(F.broadcast(offsets), "__rc_bk")
    val withOut = sums.foldLeft(joined) { case (d, (_, alias)) =>
      d.withColumn(alias, F.col(s"__rc_f__$alias") + F.col(s"__rc_o__$alias"))
    }
    val dropCols = Seq("__rc_v", "__rc_vd", "__rc_bk") ++
      in.map(_._2) ++
      sums.flatMap { case (_, a) => Seq(s"__rc_f__$a", s"__rc_o__$a") }
    withOut.drop(dropCols: _*)
  }
}
