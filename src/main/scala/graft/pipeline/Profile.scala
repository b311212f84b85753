package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import graft.sketch.kmv

/**
 * Dataset profiling — the pre-ingest data-quality report: one row per
 * profiled column with exact null/total counts and a KMV
 * distinct-count estimate, all from a single corpus scan.
 *
 * Scale shape: every per-column statistic is an aggregate expression in
 * ONE global aggregation — the scan happens once regardless of how many
 * columns are profiled, partial aggregation runs map-side, and the
 * shuffle carries one KMV buffer (bounded k mins) plus two longs per
 * column. The wide 1-row result un-pivots to (column, stats) rows with
 * a zero-shuffle stack expression.
 */
object Profile {

  /**
   * Profile `cols` of `df`: (column, n_rows, n_nulls, distinct_est)
   * per column. `distinct_est` is the KMV estimate (within a few
   * percent at default k); counts are exact.
   */
  def profileColumns(
      df: DataFrame,
      cols: Seq[String],
      kmvK: Int = graft.sketch.KmvSketch.DefaultK): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val aggExprs = cols.flatMap { c =>
      Seq(
        F.count(F.lit(1)).as(s"__n_$c"),
        F.sum(F.when(F.col(c).isNull, 1L).otherwise(0L)).as(s"__nul_$c"),
        kmv.kmv_distinct(kmv.kmv_agg(F.col(c).cast("string"), kmvK)).as(s"__d_$c"))
    }
    val wide = df.agg(aggExprs.head, aggExprs.tail: _*)
    // un-pivot: stack(n, 'c1', n1, nul1, d1, 'c2', ...) — pure projection
    val stackArgs = cols.map(c =>
      s"'$c', __n_$c, __nul_$c, __d_$c").mkString(", ")
    wide.select(F.expr(
      s"stack(${cols.length}, $stackArgs) AS (column, n_rows, n_nulls, distinct_est)"))
  }
}
