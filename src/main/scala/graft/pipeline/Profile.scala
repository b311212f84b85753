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
    // arbitrary input names (dots, spaces, quotes) resolve as a single
    // backtick-quoted attribute; internal aliases are index-based so
    // the name never round-trips through an identifier
    def quoted(c: String) = F.col("`" + c.replace("`", "``") + "`")
    val aggExprs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        F.count(F.lit(1)).as(s"__n_$i"),
        F.sum(F.when(quoted(c).isNull, 1L).otherwise(0L)).as(s"__nul_$i"),
        kmv.kmv_distinct(kmv.kmv_agg(quoted(c).cast("string"), kmvK)).as(s"__d_$i"))
    }
    val wide = df.agg(aggExprs.head, aggExprs.tail: _*)
    // un-pivot via explode of per-column structs — pure projection +
    // generate, zero shuffle, no SQL-string splicing
    val structs = cols.zipWithIndex.map { case (c, i) =>
      F.struct(
        F.lit(c).as("column"), F.col(s"__n_$i").as("n_rows"),
        F.col(s"__nul_$i").as("n_nulls"), F.col(s"__d_$i").as("distinct_est"))
    }
    wide.select(F.explode(F.array(structs: _*)).as("__r")).select("__r.*")
  }
}
