package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/**
 * Curriculum ordering: emit training data easiest-first (or by any
 * difficulty signal) while keeping every training window a
 * deterministic mix of strata (sources, languages, domains) — plain
 * difficulty sort front-loads one domain and starves the rest, which
 * is exactly the mixing failure data-mixture planning exists to
 * avoid.
 *
 * The order key is pure arithmetic: within-stratum rank r (0-based,
 * ordered by the difficulty column, tie-broken by the id column) at
 * stratum index s of S strata → `ord = r * S + s`. Round-robin by
 * construction: positions 0..S-1 are the easiest row of each stratum,
 * then the next easiest of each, and so on. Unique because (r, s) is.
 *
 * Scale shape: one window per stratum partition (a single hash
 * exchange on the stratum column) plus a broadcast join against the
 * tiny distinct-strata index. The global sort by `ord` is left to the
 * consumer (a range exchange only the final write should pay).
 */
object Curriculum {

  /**
   * Adds `ordCol` as described above. Rows with a NULL stratum or
   * NULL difficulty are kept and sort via Spark's null-first window
   * semantics within their stratum; a NULL stratum forms its own
   * stratum.
   */
  def interleaveStrata(
      df: DataFrame,
      strataCol: String,
      difficultyCol: String,
      idCol: String,
      ordCol: String = "ord"): DataFrame = {
    // distinct strata: tiny by assumption (sources/langs/domains);
    // the single-partition window over it is a few rows
    val strata = df.select(F.col(strataCol).as("__st")).distinct()
    val wIdx = Window.orderBy(F.col("__st").asc_nulls_first)
    val idx = strata
      .withColumn("__si", F.row_number().over(wIdx).cast("long") - 1L)
      .withColumn("__S", F.count(F.lit(1)).over(
        Window.partitionBy(F.lit(1))).cast("long"))
    val wr = Window.partitionBy(F.col(strataCol))
      .orderBy(F.col(difficultyCol).asc_nulls_first, F.col(idCol).asc_nulls_first)
    df.join(F.broadcast(idx), F.col(strataCol) <=> F.col("__st"))
      .withColumn("__r", F.row_number().over(wr).cast("long") - 1L)
      .withColumn(ordCol, F.col("__r") * F.col("__S") + F.col("__si"))
      .drop("__st", "__si", "__S", "__r")
  }
}
