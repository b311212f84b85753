package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

/**
 * Composite sketch operations for cluster-scale workloads.
 */
object SketchOps {

  /**
   * Skew-proof two-phase sketch aggregation: values are first aggregated
   * under (key, salt) — spreading one hot key over `saltBuckets`
   * reducers — then the per-salt sketches merge under the key alone.
   *
   * Because sketches are mergeable monoids with exact bin addition, the
   * result is byte-identical to the unsalted aggregation; salting only
   * changes the shuffle layout. Use when a single group would otherwise
   * exceed one reducer (AQE's skew handling does not split hash
   * aggregations, only joins).
   */
  def saltedSketchAgg(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val keys = keyCols.map(F.col)
    val salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(saltBuckets))
    df.withColumn("__salt", salt)
      .groupBy((keys :+ F.col("__salt")): _*)
      .agg(G.ddsketch_agg_values(F.col(valueCol)).as("__partial"))
      .groupBy(keys: _*)
      .agg(G.ddsketch_agg(F.col("__partial")).as("sketch"))
  }

  /**
   * Hourly→key rollup (the reference README's hourly/daily pattern,
   * README.md:189-199): persistable intermediate sketches plus a final
   * merge, all map-side-combinable.
   */
  def timeBucketedSketches(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      bucket: String = "hour"): DataFrame =
    df.groupBy((F.date_trunc(bucket, F.col(tsCol)).as("bucket_start") +:
        keyCols.map(F.col)): _*)
      .agg(G.ddsketch_agg_values(F.col(valueCol)).as("sketch"))
}
