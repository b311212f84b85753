package graft.sketch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

/**
 * Persisted, incrementally-maintained sketch rollup — the
 * observability materialized view behind the reference's hourly/daily
 * pattern (reference README.md:189-199), made NIGHTLY-SAFE at corpus
 * scale with a merge-on-read layout:
 *
 *   - [[materialize]] writes per-(time bucket, keys) DDSketch rows as
 *     parquet PARTITIONED BY the bucket (epoch-millis long).
 *   - [[append]] rolls up ONLY the fresh event batch and appends the
 *     pre-aggregated rows under the touched bucket partitions — a pure
 *     add: no read-modify-write of history, no partition rewrite, so
 *     concurrent readers never see a half-replaced partition and the
 *     append cost is O(batch) regardless of view size.
 *   - [[read]] merges the (few) per-batch rows of each (bucket, keys)
 *     group with `ddsketch_agg` — cheap because sketches are mergeable
 *     monoids with EXACT bin addition (see [[SketchOps.saltedSketchAgg]]),
 *     which also makes the incremental view BYTE-IDENTICAL to a
 *     from-scratch rebuild (pinned by SketchViewSpec). A time-range
 *     filter on `bucket_ms` pushes below the merge aggregate (it is a
 *     grouping column) and partition-prunes the scan.
 *   - [[compact]] rewrites the view to one row per (bucket, keys) when
 *     the per-partition row count (one per append batch) grows enough
 *     to matter; it is maintenance, never required for correctness.
 *   - [[regrain]] answers coarser-grain queries (hour → day/week) by
 *     merging persisted sketches instead of rescanning events.
 */
object SketchView {

  /** Roll one event frame up to (`bucket_ms`, keys..., `sketch`). The
    * bucket is the epoch-millis long of the truncated timestamp — a
    * stable parquet partition value (timestamps make fragile partition
    * directory names). NULL values are skipped by the aggregate; rows
    * with a NULL timestamp are dropped (no bucket to land in). */
  def rollup(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      bucket: String = "hour",
      accuracy: Double = 0.01): DataFrame =
    events.filter(F.col(tsCol).isNotNull)
      .groupBy(F.unix_millis(F.date_trunc(bucket, F.col(tsCol))).as("bucket_ms") +:
        keyCols.map(F.col): _*)
      .agg(G.ddsketch_agg_values(F.col(valueCol), accuracy).as("sketch"))

  /** Create (or replace) the persisted view from a full event scan. */
  def materialize(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      path: String,
      bucket: String = "hour",
      accuracy: Double = 0.01): Unit =
    rollup(events, tsCol, keyCols, valueCol, bucket, accuracy)
      .write.partitionBy("bucket_ms").mode("overwrite").parquet(path)

  /** Incremental maintenance: roll up the fresh batch and APPEND the
    * pre-aggregated rows — new files only under the touched bucket
    * partitions. History is never read or rewritten. */
  def append(
      fresh: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      path: String,
      bucket: String = "hour",
      accuracy: Double = 0.01): Unit =
    rollup(fresh, tsCol, keyCols, valueCol, bucket, accuracy)
      .write.partitionBy("bucket_ms").mode("append").parquet(path)

  /** The merged view: one row per (bucket_ms, keys) with the sketch of
    * every batch ever appended, plus the reconstructed `bucket_start`
    * timestamp. Filter on `bucket_ms` BEFORE acting on the result to
    * partition-prune (the predicate pushes through the merge). */
  def read(spark: SparkSession, path: String, keyCols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .withColumn("bucket_ms", F.col("bucket_ms").cast("long"))
      .groupBy(F.col("bucket_ms") +: keyCols.map(F.col): _*)
      .agg(G.ddsketch_agg(F.col("sketch")).as("sketch"))
      .withColumn("bucket_start", F.timestamp_millis(F.col("bucket_ms")))

  /** Rewrite the view to one row per (bucket, keys). The merged frame
    * must be materialized BEFORE the overwrite truncates its own
    * input — the eager localCheckpoint is the point here, not a
    * surprise (the library-wide lazy default is for operator chains). */
  def compact(spark: SparkSession, path: String, keyCols: Seq[String]): Unit =
    read(spark, path, keyCols)
      .drop("bucket_start")
      .localCheckpoint(true)
      .write.partitionBy("bucket_ms").mode("overwrite").parquet(path)

  /** Merge a view (or any rollup frame) to a coarser grain — the
    * hour → day/week dashboard query, answered from sketches alone. */
  def regrain(view: DataFrame, keyCols: Seq[String], grain: String): DataFrame =
    view
      .groupBy(F.unix_millis(F.date_trunc(grain,
          F.timestamp_millis(F.col("bucket_ms")))).as("bucket_ms") +:
        keyCols.map(F.col): _*)
      .agg(G.ddsketch_agg(F.col("sketch")).as("sketch"))
      .withColumn("bucket_start", F.timestamp_millis(F.col("bucket_ms")))
}
