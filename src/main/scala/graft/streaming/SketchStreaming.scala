package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

/**
 * Structured Streaming rollups over sketch aggregates — the streaming
 * form of the reference's hourly→daily sketch-table pattern
 * (reference: README.md:119-141, 189-199): instead of INSERT-SELECT
 * batch jobs, a watermarked windowed aggregation continuously maintains
 * per-window sketches that downstream queries merge further with
 * ddsketch_agg.
 *
 * Scale note: the aggregation state per (window, key) group is one
 * DDSketch buffer (O(log range) bins), so state store size grows with
 * key cardinality only, never with event count.
 */
object SketchStreaming {

  /** Windowed values→sketch aggregation with event-time watermarking. */
  def windowedSketchAgg(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(F.window(F.col(tsCol), windowDuration), F.col(keyCol))
      .agg(G.ddsketch_agg_values(F.col(valueCol)).as("sketch"))

  /** Same, emitting the full 12-field stats struct per window. */
  def windowedStatsAgg(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(F.window(F.col(tsCol), windowDuration), F.col(keyCol))
      .agg(G.ddsketch_stats_agg_values(F.col(valueCol)).as("stats"))

  /**
   * Session-window sketch aggregation: the streaming twin of the batch
   * `graft.operators.Sessionize` — Spark's native `session_window`
   * merges per-key state until the event-time gap exceeds
   * `gapDuration`, and the watermark closes (and frees) sessions.
   * State per open session is one sketch buffer + bounds, so the state
   * store scales with concurrently-open sessions, not event count.
   */
  def sessionizedSketchAgg(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      gapDuration: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(F.session_window(F.col(tsCol), gapDuration), F.col(keyCol))
      .agg(
        G.ddsketch_agg_values(F.col(valueCol)).as("sketch"),
        F.count(F.lit(1)).as("n_events"))

  /**
   * Streaming exact dedup: drop rows whose content hash was already
   * seen within the watermark horizon. The state store keys on the
   * 32-byte sha2, never the payload, and `withinWatermark` gives the
   * state a TTL — the unbounded-state trap of a naive
   * `dropDuplicates` on an infinite stream. NULL-content rows pass
   * through un-deduplicated (sha2(NULL) is NULL and the state store
   * would treat all NULL keys as one duplicate — dropping rows that
   * were never proven equal).
   */
  def dedupStream(
      stream: DataFrame,
      tsCol: String,
      contentCol: String,
      watermarkDelay: String): DataFrame =
    stream
      // a NULL-content row gets a unique key, so it is never treated as
      // a duplicate — single source scan per microbatch (a filtered
      // self-union would read the upstream twice) and the watermark
      // applies uniformly; null-row state entries expire with the TTL
      .withColumn("__h", F.coalesce(F.sha2(F.col(contentCol), 256), F.uuid()))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")
}
