package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/**
 * Gap-based sessionization: consecutive events of the same key belong
 * to one session until the gap to the previous event exceeds `maxGap`.
 *
 * One shuffle on the key plus a per-partition sort (lag + running sum
 * over the same window frame — Catalyst evaluates both in a single
 * Window exec). The batch twin of Structured Streaming's
 * `session_window`; results are deterministic even with tied
 * timestamps because a tied event's gap is 0 and can therefore never
 * start a new session.
 */
object Sessionize {

  /**
   * Adds `sessionCol`: a per-key session ordinal starting at 1,
   * incremented whenever the gap since the key's previous event exceeds
   * `maxGap` (both numeric, e.g. epoch milliseconds). Rows with a NULL
   * timestamp get a NULL session id and never start or extend a
   * session — a timeless event belongs to no session.
   */
  def withSessionId(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      maxGap: Long,
      sessionCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol.asc_nulls_first)
    val prev = F.lag(tsCol, 1).over(w)
    // NULL-ts rows sort first and contribute no flag; the first real
    // row still fires (its prev is either absent or a NULL ts)
    val newSession = F.when(tsCol.isNull, 0L)
      .when(prev.isNull || (tsCol - prev) > maxGap, 1L)
      .otherwise(0L)
    df.withColumn("__new_session", newSession)
      .withColumn(sessionCol,
        F.when(tsCol.isNull, F.lit(null).cast("long"))
          .otherwise(F.sum(F.col("__new_session"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .drop("__new_session")
  }

  /**
   * Skew-resistant sessionization: identical output to [[withSessionId]]
   * but the heavy window partitions on (key, time bucket) instead of
   * the bare key, so a hot key's events spread across
   * span-many sub-partitions instead of flooding one sort. Sessions
   * that cross bucket boundaries are stitched back with a second,
   * summary-level pass: one row per non-empty (key, bucket) carrying
   * (first_ts, last_ts, session count), lag-joined per key in bucket
   * order — the gap between a bucket's first event and the previous
   * non-empty bucket's last event is exactly the gap between
   * consecutive events, so the stitch applies the same `> maxGap` rule
   * the row-level pass does. The summary side is O(keys x buckets)
   * rows, orders of magnitude smaller than the events.
   *
   * Bucket arithmetic stays in LONG math (`ts - pmod(ts, span)`) —
   * long `/` in Spark is double division and breaks above 2^52.
   */
  def withSessionIdBucketed(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      maxGap: Long,
      bucketSpan: Long,
      sessionCol: String = "session_id"): DataFrame = {
    require(bucketSpan > 0, s"bucketSpan must be positive, got $bucketSpan")
    val reserved = Seq("__cb", "__ns", "__lid", "__k", "__b", "__cont", "__off")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"column names reserved by withSessionIdBucketed: $clash")

    val withCb = df.withColumn("__cb", tsCol - F.pmod(tsCol, F.lit(bucketSpan)))
    val w = Window.partitionBy(keyCol, F.col("__cb")).orderBy(tsCol.asc_nulls_first)
    val prev = F.lag(tsCol, 1).over(w)
    val newSession = F.when(tsCol.isNull, 0L)
      .when(prev.isNull || (tsCol - prev) > maxGap, 1L)
      .otherwise(0L)
    val local = withCb.withColumn("__ns", newSession)
      .withColumn("__lid",
        F.when(tsCol.isNull, F.lit(null).cast("long"))
          .otherwise(F.sum(F.col("__ns"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .drop("__ns")

    // summary pass over (key, bucket) — reuses the window's hash
    // partitioning, so it adds no exchange on the event-sized side
    val summary = local.filter(tsCol.isNotNull)
      .groupBy(keyCol.as("__k"), F.col("__cb").as("__b"))
      .agg(F.min(tsCol).as("__first"), F.max(tsCol).as("__last"),
           F.max(F.col("__lid")).as("__s"))
    val w2 = Window.partitionBy(F.col("__k")).orderBy(F.col("__b").asc)
    val prevLast = F.lag(F.col("__last"), 1).over(w2)
    val stitched = summary
      .withColumn("__cont",
        F.when(prevLast.isNotNull && (F.col("__first") - prevLast) <= maxGap, 1L)
          .otherwise(0L))
      .withColumn("__off",
        F.coalesce(F.sum(F.col("__s") - F.col("__cont"))
          .over(w2.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0L)))
      .select(F.col("__k"), F.col("__b"), F.col("__cont"), F.col("__off"))

    // null-safe key equality: NULL-key rows form their own session group
    // in withSessionId (partitionBy groups NULLs) and must here too
    local.join(stitched,
        (keyCol <=> F.col("__k")) && (F.col("__cb") <=> F.col("__b")), "left")
      .withColumn(sessionCol,
        F.when(tsCol.isNull, F.lit(null).cast("long"))
          .otherwise(F.col("__off") + F.col("__lid") - F.col("__cont")))
      .drop(reserved: _*)
  }

  /**
   * Per-(key, session) rollup: event count and time span, keyed by the
   * key column's value and the session ordinal.
   */
  def sessionStats(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      maxGap: Long): DataFrame = {
    withSessionId(df.select(keyCol.as("key"), tsCol.as("ts")),
        F.col("key"), F.col("ts"), maxGap)
      .filter(F.col("session_id").isNotNull)
      .groupBy(F.col("key"), F.col("session_id"))
      .agg(
        F.count(F.lit(1)).as("n_events"),
        (F.max(F.col("ts")) - F.min(F.col("ts"))).as("span"))
  }
}
