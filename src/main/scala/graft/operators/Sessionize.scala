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
