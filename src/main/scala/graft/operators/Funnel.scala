package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Ordered-funnel analytics: how far through a fixed sequence of steps
 * (view → click → purchase) did each user get?
 *
 * Semantics: greedy earliest-first subsequence matching with STRICTLY
 * increasing timestamps between consecutive steps — step k+1 matches
 * the first event of its type after the matched step-k event. For pure
 * existence (no span cap) greedy matching is optimal, and the strict
 * inequality makes the result independent of how same-timestamp events
 * tie-break, so any engine computing "min ts of step k+1 greater than
 * matched step k" agrees row-for-row.
 *
 * Shape at 100 TB: ONE hash exchange (the groupBy user). Per-user
 * events are folded in a single `aggregate` lambda over the sorted
 * array — no k-pass self-joins, no window cascade; the per-user event
 * list is the only memory bound (cap upstream with keepTopK for
 * pathological users).
 */
object Funnel {

  /**
   * Per-user funnel depth. `tsCol` must be an integral epoch column
   * (e.g. `unix_millis(ts)`) — keeping the comparison granularity
   * explicit is what lets an external oracle replicate ties exactly.
   *
   * Returns one row per user: (user, steps_completed LONG, converted
   * BOOLEAN). `maxSpanMillis`, when set, additionally requires every
   * matched step to fall within that span of the matched FIRST step
   * (greedy-from-earliest; no restart search).
   */
  def funnel(
      df: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      steps: Seq[String],
      maxSpan: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val stepArr = F.array(steps.map(F.lit): _*)
    val n = steps.size
    val evs = F.sort_array(F.collect_list(
      F.struct(tsCol.cast("long").as("ts"), typeCol.as("tp"))))
    val folded = F.aggregate(
      F.col("__evs"),
      F.struct(F.lit(0).as("i"), F.lit(Long.MinValue).as("last"),
               F.lit(Long.MinValue).as("first")),
      (st, e) => {
        val i = st.getField("i")
        // index capped with least(): ANSI element_at throws out-of-bounds
        // and && does not short-circuit, so i == n must still index validly
        val want = F.element_at(stepArr, F.least(i + 1, F.lit(n)))
        val inSpan = maxSpan match {
          case Some(s) =>
            i === 0 || e.getField("ts") - st.getField("first") <= F.lit(s)
          case None => F.lit(true)
        }
        val advance = i < n && e.getField("tp") === want &&
          e.getField("ts") > st.getField("last") && inSpan
        F.when(advance, F.struct(
            (i + 1).as("i"),
            e.getField("ts").as("last"),
            F.when(i === 0, e.getField("ts")).otherwise(st.getField("first"))
              .as("first")))
          .otherwise(st)
      },
      st => st.getField("i"))
    df.groupBy(userCol.as("user"))
      .agg(evs.as("__evs"))
      .select(F.col("user"),
        folded.cast("long").as("steps_completed"))
      .withColumn("converted", F.col("steps_completed") === n)
  }

  /** Funnel histogram: users per completed depth (0..steps.size). */
  def funnelCounts(
      df: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      steps: Seq[String],
      maxSpan: Option[Long] = None): DataFrame =
    funnel(df, userCol, tsCol, typeCol, steps, maxSpan)
      .groupBy(F.col("steps_completed"))
      .agg(F.count(F.lit(1)).as("users"))
      .orderBy("steps_completed")
}
