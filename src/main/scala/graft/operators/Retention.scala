package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Cohort retention: bucket every user by the day of their FIRST event
 * (the cohort), then count how many of each cohort came back k days
 * later, for k = 0..maxOffset.
 *
 * Shape at 100 TB: two hash exchanges total. The first-event-day
 * aggregate and the per-(user, day) activity distinct share the SAME
 * groupBy(user...) partitioning — cohort assignment re-attaches to
 * activity by user key, and the final (cohort, offset) rollup is over a
 * users x days -sized set, orders of magnitude below the event count.
 * No window over raw events, no self-join of the event table.
 */
object Retention {

  /**
   * Returns (cohort_day DATE, day_offset LONG, users LONG), one row per
   * non-empty cell, offsets 0..maxOffset. A user is in cohort c = the
   * UTC day of their earliest event; they count toward offset k if they
   * had any event on day c + k.
   */
  def cohortRetention(
      df: DataFrame,
      userCol: Column,
      tsCol: Column,
      maxOffset: Int = 30): DataFrame = {
    require(maxOffset >= 0, s"maxOffset must be >= 0, got $maxOffset")
    // one pass: per user, first day + the distinct set of active days
    val perUser = df
      .select(userCol.as("__u"), F.to_date(tsCol).as("__d"))
      .groupBy(F.col("__u"))
      .agg(F.min(F.col("__d")).as("cohort_day"),
           F.collect_set(F.col("__d")).as("__days"))
    perUser
      .select(F.col("cohort_day"),
        F.explode(F.col("__days")).as("__active"))
      .select(F.col("cohort_day"),
        F.datediff(F.col("__active"), F.col("cohort_day")).cast("long")
          .as("day_offset"))
      .filter(F.col("day_offset") <= maxOffset)
      .groupBy(F.col("cohort_day"), F.col("day_offset"))
      .agg(F.count(F.lit(1)).as("users"))
      .orderBy("cohort_day", "day_offset")
  }
}
