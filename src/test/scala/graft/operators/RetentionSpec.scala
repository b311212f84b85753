package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class RetentionSpec extends SparkTestBase {
  import spark.implicits._

  test("assigns cohorts by first day and counts comeback days") {
    val day = 86400000L
    val rows = Seq(
      (1L, 0L), (1L, 1 * day), (1L, 3 * day),      // cohort d0: offsets 0,1,3
      (2L, 0L), (2L, 3 * day),                     // cohort d0: offsets 0,3
      (3L, 1 * day), (3L, 2 * day))                // cohort d1: offsets 0,1
      .toDF("u", "ms").select(F.col("u"), F.timestamp_millis(F.col("ms")).as("ts"))
      .repartition(4)
    val out = Retention.cohortRetention(rows, F.col("u"), F.col("ts"), 30)
      .select(F.date_format(F.col("cohort_day"), "yyyy-MM-dd"),
              F.col("day_offset"), F.col("users"))
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("1970-01-01", 0L, 2L), ("1970-01-01", 1L, 1L), ("1970-01-01", 3L, 2L),
      ("1970-01-02", 0L, 1L), ("1970-01-02", 1L, 1L)))
  }

  test("maxOffset trims the tail; same-day repeats count once") {
    val day = 86400000L
    val rows = Seq((1L, 0L), (1L, 100L), (1L, 5 * day))
      .toDF("u", "ms").select(F.col("u"), F.timestamp_millis(F.col("ms")).as("ts"))
    val out = Retention.cohortRetention(rows, F.col("u"), F.col("ts"), 3)
      .select("day_offset", "users").as[(Long, Long)].collect().toSeq
    assert(out === Seq((0L, 1L)))   // offset-5 row trimmed, dup day collapsed
  }

  test("plans two hash exchanges (per-user pass + tiny rollup)") {
    val out = Retention.cohortRetention(sf("sf0.001", "events"),
      F.col("user_id"), F.col("ts"), 30)
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan)
  }
}
