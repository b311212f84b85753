package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/**
 * Physical-plan shape assertions: the scale story of each operator is
 * its shuffle count, and these pin it against regressions. (An operator
 * that silently gains an exchange is correct-but-wrong at 100 TB.)
 */
class PlanShapeSpec extends SparkTestBase {
  import spark.implicits._

  // Distribution exchanges are inserted by EnsureRequirements during
  // plan preparation, so count them in the prepared (executed) plan's
  // rendering — works identically with and without AQE wrapping. Only
  // hash exchanges count: the tests' repartition(4) inputs add
  // round-robin exchanges that are scaffolding, not operator cost.
  private def exchanges(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  private val left = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "t", "tag")
    .repartition(4)
  private val right = Seq((1L, 5L, 1.0), (2L, 6L, 2.0)).toDF("k", "t", "v")
    .repartition(4)

  test("asofJoin plans exactly one shuffle (union + single window)") {
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(exchanges(out) === 1)
  }

  test("sessionStats groupBy reuses the window's hash partitioning") {
    val df = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("u", "ts").repartition(4)
    val out = Sessionize.sessionStats(df, F.col("u"), F.col("ts"), 100L)
    // window partitionBy(key) hash-partitions by key; grouping on
    // (key, session_id) is satisfied by that partitioning -> the rollup
    // must not add a second exchange
    assert(exchanges(out) === 1)
  }

  test("lag and running sum share one Window exec in withSessionId") {
    val df = Seq((1L, 10L), (1L, 20L)).toDF("u", "ts").repartition(4)
    val out = Sessionize.withSessionId(df, F.col("u"), F.col("ts"), 100L)
    val windows = "Window ".r
      .findAllIn(out.queryExecution.executedPlan.toString).size
    // lag needs the plain frame, the running sum needs rows-unbounded:
    // same partition/order spec, so Catalyst may fuse or stack them —
    // but both must sit over a single exchange
    assert(exchanges(out) === 1)
    assert(windows >= 1)
  }
}
