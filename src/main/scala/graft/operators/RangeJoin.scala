package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/**
 * Bounded time-range join: pairs of (left, right) rows with equal keys
 * whose times differ by at most `tolerance`.
 *
 * Spark plans a raw inequality join as BroadcastNestedLoopJoin — a
 * non-starter beyond broadcast sizes. The scale-correct shape is
 * bucketing: quantize time by the tolerance, replicate the right side
 * to its three adjacent buckets, equi-join on (keys, bucket), and
 * filter the exact predicate. Shuffle keys stay small ints, the
 * replication factor is a constant 3 on one side, and the join is a
 * plain shuffled hash/sort-merge join that AQE can size and skew-split.
 * Any in-tolerance pair lands in exactly one bucket collision, so no
 * dedup pass is needed.
 */
object RangeJoin {

  /**
   * Inner join: left rows x `rightValues` of every right row with the
   * same `keys` and |leftTime - rightTime| <= tolerance (both numeric,
   * e.g. epoch milliseconds; tolerance > 0). Rows with NULL time never
   * match. `rightValues` must not collide with left column names; the
   * matched right time is exposed as `__rt` alongside them.
   *
   * `broadcastRight = true` hints the (bucket-replicated) right side
   * for broadcast: the join becomes a BroadcastHashJoin and the left
   * side is never shuffled at all — zero hash exchanges. Use for
   * dimension-sized right inputs (the replicated side is 3x the right
   * row count; it must fit the broadcast threshold x executor memory
   * budget). Default keeps the shuffled join that AQE can size and
   * skew-split.
   */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Long,
      rightValues: Seq[String],
      broadcastRight: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "bandJoin requires at least one key column")
    require(tolerance > 0, s"tolerance must be positive, got $tolerance")
    val dup = (rightValues ++ Seq("__rt", "__b")).toSet.intersect(left.columns.toSet)
    require(dup.isEmpty, s"right value columns collide with left columns: $dup")
    val reserved = Set("__rt", "__b", "__rb").intersect(rightValues.toSet)
    require(reserved.isEmpty, s"column names reserved by bandJoin: $reserved")

    // the bucket key is the bucket's start value, t - pmod(t, tol):
    // pure integer add/sub (exact for the full long range, floor
    // semantics for negative times since pmod is non-negative) — a
    // double-division floor would round times above 2^52 (epoch nanos)
    // and could split an in-tolerance pair across non-adjacent buckets
    def bucket(t: org.apache.spark.sql.Column) =
      (t - F.pmod(t, F.lit(tolerance))).cast("long")

    val lb = left.withColumn("__b", bucket(F.col(leftTime)))
    val rb = right.select(
        keys.map(F.col) ++ Seq(F.col(rightTime).as("__rt")) ++ rightValues.map(F.col): _*)
      .withColumn("__rb", bucket(F.col("__rt")))
      .withColumn("__b", F.explode(F.array(
        F.col("__rb") - tolerance, F.col("__rb"), F.col("__rb") + tolerance)))
      .drop("__rb")

    lb.join(if (broadcastRight) F.broadcast(rb) else rb, keys :+ "__b")
      .filter(F.abs(F.col(leftTime) - F.col("__rt")) <= tolerance)
      .drop("__b")
  }
}
