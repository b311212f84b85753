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

  /**
   * Point-in-interval join — the IP-range-lookup / time-validity shape:
   * left rows paired with every right row whose `[startCol, endCol]`
   * interval (inclusive, long-valued) contains the left `pointCol`.
   * Spark plans the raw predicate as a nested-loop join; here each
   * right interval replicates to the `cellWidth`-wide cells it covers,
   * left points probe their single cell, and the exact containment
   * filter runs after a plain equi-join on the cell id.
   *
   * Pick `cellWidth` near the typical interval span: replication is
   * ~span/cellWidth + 1 per interval. A pathologically wide interval
   * replicates proportionally — `maxCells` bounds it (such intervals
   * are dropped with a warning; 0 disables the bound). NULL points,
   * NULL bounds, and empty intervals (start > end) never match.
   * `broadcastRight` as in [[bandJoin]].
   */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      rightValues: Seq[String],
      cellWidth: Long,
      maxCells: Int = 4096,
      broadcastRight: Boolean = false): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive, got $cellWidth")
    val dup = (rightValues ++ Seq("__s", "__e", "__c")).toSet.intersect(left.columns.toSet)
    require(dup.isEmpty, s"right value columns collide with left columns: $dup")

    // cell id = the cell's start value, t - pmod(t, w): pure long
    // add/sub, exact over the full range (a divide-by-width id would
    // round through double division above 2^52 — see bandJoin)
    def cell(t: org.apache.spark.sql.Column) =
      (t - F.pmod(t, F.lit(cellWidth))).cast("long")

    val rb0 = right.select(
        Seq(F.col(startCol).as("__s"), F.col(endCol).as("__e")) ++
          rightValues.map(F.col): _*)
      .filter(F.col("__s").isNotNull && F.col("__e").isNotNull &&
        F.col("__s") <= F.col("__e"))
    val bounded =
      if (maxCells <= 0) rb0
      else {
        val acc = graft.pipeline.AccumulatorRetainer.retain(
          right.sparkSession.sparkContext
            .longAccumulator("graft.rangejoin.droppedIntervals"))
        val keep = F.udf((cellSpan: Long) => {
          val nCells = cellSpan / cellWidth + 1L   // exact: span is a multiple
          val ok = nCells <= maxCells
          if (!ok) {
            acc.add(1L)
            org.slf4j.LoggerFactory.getLogger("graft.operators.RangeJoin")
              .warn(s"intervalJoin: dropping interval spanning $nCells cells (cap $maxCells)")
          }
          ok
        })
        rb0.filter(keep(cell(F.col("__e")) - cell(F.col("__s"))))
      }
    val rb = bounded
      .withColumn("__c", F.explode(F.sequence(
        cell(F.col("__s")), cell(F.col("__e")), F.lit(cellWidth))))
    val lb = left.withColumn("__c", cell(F.col(pointCol)))
    lb.join(if (broadcastRight) F.broadcast(rb) else rb, Seq("__c"))
      .filter(F.col(pointCol) >= F.col("__s") && F.col(pointCol) <= F.col("__e"))
      .drop("__c", "__s", "__e")
  }
}
