package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/**
 * As-of (most-recent-prior) join — the time-series join DuckDB ships
 * natively (`ASOF JOIN`, the oracle for our tests) and Spark has no
 * built-in operator for.
 *
 * Spark-first shape: tag both inputs, union them, and resolve each left
 * row's match with one `last(_, ignoreNulls)` running window over
 * (keys, time). That is a single shuffle on the join keys plus a
 * per-partition sort — the same physical shape as any windowed
 * aggregation — with no range explosion (an inequality-join rewrite
 * would produce |L|x|R| per key) and no per-row index probe. At scale
 * the sort is external (spillable), AQE handles partition sizing, and a
 * skewed key can be salted upstream exactly like any window workload.
 */
object AsOfJoin {

  /**
   * For each left row, attach the `rightValues` columns of the right row
   * with the greatest `rightTime` <= the left row's `leftTime` within
   * the same `keys` group (inclusive match, like DuckDB's
   * `ON l.k = r.k AND l.t >= r.t`); NULL-filled when no prior right row
   * exists. Left rows with a NULL time keep their columns and match
   * nothing; right rows with a NULL time are ignored.
   *
   * `leftTime`/`rightTime` must have the same orderable type. If several
   * right rows share (keys, rightTime), which one wins is unspecified —
   * pre-aggregate the right side to unique timestamps for deterministic
   * output. `rightValues` names must not collide with left columns.
   * NULL-key rows follow equality-join semantics (NULL = NULL never
   * matches): left rows with a NULL key match nothing.
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asofJoin requires at least one key column")
    val dup = rightValues.toSet.intersect(left.columns.toSet)
    require(dup.isEmpty, s"right value columns collide with left columns: $dup")
    val reserved = Set("__t", "__side", "__l", "__r", "__m")
    val clash = (left.columns ++ rightValues).toSet.intersect(reserved)
    require(clash.isEmpty, s"column names reserved by asofJoin: $clash")

    val lStructCol = F.struct(left.columns.map(F.col).toSeq: _*)
    val rStructCol = F.struct(rightValues.map(F.col): _*)
    val lType = left.select(lStructCol).schema.head.dataType
    val rType = right.select(rStructCol).schema.head.dataType

    val lp = left.select(
      keys.map(F.col) ++ Seq(
        F.col(leftTime).as("__t"),
        F.lit(1).as("__side"),
        lStructCol.as("__l"),
        F.lit(null).cast(rType).as("__r")): _*)
    // NULL-key right rows would otherwise share a window partition with
    // NULL-key left rows (partitionBy groups NULLs), silently matching
    // where an equi-join would not
    val rp = right
      .filter(F.col(rightTime).isNotNull &&
        keys.map(F.col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(F.col) ++ Seq(
          F.col(rightTime).as("__t"),
          F.lit(0).as("__side"),
          F.lit(null).cast(lType).as("__l"),
          rStructCol.as("__r")): _*)

    // right rows sort before left rows at equal time (__side 0 < 1), so
    // a right row at exactly the left row's time is matched (inclusive)
    val w = Window
      .partitionBy(keys.map(F.col): _*)
      .orderBy(F.col("__t").asc_nulls_first, F.col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lp.union(rp)
      .withColumn("__m", F.last(F.col("__r"), ignoreNulls = true).over(w))
      .filter(F.col("__side") === 1)
      .select(
        left.columns.map(c => F.col(s"__l.$c").as(c)).toSeq ++
          rightValues.map(c => F.col(s"__m.$c").as(c)): _*)
  }

  /**
   * Skew-resistant as-of join: the callable form of the salting escape
   * hatch. A hot key floods a single window partition in [[asofJoin]];
   * here the left side is split across `saltBuckets` sub-partitions
   * (salted by a hash of the left timestamp, so the hot key's rows
   * spread evenly) and the right side is replicated into every bucket —
   * each bucket then holds the full right history and resolves its left
   * rows independently. Results are identical to [[asofJoin]].
   *
   * Cost model: right side is written `saltBuckets` times into the one
   * shuffle (still exactly one hash exchange — pinned by PlanShapeSpec).
   * Use when the left side is orders of magnitude larger than the right
   * within the skewed keys — the common telemetry shape (billions of
   * clicks against thousands of dimension updates).
   */
  def asofJoinSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 2, s"saltBuckets must be >= 2, got $saltBuckets")
    require(!left.columns.contains("__salt") && !rightValues.contains("__salt"),
      "column name __salt is reserved by asofJoinSalted")
    val ls = left.withColumn("__salt",
      F.pmod(F.hash(F.col(leftTime)), F.lit(saltBuckets)))
    val rs = right.withColumn("__salt",
      F.explode(F.sequence(F.lit(0), F.lit(saltBuckets - 1))))
    asofJoin(ls, rs, keys :+ "__salt", leftTime, rightTime, rightValues)
      .drop("__salt")
  }
}
