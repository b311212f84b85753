package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/**
 * Deterministic sequence packing: batch shaping for training pipelines,
 * where documents are concatenated into fixed token-budget packs.
 *
 * Semantics: within each stratum, documents are laid out in `orderCol`
 * order and cut into contiguous packs at every `budget` tokens of the
 * running total — `pack_id = exclusive-prefix-sum div budget`. Every
 * pack except a stratum's last therefore carries at least
 * `budget - max_doc_tokens` tokens, documents are never reordered, and
 * the assignment is a pure function of (stratum, order, tokens) —
 * reproducible across runs, cluster sizes, and engines (one window
 * sum + an integer division). A document larger than the budget spans
 * several budget multiples and pushes the next document to a fresh
 * pack, so oversize documents get packs of their own (intermediate
 * pack ids are skipped, not reused).
 *
 * Scale shape: ONE hash exchange on the stratum column plus a
 * per-partition external sort — the same physical shape as any window
 * aggregation. Choose stratum granularity (e.g. source x date-hour) so
 * a stratum's documents fit one executor's spillable sort, exactly as
 * with any windowed operator.
 *
 * NULL discipline: rows with NULL token counts get a NULL pack_id and
 * consume no budget; rows with NULL strata pack together in the NULL
 * stratum (window partitioning groups NULLs).
 */
object Packing {

  /**
   * Adds `pack_id` (per-stratum pack ordinal from 0) and `pack_pos`
   * (position within the pack from 0). `tokensCol` must be numeric;
   * pack totals use long arithmetic.
   */
  def packSequences(
      df: DataFrame,
      stratumCol: Column,
      orderCol: Column,
      tokensCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val clash = df.columns.toSet.intersect(Set("pack_id", "pack_pos", "__cs"))
    require(clash.isEmpty, s"column names reserved by packSequences: $clash")

    val w = Window.partitionBy(stratumCol).orderBy(orderCol.asc_nulls_last)
    // exclusive prefix sum: the pack a document starts in
    val cs = F.coalesce(
      F.sum(tokensCol.cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)),
      F.lit(0L))
    val packed = df
      .withColumn("__cs", cs)
      .withColumn("pack_id",
        F.when(tokensCol.isNull, F.lit(null).cast("long"))
          .otherwise(F.expr(s"__cs div ${budget}L")))
    // pack_pos shares the window's partitioning and ordering, so both
    // window passes sit over the single exchange
    packed
      .withColumn("pack_pos",
        F.when(F.col("pack_id").isNull, F.lit(null).cast("long"))
          .otherwise(F.row_number().over(
            Window.partitionBy(stratumCol, F.col("pack_id"))
              .orderBy(orderCol.asc_nulls_last)).cast("long") - 1L))
      .drop("__cs")
  }
}
