package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed parquet sink — the layout that deletes the shuffle.
 *
 * At 100 TB the dominant cost of a fact-to-fact join (orders x
 * lineitem, doc x doc-signature) is the pair of hash exchanges. If both
 * sides are WRITTEN bucketed by the join key with the same bucket
 * count, Spark's scan reports `HashPartitioning(key, n)` and
 * EnsureRequirements inserts NO exchange: the join runs bucket-by-
 * bucket, each task reading one bucket file from each side. The shuffle
 * is paid once at write time (by the job that produced the table) and
 * amortized over every subsequent join, which is the right trade
 * whenever a table is joined on the same key more than once.
 *
 * `sortBy` additionally orders rows inside each bucket file so a
 * sort-merge join can skip its sort when files-per-bucket is 1 —
 * `writeBucketed` repartitions on the bucket columns first to get
 * exactly that layout.
 */
object Bucketed {

  /**
   * Write `df` as a bucketed (and optionally bucket-sorted) parquet
   * table registered in the session catalog. Bucket metadata only
   * survives through `saveAsTable` — a plain `.parquet(path)` write
   * silently drops it. The pre-write `repartition` on the bucket
   * columns yields one file per bucket, which is what lets the scan
   * report both the partitioning AND the sort order downstream.
   */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      path: Option[String] = None): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    if (path.isEmpty) {
      // a stale managed-table directory (from an earlier session whose
      // in-memory catalog is gone) makes saveAsTable throw
      // LOCATION_ALREADY_EXISTS — clear it before writing
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val cols = bucketCols.map(df.col)
    var w = df.repartition(numBuckets, cols: _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }

  /** Co-located equi-join of two tables bucketed on their join keys:
    * zero exchanges when both sides were written with the same bucket
    * count (pinned by PlanShapeSpec). */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      joinExpr: org.apache.spark.sql.Column,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), joinExpr, joinType)
}
