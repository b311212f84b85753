package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Parquet compaction — the small-files cure: rewrite a directory of
 * many small parquet files into ~targetBytes files, atomically (write
 * to a sibling temp dir, then swap). A 100 TB table accumulating
 * thousands of KB-sized files per ingest hour pays for them on every
 * scan (task-per-file scheduling, footer reads, no row-group
 * parallelism); compaction restores scan-friendly file sizes without
 * touching row content.
 *
 * File count = ceil(currentBytes / targetBytes) from the REAL on-disk
 * footprint (no compression-ratio guessing); the rewrite is one
 * round-robin repartition — no shuffle key, no skew. Content is
 * preserved exactly (same rows, same schema); only layout changes.
 */
object Compaction {

  /** On-disk byte size of a path (recursive). */
  def pathBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** Number of parquet part-files under a path. */
  def partFileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /**
   * Compact `path` in place to ~`targetBytes` per file. Returns the
   * resulting part-file count. The rewrite goes to `<path>__compact`
   * first; the swap then renames the original aside to `<path>__old`,
   * promotes the rewrite, and deletes `<path>__old` LAST — so at every
   * step the rows live in a complete directory: a crash mid-write
   * leaves the original untouched, and a crash mid-swap leaves either
   * the original (at `path` or parked at `<path>__old`) or the
   * promoted rewrite. Every rename/delete return code is checked; a
   * failed promotion restores the original before throwing. Note the
   * two renames are not one atomic unit on HDFS/object stores —
   * readers concurrent with the swap can see `path` briefly absent;
   * run compaction in the table's maintenance window.
   */
  def compact(spark: SparkSession, path: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val total = pathBytes(spark, path)
    val nFiles = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val tmp = path.stripSuffix("/") + "__compact"
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp)
    promote(spark, tmp, path)
    partFileCount(spark, path)
  }

  /** The swap half of [[compact]], reusable by any rewrite-then-replace
    * maintenance (flat-index takedowns): park the original at
    * `<path>__old`, promote `tmp` to `path`, delete the parked copy
    * LAST — every step leaves the rows in a complete directory, every
    * rename/delete return code is checked, and a failed promotion
    * restores the original before throwing. A crash BEFORE the call
    * (tmp written, swap not started) leaves the original untouched. */
  private[graft] def promote(spark: SparkSession, tmp: String, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val t = new org.apache.hadoop.fs.Path(tmp)
    val old = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__old")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"promote: cannot clear stale $old")
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"promote: cannot park original: $path -> $old")
    if (!fs.rename(t, p)) {
      // promotion failed: put the original back before giving up
      if (!fs.rename(old, p))
        throw new java.io.IOException(
          s"promote swap failed AND restore failed — original data is at $old")
      throw new java.io.IOException(s"promote swap failed: $tmp -> $path")
    }
    if (!fs.delete(old, true))
      throw new java.io.IOException(
        s"promote succeeded but could not delete the parked original $old")
  }

  /** Convenience: write `df` fragmented (for tests/demos) — n files
    * regardless of size. */
  def writeFragmented(df: DataFrame, path: String, nFiles: Int): Unit =
    df.repartition(nFiles).write.mode("overwrite").parquet(path)
}
