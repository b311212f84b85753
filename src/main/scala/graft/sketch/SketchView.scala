package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

/**
 * Persisted, incrementally-maintained sketch rollup — the
 * observability materialized view behind the reference's hourly/daily
 * pattern (reference README.md:189-199), made NIGHTLY-SAFE at corpus
 * scale with a merge-on-read layout:
 *
 *   - [[materialize]] writes per-(time bucket, keys) sketch rows
 *     (DDSketch by default; any [[ViewFamily]] — KMV uniques, CMS
 *     frequencies, TopK heavy hitters, Bloom membership) as
 *     parquet, PARTITIONED BY a coarser `__part` directory key (pure
 *     long math: `bucket_ms - bucket_ms mod partSpanMs`, one UTC day
 *     by default — fine rows, bounded directories; hour-grain
 *     directories are the classic tiny-partition pathology).
 *   - [[append]] rolls up ONLY the fresh event batch and appends the
 *     pre-aggregated rows under the touched partitions — a pure add:
 *     no read-modify-write of history, no partition rewrite, so
 *     concurrent readers never see a half-replaced partition and the
 *     append cost is O(batch) regardless of view size.
 *   - [[read]] / [[readRange]] merge the (few) per-batch rows of each
 *     (bucket, keys) group with `ddsketch_agg` — cheap because
 *     sketches are mergeable monoids with EXACT bin addition (see
 *     [[SketchOps.saltedSketchAgg]]), which also makes the incremental
 *     view BYTE-IDENTICAL to a from-scratch rebuild (pinned by
 *     SketchViewSpec). `readRange` derives the `__part` predicate with
 *     the same long math, so a dashboard's time window prunes the scan
 *     to its partitions.
 *   - [[compact]] rewrites the view to one row per (bucket, keys) when
 *     the per-group row count (one per append batch) grows enough to
 *     matter; it is maintenance, never required for correctness.
 *   - [[regrain]] answers coarser-grain queries (hour → day/week) by
 *     merging persisted sketches instead of rescanning events.
 *
 * `partSpanMs` is part of the on-disk layout: use the same value for
 * every call against one path (the default suits hour/minute buckets).
 */
object SketchView {

  /** One UTC day — the default partition-directory span. */
  val DefaultPartSpanMs: Long = 86400000L

  /** A mergeable sketch family pluggable into the view: `build` is
    * the value→sketch aggregate, `merge` the sketch→sketch merge
    * aggregate. Any pair whose merge is the monoid combine of builds
    * keeps the view ≡ rebuild guarantee (byte-identical for every
    * family here except TopK, whose combine is order-sensitively
    * approximate — its view is still a valid TopK of the union). */
  final case class ViewFamily(build: Column => Column, merge: Column => Column)

  object ViewFamily {
    /** Quantiles (the default): DDSketch values → mergeable sketch. */
    def ddsketch(accuracy: Double = 0.01): ViewFamily =
      ViewFamily(G.ddsketch_agg_values(_, accuracy), G.ddsketch_agg)
    /** Distinct counts: "daily uniques from hourly sketches". */
    def kmvDistinct(k: Int = KmvSketch.DefaultK): ViewFamily =
      ViewFamily(kmv.kmv_agg(_, k), kmv.kmv_merge_agg)
    /** Frequency estimates (Count-Min). */
    def cmsFrequency(
        eps: Double = cms.DefaultEps,
        confidence: Double = cms.DefaultConfidence): ViewFamily =
      ViewFamily(cms.cms_agg(_, eps, confidence), cms.cms_merge_agg)
    /** Heavy hitters (space-saving TopK). */
    def topkItems(capacity: Int = TopKSketch.DefaultCapacity): ViewFamily =
      ViewFamily(topk.topk_agg(_, capacity), topk.topk_merge_agg)
    /** Membership (Bloom OR). */
    def bloomMembership(
        expectedItems: Long = bloom.DefaultItems,
        fpp: Double = bloom.DefaultFpp): ViewFamily =
      ViewFamily(bloom.bloom_agg(_, expectedItems, fpp), bloom.bloom_merge_agg)
  }

  /** Roll one event frame up to (`bucket_ms`, keys..., `sketch`). The
    * bucket is the epoch-millis long of the truncated timestamp (a
    * stable, timezone-free key). NULL values are skipped by the
    * aggregate; rows with a NULL timestamp are dropped (no bucket to
    * land in). */
  def rollup(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      bucket: String = "hour",
      family: ViewFamily = ViewFamily.ddsketch()): DataFrame =
    events.filter(F.col(tsCol).isNotNull)
      .groupBy(F.unix_millis(F.date_trunc(bucket, F.col(tsCol))).as("bucket_ms") +:
        keyCols.map(F.col): _*)
      .agg(family.build(F.col(valueCol)).as("sketch"))

  /** Create (or replace) the persisted view from a full event scan. */
  def materialize(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      path: String,
      bucket: String = "hour",
      family: ViewFamily = ViewFamily.ddsketch(),
      partSpanMs: Long = DefaultPartSpanMs): Unit =
    writeView(rollup(events, tsCol, keyCols, valueCol, bucket, family),
      path, "overwrite", partSpanMs)

  /** The directory key of a bucket: pure long floor, identical on the
    * driver (readRange pruning) and in the plan — no timezone, no
    * date library (the RangeJoin bucketing precedent). */
  private def partFloor(ms: Long, spanMs: Long): Long =
    ms - java.lang.Math.floorMod(ms, spanMs)

  /** Cluster each directory partition into one task before the
    * partitioned write: without it every reducer of the rollup's
    * (bucket, keys) hash holds a slice of MANY partitions and opens a
    * file per slice — tasks × partitions small files. After the
    * repartition each batch writes one file per touched partition, and
    * the extra exchange moves only sketch rows (thousands of × smaller
    * than the events).
    *
    * Layout: `path/__part=<floor>/__batch=<id>/part-*.parquet`. Batch
    * maintenance writes `__batch=-1`; [[streamAppend]] stamps the
    * micro-batch id and overwrites DYNAMICALLY, so a replayed batch
    * replaces exactly its own directories (idempotent on
    * at-least-once delivery). */
  private def writeView(
      rollup: DataFrame, path: String, mode: String, partSpanMs: Long,
      batchId: Long = -1L, dynamic: Boolean = false): Unit =
    rollup
      .withColumn("__part",
        F.col("bucket_ms") - F.pmod(F.col("bucket_ms"), F.lit(partSpanMs)))
      .withColumn("__batch", F.lit(batchId))
      .repartition(F.col("__part"))
      .write.partitionBy("__part", "__batch")
      .option("partitionOverwriteMode", if (dynamic) "dynamic" else "static")
      .mode(mode).parquet(path)

  /** The merged view: one row per (bucket_ms, keys) with the sketch of
    * every batch ever appended, plus the reconstructed `bucket_start`
    * timestamp. For a time window use [[readRange]] — it prunes the
    * scan to the window's partitions. */
  def read(spark: SparkSession, path: String, keyCols: Seq[String],
      family: ViewFamily = ViewFamily.ddsketch()): DataFrame =
    merge(spark.read.parquet(path), keyCols, family)

  /** [[read]] restricted to `fromMs <= bucket_ms < untilMs`, with the
    * matching `__part` predicate derived by the same long math so the
    * parquet scan lists only the window's directories. */
  def readRange(
      spark: SparkSession,
      path: String,
      keyCols: Seq[String],
      fromMs: Long,
      untilMs: Long,
      family: ViewFamily = ViewFamily.ddsketch(),
      partSpanMs: Long = DefaultPartSpanMs): DataFrame =
    merge(
      spark.read.parquet(path)
        .filter(F.col("__part") >= partFloor(fromMs, partSpanMs) &&
                F.col("__part") < untilMs &&
                F.col("bucket_ms") >= fromMs && F.col("bucket_ms") < untilMs),
      keyCols, family)

  private def merge(
      raw: DataFrame, keyCols: Seq[String], family: ViewFamily): DataFrame =
    raw
      .groupBy(F.col("bucket_ms") +: keyCols.map(F.col): _*)
      .agg(family.merge(F.col("sketch")).as("sketch"))
      .withColumn("bucket_start", F.timestamp_millis(F.col("bucket_ms")))

  /** Incremental maintenance: roll up the fresh batch and APPEND the
    * pre-aggregated rows — new files only under the touched
    * partitions. History is never read or rewritten. */
  def append(
      fresh: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      path: String,
      bucket: String = "hour",
      family: ViewFamily = ViewFamily.ddsketch(),
      partSpanMs: Long = DefaultPartSpanMs): Unit =
    writeView(rollup(fresh, tsCol, keyCols, valueCol, bucket, family),
      path, "append", partSpanMs)

  /** Rewrite the view to one row per (bucket, keys). The merged frame
    * must be materialized BEFORE the overwrite truncates its own
    * input — the eager localCheckpoint is the point here, not a
    * surprise (the library-wide lazy default is for operator chains). */
  def compact(
      spark: SparkSession,
      path: String,
      keyCols: Seq[String],
      family: ViewFamily = ViewFamily.ddsketch(),
      partSpanMs: Long = DefaultPartSpanMs): Unit =
    writeView(
      read(spark, path, keyCols, family).drop("bucket_start")
        .localCheckpoint(true),
      path, "overwrite", partSpanMs)

  /** Continuous maintenance: a foreachBatch sink that rolls each
    * micro-batch up and lands it under its own `__batch` partition
    * with dynamic overwrite — a replayed micro-batch replaces exactly
    * its own files, so the view stays correct (effectively-once) on
    * Structured Streaming's at-least-once foreachBatch contract. One
    * streaming writer per path (batch ids would collide otherwise);
    * batch [[append]]s (`__batch=-1`) can interleave safely.
    *
    * Returns the writer — set trigger/checkpoint and `.start()`. */
  def streamAppend(
      stream: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      path: String,
      bucket: String = "hour",
      family: ViewFamily = ViewFamily.ddsketch(),
      partSpanMs: Long = DefaultPartSpanMs)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, tsCol, keyCols, valueCol, path, bucket, family,
          partSpanMs, batchId)
    }

  /** One micro-batch of [[streamAppend]] (exposed for replay tests). */
  private[sketch] def appendBatch(
      batch: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      path: String,
      bucket: String,
      family: ViewFamily,
      partSpanMs: Long,
      batchId: Long): Unit =
    writeView(rollup(batch, tsCol, keyCols, valueCol, bucket, family),
      path, "overwrite", partSpanMs, batchId, dynamic = true)

  /** Repair/backfill: replace the view's content for the partition
    * range `[fromMs, untilMs)` with a fresh rollup of `events` — the
    * one operation that rewrites history, for late data or an
    * upstream fix that invalidated a window. The range must align to
    * `partSpanMs` (whole directories are dropped — every batch in the
    * range, so stale stream appends can't double-count). Events
    * outside the range are ignored. */
  def backfill(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      path: String,
      fromMs: Long,
      untilMs: Long,
      bucket: String = "hour",
      family: ViewFamily = ViewFamily.ddsketch(),
      partSpanMs: Long = DefaultPartSpanMs): Unit = {
    require(partFloor(fromMs, partSpanMs) == fromMs &&
        partFloor(untilMs, partSpanMs) == untilMs,
      s"backfill range must align to partSpanMs=$partSpanMs")
    val spark = events.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("__part=")) {
        val p = scala.util.Try(name.stripPrefix("__part=").toLong).toOption
        if (p.exists(v => v >= fromMs && v < untilMs))
          fs.delete(st.getPath, true)
      }
    }
    append(
      events.filter(F.unix_millis(F.col(tsCol)) >= fromMs &&
        F.unix_millis(F.col(tsCol)) < untilMs),
      tsCol, keyCols, valueCol, path, bucket, family, partSpanMs)
  }

  /** Retention: drop every `__part` directory strictly OLDER than
    * `keepFromMs`'s partition (directory-level deletes — no file
    * rewrite, no scan; the same long-math floor as [[readRange]]).
    * Safe against concurrent readers of the kept range. Returns the
    * number of partitions dropped. */
  def expire(
      spark: SparkSession,
      path: String,
      keepFromMs: Long,
      partSpanMs: Long = DefaultPartSpanMs): Int = {
    val floor = partFloor(keepFromMs, partSpanMs)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) 0
    else
      fs.listStatus(root).toSeq.count { st =>
        val name = st.getPath.getName
        st.isDirectory && name.startsWith("__part=") &&
          scala.util.Try(name.stripPrefix("__part=").toLong)
            .toOption.exists(_ < floor) && {
            fs.delete(st.getPath, true); true
          }
      }
  }

  /** Merge a view (or any rollup frame) to a coarser grain — the
    * hour → day/week dashboard query, answered from sketches alone. */
  def regrain(view: DataFrame, keyCols: Seq[String], grain: String,
      family: ViewFamily = ViewFamily.ddsketch()): DataFrame =
    view
      .groupBy(F.unix_millis(F.date_trunc(grain,
          F.timestamp_millis(F.col("bucket_ms")))).as("bucket_ms") +:
        keyCols.map(F.col): _*)
      .agg(family.merge(F.col("sketch")).as("sketch"))
      .withColumn("bucket_start", F.timestamp_millis(F.col("bucket_ms")))
}
