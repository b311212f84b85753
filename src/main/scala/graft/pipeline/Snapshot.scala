package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Snapshot maintenance for continuously re-ingested corpora: a crawl
 * that re-fetches pages, a feed that re-delivers records, a CDC tail
 * of row-level upserts. The core operation is "latest version wins,
 * per key" — and the scale shape here is deliberately DIFFERENT from
 * [[Dedup.keepCanonical]]'s ranked window:
 *
 *   - `keepCanonical` shuffles EVERY row to its key's partition and
 *     sorts there (row_number). Right when the caller needs runners-up
 *     or an arbitrary multi-column preference order.
 *   - `latestByKey` is a `max_by(struct(row), struct(version, tie))`
 *     aggregate: a declarative aggregate with a partial-merge phase
 *     (planned as a SortAggregate for the struct-typed buffer), so
 *     each map task reduces its local duplicates BEFORE the
 *     exchange. On a snapshot+delta merge — billions of keys, a
 *     handful of versions each, duplicates concentrated in the delta —
 *     map-side combine ships one row per (task, key) instead of every
 *     version, and no per-partition sort ever happens.
 *
 * Determinism contract: `(version, tiebreak)` must be unique per key
 * (pass a unique id as the tiebreak); `max_by` on the packed struct
 * then has a single maximum, identical in any execution order.
 */
object Snapshot {

  /**
   * One surviving row per key: the row whose `(version, tiebreak)`
   * struct is the maximum. Input columns pass through unchanged (the
   * whole row rides inside the max_by payload struct).
   *
   * Streaming-compatible as-is: on a streaming DataFrame this plans
   * as a stateful aggregation (complete/update output modes) whose
   * state is ONE packed row per key — the continuously-maintained
   * "current snapshot" of a CDC tail, never event-count-sized.
   * Gate-verified by `q_stream_latest`.
   */
  def latestByKey(
      df: DataFrame,
      key: Column,
      version: Column,
      tiebreak: Column): DataFrame = {
    val cols = df.columns.map(F.col)
    df.groupBy(key.as("__k"))
      .agg(F.max_by(F.struct(cols: _*), F.struct(version, tiebreak)).as("__row"))
      .select(F.col("__row.*"))
  }

  /**
   * Upsert a delta batch into a base snapshot: rows in `updates`
   * replace base rows with the same key when their version is newer;
   * equal versions resolve to the UPDATE side (the usual CDC
   * convention — a re-delivered record with the same version is the
   * correction). Ties are broken by a synthetic source-priority column
   * inside the version struct, so the caller's own tiebreak only
   * orders within one side.
   *
   * Both inputs must share a schema (`unionByName`); the output is the
   * merged snapshot with the same schema.
   */
  def mergeSnapshot(
      base: DataFrame,
      updates: DataFrame,
      key: Column,
      version: Column,
      tiebreak: Column): DataFrame = {
    val pri = "__src_priority"
    val tagged = base.withColumn(pri, F.lit(0))
      .unionByName(updates.withColumn(pri, F.lit(1)))
    latestByKey(tagged, key, F.struct(version, F.col(pri)), tiebreak)
      .drop(pri)
  }

  /**
   * Upsert with deletions: rows whose `deleted` flag is true act as
   * tombstones — they win the per-key version race like any other
   * update, then the key is dropped from the merged snapshot. The
   * output never contains the tombstone column's true rows, so
   * repeated merges are idempotent as long as tombstones keep being
   * re-delivered or the base has already forgotten the key.
   */
  def mergeSnapshotWithDeletes(
      base: DataFrame,
      updates: DataFrame,
      key: Column,
      version: Column,
      tiebreak: Column,
      deleted: Column): DataFrame =
    mergeSnapshot(base, updates, key, version, tiebreak)
      .filter(deleted.isNull || !deleted)

  /**
   * Crawl-over-crawl delta: classify every key across two snapshots as
   * `added` (new only), `removed` (old only), `changed` (both, content
   * hash differs) or `unchanged` — the nightly what-moved report and
   * the input to incremental reprocessing (re-embed/re-index only the
   * added+changed slice instead of the whole crawl).
   *
   * Content comparison is by sha2 over the `contentCols`, so only
   * (key, 32-byte hash) pairs shuffle — never the payloads. Each
   * column is hashed INDEPENDENTLY first (fixed-width 64-hex tokens,
   * NULL -> a non-hex one-char sentinel), then the token concatenation
   * is hashed: no value containing a separator/sentinel character can
   * alias a different column split or a NULL, so distinct content never
   * reports `unchanged` (short of a sha2 collision). One
   * full-outer hash join on the key. Keys must be unique per snapshot
   * ([[latestByKey]] first if not); duplicate keys would cross-join
   * multiplicatively like any keyed join.
   */
  def diffSnapshots(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    def hashed(df: DataFrame, out: String): DataFrame =
      df.select(F.col(keyCol).as("__k"),
        F.sha2(F.concat(
          contentCols.map(c =>
            F.coalesce(F.sha2(F.col(c).cast("string"), 256), F.lit("\u0000"))): _*), 256)
          .as(out))
    hashed(oldSnap, "__oh").join(hashed(newSnap, "__nh"), Seq("__k"), "full_outer")
      .select(F.col("__k").as(keyCol),
        F.when(F.col("__oh").isNull, "added")
          .when(F.col("__nh").isNull, "removed")
          .when(F.col("__oh") === F.col("__nh"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** The per-row 60-bit manifest token over `cols`: each column md5'd
    * independently (fixed-width hex tokens, non-hex NULL sentinel —
    * the [[diffSnapshots]] tuple-encoding rule), the concatenation
    * md5'd again, truncated to 15 hex chars and parsed as a positive
    * BIGINT. Every step replays verbatim in ANSI SQL, so manifests are
    * cross-engine checkable. */
  def manifestToken(cols: Seq[Column]): Column =
    // the NULL sentinel must be NON-EMPTY and non-hex: with an empty
    // sentinel, (a, NULL) and (NULL, a) would both concatenate to
    // md5(a) and alias
    F.conv(F.substring(F.md5(F.concat(
      cols.map(c => F.coalesce(F.md5(c.cast("string")), F.lit("\u0001"))): _*)),
      1, 15), 16, 10).cast("long")

  /**
   * Corpus content manifest — the dataset-versioning primitive: one
   * row per group (source, shard, split, ...) carrying the exact row
   * count and an ORDER-INDEPENDENT content hash: bit_xor of the
   * per-row [[manifestToken]]s. Two corpora with identical grouped
   * content produce identical manifests regardless of partitioning,
   * file layout, or row order; a single flipped byte flips the hash
   * (short of an md5-prefix collision, ~n²/2^61 per group).
   *
   * Scale shape: ONE map-side-combined exchange whose keys are the
   * groups — xor commutes and never overflows (the
   * [[Dedup.duplicateClusters]] signature convention), so partial
   * aggregation folds each task's rows locally and the manifest of an
   * incremental batch xors into a stored manifest without rescanning
   * history. Returns (groupCols..., n_rows, content_hash).
   */
  def manifest(
      df: DataFrame,
      groupCols: Seq[String],
      hashCols: Seq[String]): DataFrame = {
    require(hashCols.nonEmpty, "need at least one hash column")
    val tok = manifestToken(hashCols.map(F.col))
    df.groupBy(groupCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n_rows"),
        F.coalesce(F.bit_xor(tok), F.lit(0L)).as("content_hash"))
  }

  /**
   * Compare two manifests group-by-group: `added` / `removed` /
   * `changed` (count or hash differs) / `unchanged` — [[diffSnapshots]]
   * lifted to whole dataset versions. Joins only the manifests (one
   * row per group), never the corpora.
   */
  def diffManifests(
      oldMan: DataFrame,
      newMan: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val o = oldMan.select(
      groupCols.map(F.col) ++
        Seq(F.col("n_rows").as("__on"), F.col("content_hash").as("__oh")): _*)
    val n = newMan.select(
      groupCols.map(F.col) ++
        Seq(F.col("n_rows").as("__nn"), F.col("content_hash").as("__nh")): _*)
    o.join(n, groupCols, "full_outer")
      .select(groupCols.map(F.col) :+
        F.when(F.col("__on").isNull, "added")
          .when(F.col("__nn").isNull, "removed")
          .when(F.col("__on") === F.col("__nn") &&
            F.col("__oh") === F.col("__nh"), "unchanged")
          .otherwise("changed").as("status"): _*)
  }

  /** Persist a manifest's base layer (`__batch=-1`, static overwrite). */
  def saveManifest(man: DataFrame, path: String): Unit =
    man.withColumn("__batch", F.lit(-1L))
      .repartition(1)
      .write.partitionBy("__batch").mode("overwrite")
      .parquet(s"$path/rows")

  /** One manifest delta: the batch's per-group (n_rows, content_hash)
    * lands under its own `__batch` partition. A real micro-batch id
    * writes with dynamic overwrite, so a replayed batch replaces its
    * own rows — CRITICAL for xor folding: an appended duplicate delta
    * would xor the batch's hash back OUT (x ^ x = 0) while
    * double-counting its rows. Batch maintenance uses `-1` file-adds. */
  def appendManifestBatch(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      batch: DataFrame,
      groupCols: Seq[String],
      hashCols: Seq[String],
      batchId: Long): Unit = {
    val man = manifest(batch, groupCols, hashCols)
    if (man.isEmpty) return // an all-empty batch writes nothing
    val w = man.withColumn("__batch", F.lit(batchId))
      .repartition(1)
      .write.partitionBy("__batch")
    (if (batchId == -1L) w.mode("append")
     else w.option("partitionOverwriteMode", "dynamic").mode("overwrite"))
      .parquet(s"$path/rows")
  }

  /** Continuously maintained manifest: a foreachBatch sink folding each
    * micro-batch's per-group delta under its own `__batch` partition —
    * replay-idempotent (effectively-once), the index `__batch` protocol
    * applied to dataset versioning. Returns the writer — set
    * trigger/checkpoint and `.start()`. */
  def streamManifest(
      stream: DataFrame,
      path: String,
      groupCols: Seq[String],
      hashCols: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        appendManifestBatch(batch.sparkSession, path, batch,
          groupCols, hashCols, batchId)
        ()
    }

  /** Fold a persisted manifest's delta rows into the current per-group
    * view: exact long sums for counts, xor for hashes — equals
    * [[manifest]] over the union of every ingested batch. */
  def loadManifest(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      groupCols: Seq[String]): DataFrame =
    spark.read.parquet(s"$path/rows")
      .groupBy(groupCols.map(F.col): _*)
      .agg(F.sum(F.col("n_rows")).as("n_rows"),
        F.coalesce(F.bit_xor(F.col("content_hash")), F.lit(0L)).as("content_hash"))
}
