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
 * == On-disk contract: the `_view.json` manifest ==
 *
 * The family, its geometry (accuracy/k/eps/confidence/capacity/fpp),
 * the bucket grain, `partSpanMs`, and the key columns are all part of
 * the on-disk layout — a reader probing a KMV view with the CMS
 * family, or tomorrow's `partSpanMs` against yesterday's directories,
 * would get SILENT garbage (merge aggregates skip mismatched blobs by
 * design, [[MergeAggExprs]]). So [[materialize]] records them in a
 * tiny `_view.json` at the view root (the leading underscore keeps it
 * out of Spark's data-file listing, like `_SUCCESS`), and every other
 * lifecycle call validates its own arguments against it, FAILING FAST
 * on mismatch. Manifest-less paths (pre-manifest layouts) are adopted:
 * the first maintenance call writes one. [[readAuto]] goes the other
 * way — it reads the view using only the manifest.
 *
 * == Maintenance concurrency contract ==
 *
 * `append`/`streamAppend` are pure file-adds and compose freely with
 * readers and each other (one STREAMING writer per path — batch ids
 * collide otherwise). ALL THREE maintenance ops run on FILE-LEVEL
 * SNAPSHOTS now: `compact` folds a snapshot of the whole view,
 * `backfill` replaces exactly the snapshot of its range (staged +
 * journaled like compact), `expire` deletes exactly its snapshot —
 * so a batch append landing at ANY point during any of them survives
 * (interleaved ≡ serialized, byte-exact; SketchViewSpec pins all
 * three), and a crashed compact/backfill is finished idempotently by
 * the next maintenance call ([[recoverPendingCompact]]). The three
 * ops take a shared single-maintainer lock (at most one at a time —
 * two racing would fold/prune overlapping snapshots); `backfill`
 * additionally requires the STREAMING writer stopped (see its note).
 * Readers are journal-aware ([[rawView]]) and [[readResilient]]
 * re-plans through a compact finishing mid-query.
 * The crash-replay hazard —
 * a micro-batch written but not yet committed to the checkpoint,
 * folded by a compact, then REPLAYED after restart — is closed by the
 * manifest's `foldedThroughBatch` watermark: compact records the
 * highest `__batch` id it folded, and a replayed micro-batch at or
 * below the watermark is a no-op instead of a double-count
 * (SketchViewSpec pins it).
 */
object SketchView {

  /** One UTC day — the default partition-directory span. */
  val DefaultPartSpanMs: Long = 86400000L

  /** A mergeable sketch family pluggable into the view: `build` is
    * the value→sketch aggregate, `merge` the sketch→sketch merge
    * aggregate, and (`id`, `geometry`) the manifest identity the
    * on-disk layout is validated against. Any pair whose merge is the
    * monoid combine of builds keeps the view ≡ rebuild guarantee
    * (byte-identical for every family here except TopK, whose combine
    * is order-sensitively approximate — its view is still a valid
    * TopK of the union). */
  final case class ViewFamily(
      id: String,
      geometry: Map[String, String],
      build: Column => Column,
      merge: Column => Column)

  object ViewFamily {
    /** Quantiles (the default): DDSketch values → mergeable sketch. */
    def ddsketch(accuracy: Double = 0.01): ViewFamily =
      ViewFamily("ddsketch", Map("accuracy" -> accuracy.toString),
        G.ddsketch_agg_values(_, accuracy), G.ddsketch_agg)
    /** Distinct counts: "daily uniques from hourly sketches". */
    def kmvDistinct(k: Int = KmvSketch.DefaultK): ViewFamily =
      ViewFamily("kmv", Map("k" -> k.toString),
        kmv.kmv_agg(_, k), kmv.kmv_merge_agg)
    /** Frequency estimates (Count-Min). */
    def cmsFrequency(
        eps: Double = cms.DefaultEps,
        confidence: Double = cms.DefaultConfidence): ViewFamily =
      ViewFamily("cms",
        Map("eps" -> eps.toString, "confidence" -> confidence.toString),
        cms.cms_agg(_, eps, confidence), cms.cms_merge_agg)
    /** Heavy hitters (space-saving TopK). */
    def topkItems(capacity: Int = TopKSketch.DefaultCapacity): ViewFamily =
      ViewFamily("topk", Map("capacity" -> capacity.toString),
        topk.topk_agg(_, capacity), topk.topk_merge_agg)
    /** Membership (Bloom OR). */
    def bloomMembership(
        expectedItems: Long = bloom.DefaultItems,
        fpp: Double = bloom.DefaultFpp): ViewFamily =
      ViewFamily("bloom",
        Map("expectedItems" -> expectedItems.toString, "fpp" -> fpp.toString),
        bloom.bloom_agg(_, expectedItems, fpp), bloom.bloom_merge_agg)

    /** Distinct counts via Spark's BUILT-IN Datasketches HLL — the
      * Spark-first sibling of [[kmvDistinct]] when ~2% estimates
      * suffice and memory must stay fixed (an HLL sketch is
      * 2^lgConfigK bytes-ish regardless of cardinality; KMV costs 8·k
      * bytes but is exact below k). Union-merge semantics come from
      * `hll_union_agg`; estimates are stable across merge order, but
      * the blob is NOT byte-canonical — compare estimates, never
      * bytes (unlike the exact families). */
    def hllDistinct(lgConfigK: Int = 12): ViewFamily =
      ViewFamily("hll", Map("lgConfigK" -> lgConfigK.toString),
        c => org.apache.spark.sql.functions.hll_sketch_agg(c, lgConfigK),
        sk => org.apache.spark.sql.functions.hll_union_agg(sk))

    /** EXACT weighted totals riding the DDSketch COUNT field: each
      * row adds its value as count WEIGHT, so `ddsketch_count` of the
      * merged view is the exact weighted sum — bin counts round-trip
      * the wire codec exactly for integers, while the format's value
      * sum is bin-reconstructed and approximate. The byte-total
      * family behind [[graft.pipeline.DataCard]]'s cards. */
    def weightedCount(accuracy: Double = 0.01): ViewFamily =
      ViewFamily("ddsketch_wcount", Map("accuracy" -> accuracy.toString),
        c => G.ddsketch_agg_weighted(
          org.apache.spark.sql.functions.lit(1.0), c, accuracy),
        G.ddsketch_agg)

    /** EXACT first/second moments — (n, Σx, Σx²) as a plain struct:
      * count/sum/mean/variance per bucket with no sketch at all, the
      * cheapest family when quantiles aren't needed. Merges are field
      * sums (a perfect monoid; integer-valued inputs stay EXACT below
      * 2^53 through any merge schedule). Probe with
      * [[SketchOps.momentsMean]] / [[SketchOps.momentsVariance]]. */
    def moments(): ViewFamily =
      ViewFamily("moments", Map.empty,
        c => {
          val d = c.cast("double")
          org.apache.spark.sql.functions.struct(
            org.apache.spark.sql.functions.count(d).as("n"),
            org.apache.spark.sql.functions.sum(d).as("s"),
            org.apache.spark.sql.functions.sum(d * d).as("s2"))
        },
        sk => org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.sum(sk.getField("n")).as("n"),
          org.apache.spark.sql.functions.sum(sk.getField("s")).as("s"),
          org.apache.spark.sql.functions.sum(sk.getField("s2")).as("s2")))

    /** Reconstruct a built-in family from its manifest identity (the
      * [[readAuto]] path). Custom families can't be rebuilt from a
      * manifest — pass them explicitly to [[read]]. */
    def fromManifest(id: String, geometry: Map[String, String]): ViewFamily =
      id match {
        case "ddsketch" => ddsketch(geometry("accuracy").toDouble)
        case "kmv"      => kmvDistinct(geometry("k").toInt)
        case "cms" =>
          cmsFrequency(geometry("eps").toDouble, geometry("confidence").toDouble)
        case "topk"  => topkItems(geometry("capacity").toInt)
        case "bloom" =>
          bloomMembership(geometry("expectedItems").toLong, geometry("fpp").toDouble)
        case "moments" => moments()
        case "hll" => hllDistinct(geometry("lgConfigK").toInt)
        case "ddsketch_wcount" => weightedCount(geometry("accuracy").toDouble)
        case other =>
          throw new IllegalArgumentException(s"unknown view family '$other'")
      }
  }

  /** The recorded on-disk contract of a view (see the class note).
    * `foldedThroughBatch` is the compact watermark: every streaming
    * `__batch` id <= it has been folded into the `__batch=-1` rows,
    * so a crash-replay of one of those ids must write nothing. */
  final case class ViewManifest(
      family: String,
      geometry: Map[String, String],
      bucket: String,
      partSpanMs: Long,
      keyCols: Seq[String],
      foldedThroughBatch: Long)

  private val ManifestFile = "_view.json"

  /** The view's manifest, when one exists (views created before the
    * manifest layer have none until the next maintenance call). */
  def readManifest(spark: SparkSession, path: String): Option[ViewManifest] = {
    val p = new org.apache.hadoop.fs.Path(path, ManifestFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes =
        try {
          val len = fs.getFileStatus(p).getLen.toInt
          val b = new Array[Byte](len)
          in.readFully(0L, b)
          b
        } finally in.close()
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(bytes, "UTF-8"))
      def strings(node: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
        (0 until node.size()).map(i => node.get(i).asText())
      val geomNode = root.get("geometry")
      val geom = scala.collection.immutable.ListMap(
        geomNode.fieldNames().asScala().map(k => k -> geomNode.get(k).asText()): _*)
      Some(ViewManifest(
        root.get("family").asText(),
        geom,
        root.get("bucket").asText(),
        root.get("partSpanMs").asLong(),
        strings(root.get("keyCols")),
        root.get("foldedThroughBatch").asLong()))
    }
  }

  // scala 2.13 has .asScala via CollectionConverters; keep the import local
  implicit private class JIter[A](it: java.util.Iterator[A]) {
    def asScala(): Seq[A] = {
      val b = Seq.newBuilder[A]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  private def writeManifest(
      spark: SparkSession, path: String, m: ViewManifest): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("family", m.family)
    val geom = root.putObject("geometry")
    m.geometry.foreach { case (k, v) => geom.put(k, v) }
    root.put("bucket", m.bucket)
    root.put("partSpanMs", m.partSpanMs)
    val keys = root.putArray("keyCols")
    m.keyCols.foreach(keys.add)
    root.put("foldedThroughBatch", m.foldedThroughBatch)
    val p = new org.apache.hadoop.fs.Path(path, ManifestFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(om.writeValueAsBytes(root)) finally out.close()
  }

  /** Validate call arguments against the recorded contract, fail-fast
    * on any mismatch. `bucket = None` for calls that don't roll up
    * (reads). Returns the manifest when one exists. */
  private def validateManifest(
      spark: SparkSession,
      path: String,
      family: ViewFamily,
      bucket: Option[String],
      partSpanMs: Long,
      keyCols: Seq[String]): Option[ViewManifest] =
    readManifest(spark, path).map { m =>
      def fail(what: String, want: Any, got: Any): Nothing =
        throw new IllegalArgumentException(
          s"view at $path was created with $what=$want, called with $got " +
            s"(the $ManifestFile manifest records the on-disk layout; " +
            "mismatched merges would be silently skipped)")
      if (m.family != family.id) fail("family", m.family, family.id)
      if (m.geometry != family.geometry)
        fail("geometry", m.geometry, family.geometry)
      bucket.foreach(b => if (m.bucket != b) fail("bucket", m.bucket, b))
      if (m.partSpanMs != partSpanMs)
        fail("partSpanMs", m.partSpanMs, partSpanMs)
      if (m.keyCols != keyCols) fail("keyCols", m.keyCols, keyCols)
      m
    }

  /** Validate when present; ADOPT (write) the manifest when absent —
    * the upgrade path for pre-manifest views, and the create path for
    * append-first layouts (streaming to a fresh directory). */
  private def validateOrAdopt(
      spark: SparkSession,
      path: String,
      family: ViewFamily,
      bucket: String,
      partSpanMs: Long,
      keyCols: Seq[String]): ViewManifest =
    validateManifest(spark, path, family, Some(bucket), partSpanMs, keyCols)
      .getOrElse {
        val m = ViewManifest(family.id, family.geometry, bucket, partSpanMs,
          keyCols, -1L)
        writeManifest(spark, path, m)
        m
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

  /** Create (or replace) the persisted view from a full event scan.
    * Writes the `_view.json` manifest recording the layout. */
  def materialize(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      path: String,
      bucket: String = "hour",
      family: ViewFamily = ViewFamily.ddsketch(),
      partSpanMs: Long = DefaultPartSpanMs): Unit = {
    writeView(rollup(events, tsCol, keyCols, valueCol, bucket, family),
      path, "overwrite", partSpanMs)
    // after the overwrite (static overwrite clears the directory)
    writeManifest(events.sparkSession, path,
      ViewManifest(family.id, family.geometry, bucket, partSpanMs, keyCols, -1L))
  }

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

  /** The view's raw rows, CONSISTENT through a compact's recovery
    * window: normally a plain directory read, but when a compact
    * journal (`_compact_pending.json`) is present — a compact crashed
    * (or is finishing right now) after its fold committed — a plain
    * listing could see the folded history HALF-pruned with no error.
    * The journaled file set and the staged fold are then the truth:
    * read (current files − journaled set) ∪ staged fold files, which
    * equals the post-compact view exactly regardless of how far the
    * prune got. Readers racing finishCompact's rename phase can still
    * hit missing staged files — that window FAILS (never silently
    * under-counts) and [[readResilient]] re-plans through it. */
  private def rawView(spark: SparkSession, path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readPendingJournal(fs, root).flatten match {
      case Some((journaled, _)) =>
        val doomed = journaled.toSet
        val survivors = listDataFiles(fs, root).filterNot(doomed)
        val stagingRoot = s"$path/$FoldStaging"
        val staged =
          listDataFiles(fs, new org.apache.hadoop.fs.Path(stagingRoot))
        val frames = Seq(
          if (survivors.isEmpty) None
          else Some(spark.read.option("basePath", path)
            .parquet(survivors.map(rel => s"$path/$rel"): _*)),
          if (staged.isEmpty) None
          else Some(spark.read.option("basePath", stagingRoot)
            .parquet(staged.map(rel => s"$stagingRoot/$rel"): _*))).flatten
        frames.reduceOption(_.unionByName(_))
          .getOrElse(spark.read.parquet(path))
      case None => spark.read.parquet(path)
    }
  }

  /** The merged view: one row per (bucket_ms, keys) with the sketch of
    * every batch ever appended, plus the reconstructed `bucket_start`
    * timestamp. For a time window use [[readRange]] — it prunes the
    * scan to the window's partitions. Fails fast when `family` or
    * `keyCols` contradict the view's manifest. */
  def read(spark: SparkSession, path: String, keyCols: Seq[String],
      family: ViewFamily = ViewFamily.ddsketch()): DataFrame = {
    readManifest(spark, path).foreach { m =>
      validateManifest(spark, path, family, None, m.partSpanMs, keyCols)
    }
    merge(rawView(spark, path), keyCols, family)
  }

  /** Execute `action` over a freshly planned [[read]], RE-PLANNING
    * (bounded) when a concurrent [[compact]] prunes planned files
    * between plan and execution — the hot-dashboard-during-nightly-
    * compact race. A missing-file failure means the listing went
    * stale; once the compact finishes, a re-planned read is stable
    * (and mid-recovery plans are already consistent via the journal,
    * see [[rawView]]). Non-file-loss failures propagate unchanged. */
  def readResilient[T](
      spark: SparkSession,
      path: String,
      keyCols: Seq[String],
      family: ViewFamily = ViewFamily.ddsketch(),
      attempts: Int = 3)(action: DataFrame => T): T = {
    var tryNo = 0
    var out: Option[T] = None
    while (out.isEmpty) {
      try out = Some(action(read(spark, path, keyCols, family)))
      catch {
        case e: Throwable if tryNo < attempts - 1 && isFileLoss(e) =>
          tryNo += 1
      }
    }
    out.get
  }

  /** Does this failure (anywhere in the cause chain) look like files
    * vanishing under a planned scan? */
  private def isFileLoss(e: Throwable): Boolean = {
    var t: Throwable = e
    var seen = 0
    while (t != null && seen < 16) {
      val msg = Option(t.getMessage).getOrElse("")
      if (t.isInstanceOf[java.io.FileNotFoundException] ||
          msg.contains("FILE_NOT_EXIST") ||
          msg.contains("does not exist") ||
          msg.contains("No such file")) return true
      t = if (t.getCause eq t) null else t.getCause
      seen += 1
    }
    false
  }

  /** [[read]] with the family and key columns taken from the view's
    * own manifest — the "open whatever is there" path for dashboards
    * and catalogs. Returns (view, manifest). */
  def readAuto(spark: SparkSession, path: String): (DataFrame, ViewManifest) = {
    val m = readManifest(spark, path).getOrElse(throw new IllegalArgumentException(
      s"view at $path has no $ManifestFile manifest — pass the family to read()"))
    (merge(rawView(spark, path), m.keyCols,
      ViewFamily.fromManifest(m.family, m.geometry)), m)
  }

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
      partSpanMs: Long = DefaultPartSpanMs): DataFrame = {
    validateManifest(spark, path, family, None, partSpanMs, keyCols)
    merge(
      rawView(spark, path)
        .filter(F.col("__part") >= partFloor(fromMs, partSpanMs) &&
                F.col("__part") < untilMs &&
                F.col("bucket_ms") >= fromMs && F.col("bucket_ms") < untilMs),
      keyCols, family)
  }

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
      partSpanMs: Long = DefaultPartSpanMs): Unit = {
    validateOrAdopt(fresh.sparkSession, path, family, bucket, partSpanMs, keyCols)
    writeView(rollup(fresh, tsCol, keyCols, valueCol, bucket, family),
      path, "append", partSpanMs)
  }

  private val PendingFile = "_compact_pending.json"
  private val FoldStaging = "_compact_fold"
  private val LockFile = graft.pipeline.Maintenance.CompactLockFile

  /** Locks older than this are presumed crashed and broken. */
  private[graft] val CompactLockStaleMs: Long = 6L * 3600000L

  /** Best-effort single-maintainer mutex (compact/backfill/expire all
    * take it — two maintenance ops racing would fold/prune overlapping
    * snapshots): an exclusive create of `_compact_lock` carrying the
    * acquire time. A second maintainer finding a FRESH lock fails fast;
    * a lock older than [[CompactLockStaleMs]] is presumed crashed and
    * broken by ATOMIC RENAME to a per-breaker tombstone — of two
    * concurrent breakers only one's rename succeeds, so a breaker can
    * never blind-delete a lock another breaker just re-created. After
    * the rename wins, the breaker verifies the tombstone still carries
    * the stale token it based the break on; a mismatch means it stole
    * a LIVE lock (the holder acquired between the staleness read and
    * the rename) — it renames the lock back and aborts. The remaining
    * window (holder's own post-create verify already passed when a
    * breaker with a stale read arrives) is narrowed, not eliminated:
    * atomic-create/rename semantics hold on HDFS/local, object stores
    * are best-effort — keep the nightly scheduler as the real mutex. */
  private def acquireCompactLock(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(root, LockFile)
    // token = acquire time + a per-attempt nonce, so ownership is
    // VERIFIABLE after create (and a tombstone's origin checkable)
    val token = s"${System.currentTimeMillis()} ${System.nanoTime()}"
    def readTokenOf(path: org.apache.hadoop.fs.Path): String =
      try {
        val in = fs.open(path)
        val b = new Array[Byte](64)
        val n = try in.read(b) finally in.close()
        new String(b, 0, math.max(n, 0), "UTF-8").trim
      } catch { case _: Exception => "" }
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      val observed = readTokenOf(p)
      val stale =
        try {
          val ts = observed.split(' ').head.toLong
          System.currentTimeMillis() - ts > CompactLockStaleMs
        } catch { case _: Exception => true } // unreadable = stale
      if (!stale)
        throw new IllegalStateException(
          s"another maintenance op holds $p (fresh lock) — " +
            "compact/backfill/expire are single-maintainer; wait for it " +
            "or remove a stale lock")
      // break by atomic rename to a unique tombstone: only one of two
      // concurrent breakers wins the rename; the loser sees a missing
      // source and backs off
      val tomb = new org.apache.hadoop.fs.Path(root,
        s".${LockFile}_tomb_${System.nanoTime()}")
      if (!fs.rename(p, tomb))
        throw new IllegalStateException(
          s"lost the race breaking the stale lock $p (another breaker won)")
      if (readTokenOf(tomb) != observed) {
        // we renamed a lock that CHANGED since the staleness read — a
        // live holder re-acquired in between; put it back and abort
        // (if the restore loses to yet another creator, the tombstone
        // stays behind as an inert dotfile)
        fs.rename(tomb, p)
        throw new IllegalStateException(
          s"aborted breaking $p: the lock was re-acquired mid-break")
      }
      fs.delete(tomb, false)
      if (!tryCreate())
        throw new IllegalStateException(
          s"lost the race re-acquiring $p after breaking a stale lock")
    }
    // ownership check: if a concurrent stale-breaker clobbered our
    // lock between create and here, back off instead of double-running
    if (readTokenOf(p) != token)
      throw new IllegalStateException(
        s"lost the race re-acquiring $p after breaking a stale lock")
    p
  }

  /** Every data file currently in the view, as paths RELATIVE to the
    * view root (`__part=X/__batch=Y/part-*.parquet`) — the file-level
    * snapshot compact folds and prunes. Hidden files (`_`/`.` prefix,
    * Spark's own convention) are excluded. */
  private def listDataFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[String] = {
    val out = Seq.newBuilder[String]
    if (fs.exists(root)) fs.listStatus(root).foreach { part =>
      val pn = part.getPath.getName
      if (part.isDirectory && pn.startsWith("__part="))
        fs.listStatus(part.getPath).foreach { b =>
          val bn = b.getPath.getName
          if (b.isDirectory && bn.startsWith("__batch="))
            fs.listStatus(b.getPath).foreach { f =>
              val fn = f.getPath.getName
              if (f.isFile && !fn.startsWith("_") && !fn.startsWith("."))
                out += s"$pn/$bn/$fn"
            }
        }
    }
    out.result()
  }

  /** The `__batch=` id embedded in a relative data-file path. */
  private def batchIdOf(rel: String): Long = {
    val seg = rel.split('/')(1)
    scala.util.Try(seg.stripPrefix("__batch=").toLong).getOrElse(-1L)
  }

  /** Rewrite the view to one row per (bucket, keys), SAFELY against a
    * concurrent [[append]]/[[streamAppend]]: compact folds a FILE-LEVEL
    * SNAPSHOT of the view — any file an append lands after the
    * snapshot is simply not in the fold's input and not in its prune
    * list, so it survives untouched (interleaved append/compact ≡
    * serialized, byte-exact; pinned by SketchViewSpec). The protocol:
    *
    *   1. snapshot the data-file list S (a directory listing);
    *   2. fold exactly S to one row per group, STAGED under
    *      `_compact_fold/` (invisible to readers — underscore prefix);
    *   3. journal `{files: S, folded}` to `_compact_pending.json` —
    *      the commit point: the fold is complete on disk;
    *   4. delete S's files (and emptied directories);
    *   5. move the staged fold files under `__batch=-1`;
    *   6. advance the manifest watermark, drop journal + staging.
    *
    * A crash before step 3 leaves the view untouched (staging is
    * invisible and overwritten next time); a crash after step 3 is
    * finished idempotently by the next compact (steps 4-6 re-run from
    * the journal), so no crash point loses data or double-counts it —
    * readers in the recovery window may transiently see the folded
    * history missing, never doubled. The old whole-directory overwrite
    * lost interleaved appends AND (on crash) the entire view+manifest.
    *
    * The manifest's `foldedThroughBatch` watermark advances to the
    * highest streaming `__batch` id folded here, so a
    * crashed-then-replayed micro-batch at or below it becomes a no-op
    * instead of a double-count. Manifest-less (pre-manifest) views are
    * adopted when `bucket` is passed; without it they compact fine but
    * stay manifest-less. */
  def compact(
      spark: SparkSession,
      path: String,
      keyCols: Seq[String],
      family: ViewFamily = ViewFamily.ddsketch(),
      partSpanMs: Long = DefaultPartSpanMs,
      bucket: Option[String] = None): Unit =
    compactImpl(spark, path, keyCols, family, partSpanMs, bucket,
      () => (), () => ())

  /** Auto-compaction policy hook: [[compact]] iff the view holds more
    * than `maxFilesPerPart` data files per `__part` partition — one
    * cheap directory listing below the dial, so a long-lived
    * [[streamAppend]] writer can call it every N micro-batches and
    * self-maintain. Returns true iff a compaction ran. */
  def maybeCompact(
      spark: SparkSession,
      path: String,
      keyCols: Seq[String],
      maxFilesPerPart: Int = 4,
      family: ViewFamily = ViewFamily.ddsketch(),
      partSpanMs: Long = DefaultPartSpanMs,
      bucket: Option[String] = None): Boolean = {
    require(maxFilesPerPart >= 1,
      s"maxFilesPerPart must be >= 1, got $maxFilesPerPart")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    val files = listDataFiles(fs, root)
    val parts = files.map(_.split('/')(0)).distinct.length
    // the newest streaming batch is never folded (mid-commit window) —
    // don't let it keep re-triggering a fold that cannot reclaim it
    val newest = files.map(batchIdOf).filter(_ >= 0L)
      .reduceOption(_ max _)
    val foldable = files.count(f => !newest.contains(batchIdOf(f)))
    if (parts == 0 || foldable <= maxFilesPerPart.toLong * parts) false
    else {
      compact(spark, path, keyCols, family, partSpanMs, bucket)
      true
    }
  }

  /** [[compact]] with race/crash-window hooks (test seam): `afterSnapshot`
    * runs once the file snapshot is taken, `afterJournal` once the fold
    * is staged and journaled — the two windows a concurrent append (or
    * a crash) can land in. */
  private[graft] def compactImpl(
      spark: SparkSession,
      path: String,
      keyCols: Seq[String],
      family: ViewFamily,
      partSpanMs: Long,
      bucket: Option[String],
      afterSnapshot: () => Unit,
      afterJournal: () => Unit): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = acquireCompactLock(fs, root)
    try {
      compactLocked(spark, path, keyCols, family, partSpanMs, bucket,
        afterSnapshot, afterJournal, root, fs)
    } finally fs.delete(lock, false)
  }

  private def compactLocked(
      spark: SparkSession,
      path: String,
      keyCols: Seq[String],
      family: ViewFamily,
      partSpanMs: Long,
      bucket: Option[String],
      afterSnapshot: () => Unit,
      afterJournal: () => Unit,
      root: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    recoverPendingCompact(spark, path) // finish a crashed predecessor first
    val manifest =
      validateManifest(spark, path, family, None, partSpanMs, keyCols)
        .orElse(bucket.map { b =>
          // adopt: record the layout for a pre-manifest view
          val m = ViewManifest(family.id, family.geometry, b, partSpanMs,
            keyCols, -1L)
          writeManifest(spark, path, m)
          m
        })
    val all = listDataFiles(fs, root)
    // NEVER fold the HIGHEST streaming batch id present: a concurrent
    // stream writer could be mid-commit of exactly that batch (task
    // files land one by one), and folding a partial batch while
    // advancing the watermark past it would make its crash-replay a
    // no-op — silently losing the unwritten rows. Every id BELOW the
    // max is safe (Structured Streaming starts batch N+1 only after N
    // fully committed). The newest batch just stays merge-on-read
    // until the next compact.
    val maxStream = all.map(batchIdOf).filter(_ >= 0L)
      .foldLeft(-1L)(math.max)
    val snapshot =
      if (maxStream < 0L) all else all.filter(batchIdOf(_) != maxStream)
    afterSnapshot()
    if (snapshot.nonEmpty) {
      val folded = math.max(snapshot.map(batchIdOf).max,
        manifest.map(_.foldedThroughBatch).getOrElse(-1L))
      // fold EXACTLY the snapshot (basePath keeps partition parsing);
      // staged while the originals are still intact, so no checkpoint
      // is needed to protect the fold's own input
      val foldDf = merge(
        spark.read.option("basePath", path)
          .parquet(snapshot.map(rel => s"$path/$rel"): _*),
        keyCols, family).drop("bucket_start")
      writeView(foldDf, s"$path/$FoldStaging", "overwrite", partSpanMs)
      writePending(fs, root, snapshot, folded)
      afterJournal()
      finishCompact(spark, fs, root, snapshot, folded)
    }
  }

  private def writePending(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      files: Seq[String],
      folded: Long): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val j = om.createObjectNode()
    j.put("folded", folded)
    val arr = j.putArray("files")
    files.foreach(arr.add)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, PendingFile), true)
    try out.write(om.writeValueAsBytes(j)) finally out.close()
  }

  /** Steps 4-6 of [[compact]] — idempotent, so a crash anywhere inside
    * is finished by re-running from the journal. */
  private def finishCompact(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      snapshot: Seq[String],
      folded: Long): Unit = {
    // prune the folded originals; drop emptied __batch/__part dirs
    snapshot.foreach { rel =>
      fs.delete(new org.apache.hadoop.fs.Path(root, rel), false)
    }
    snapshot.map(rel => rel.substring(0, rel.lastIndexOf('/'))).distinct
      .foreach { bdir =>
        val bp = new org.apache.hadoop.fs.Path(root, bdir)
        if (fs.exists(bp) && fs.listStatus(bp).isEmpty) fs.delete(bp, false)
        val pp = bp.getParent
        if (fs.exists(pp) && fs.listStatus(pp).isEmpty) fs.delete(pp, false)
      }
    // move the staged fold under __batch=-1 (file renames; staged part
    // names carry a job UUID so they can't collide with live appends).
    // Every rename is CHECKED: a silent rename failure followed by the
    // staging delete below would permanently drop that fold file — and
    // the folded history it replaced was already pruned above. Throwing
    // instead leaves journal + staging in place, so the next
    // recoverPendingCompact retries the move.
    val staging = new org.apache.hadoop.fs.Path(root, FoldStaging)
    if (fs.exists(staging)) fs.listStatus(staging).foreach { part =>
      val pn = part.getPath.getName
      if (part.isDirectory && pn.startsWith("__part="))
        fs.listStatus(part.getPath).foreach { b =>
          if (b.isDirectory && b.getPath.getName.startsWith("__batch="))
            fs.listStatus(b.getPath).foreach { f =>
              val fn = f.getPath.getName
              if (f.isFile && !fn.startsWith("_") && !fn.startsWith(".")) {
                val destDir = new org.apache.hadoop.fs.Path(
                  new org.apache.hadoop.fs.Path(root, pn), "__batch=-1")
                if (!fs.mkdirs(destDir))
                  throw new java.io.IOException(
                    s"compact: cannot create $destDir for the staged fold")
                if (!fs.rename(f.getPath,
                    new org.apache.hadoop.fs.Path(destDir, fn)))
                  throw new java.io.IOException(
                    s"compact: failed moving staged fold file ${f.getPath} " +
                      s"into $destDir — journal kept for recovery")
              }
            }
        }
    }
    readManifest(spark, root.toString).foreach { m =>
      writeManifest(spark, root.toString, m.copy(foldedThroughBatch = folded))
    }
    fs.delete(new org.apache.hadoop.fs.Path(root, PendingFile), false)
    fs.delete(staging, true)
  }

  /** Finish a compact that crashed after its journal was written (the
    * fold is complete on disk — steps 4-6 just need re-running). Ran
    * automatically at the start of every [[compact]]; exposed for an
    * explicit repair. No-op when no journal exists. Returns whether a
    * recovery ran. */
  /** Parse `_compact_pending.json` when present and intact. `None`
    * when absent; `Some(None)` when present but truncated/corrupt (a
    * crash DURING the journal write). */
  private def readPendingJournal(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[Option[(Seq[String], Long)]] = {
    val p = new org.apache.hadoop.fs.Path(root, PendingFile)
    if (!fs.exists(p)) None
    else Some(
      try {
        val in = fs.open(p)
        val bytes =
          try {
            val len = fs.getFileStatus(p).getLen.toInt
            val b = new Array[Byte](len)
            in.readFully(0L, b)
            b
          } finally in.close()
        val j = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new String(bytes, "UTF-8"))
        Some(((0 until j.get("files").size())
          .map(i => j.get("files").get(i).asText()): Seq[String],
          j.get("folded").asLong()))
      } catch { case _: Exception => None })
  }

  def recoverPendingCompact(spark: SparkSession, path: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readPendingJournal(fs, root) match {
      case None => false
      case Some(parsed) => parsed match {
        case Some((files, folded)) =>
          finishCompact(spark, fs, root, files, folded)
          true
        case None =>
          // a TRUNCATED/corrupt journal means the crash hit DURING the
          // journal write — the prune never started and the view is
          // intact, so the half-journal and the staged fold are safe
          // to discard (the next compact re-folds from scratch)
          fs.delete(new org.apache.hadoop.fs.Path(root, PendingFile), false)
          fs.delete(new org.apache.hadoop.fs.Path(root, FoldStaging), true)
          false
      }
    }
  }

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
        graft.pipeline.Maintenance.heartbeat(batch.sparkSession, path)
        graft.pipeline.Maintenance.requireNoExclusiveMaintenance(
          batch.sparkSession, path)
        appendBatch(batch, tsCol, keyCols, valueCol, path, bucket, family,
          partSpanMs, batchId)
    }

  /** One micro-batch of [[streamAppend]] (exposed for replay tests).
    * A batch id at or below the manifest's `foldedThroughBatch` was
    * already folded by a [[compact]] — its replay writes NOTHING
    * (its original directories no longer exist; recreating them would
    * double-count the folded rows). */
  private[graft] def appendBatch(
      batch: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      path: String,
      bucket: String,
      family: ViewFamily,
      partSpanMs: Long,
      batchId: Long): Unit = {
    val m = validateOrAdopt(batch.sparkSession, path, family, bucket,
      partSpanMs, keyCols)
    if (batchId > m.foldedThroughBatch)
      writeView(rollup(batch, tsCol, keyCols, valueCol, bucket, family),
        path, "overwrite", partSpanMs, batchId, dynamic = true)
  }

  /** The `__part=` floor embedded in a relative data-file path. */
  private def partIdOf(rel: String): Option[Long] =
    scala.util.Try(rel.split('/')(0).stripPrefix("__part=").toLong).toOption

  /** Repair/backfill: replace the view's content for the partition
    * range `[fromMs, untilMs)` with a fresh rollup of `events` — the
    * one operation that rewrites history, for late data or an
    * upstream fix that invalidated a window. The range must align to
    * `partSpanMs`. Events outside the range are ignored, and so are
    * rollup BUCKETS outside it: a bucket coarser than `partSpanMs`
    * (say "week" over day partitions) can truncate below `fromMs`, and
    * writing that bucket would double-count against partitions the
    * backfill never dropped — the output filter keeps every written
    * row inside the replaced range.
    *
    * SAFE against a concurrent batch [[append]] — the [[compact]]
    * protocol applied to a range: backfill snapshots the range's
    * FILE list, stages the fresh rollup under `_compact_fold/`,
    * journals `{files, folded}`, then prunes exactly the snapshot and
    * promotes the staging — an append landing at any point is not in
    * the snapshot and survives (interleaved ≡ serialized
    * backfill-then-append, byte-exact; SketchViewSpec pins it), and a
    * crash after the journal is finished idempotently by the next
    * maintenance call. Takes the single-maintainer lock (one of
    * compact/backfill/expire at a time). The STREAMING writer must be
    * stopped: a crash-replay of a micro-batch whose in-range files the
    * backfill pruned would re-write them and double-count against the
    * fresh rollup (its id is above the fold watermark by design —
    * backfill cannot advance the global watermark for a range-local
    * prune). */
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
      partSpanMs: Long = DefaultPartSpanMs): Unit =
    backfillImpl(events, tsCol, keyCols, valueCol, path, fromMs, untilMs,
      bucket, family, partSpanMs, () => (), () => ())

  /** [[backfill]] with race/crash-window hooks (test seam):
    * `afterSnapshot` runs once the range's file snapshot is taken,
    * `afterJournal` once the fresh rollup is staged and journaled —
    * the windows a concurrent append (or a crash) can land in. */
  private[graft] def backfillImpl(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      path: String,
      fromMs: Long,
      untilMs: Long,
      bucket: String,
      family: ViewFamily,
      partSpanMs: Long,
      afterSnapshot: () => Unit,
      afterJournal: () => Unit): Unit = {
    require(partFloor(fromMs, partSpanMs) == fromMs &&
        partFloor(untilMs, partSpanMs) == untilMs,
      s"backfill range must align to partSpanMs=$partSpanMs")
    val spark = events.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = acquireCompactLock(fs, root)
    // writer-exclusive: a live streaming writer's crash-replay could
    // re-write pruned in-range files and double-count against the
    // fresh rollup. The marker wrapper enforces the lease AND makes
    // the backfill visible to streamAppend's sink gate (Dekker
    // ordering — marker before lease check; liveness rides the
    // just-acquired _compact_lock)
    try graft.pipeline.Maintenance.withExclusiveMarker(spark, path,
      graft.pipeline.Maintenance.DefaultWriterLeaseMs,
      graft.pipeline.Maintenance.CompactLockFile) {
      recoverPendingCompact(spark, path) // finish a crashed predecessor
      validateOrAdopt(spark, path, family, bucket, partSpanMs, keyCols)
      // snapshot: every data file currently in the replaced range
      val snapshot = listDataFiles(fs, root)
        .filter(rel => partIdOf(rel).exists(v => v >= fromMs && v < untilMs))
      afterSnapshot()
      val fresh = rollup(
        events.filter(F.unix_millis(F.col(tsCol)) >= fromMs &&
          F.unix_millis(F.col(tsCol)) < untilMs),
        tsCol, keyCols, valueCol, bucket, family)
        .filter(F.col("bucket_ms") >= fromMs && F.col("bucket_ms") < untilMs)
      writeView(fresh, s"$path/$FoldStaging", "overwrite", partSpanMs)
      // the journal carries the UNCHANGED watermark — backfill prunes a
      // range, not a batch prefix, so it must not advance it
      val folded = readManifest(spark, path).map(_.foldedThroughBatch)
        .getOrElse(-1L)
      writePending(fs, root, snapshot, folded)
      afterJournal()
      finishCompact(spark, fs, root, snapshot, folded)
      ()
    } finally fs.delete(lock, false)
  }

  /** Retention: drop every data FILE in `__part` partitions strictly
    * OLDER than `keepFromMs`'s partition (no rewrite, no scan; the
    * same long-math floor as [[readRange]]). File-level snapshot
    * deletes make it safe against a concurrent [[append]]: an
    * append's files landing after the snapshot are not in it and
    * survive intact — interleaved ≡ serialized (expire-then-append or
    * append-then-expire, whichever side of the snapshot the append
    * landed; SketchViewSpec pins both). Deletes are idempotent, so a
    * crash mid-expire just leaves retention unfinished — re-run.
    * Takes the single-maintainer lock (an expire racing a compact
    * would delete fold inputs / resurrect expired rows through the
    * staged fold). Safe against concurrent readers of the kept range.
    * Returns the number of partitions touched. */
  def expire(
      spark: SparkSession,
      path: String,
      keepFromMs: Long,
      partSpanMs: Long = DefaultPartSpanMs): Int =
    expireImpl(spark, path, keepFromMs, partSpanMs, () => ())

  /** [[expire]] with the snapshot-window hook (test seam). */
  private[graft] def expireImpl(
      spark: SparkSession,
      path: String,
      keepFromMs: Long,
      partSpanMs: Long,
      afterSnapshot: () => Unit): Int = {
    readManifest(spark, path).foreach { m =>
      if (m.partSpanMs != partSpanMs)
        throw new IllegalArgumentException(
          s"view at $path has partSpanMs=${m.partSpanMs}, expire called " +
            s"with $partSpanMs — the retention floor would land mid-partition")
    }
    val floor = partFloor(keepFromMs, partSpanMs)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val lock = acquireCompactLock(fs, root)
    try {
      recoverPendingCompact(spark, path) // finish a crashed predecessor
      val doomed = listDataFiles(fs, root)
        .filter(rel => partIdOf(rel).exists(_ < floor))
      afterSnapshot()
      doomed.foreach { rel =>
        fs.delete(new org.apache.hadoop.fs.Path(root, rel), false)
      }
      // drop emptied __batch / __part dirs (an append that landed
      // after the snapshot keeps its dirs non-empty and alive)
      doomed.map(rel => rel.substring(0, rel.lastIndexOf('/'))).distinct
        .foreach { bdir =>
          val bp = new org.apache.hadoop.fs.Path(root, bdir)
          if (fs.exists(bp) && fs.listStatus(bp).isEmpty) fs.delete(bp, false)
          val pp = bp.getParent
          if (fs.exists(pp) && fs.listStatus(pp).isEmpty) fs.delete(pp, false)
        }
      doomed.flatMap(partIdOf).distinct.size
    } finally fs.delete(lock, false)
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
