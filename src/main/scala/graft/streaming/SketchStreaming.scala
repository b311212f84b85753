package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

/**
 * Structured Streaming rollups over sketch aggregates — the streaming
 * form of the reference's hourly→daily sketch-table pattern
 * (reference: README.md:119-141, 189-199): instead of INSERT-SELECT
 * batch jobs, a watermarked windowed aggregation continuously maintains
 * per-window sketches that downstream queries merge further with
 * ddsketch_agg.
 *
 * Scale note: the aggregation state per (window, key) group is one
 * DDSketch buffer (O(log range) bins), so state store size grows with
 * key cardinality only, never with event count.
 */
object SketchStreaming {

  /** Windowed values→sketch aggregation with event-time watermarking. */
  def windowedSketchAgg(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(F.window(F.col(tsCol), windowDuration), F.col(keyCol))
      .agg(G.ddsketch_agg_values(F.col(valueCol)).as("sketch"))

  /** Same, emitting the full 12-field stats struct per window. */
  def windowedStatsAgg(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(F.window(F.col(tsCol), windowDuration), F.col(keyCol))
      .agg(G.ddsketch_stats_agg_values(F.col(valueCol)).as("stats"))

  /**
   * Windowed heavy-hitter tracking: per (window, key) Count-Min + TopK
   * sketches over an item column — "which URLs/tokens dominated each
   * 10-minute window?" as one streaming aggregation. Both families are
   * TypedImperativeAggregates with mergeable buffers, so they fold
   * incrementally in the state store exactly like the DDSketch aggs:
   * state per open window is two fixed-size sketch blobs, independent
   * of item cardinality, and the watermark closes (and frees) windows.
   * Probe the emitted blobs with `cms_estimate` / `topk_items`.
   */
  def windowedFrequencyAgg(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      itemCol: String,
      windowDuration: String,
      watermarkDelay: String,
      topKCapacity: Int = graft.sketch.TopKSketch.DefaultCapacity,
      cmsEps: Double = graft.sketch.cms.DefaultEps,
      cmsConfidence: Double = graft.sketch.cms.DefaultConfidence): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(F.window(F.col(tsCol), windowDuration), F.col(keyCol))
      .agg(
        graft.sketch.cms.cms_agg(F.col(itemCol), cmsEps, cmsConfidence).as("cms"),
        graft.sketch.topk.topk_agg(F.col(itemCol), topKCapacity).as("topk"))

  /**
   * Streaming BURST detection — the continuous twin of
   * [[graft.sketch.SketchOps.trendingItems]]: per event-time window
   * and key, the items whose windowed count RISES above a fixed
   * per-item baseline (`refCounts`: item → baseline count, e.g.
   * yesterday's totals) by at least `minRise` — `rise = count /
   * (baseline + 1)` (add-one: items absent from the baseline burst at
   * their raw count). Rides ONE [[windowedFrequencyAgg]] TopK
   * aggregation (state per open window/key is one sketch blob), then
   * a stateless explode + broadcast baseline join — counts (and the
   * rise ratios, single divisions of exact longs) are EXACT while
   * the capacity covers the window's distinct items.
   */
  def burstStream(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      itemCol: String,
      windowDuration: String,
      watermarkDelay: String,
      refCounts: DataFrame, // (item STRING, ref BIGINT)
      minRise: Double,
      topKCapacity: Int = graft.sketch.TopKSketch.DefaultCapacity): DataFrame =
    windowedFrequencyAgg(stream, tsCol, keyCol, itemCol,
        windowDuration, watermarkDelay, topKCapacity)
      .select(F.col("window"), F.col(keyCol),
        F.explode(graft.sketch.topk.topk_items(F.col("topk"), Int.MaxValue))
          .as("__it"))
      .select(F.col("window"), F.col(keyCol),
        F.col("__it.item").as("item"), F.col("__it.count").as("count"))
      .join(F.broadcast(refCounts.select(F.col("item"), F.col("ref"))),
        Seq("item"), "left")
      .withColumn("rise", F.col("count").cast("double") /
        (F.coalesce(F.col("ref"), F.lit(0L)) + 1L).cast("double"))
      .filter(F.col("rise") >= minRise)

  /**
   * Session-window sketch aggregation: the streaming twin of the batch
   * `graft.operators.Sessionize` — Spark's native `session_window`
   * merges per-key state until the event-time gap exceeds
   * `gapDuration`, and the watermark closes (and frees) sessions.
   * State per open session is one sketch buffer + bounds, so the state
   * store scales with concurrently-open sessions, not event count.
   */
  def sessionizedSketchAgg(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      gapDuration: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(F.session_window(F.col(tsCol), gapDuration), F.col(keyCol))
      .agg(
        G.ddsketch_agg_values(F.col(valueCol)).as("sketch"),
        F.count(F.lit(1)).as("n_events"))

  /**
   * Custom-state streaming: a running per-key sketch maintained with
   * `flatMapGroupsWithState` — the escape hatch when windowed/session
   * aggregation can't express the state machine (here: emit the
   * lifetime-to-date sketch for every key touched by the micro-batch).
   * State per key is one serialized sketch (O(log value-range) — the
   * wire codec doubles as the state-store format) plus the update
   * count. State for keys that go quiet expires `stateTtlMs` past
   * their last event (event-time timeout driven by the watermark —
   * a processing-time timeout would keep scheduling no-data batches).
   *
   * Output per touched key and batch: (key, sketch bytes, n_updates).
   */
  def runningSketchPerKey(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      watermarkDelay: String,
      stateTtlMs: Long = 3600000L,
      accuracy: Double = graft.sketch.DDSketch.DefaultRelativeAccuracy): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    // the watermark tag lives in the attribute's metadata: the column
    // must be projected bare (no cast/expression wrapper) to stay the
    // event-time column the stateful operator requires. tsCol must
    // already be a TimestampType column.
    val pairs = stream
      .withWatermark(tsCol, watermarkDelay)
      .select(F.col(keyCol).cast("string").as("k"),
              F.col(valueCol).cast("double").as("v"),
              F.col(tsCol).as("t"))
      .as[(String, Double, java.sql.Timestamp)]
    pairs.groupByKey(_._1)
      .flatMapGroupsWithState[(Array[Byte], Long), (String, Array[Byte], Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[(Array[Byte], Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (sketch, n0) = state.getOption
              .map { case (bytes, n) => (graft.sketch.DataDogCodec.decode(bytes), n) }
              .getOrElse((graft.sketch.DDSketch(accuracy), 0L))
            var n = n0
            var maxT = Long.MinValue
            rows.foreach { case (_, v, t) =>
              if (!v.isNaN) { sketch.add(v); n += 1 }
              if (t != null && t.getTime > maxT) maxT = t.getTime
            }
            val bytes = graft.sketch.DataDogCodec.encode(sketch)
            state.update((bytes, n))
            // must be strictly past the current watermark
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1, maxT + stateTtlMs))
            Iterator.single((key, bytes, n))
          }
      }
      .toDF("key", "sketch", "n_updates")
  }

  /**
   * Streaming exact dedup: drop rows whose content hash was already
   * seen within the watermark horizon. The state store keys on the
   * 32-byte sha2, never the payload, and `withinWatermark` gives the
   * state a TTL — the unbounded-state trap of a naive
   * `dropDuplicates` on an infinite stream. NULL-content rows pass
   * through un-deduplicated (sha2(NULL) is NULL and the state store
   * would treat all NULL keys as one duplicate — dropping rows that
   * were never proven equal).
   */
  /**
   * Streaming NEAR-duplicate detection: probe each arriving document
   * against a persisted MinHash signature index of the historical
   * corpus ([[graft.pipeline.Dedup.buildSignatureIndex]]) — the
   * crawl-ingest shape: fuzzy-dedup AS the stream lands, without ever
   * re-scanning (or re-shingling) history.
   *
   * Per micro-batch: the new document explodes to its OPH band
   * buckets, a stream-static join against the index yields candidate
   * (new, old) pairs, `dropDuplicatesWithinWatermark` collapses the
   * per-shared-band multiplicity (state = one entry per emitted pair
   * within the watermark horizon, expired by event time — never
   * corpus-sized), and an exact-Jaccard verify against the history
   * text (stream-static join, history rows hash-filtered by candidate
   * id BEFORE any shingling) keeps only true near-dups. Stateless
   * except the pair dedup, so append mode emits pairs the micro-batch
   * they arrive. Output: (id_new, id_old, inter, uni) — the streaming
   * twin of [[graft.pipeline.Dedup.incrementalNearDuplicatePairs]],
   * identical output on identical input (BatchStreamEquivalenceSpec).
   *
   * Geometry (shingleSize/bands/rowsPerBand) must match the index's.
   * At 100 TB: the index and history are static-side scans per
   * micro-batch — keep both in compact parquet bucketed by their join
   * keys; the stream side is micro-batch-sized and broadcasts.
   */
  def nearDupStream(
      stream: DataFrame,
      tsCol: String,
      idCol: String,
      textCol: String,
      histIndex: DataFrame,
      histDocs: DataFrame,
      histIdCol: String,
      histTextCol: String,
      watermarkDelay: String,
      shingleSize: Int = 5,
      threshold: Double = 0.8,
      bands: Int = 32,
      rowsPerBand: Int = 4): DataFrame = {
    import graft.pipeline.TextFunctions
    val numHashes = bands * rowsPerBand
    val probed = stream
      .withWatermark(tsCol, watermarkDelay)
      .select(F.col(tsCol).as("__ts"),
        F.col(idCol).as("id_new"),
        TextFunctions.shinglesUdf(shingleSize)(F.col(textCol)).as("__sn"),
        F.explode(TextFunctions.minhashTextOphBandsUdf(
          shingleSize, numHashes, bands, rowsPerBand)(F.col(textCol))).as("__b"))
      .select(F.col("__ts"), F.col("id_new"), F.col("__sn"),
        F.col("__b._1").as("band"), F.col("__b._2").as("bucket"))
    val idx = histIndex.select(
      F.col("band"), F.col("bucket"), F.col("id").as("id_old"))
    val candidates = probed
      .join(idx, Seq("band", "bucket"))
      // one verify (and one emission) per distinct pair: dedup BEFORE
      // the history-text join so shared-band multiplicity never
      // multiplies the shingling work
      .dropDuplicatesWithinWatermark("id_new", "id_old")
    candidates
      .join(histDocs.select(F.col(histIdCol).as("id_old"),
        F.col(histTextCol).as("__told")), Seq("id_old"))
      .withColumn("__so", TextFunctions.shinglesUdf(shingleSize)(F.col("__told")))
      .withColumn("inter",
        F.size(F.array_intersect(F.col("__sn"), F.col("__so"))).cast("long"))
      .withColumn("uni",
        F.size(F.array_union(F.col("__sn"), F.col("__so"))).cast("long"))
      .filter(F.col("uni") > 0 && F.col("inter") >= F.col("uni") * threshold)
      .select("id_new", "id_old", "inter", "uni")
  }

  /**
   * Streaming MULTIWINDOW SLO alert — the continuously-evaluated form
   * of [[graft.sketch.Slo.multiWindowBurn]] (the batch form reads a
   * persisted view): per `slideDuration` evaluation point and key,
   * the error-budget burn over the trailing SHORT and LONG windows,
   * alerting when both exceed `threshold` (short confirms it is still
   * happening, long confirms it is material — the SRE-workbook pager
   * rule, run as a stream).
   *
   * ONE sliding-window aggregation: the long window is the slide's
   * window frame, and the short window is a CONDITIONAL sub-aggregate
   * inside it (`value WHERE ts >= window.end - short` — NULLs skipped
   * by the sketch agg), so state per open (window, key) is two sketch
   * buffers, never chained stateful operators or a stream-stream
   * join (two independent windowed aggs can't join in one query).
   * Keys quiet in the short window still alert=false with n_short=0,
   * the batch form's left-join contract.
   *
   * Output per (window, key): window, keys, n_short, n_long,
   * burn_short, burn_long, alert.
   */
  def multiWindowBurnStream(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      objective: Double,
      budget: Double,
      shortDuration: String,
      longDuration: String,
      slideDuration: String,
      watermarkDelay: String,
      threshold: Double = 1.0): DataFrame = {
    require(budget > 0.0 && budget < 1.0, s"budget must be in (0,1): $budget")
    val shortCut = F.col("window.end") - F.expr(s"INTERVAL $shortDuration")
    def burn(sk: org.apache.spark.sql.Column) =
      (F.lit(1.0) - G.ddsketch_cdf(sk, objective)) / F.lit(budget)
    stream
      .withWatermark(tsCol, watermarkDelay)
      .select(F.window(F.col(tsCol), longDuration, slideDuration).as("window"),
        F.col(keyCol), F.col(valueCol).cast("double").as("__v"),
        F.col(tsCol).as("__ts"))
      .groupBy(F.col("window"), F.col(keyCol))
      .agg(
        G.ddsketch_agg_values(F.col("__v")).as("__sk_l"),
        G.ddsketch_agg_values(
          F.when(F.col("__ts") >= shortCut, F.col("__v"))).as("__sk_s"))
      .select(F.col("window"), F.col(keyCol),
        F.coalesce(G.ddsketch_count(F.col("__sk_s")), F.lit(0L)).as("n_short"),
        G.ddsketch_count(F.col("__sk_l")).as("n_long"),
        burn(F.col("__sk_s")).as("burn_short"),
        burn(F.col("__sk_l")).as("burn_long"))
      .withColumn("alert", F.coalesce(
        F.col("burn_short") > threshold && F.col("burn_long") > threshold,
        F.lit(false)))
  }

  /**
   * Streaming SUBSTRING-span detection: gram occurrences in arriving
   * documents whose k-token hash exists in a persisted
   * [[graft.pipeline.Dedup.buildGramIndex]] of the history — the
   * ingest-time "is this passage already in the corpus?" scrub.
   * Every stage is STATELESS (per-row shingling, a broadcast-bloom
   * predicate built once at wiring time, a stream-static left-semi
   * verify join), so it runs in append mode with no watermark and no
   * state store, emitting one (idCol, span_start, span_end) row per
   * matching k-gram occurrence the micro-batch it arrives. Positions
   * are unique within a document, so there is no within-arrival
   * multiplicity to dedup. Merge to maximal spans downstream with
   * [[graft.pipeline.Dedup.mergeSpans]] (a batch finisher — merging
   * needs all of a document's hits, which only the sink sees).
   *
   * At 100 TB: the index is a static-side scan per micro-batch (keep
   * it parquet, bucketed by `gh`); the bloom prune drops the
   * non-duplicated bulk of the stream's grams before the join.
   */
  def spanHitStream(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      gramIndex: DataFrame,
      k: Int = 8,
      expectedItems: Long = graft.sketch.bloom.DefaultItems,
      fpp: Double = graft.sketch.bloom.DefaultFpp): DataFrame =
    graft.pipeline.Dedup.indexGramHits(
      stream, gramIndex, idCol, textCol, k, expectedItems, fpp)

  /**
   * Streaming EDIT-DISTANCE-1 matching: arriving short strings
   * (titles, URLs, product keys) probed against a persisted
   * [[graft.pipeline.Dedup.buildEditOneIndex]] of history — every
   * (new, old) pair within one edit, the micro-batch it arrives.
   * The probe explodes the row's (len+1) deletion-neighborhood keys
   * (guaranteed recall at distance <= 1), hash-joins the static
   * index, and verifies candidates exactly; multiple shared keys per
   * true pair collapse in `dropDuplicatesWithinWatermark` (state =
   * one entry per emitted pair within the horizon, expired by event
   * time — never corpus-sized). The streaming twin of
   * [[graft.pipeline.Dedup.incrementalEditOnePairs]], identical
   * output on identical input (BatchStreamEquivalenceSpec).
   */
  def editOneStream(
      stream: DataFrame,
      tsCol: String,
      idCol: String,
      strCol: String,
      index: DataFrame,
      watermarkDelay: String,
      maxLen: Int = 256): DataFrame = {
    val delU = F.udf((s: String) =>
      if (s == null || s.length > maxLen) Array.empty[Long]
      else graft.pipeline.Dedup.deletionHashes(s))
    val okU = F.udf((a: String, b: String) =>
      graft.pipeline.Dedup.editDistanceLeOne(a, b))
    stream
      .withWatermark(tsCol, watermarkDelay)
      .select(F.col(tsCol).as("__ts"),
        F.col(idCol).cast("long").as("id_new"), F.col(strCol).as("__bs"))
      .filter(F.col("__bs").isNotNull)
      .select(F.col("__ts"), F.col("id_new"), F.col("__bs"),
        F.explode(delU(F.col("__bs"))).as("key"))
      .join(index, "key")
      .filter(okU(F.col("__bs"), F.col("s")))
      .select(F.col("__ts"), F.col("id_new"), F.col("id").as("id_old"))
      .dropDuplicatesWithinWatermark("id_new", "id_old")
      .select("id_new", "id_old")
  }

  /**
   * Streaming EDIT-DISTANCE-<= k matching — [[editOneStream]]'s
   * general-k sibling over a persisted
   * [[graft.pipeline.Dedup.buildEditKIndex]] (PassJoin segments):
   * probe keys explode per row (O(k³) of them), hash-join the static
   * index, verify with the banded DP, and collapse shared-segment
   * multiplicity in pair-dedup state within the watermark horizon.
   */
  def editKStream(
      stream: DataFrame,
      tsCol: String,
      idCol: String,
      strCol: String,
      index: DataFrame,
      watermarkDelay: String,
      k: Int = 2,
      maxLen: Int = 256): DataFrame = {
    val probeU = F.udf((s: String) =>
      if (s == null || s.length > maxLen + k) Array.empty[Long]
      else graft.pipeline.Dedup.passJoinProbeKeys(s, k, maxLen))
    val okU = F.udf((a: String, b: String) =>
      graft.pipeline.Dedup.editDistanceAtMost(a, b, k))
    stream
      .withWatermark(tsCol, watermarkDelay)
      .select(F.col(tsCol).as("__ts"),
        F.col(idCol).cast("long").as("id_new"), F.col(strCol).as("__bs"))
      .filter(F.col("__bs").isNotNull)
      .select(F.col("__ts"), F.col("id_new"), F.col("__bs"),
        F.explode(probeU(F.col("__bs"))).as("key"))
      .join(index, "key")
      .filter(okU(F.col("__bs"), F.col("s")))
      .select(F.col("__ts"), F.col("id_new"), F.col("id").as("id_old"))
      .dropDuplicatesWithinWatermark("id_new", "id_old")
      .select("id_new", "id_old")
  }

  /**
   * Windowed drift gate: per event-time window, bin `valueCol` by the
   * fixed `cuts` (the [[graft.pipeline.Drift]] binning — count of cuts
   * strictly below the value) and emit the window's PSI against a
   * FIXED reference distribution (`refCounts`, from
   * [[graft.pipeline.Drift.referenceBinCounts]] over the reference
   * snapshot). The per-bin counts are conditional sums inside ONE
   * windowed aggregation — no chained stateful operators, state per
   * open window is `cuts.size + 1` longs. Formula = `Drift.psiStatistic`
   * verbatim: add-one smoothing on both sides, `roundTo`-dp round (ln
   * is libm — the repo convention for anything summed through log).
   */
  def driftStream(
      stream: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String,
      cuts: Seq[Double],
      refCounts: Seq[Long],
      roundTo: Int = 4): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.distinct.sorted,
      s"cuts must be ascending: $cuts")
    val k = cuts.size + 1
    require(refCounts.size == k,
      s"refCounts must have ${k} entries (cuts.size + 1), got ${refCounts.size}")
    val bLit = F.array(cuts.map(F.lit(_)): _*)
    val v = F.col(valueCol).cast("double")
    val binned = stream
      .withWatermark(tsCol, watermarkDelay)
      .filter(v.isNotNull && !F.isnan(v))
      .withColumn("__bin", F.size(F.filter(bLit, c => c < v)))
    val binCounts = (0 until k).map(i =>
      F.sum(F.when(F.col("__bin") === i, 1L).otherwise(0L)).as(s"__c$i"))
    val agg = binned
      .groupBy(F.window(F.col(tsCol), windowDuration))
      .agg(binCounts.head, binCounts.tail: _*)
    val n = (0 until k).map(i => F.col(s"__c$i")).reduce(_ + _)
    val nRef = refCounts.sum
    val terms = (0 until k).map { i =>
      val po = (F.col(s"__c$i") + 1).cast("double") / (n + k).cast("double")
      val pe = F.lit((refCounts(i) + 1).toDouble / (nRef + k).toDouble)
      (po - pe) * F.log(po / pe)
    }
    agg.select(F.col("window"), n.as("n"),
      F.round(terms.reduce(_ + _), roundTo).as("psi"))
  }

  /**
   * Streaming PERCEPTUAL media dedup: arriving image/audio/video
   * payloads probed against a persisted
   * [[graft.pipeline.Multimodal.buildMediaHashIndex]] of the
   * historical corpus — the last dedup family to get its streaming
   * form (exact, minhash, embedding, edit-1, edit-k and substring
   * spans already have one). Per micro-batch: decode + modality-
   * dispatched 64-bit perceptual hash
   * ([[graft.pipeline.Multimodal.perceptualHashCol]]), explode into
   * the Hamming band chunks, stream-static join against the index's
   * (band, bits) buckets, exact popcount verify against the full
   * signature carried IN the index (history payloads are never
   * re-decoded), and `dropDuplicatesWithinWatermark` collapses the
   * shared-band multiplicity (a pair within distance d shares
   * >= bands - d bands) — state is one entry per emitted pair within
   * the watermark horizon, never corpus-sized. Undecodable payloads
   * and unhashable modalities hash to NULL and drop, per the
   * malformed-input discipline.
   *
   * Output: (id_new, id_old, hamming) — the streaming twin of
   * [[graft.pipeline.Multimodal.incrementalNearDuplicateMedia]],
   * identical on identical input (BatchStreamEquivalenceSpec).
   * Geometry (`bands`) must match the index's — checked against its
   * `bands` metadata column at wiring time (one 1-row driver job on
   * the STATIC side). At 100 TB: the index is a static-side scan per
   * micro-batch (keep it parquet, bucketed by (band, bits)); the
   * stream side is micro-batch-sized and broadcasts.
   */
  def mediaDupStream(
      stream: DataFrame,
      tsCol: String,
      idCol: String,
      modalityCol: String,
      payloadCol: String,
      histIndex: DataFrame,
      watermarkDelay: String,
      maxHamming: Int = 6,
      bands: Int = 8): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must be >= 2 and divide 64, got $bands")
    require(maxHamming >= 0 && maxHamming <= bands - 1,
      s"$bands bands only guarantee hamming <= ${bands - 1}, got $maxHamming")
    if (histIndex.columns.contains("bands")) {
      histIndex.select(F.col("bands")).take(1).foreach { r =>
        require(r.getInt(0) == bands,
          s"media hash index was built with bands=${r.getInt(0)} but is " +
            s"being probed with bands=$bands — band ids/bit widths would " +
            "not line up and recall would silently collapse")
      }
    }
    stream
      .withWatermark(tsCol, watermarkDelay)
      .select(F.col(tsCol).as("__ts"), F.col(idCol).as("id_new"),
        graft.pipeline.Multimodal.perceptualHashCol(
          F.col(modalityCol), F.col(payloadCol)).cast("long").as("__sn"))
      .filter(F.col("__sn").isNotNull)
      .select(F.col("__ts"), F.col("id_new"), F.col("__sn"),
        F.explode(graft.pipeline.Dedup.chunkCols(F.col("__sn"), bands)).as("__c"))
      .select(F.col("__ts"), F.col("id_new"), F.col("__sn"),
        F.col("__c._1").as("band"), F.col("__c._2").as("bits"))
      .join(histIndex.select(F.col("band"), F.col("bits"),
        F.col("id").as("id_old"), F.col("sig").as("__so")), Seq("band", "bits"))
      .select(F.col("__ts"), F.col("id_new"), F.col("id_old"),
        F.bit_count(F.col("__sn").bitwiseXOR(F.col("__so"))).as("hamming"))
      .filter(F.col("hamming") <= maxHamming)
      .dropDuplicatesWithinWatermark("id_new", "id_old")
      .select("id_new", "id_old", "hamming")
  }

  /**
   * Streaming CANARY scan — continuous provenance detection on
   * ingest: every canary-shaped token in arriving documents,
   * attributed to `releaseId`'s planted set
   * ([[graft.pipeline.Canary.verify]] semantics: `source_id` is the
   * planted document id, NULL for foreign/corrupt canaries). Both
   * stages are STATELESS — a map-only codegen'd regex extraction and
   * a stream-static broadcast join against the release-sized expected
   * token set — so this runs in append mode with no watermark and no
   * state store, emitting hits the micro-batch they arrive. The
   * streaming twin of scan→verify, identical on identical input
   * (BatchStreamEquivalenceSpec).
   */
  def canaryStream(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      releaseId: String,
      candidateIds: DataFrame,
      candidateIdCol: String): DataFrame =
    graft.pipeline.Canary.verify(
      graft.pipeline.Canary.scan(stream, idCol, textCol),
      releaseId, candidateIds, candidateIdCol)

  /**
   * Windowed EMBEDDING drift gate — the streaming twin of
   * [[graft.pipeline.Drift.embeddingDrift]]: per event-time window,
   * assign each arriving vector to the FROZEN index's nearest centroid
   * (stateless map, broadcast centroids) and emit the window's
   * cell-occupancy PSI against the index's own occupancy. Pure
   * composition: the cell id IS the bin, so this rides [[driftStream]]
   * with integer cut points between cells and the index occupancy as
   * the reference counts — same ONE-windowed-agg state shape
   * (nlist + 1 longs per open window), same formula as the batch form.
   * The continuous re-train signal for frozen-geometry index
   * maintenance (appendToIvfIndex / appendToIvfPq / d4Incremental).
   */
  def embeddingDriftStream(
      stream: DataFrame,
      tsCol: String,
      vecCol: String,
      index: graft.pipeline.Similarity.IvfIndex,
      windowDuration: String,
      watermarkDelay: String,
      roundTo: Int = 4): DataFrame = {
    val k = index.centroids.length
    require(k >= 2, s"embedding drift needs >= 2 cells, got $k")
    val spark = stream.sparkSession
    val refCounts = graft.pipeline.Drift.cellOccupancy(index).toSeq
    val binned = stream
      .filter(F.col(vecCol).isNotNull)
      .withColumn("__cellv",
        graft.pipeline.Drift.cellOf(index, spark, F.col(vecCol)).cast("double"))
    driftStream(binned, tsCol, "__cellv", windowDuration, watermarkDelay,
      cuts = (1 until k).map(_ - 0.5), refCounts = refCounts, roundTo = roundTo)
  }

  def dedupStream(
      stream: DataFrame,
      tsCol: String,
      contentCol: String,
      watermarkDelay: String): DataFrame =
    stream
      // a NULL-content row gets a unique key, so it is never treated as
      // a duplicate — single source scan per microbatch (a filtered
      // self-union would read the upstream twice) and the watermark
      // applies uniformly; null-row state entries expire with the TTL
      .withColumn("__h", F.coalesce(F.sha2(F.col(contentCol), 256), F.uuid()))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")
}
