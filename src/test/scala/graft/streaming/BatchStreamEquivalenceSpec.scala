package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import graft.sketch.{DDSketch, DataDogCodec, functions => G}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

/**
 * Batch ≡ streaming equivalence over the REAL sf0.001 events table: the
 * streaming operators must produce the same sketches as the
 * oracle-checked batch aggregations on identical input. Bin stores,
 * counts, zero counts, and min/max are integer-exact and compared
 * exactly; only the `sum` field is floating-point accumulation-order
 * dependent (batch and streaming merge partials in different orders),
 * so it gets a 1e-9 relative tolerance.
 */
class BatchStreamEquivalenceSpec extends SparkTestBase {

  private def assertSketchEqual(a: Array[Byte], b: Array[Byte], where: String): Unit = {
    val sa = DataDogCodec.decode(a)
    val sb = DataDogCodec.decode(b)
    assert(sa.relativeAccuracy === sb.relativeAccuracy, s"$where gamma")
    assert(sa.countLong === sb.countLong, s"$where count")
    assert(sa.zeroCount === sb.zeroCount, s"$where zeroCount")
    assert(sa.min === sb.min, s"$where min")
    assert(sa.max === sb.max, s"$where max")
    def assertBins(x: graft.sketch.BinStore, y: graft.sketch.BinStore, side: String): Unit = {
      assert(x.size === y.size, s"$where $side bin count")
      var i = 0
      while (i < x.size) {
        assert(x.indexAt(i) === y.indexAt(i), s"$where $side bin index $i")
        assert(x.countAt(i) === y.countAt(i), s"$where $side bin count $i")
        i += 1
      }
    }
    assertBins(sa.positives, sb.positives, "pos")
    assertBins(sa.negatives, sb.negatives, "neg")
    assert(math.abs(sa.sum - sb.sum) <= 1e-9 * math.abs(sb.sum), s"$where sum")
  }

  private def eventRows(): Array[(Timestamp, String, Double)] = {
    val session = spark
    import session.implicits._
    sf("sf0.001", "events")
      .select(F.col("ts").cast("timestamp"), F.col("event_type"),
              F.col("value").cast("double"))
      .as[(Timestamp, String, Double)]
      .collect()
  }

  test("windowedSketchAgg over a stream equals the batch windowed aggregation") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    assert(rows.length > 100)

    val batch = rows.toSeq.toDF("ts", "event_type", "value")
      .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
      .agg(G.ddsketch_agg_values(F.col("value")).as("sketch"))
      .select(F.col("window.start").cast("long").as("ws"), F.col("event_type"), F.col("sketch"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getAs[Array[Byte]](2)).toMap

    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = SketchStreaming.windowedSketchAgg(
      input.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", "value", "1 hour", "365 days")
    val query = agg.writeStream.format("memory").queryName("bs_win")
      .outputMode("complete").start()
    try {
      // three micro-batches: partial state must merge across batches
      val chunks = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
      chunks.foreach { c => input.addData(c.toSeq); query.processAllAvailable() }

      val streamed = spark.sql(
        """SELECT unix_timestamp(window.start) AS ws, event_type, sketch
          |FROM bs_win""".stripMargin)
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getAs[Array[Byte]](2)).toMap

      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (k, bytes) => assertSketchEqual(bytes, batch(k), k.toString) }
    } finally query.stop()
  }

  test("driftStream per-window PSI equals the batch formula on identical input") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    val cuts = Seq(10.0, 25.0, 50.0, 100.0, 250.0)
    val batchDf = rows.toSeq.toDF("ts", "event_type", "value")
    val ref = graft.pipeline.Drift.referenceBinCounts(batchDf, "value", cuts)
    // the operator itself run in BATCH mode (window agg works on a
    // static frame; the watermark is a no-op) is the reference
    val batch = SketchStreaming
      .driftStream(batchDf, "ts", "value", "1 hour", "365 days", cuts, ref)
      .select(F.col("window.start").cast("long").as("ws"), F.col("n"), F.col("psi"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = SketchStreaming.driftStream(
      input.toDF().toDF("ts", "event_type", "value"),
      "ts", "value", "1 hour", "365 days", cuts, ref)
    val query = agg.writeStream.format("memory").queryName("bs_drift")
      .outputMode("complete").start()
    try {
      val chunks = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
      chunks.foreach { c => input.addData(c.toSeq); query.processAllAvailable() }
      val streamed = spark.sql(
        """SELECT unix_timestamp(window.start) AS ws, n, psi FROM bs_drift""")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(streamed.keySet === batch.keySet)
      assert(streamed.nonEmpty)
      streamed.foreach { case (k, (n, psi)) =>
        assert(n === batch(k)._1, s"n at $k")
        // 4dp-rounded on both sides; partial-sum order may differ
        assert(math.abs(psi - batch(k)._2) <= 1e-4 + 1e-12, s"psi at $k")
      }
    } finally query.stop()
  }

  test("runningSketchPerKey final emission equals the batch per-key sketch") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()

    val batch = rows.toSeq.toDF("ts", "event_type", "value")
      .groupBy(F.col("event_type"))
      .agg(G.ddsketch_agg_values(F.col("value")).as("sketch"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap

    val input = MemoryStream[(Timestamp, String, Double)]
    val out = SketchStreaming.runningSketchPerKey(
      input.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", "value", watermarkDelay = "365 days")
    val query = out.writeStream.format("memory").queryName("bs_run")
      .outputMode("append").start()
    try {
      val chunks = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
      chunks.foreach { c => input.addData(c.toSeq); query.processAllAvailable() }

      // the LAST emission per key is the lifetime-to-date sketch
      val streamed = spark.sql(
        """SELECT key, sketch FROM (
          |  SELECT key, sketch, n_updates,
          |         row_number() OVER (PARTITION BY key ORDER BY n_updates DESC) AS rn
          |  FROM bs_run) WHERE rn = 1""".stripMargin)
        .collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap

      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (k, bytes) => assertSketchEqual(bytes, batch(k), k) }
    } finally query.stop()
  }

  test("dedupStream keeps exactly the batch-distinct set of content hashes") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = sf("sf0.001", "documents")
      .select(F.col("doc_id"), F.col("text")).limit(200)
      .as[(Long, String)].collect()
    // duplicate every doc once so the stream contains real dupes
    val rows = (docs ++ docs).zipWithIndex.map { case ((id, text), i) =>
      (Timestamp.valueOf(f"2026-01-01 10:${i % 60}%02d:00"), id, text)
    }

    val batchHashes = docs.map(_._2).map(t =>
      java.security.MessageDigest.getInstance("SHA-256").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).toSet

    val input = MemoryStream[(Timestamp, Long, String)]
    val dd = SketchStreaming.dedupStream(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", "text", "365 days")
    val query = dd.writeStream.format("memory").queryName("bs_dd")
      .outputMode("append").start()
    try {
      input.addData(rows.toSeq)
      query.processAllAvailable()
      val kept = spark.sql("SELECT sha2(text, 256) AS h FROM bs_dd")
        .as[String].collect()
      assert(kept.length === kept.distinct.length)          // no dupes emitted
      assert(kept.toSet === batchHashes)                    // same distinct set as batch
    } finally query.stop()
  }

  test("incremental embedding dedup over a signature index is batch≡stream") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val emb = sf("sf0.001", "embeddings")
    val hist = emb.filter(F.col("vec_id") % 3 =!= 0)
      .select(F.col("vec_id"), F.col("embedding"))
    // fresh batch = remaining vectors PLUS exact copies of 5 history
    // vectors (shifted ids) so true duplicates certainly exist
    val copies = hist.filter(F.col("vec_id") < 16)
      .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
    val fresh = emb.filter(F.col("vec_id") % 3 === 0)
      .select(F.col("vec_id"), F.col("embedding")).union(copies)
    val index = Dedup.buildVectorSignatureIndex(hist, "vec_id", "embedding")
      .localCheckpoint(eager = false)

    val batchPairs = Dedup.incrementalEmbeddingDuplicates(
        fresh, index, "vec_id", "embedding", 0.99)
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    assert(copies.select("vec_id").as[Long].collect()
      .forall(id => batchPairs.exists(_._1 == id)))   // every copy caught

    val rows = fresh.as[(Long, Array[Float])].collect()
    val input = MemoryStream[(Long, Array[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
    val q = Dedup.incrementalEmbeddingDuplicates(
        stream, index, "vec_id", "embedding", 0.99)
      .writeStream.format("memory").queryName("bs_embdup")
      .outputMode("append").start()
    try {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      val streamPairs = spark.sql("SELECT id_new, id_old FROM bs_embdup")
        .as[(Long, Long)].collect().toSet
      assert(streamPairs === batchPairs)
    } finally q.stop()
  }

  test("streaming minhash near-dup probe over a signature index is batch≡stream") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val docs = sf("sf0.001", "documents")
      .filter(F.col("text").isNotNull)
      .select(F.col("doc_id"), F.col("text"))
    val hist = docs.filter(F.col("doc_id") % 3 =!= 0)
    // fresh batch = remaining docs PLUS near-copies of 5 history docs
    // (shifted ids, one appended token) so qualifying pairs certainly exist
    val copies = hist.filter(F.col("doc_id") < 16)
      .select((F.col("doc_id") + 100000L).as("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).as("text"))
    val fresh = docs.filter(F.col("doc_id") % 3 === 0).union(copies)
    val index = Dedup.buildSignatureIndex(hist, "doc_id", "text", 5, 16, 8)
      .localCheckpoint(eager = false)

    val batchPairs = Dedup.incrementalNearDuplicatePairs(
        fresh, index, hist, "doc_id", "text", 5, 0.8, 16, 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(copies.select("doc_id").as[Long].collect()
      .forall(id => batchPairs.exists(_._1 == id)))   // every copy caught

    val rows = fresh.as[(Long, String)].collect().map { case (id, text) =>
      (Timestamp.valueOf("2026-01-01 10:00:00"), id, text)
    }
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = SketchStreaming.nearDupStream(
      input.toDF().toDF("ts", "doc_id", "text"),
      "ts", "doc_id", "text", index, hist, "doc_id", "text",
      watermarkDelay = "365 days",
      shingleSize = 5, threshold = 0.8, bands = 16, rowsPerBand = 8)
    val q = out.writeStream.format("memory").queryName("bs_neardup")
      .outputMode("append").start()
    try {
      // two micro-batches: the pair-dedup state must hold across batches
      val chunks = rows.grouped(rows.length / 2 + 1).toSeq
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      val streamPairs = spark.sql(
          "SELECT id_new, id_old, inter, uni FROM bs_neardup")
        .as[(Long, Long, Long, Long)].collect()
      assert(streamPairs.length === streamPairs.distinct.length) // once per pair
      assert(streamPairs.toSet === batchPairs)
    } finally q.stop()
  }

  test("incremental perceptual media dedup over a hash index is batch≡stream") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.{Dedup, Multimodal}
    val docs = sf("sf0.001", "documents").select(F.col("doc_id"))
      .filter(F.col("doc_id") < 150)
    val hist = Multimodal.plantedNearDupMedia(
      docs.filter(F.col("doc_id") % 3 =!= 2), "doc_id")
    val index = Multimodal.buildMediaHashIndex(hist)
      .localCheckpoint(eager = false)
    val batchMedia = Multimodal.plantedNearDupMedia(
      docs.filter(F.col("doc_id") % 3 === 2), "doc_id")
    val batchPairs = Multimodal
      .incrementalNearDuplicateMedia(batchMedia, index, maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    assert(batchPairs.nonEmpty)

    // stream the same payloads; the stateless per-band match form
    // applies to a streaming batch unchanged (stream-static join)
    val rows = batchMedia.toDF().select("media_id", "payload")
      .as[(Long, Array[Byte])].collect()
    val input = MemoryStream[(Long, Array[Byte])]
    val stream = input.toDF().toDF("media_id", "payload")
      .withColumn("modality", F.lit("image"))
      .withColumn("meta_bytes", F.lit(0L))
      .withColumn("meta_source", F.lit("planted"))
      .as[Multimodal.MediaRecord]
    val q = Dedup.incrementalHammingMatches(
        Multimodal.perceptualHash(stream).select(F.col("media_id"), F.col("phash")),
        index, "media_id", "phash", maxHamming = 6)
      .writeStream.format("memory").queryName("bs_mediadup")
      .outputMode("append").start()
    try {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      val streamPairs = spark.sql("SELECT id_new, id_old, hamming FROM bs_mediadup")
        .as[(Long, Long, Int)].collect().toSet   // per-band rows collapse in the set
      assert(streamPairs === batchPairs)
    } finally q.stop()
  }

  test("mediaDupStream over a hash index is batch≡stream, once per pair") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.{Dedup, Multimodal}
    val docs = sf("sf0.001", "documents").select(F.col("doc_id"))
      .filter(F.col("doc_id") < 150)
    val hist = Multimodal.plantedNearDupMedia(
      docs.filter(F.col("doc_id") % 3 =!= 2), "doc_id")
    val index = Multimodal.buildMediaHashIndex(hist)
      .localCheckpoint(eager = false)
    val batchMedia = Multimodal.plantedNearDupMedia(
      docs.filter(F.col("doc_id") % 3 === 2), "doc_id")
    val batchPairs = Multimodal
      .incrementalNearDuplicateMedia(batchMedia, index, maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    assert(batchPairs.nonEmpty)

    val rows = batchMedia.toDF().select("media_id", "modality", "payload")
      .as[(Long, String, Array[Byte])].collect().map { case (id, m, p) =>
        (Timestamp.valueOf("2026-01-01 10:00:00"), id, m, p)
      }
    val input = MemoryStream[(Timestamp, Long, String, Array[Byte])]
    val out = SketchStreaming.mediaDupStream(
      input.toDF().toDF("ts", "media_id", "modality", "payload"),
      "ts", "media_id", "modality", "payload", index,
      watermarkDelay = "365 days", maxHamming = 6)
    val q = out.writeStream.format("memory").queryName("bs_mediastream")
      .outputMode("append").start()
    try {
      // two micro-batches: pair-dedup state must hold across batches
      val chunks = rows.grouped(rows.length / 2 + 1).toSeq
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      val streamPairs = spark.sql(
          "SELECT id_new, id_old, hamming FROM bs_mediastream")
        .as[(Long, Long, Int)].collect()
      assert(streamPairs.length === streamPairs.distinct.length) // once per pair
      assert(streamPairs.toSet === batchPairs)
    } finally q.stop()

    // geometry guard: probing a bands=4 index with the default 8 throws
    val idx4 = Multimodal.buildMediaHashIndex(hist, bands = 4)
      .localCheckpoint(eager = false)
    intercept[IllegalArgumentException] {
      SketchStreaming.mediaDupStream(
        input.toDF().toDF("ts", "media_id", "modality", "payload"),
        "ts", "media_id", "modality", "payload", idx4,
        watermarkDelay = "365 days", maxHamming = 3)
    }
  }

  test("embeddingDriftStream per-window PSI equals the batch embeddingDrift") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.{Drift, Similarity}
    val emb = sf("sf0.001", "embeddings")
      .filter(F.col("embedding").isNotNull)
      .select(F.col("vec_id"), F.col("embedding"))
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nlist = 8, iterations = 2)
    // window A: the index's own vectors (psi exactly 0); window B: a
    // skewed slice (every 7th vector, then 30 copies of vector 0)
    val wA = emb.select(F.col("embedding"))
      .as[Array[Float]].collect().map((Timestamp.valueOf("2026-01-01 10:00:00"), _))
    val skew = emb.filter(F.col("vec_id") % 7 === 0)
      .select(F.col("embedding")).as[Array[Float]].collect() ++
      Array.fill(30)(emb.filter(F.col("vec_id") === 0)
        .select(F.col("embedding")).as[Array[Float]].head())
    val wB = skew.map((Timestamp.valueOf("2026-01-01 12:00:00"), _))
    val input = MemoryStream[(Timestamp, Array[Float])]
    val out = SketchStreaming.embeddingDriftStream(
      input.toDF().toDF("ts", "embedding"), "ts", "embedding", idx,
      "1 hour", "10 minutes")
    val q = out.writeStream.format("memory").queryName("bs_edrift")
      .outputMode("complete").start()
    try {
      input.addData((wA ++ wB).toSeq)
      q.processAllAvailable()
      val got = spark.sql("SELECT window.start, n, psi FROM bs_edrift")
        .as[(Timestamp, Long, Double)].collect()
        .map { case (w, n, p) => w.toString -> ((n, p)) }.toMap
      assert(got.size === 2)
      val (nA, psiA) = got("2026-01-01 10:00:00.0")
      assert(nA === emb.count() && psiA === 0.0)
      val (nB, psiB) = got("2026-01-01 12:00:00.0")
      assert(nB === skew.length.toLong)
      // batch twin on the same slice — identical formula, same 4dp
      // (allow one rounding-boundary ulp between agg orders)
      val batchPsi = Drift.embeddingDrift(idx,
        skew.toSeq.toDF("embedding"), "embedding").head().getDouble(2)
      assert(math.abs(psiB - batchPsi) <= 2e-4, s"$psiB vs $batchPsi")
      assert(psiB > 0.0)
    } finally q.stop()
  }

  test("streamToTextIndex equals a full rebuild; a replayed micro-batch is a no-op") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Retrieval
    val docs = sf("sf0.001", "documents")
      .filter(F.col("text").isNotNull).select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_tidx_str").toString
    Retrieval.buildTextIndex(docs.filter(F.col("doc_id") % 3 =!= 0),
      "doc_id", "text", buckets = 16).save(path)
    val rows = docs.filter(F.col("doc_id") % 3 === 0)
      .as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = Retrieval.streamToTextIndex(
        input.toDF().toDF("doc_id", "text"), path, "doc_id", "text")
      .start()
    try {
      rows.grouped(rows.length / 2 + 1)
        .foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val grown = Retrieval.loadTextIndex(spark, path)
    val rebuilt = Retrieval.buildTextIndex(docs, "doc_id", "text", buckets = 16)
    assert(grown.nDocs === rebuilt.nDocs)
    assert(grown.dlSum === rebuilt.dlSum)       // stats are EXACT deltas
    assert(grown.avgdl === rebuilt.avgdl)       // fresh mean either way
    def posts(df: org.apache.spark.sql.DataFrame) =
      df.select("term", "id", "tf", "dl").collect().map(_.toSeq).toSet
    assert(posts(grown.postings) === posts(rebuilt.postings))
    // replaying micro-batch 0 (dynamic overwrite of its own partitions
    // + its own stats row) leaves the index IDENTICAL — no double count
    val firstChunk = rows.grouped(rows.length / 2 + 1).toSeq.head
    Retrieval.appendBatchToTextIndex(spark, path,
      firstChunk.toSeq.toDF("doc_id", "text"), "doc_id", "text", batchId = 0L)
    val replayed = Retrieval.loadTextIndex(spark, path)
    assert(replayed.nDocs === rebuilt.nDocs && replayed.dlSum === rebuilt.dlSum)
    assert(posts(replayed.postings) === posts(rebuilt.postings))
  }

  test("canaryStream scan+verify is batch≡stream (stateless, append mode)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Canary
    val docs = sf("sf0.001", "documents").select("doc_id", "text")
    val planted = Canary.plant(docs, "doc_id", "text", "rX", fraction = 0.2)
    val batch = Canary.verify(
        Canary.scan(planted, "doc_id", "text"),
        "rX", docs.select("doc_id"), "doc_id")
      .select("doc_id", "canary", "source_id")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(batch.nonEmpty && batch.forall { case (id, _, src) => src.contains(id) })

    val rows = planted.as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val out = SketchStreaming.canaryStream(
      input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", "rX", docs.select("doc_id"), "doc_id")
    val q = out.writeStream.format("memory").queryName("bs_canary")
      .outputMode("append").start()
    try {
      rows.grouped(rows.length / 2 + 1)
        .foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      val got = spark.sql("SELECT doc_id, canary, source_id FROM bs_canary")
        .as[(Long, String, Option[Long])].collect().toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("map-only curation (decontamination, boilerplate strip) is batch≡stream") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.{Boilerplate, Decontaminate}
    val staticDocs = sf("sf0.001", "documents").select("doc_id", "text")
    val benchmark = staticDocs.filter(F.col("doc_id") % 17 === 0).select("text")
    val boiler = Boilerplate.frequentSegmentSet(staticDocs, "text", "\\s+", 350L)
    assert(boiler.nonEmpty)

    val batchFlags = Decontaminate
      .contaminationFlags(staticDocs, "doc_id", "text", benchmark, "text", n = 5)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val batchStrip = Boilerplate
      .stripBoilerplateWith(staticDocs, boiler, "text", "\\s+", " ")
      .as[(Long, String)].collect().toMap

    val rows = staticDocs.as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    // both ops are stateless map-only scans: they apply to a streaming
    // DataFrame unchanged (broadcast set probes, no state store)
    val flagged = Decontaminate
      .contaminationFlags(stream, "doc_id", "text", benchmark, "text", n = 5)
    val stripped = Boilerplate
      .stripBoilerplateWith(stream, boiler, "text", "\\s+", " ")
    val q1 = flagged.writeStream.format("memory").queryName("bs_decon")
      .outputMode("append").start()
    val q2 = stripped.writeStream.format("memory").queryName("bs_boiler")
      .outputMode("append").start()
    try {
      input.addData(rows.toSeq)
      q1.processAllAvailable()
      q2.processAllAvailable()
      val streamFlags = spark.table("bs_decon")
        .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val streamStrip = spark.table("bs_boiler")
        .as[(Long, String)].collect().toMap
      assert(streamFlags === batchFlags)
      assert(streamStrip === batchStrip)
    } finally { q1.stop(); q2.stop() }
  }

  test("incremental exact dedup is batch≡stream (broadcast bloom + stream-static semi-join)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val docs = sf("sf0.001", "documents").select("doc_id", "text")
    val hist = docs.filter(F.col("doc_id") % 3 =!= 0)
    val freshRows = docs.filter(F.col("doc_id") % 3 === 0)
      .union(hist.filter(F.col("doc_id") % 7 === 0)
        .select((F.col("doc_id") + 1000000L).as("doc_id"), F.col("text")))
      .as[(Long, String)].collect()
    val index = Dedup.buildContentHashIndex(hist, "text")
      .localCheckpoint(eager = false)
    val batch = Dedup.incrementalExactDuplicates(
        freshRows.toSeq.toDF("doc_id", "text"), index, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(batch.nonEmpty)

    val input = MemoryStream[(Long, String)]
    val q = Dedup.incrementalExactDuplicates(
        input.toDF().toDF("doc_id", "text"), index, "doc_id", "text")
      .select("doc_id")
      .writeStream.format("memory").queryName("bs_inc_exact")
      .outputMode("append").start()
    try {
      input.addData(freshRows.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("bs_inc_exact").as[Long].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("BPE tokenization is batch≡stream (broadcast rank table, per-thread memo, no state)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Vocab
    val staticDocs = sf("sf0.001", "documents").select("doc_id", "text")
      .filter(F.col("doc_id") < 100)
    val merges = Vocab.learnBpeMerges(staticDocs, "text", 12).map(m => (m._1, m._2))
    val batch = Vocab.tokenizeBpe(staticDocs, "text", merges)
      .select("doc_id", "tokens")
      .as[(Long, Seq[String])].collect().toMap

    val rows = staticDocs.as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = Vocab.tokenizeBpe(input.toDF().toDF("doc_id", "text"), "text", merges)
      .select("doc_id", "tokens")
      .writeStream.format("memory").queryName("bs_tok").outputMode("append").start()
    try {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("bs_tok")
        .as[(Long, Seq[String])].collect().toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("unigram-LM tokenization is batch≡stream (broadcast model, stateless map)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.UnigramLm
    val staticDocs = sf("sf0.001", "documents").select("doc_id", "text")
      .filter(F.col("doc_id") < 100)
    val model = UnigramLm.learn(staticDocs, "text", vocabSize = 128, iters = 2)
    val batch = UnigramLm.tokenize(staticDocs, "text", model)
      .select("doc_id", "tokens")
      .as[(Long, Seq[String])].collect().toMap

    val rows = staticDocs.as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = UnigramLm.tokenize(input.toDF().toDF("doc_id", "text"), "text", model)
      .select("doc_id", "tokens")
      .writeStream.format("memory").queryName("bs_tok_uni").outputMode("append").start()
    try {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("bs_tok_uni")
        .as[(Long, Seq[String])].collect().toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("WordPiece tokenization is batch≡stream (broadcast pieces, per-thread memo, no state)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.WordPiece
    val staticDocs = sf("sf0.001", "documents").select("doc_id", "text")
      .filter(F.col("doc_id") < 100)
    val model = WordPiece.learn(staticDocs, "text", vocabSize = 128)
    val batch = WordPiece.tokenize(staticDocs, "text", model)
      .select("doc_id", "tokens")
      .as[(Long, Seq[String])].collect().toMap

    val rows = staticDocs.as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = WordPiece.tokenize(input.toDF().toDF("doc_id", "text"), "text", model)
      .select("doc_id", "tokens")
      .writeStream.format("memory").queryName("bs_tok_wp")
      .outputMode("append").start()
    try {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("bs_tok_wp")
        .as[(Long, Seq[String])].collect().toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("DSIR scoring and compression ratio are batch≡stream (broadcast model, map-only)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val staticDocs = sf("sf0.001", "documents").select("doc_id", "text")
      .filter(F.col("doc_id") < 100)
    val target = staticDocs.filter(F.col("doc_id") % 5 === 0).select("text")
    val m = graft.pipeline.Dsir.learn(staticDocs, target, "text", 1 << 12)
    def shape(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.Dsir.score(df, "text", m)
        .withColumn("cr",
          graft.pipeline.TextFunctions.compressionRatio(F.col("text")))
        .select("doc_id", "dsir_score", "cr")
    val batch = shape(staticDocs).as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val rows = staticDocs.as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = shape(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("bs_dsir")
      .outputMode("append").start()
    try {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("bs_dsir")
        .as[(Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("index gram hits are batch≡stream (bloom predicate + stream-static semi-join)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val docs = sf("sf0.001", "documents").select("doc_id", "text")
    val hist = docs.filter(F.col("doc_id") % 3 =!= 0)
    val index = Dedup.buildGramIndex(hist, "text", k = 8)
      .localCheckpoint(eager = false)
    val freshRows = docs.filter(F.col("doc_id") % 3 === 0)
      .union(hist.filter(F.col("doc_id") % 7 === 0)
        .select((F.col("doc_id") + 1000000L).as("doc_id"), F.col("text")))
      .as[(Long, String)].collect()
    val batch = Dedup.indexGramHits(
        freshRows.toSeq.toDF("doc_id", "text"), index, "doc_id", "text", k = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty) // replayed history docs must hit

    val input = MemoryStream[(Long, String)]
    val q = Dedup.indexGramHits(
        input.toDF().toDF("doc_id", "text"), index, "doc_id", "text", k = 8)
      .writeStream.format("memory").queryName("bs_gram_hits")
      .outputMode("append").start()
    try {
      input.addData(freshRows.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("bs_gram_hits")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("multiWindowBurnStream: stream ≡ batch operator ≡ view-based multiWindowBurn") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600000L
    val base = 472224L * hour // epoch-aligned to hours, 4h slides, days
    // "bad" burns in both windows; "recovered" only in the long one
    val rows = (0 until 48).flatMap { h =>
      val ts = new Timestamp(base + h * hour)
      Seq(("bad", ts, 200.0),
        ("recovered", ts, if (h >= 46) 1.0 else 200.0))
    }.map { case (k, ts, v) => (ts, k, v) }
    val batchDf = rows.toDF("ts", "event_type", "value")

    // the operator run in batch mode is the reference
    def shape(df: org.apache.spark.sql.DataFrame) =
      SketchStreaming.multiWindowBurnStream(df, "ts", "event_type", "value",
        objective = 100.0, budget = 0.1,
        shortDuration = "2 hours", longDuration = "48 hours",
        slideDuration = "2 hours", watermarkDelay = "365 days")
    def collect(df: org.apache.spark.sql.DataFrame) = df
      .select(F.unix_millis(F.col("window.end")).as("e"), F.col("event_type"),
        F.col("n_short"), F.col("n_long"), F.col("burn_short"),
        F.col("burn_long"), F.col("alert"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4),
          r.getDouble(5), r.getBoolean(6))).toString).toMap
    val batch = collect(shape(batchDf))

    val input = MemoryStream[(Timestamp, String, Double)]
    val q = shape(input.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("bs_slo_multi")
      .outputMode("complete").start()
    try {
      val chunks = rows.grouped(rows.length / 3 + 1).toSeq
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      val streamed = collect(spark.table("bs_slo_multi"))
      assert(streamed === batch) // bins are exact adds → burn doubles identical
      assert(streamed.nonEmpty)
    } finally q.stop()

    // the window ending at the corpus end matches the batch VIEW form
    // (hour-bucket rollup + merge is exact bin addition)
    val dir = java.nio.file.Files.createTempDirectory("graft_slo_bs").toString
    graft.sketch.SketchView.materialize(
      batchDf, "ts", Seq("event_type"), "value", dir)
    val until = base + 48 * hour
    val viewForm = graft.sketch.Slo.multiWindowBurn(spark, dir,
        Seq("event_type"), objective = 100.0, budget = 0.1,
        untilMs = until, shortMs = 2 * hour, longMs = 48 * hour)
      .select(F.col("event_type"), F.col("n_short"), F.col("n_long"),
        F.col("burn_short"), F.col("burn_long"), F.col("alert"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    val lastWindow = collect(shape(batchDf)).collect {
      case ((e, k), v) if e == until => k -> v
    }
    assert(lastWindow.keySet === viewForm.keySet)
    viewForm.foreach { case (k, v) =>
      assert(lastWindow(k) === v.toString, s"key $k") }
    assert(viewForm("bad")._5 === true)
    assert(viewForm("recovered")._5 === false)
  }

  test("spanHitStream + mergeSpans covers a replayed history doc end to end") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val docs = sf("sf0.001", "documents").select("doc_id", "text")
      .filter(F.col("text").isNotNull)
    val hist = docs.filter(F.col("doc_id") % 3 =!= 0)
    val index = Dedup.buildGramIndex(hist, "text", k = 8)
      .localCheckpoint(eager = false)
    // fresh = the other slice + exact replays of history docs: a
    // replayed doc's merged span must be the WHOLE token range
    val replays = hist.filter(F.col("doc_id") % 7 === 0)
      .select((F.col("doc_id") + 1000000L).as("doc_id"), F.col("text"))
    val freshRows = docs.filter(F.col("doc_id") % 3 === 0).union(replays)
      .as[(Long, String)].collect()

    val batchMerged = Dedup.mergeSpans(
        Dedup.indexGramHits(freshRows.toSeq.toDF("doc_id", "text"),
          index, "doc_id", "text", k = 8), "doc_id")
      .as[(Long, Long, Long)].collect().toSet

    val input = MemoryStream[(Long, String)]
    val q = SketchStreaming.spanHitStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", index, k = 8)
      .writeStream.format("memory").queryName("bs_span_hits")
      .outputMode("append").start()
    try {
      val chunks = freshRows.grouped(freshRows.length / 2 + 1).toSeq
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      val streamMerged = Dedup.mergeSpans(
          spark.table("bs_span_hits"), "doc_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamMerged === batchMerged)
      // every replayed doc is fully covered by one maximal span
      val nToks = replays.select(F.col("doc_id"),
          F.size(F.filter(F.split(F.col("text"), "\\s+"),
            t => F.length(t) > 0)).cast("long"))
        .as[(Long, Long)].collect().toMap
      nToks.foreach { case (id, n) =>
        if (n >= 8)
          assert(streamMerged.contains((id, 1L, n)), s"doc $id not covered")
      }
    } finally q.stop()
  }

  test("editOneStream equals the batch incremental edit-1 pairs, once per pair") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val keys = sf("sf0.001", "documents").select(F.col("doc_id"),
      F.md5(F.col("doc_id").cast("string")).as("k"))
    val variants = keys.select(
      (F.col("doc_id") + 1000000L).as("doc_id"),
      F.concat(F.lit("z"), F.substring(F.col("k"), 2, 100)).as("k"))
    val index = Dedup.buildEditOneIndex(keys, "doc_id", "k")
      .localCheckpoint(eager = false)
    val batchPairs = Dedup.incrementalEditOnePairs(index,
        variants, "doc_id", "k")
      .as[(Long, Long)].collect().toSet
    assert(batchPairs.nonEmpty)

    val rows = variants.as[(Long, String)].collect().map { case (id, k) =>
      (Timestamp.valueOf("2026-01-01 10:00:00"), id, k)
    }
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = SketchStreaming.editOneStream(
        input.toDF().toDF("ts", "doc_id", "k"),
        "ts", "doc_id", "k", index, watermarkDelay = "365 days")
      .writeStream.format("memory").queryName("bs_editone")
      .outputMode("append").start()
    try {
      // two micro-batches, the second REPLAYING part of the first:
      // the pair-dedup state must emit each pair exactly once
      val half = rows.length / 2 + 1
      input.addData(rows.take(half).toSeq); q.processAllAvailable()
      input.addData(rows.toSeq); q.processAllAvailable()
      val streamed = spark.table("bs_editone")
        .as[(Long, Long)].collect()
      assert(streamed.length === streamed.distinct.length)
      assert(streamed.toSet === batchPairs)
    } finally q.stop()
  }

  test("WARC record explode + WET conversion is batch≡stream (stateless map-only)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Warc

    val files = (0L until 6L).map { i =>
      val recs = (0 until 3).map { j =>
        val html = s"<html><head><title>f$i r$j</title></head><body><p>body $i $j</p></body></html>"
        Warc.WarcRecord("resource", s"<urn:uuid:f$i-r$j>",
          s"http://example.com/$i/$j", "2026-01-01T00:00:00Z",
          "text/html; charset=utf-8", html.getBytes("UTF-8").length.toLong,
          html.getBytes("UTF-8"))
      }
      (i, Warc.writeWarc(recs))
    }

    val batchDf = files.toDF("file_id", "warc")
    val batch = Warc.wetConversion(Warc.records(batchDf, "file_id", "warc"))
      .as[(Long, String, Long, String)].collect().toSet
    assert(batch.size == 18)

    val input = MemoryStream[(Long, Array[Byte])]
    val stream = input.toDF().toDF("file_id", "warc")
    val q = Warc.wetConversion(Warc.records(stream, "file_id", "warc"))
      .writeStream.format("memory").queryName("bs_warc")
      .outputMode("append").start()
    try {
      input.addData(files)
      q.processAllAvailable()
      val streamed = spark.table("bs_warc")
        .as[(Long, String, Long, String)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("burstStream flags exactly the items rising past the baseline") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 472224L * 3600000L
    def ts(m: Int) = new Timestamp(base + m * 60000L)
    // baseline: u1 -> 10, u2 -> 1; u3 unseen
    val ref = Seq(("u1", 10L), ("u2", 1L)).toDF("item", "ref")
    // one 4h window: u1 x2 (rise 2/11 < .3), u2 x2 (rise 1.0), u3 x1 (rise 1.0)
    val rows = Seq.fill(2)(("k", ts(1), "u1")) ++
      Seq.fill(2)(("k", ts(2), "u2")) ++ Seq(("k", ts(3), "u3"))
    val input = MemoryStream[(String, Timestamp, String)]
    val out = SketchStreaming.burstStream(
      input.toDF().toDF("event_type", "ts", "item"),
      "ts", "event_type", "item", "4 hours", "365 days",
      ref, minRise = 0.3, topKCapacity = 16)
    val q = out.writeStream.format("memory").queryName("bs_burst")
      .outputMode("complete").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      val got = spark.table("bs_burst")
        .select("item", "count", "ref", "rise")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
            r.getDouble(3)))).toMap
      assert(got.keySet === Set("u2", "u3"))
      assert(got("u2") === ((2L, 1L, 1.0)))
      assert(got("u3") === ((1L, -1L, 1.0))) // unseen: NULL ref, add-one rise
    } finally q.stop()
  }
}
