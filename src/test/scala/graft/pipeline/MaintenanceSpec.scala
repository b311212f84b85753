package graft.pipeline

import org.apache.spark.sql.{functions => F}
import graft.SparkTestBase

/**
 * The maintenance mutex + writer-lease contracts for the persisted
 * index family (the SketchView `_compact_lock` protocol ported to
 * CellTable per the r11 verdict):
 *   - a second maintenance call inside the first's window gets a
 *     clean refusal (never interleaved journal/prune/rename);
 *   - a stale lock (crashed maintainer) is broken and the op proceeds;
 *   - writer-exclusive mutations refuse while a streaming-writer
 *     heartbeat is fresh, and proceed after releaseWriterLease;
 *   - maybeCompact triggers on the files-per-partition dial only;
 *   - journal paths containing commas survive crash recovery (the
 *     quote-aware readJson).
 */
class MaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = sf("sf0.001", "embeddings")
    .filter(F.col("embedding").isNotNull)
    .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def writeFile(path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def buildIvf(dir: String, batches: Int = 3): Unit = {
    val e = emb
    Similarity.buildIvfIndex(e.filter(F.col("vec_id") % 4 === 0),
      "vec_id", "embedding", nlist = 8, iterations = 2).save(dir)
    (1 to batches).foreach { m =>
      Similarity.appendToIvfIndexTouched(spark, dir,
        e.filter(F.col("vec_id") % 4 === m % 4), "vec_id", "embedding",
        batchId = m.toLong - 1L)
    }
  }

  test("a second maintenance call inside a compact's window is refused cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mx_lock").toString
    buildIvf(dir)
    var refused: Option[Throwable] = None
    // the afterJournal seam runs INSIDE the first maintainer's lock
    // window — exactly where a nightly compact could race a takedown
    CellTable.compact(spark, dir, s"$dir/assigned", afterJournal = () => {
      refused = Some(intercept[IllegalStateException] {
        Similarity.removeFromIvfIndex(spark, dir,
          emb.limit(3).select("vec_id"), "vec_id")
      })
    })
    assert(refused.exists(_.getMessage.contains("single-maintainer")))
    // the first maintainer finished normally and released the lock
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_maintenance_lock")))
    Similarity.removeFromIvfIndex(spark, dir,
      emb.limit(3).select("vec_id"), "vec_id") // now fine
  }

  test("a fresh foreign lock refuses; a stale lock is broken and the op proceeds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mx_stale").toString
    buildIvf(dir)
    val lock = s"$dir/_maintenance_lock"
    // fresh foreign lock -> clean refusal
    writeFile(lock, s"${System.currentTimeMillis()} 1")
    intercept[IllegalStateException] {
      Similarity.compactIvfIndex(spark, dir)
    }
    // stale lock (presumed-crashed maintainer) -> broken, op proceeds
    writeFile(lock,
      s"${System.currentTimeMillis() - Maintenance.LockStaleMs - 60000L} 1")
    val before = Similarity.loadIvfIndex(spark, dir).assigned.count()
    Similarity.compactIvfIndex(spark, dir)
    assert(Similarity.loadIvfIndex(spark, dir).assigned.count() === before)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(lock)))
  }

  test("writer-exclusive mutations refuse while a writer heartbeat is fresh") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mx_lease").toString
    buildIvf(dir)
    Maintenance.heartbeat(spark, dir) // a live streaming writer
    val ex = intercept[IllegalStateException] {
      Similarity.removeFromIvfIndex(spark, dir,
        emb.limit(3).select("vec_id"), "vec_id")
    }
    assert(ex.getMessage.contains("releaseWriterLease"))
    // the documented stop-the-writer flow: release, then mutate
    Maintenance.releaseWriterLease(spark, dir)
    Similarity.removeFromIvfIndex(spark, dir,
      emb.limit(3).select("vec_id"), "vec_id")
    // a crashed writer's heartbeat ages out instead of wedging forever
    writeFile(s"$dir/_writer_heartbeat",
      (System.currentTimeMillis() - Maintenance.DefaultWriterLeaseMs - 1000L)
        .toString)
    Maintenance.requireWriterStopped(spark, dir)
  }

  test("text-index stats fold and backfill enforce the writer lease too") {
    val docs = sf("sf0.001", "documents")
      .filter(F.col("text").isNotNull).select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_mx_tidx").toString
    Retrieval.buildTextIndex(docs, "doc_id", "text", buckets = 8).save(path)
    Maintenance.heartbeat(spark, path)
    intercept[IllegalStateException] {
      Retrieval.compactTextIndex(spark, path)
    }
    intercept[IllegalStateException] {
      Retrieval.removeFromTextIndex(spark, path,
        docs.limit(2).select("doc_id"), "doc_id")
    }
    Maintenance.releaseWriterLease(spark, path)
    Retrieval.compactTextIndex(spark, path) // proceeds after release

    // SketchView.backfill refuses under a live view writer
    val ev = sf("sf0.001", "events")
      .select(F.col("ts"), F.col("event_type"), F.col("value"))
    val vdir = java.nio.file.Files.createTempDirectory("graft_mx_view").toString
    graft.sketch.SketchView.materialize(
      ev, "ts", Seq("event_type"), "value", vdir)
    val span = graft.sketch.SketchView.DefaultPartSpanMs
    val lo = ev.agg(F.min(F.unix_millis(F.col("ts")))).head().getLong(0)
    val from = lo - java.lang.Math.floorMod(lo, span)
    Maintenance.heartbeat(spark, vdir)
    intercept[IllegalStateException] {
      graft.sketch.SketchView.backfill(ev, "ts", Seq("event_type"), "value",
        vdir, from, from + span)
    }
    Maintenance.releaseWriterLease(spark, vdir)
    graft.sketch.SketchView.backfill(ev, "ts", Seq("event_type"), "value",
      vdir, from, from + span)
  }

  test("maybeCompact triggers on the files-per-partition dial only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mx_auto").toString
    buildIvf(dir, batches = 3)
    def content() = Similarity.loadIvfIndex(spark, dir).assigned
      .select(F.col("neighbor_id").cast("long"), F.col("__cell"))
      .as[(Long, Int)].collect().sorted.toSeq
    val before = content()
    // 4 batches' files per touched cell: a generous dial stays quiet
    assert(!Similarity.maybeCompactIvfIndex(spark, dir, maxFilesPerCell = 50))
    assert(spark.read.parquet(s"$dir/assigned")
      .select(F.col("__batch").cast("long")).distinct().count() === 4L)
    // a tight dial triggers the fold; content is byte-identical
    assert(Similarity.maybeCompactIvfIndex(spark, dir, maxFilesPerCell = 1))
    assert(content() === before)
    // immediately after folding, the same dial is quiet again
    assert(!Similarity.maybeCompactIvfIndex(spark, dir, maxFilesPerCell = 1))

    // the SketchView twin
    val ev = sf("sf0.001", "events")
      .select(F.col("ts"), F.col("event_type"), F.col("value"))
    val vdir = java.nio.file.Files.createTempDirectory("graft_mx_autov").toString
    val evenHour = F.pmod(
      F.unix_millis(F.date_trunc("hour", F.col("ts"))) / 3600000L,
      F.lit(2)) === 0
    graft.sketch.SketchView.materialize(
      ev.filter(evenHour), "ts", Seq("event_type"), "value", vdir)
    graft.sketch.SketchView.append(
      ev.filter(!evenHour), "ts", Seq("event_type"), "value", vdir)
    assert(!graft.sketch.SketchView.maybeCompact(
      spark, vdir, Seq("event_type"), maxFilesPerPart = 50))
    assert(graft.sketch.SketchView.maybeCompact(
      spark, vdir, Seq("event_type"), maxFilesPerPart = 1))
    assert(!graft.sketch.SketchView.maybeCompact(
      spark, vdir, Seq("event_type"), maxFilesPerPart = 1))
  }

  test("retrainIvfIndex: staged swap, crash states consistent, replays suppressed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mx_rt").toString
    val e = emb
    Similarity.buildIvfIndex(e.filter(F.col("vec_id") % 2 === 0),
      "vec_id", "embedding", nlist = 4, iterations = 2).save(dir)
    Similarity.appendToIvfIndexTouched(spark, dir,
      e.filter(F.col("vec_id") % 2 =!= 0), "vec_id", "embedding", batchId = 0L)
    def ids() = Similarity.loadIvfIndex(spark, dir).assigned
      .select(F.col("neighbor_id").cast("long")).as[Long].collect().sorted.toSeq
    val before = ids()

    // a live writer refuses the retrain (writer-exclusive)
    Maintenance.heartbeat(spark, dir)
    intercept[IllegalStateException] {
      Similarity.retrainIvfIndex(spark, dir, nlist = 8)
    }
    Maintenance.releaseWriterLease(spark, dir)

    // crash BEFORE the journal: the old index stays live (4 centroids)
    intercept[RuntimeException] {
      Similarity.retrainIvfIndexImpl(spark, dir, 8, 2,
        afterStage = () => throw new RuntimeException("boom"), () => ())
    }
    assert(Similarity.loadIvfIndex(spark, dir).centroids.length === 4)
    assert(ids() === before)

    // crash AFTER the journal: recovery finishes the swap idempotently
    intercept[RuntimeException] {
      Similarity.retrainIvfIndexImpl(spark, dir, 8, 2,
        () => (), afterJournal = () => throw new RuntimeException("boom"))
    }
    Similarity.recoverRetrain(spark, dir)
    val re = Similarity.loadIvfIndex(spark, dir)
    assert(re.centroids.length === 8)
    assert(ids() === before, "retrain changed the content set")
    // assignment is SELF-consistent with the retrained centroids
    val cB = spark.sparkContext.broadcast(re.centroids)
    val mis = re.assigned.collect().count { r =>
      Similarity.nearestCentroid(cB.value,
        r.getAs[scala.collection.Seq[Float]]("__cv").toArray) != r.getInt(2)
    }
    assert(mis === 0, s"$mis rows assigned off their nearest centroid")
    // the rebuilt base layer absorbed the stream batch: its replay
    // must write nothing (watermark advanced by the retrain)
    Similarity.appendToIvfIndexTouched(spark, dir,
      e.filter(F.col("vec_id") % 2 =!= 0), "vec_id", "embedding", batchId = 0L)
    assert(ids() === before, "folded stream batch replayed after retrain")
    // planted exact copies probe rank-1 against the retrained index
    val probes = e.filter(F.col("vec_id") % 37 === 0)
      .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
    val hits = Similarity.ivfTopKIndexed(re, probes, "vec_id", "embedding", 1,
        nprobe = 1)
      .select("query_id", "neighbor_id", "cos").collect()
    assert(hits.length === probes.count())
    hits.foreach(r => assert(r.getLong(1) === r.getLong(0) - 100000L))
  }

  test("maybeRetrainIvfIndex: quiet on in-distribution batches, retrains on drift") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mx_mrt").toString
    val e = emb
    Similarity.buildIvfIndex(e, "vec_id", "embedding",
      nlist = 4, iterations = 2).save(dir)
    // a batch drawn from the index's own distribution: PSI ~ 0, quiet
    val (ran1, psi1) = Similarity.maybeRetrainIvfIndex(
      spark, dir, e.limit(200), "embedding", psiThreshold = 0.2)
    assert(!ran1 && psi1 < 0.05, s"psi=$psi1")
    assert(Similarity.loadIvfIndex(spark, dir).centroids.length === 4)
    // a shifted batch collapses into few cells: PSI blows the dial
    val shiftU = F.udf((v: Seq[Float]) => v.map(x => x + 25.0f).toArray)
    val shifted = e.limit(300)
      .select(F.col("vec_id"), shiftU(F.col("embedding")).as("embedding"))
    val (ran2, psi2) = Similarity.maybeRetrainIvfIndex(
      spark, dir, shifted, "embedding", psiThreshold = 0.2, nlist = 8)
    assert(ran2 && psi2 >= 0.2, s"psi=$psi2")
    assert(Similarity.loadIvfIndex(spark, dir).centroids.length === 8)
    assert(Similarity.loadIvfIndex(spark, dir).assigned.count() === e.count())
  }

  test("retrain parity: HNSW and IVF-PQ staged swaps; stale rotation deleted") {
    val e = emb
    // HNSW: retrain regrows the navigation geometry; content invariant
    val hDir = java.nio.file.Files.createTempDirectory("graft_mx_hrt").toString
    Hnsw.buildHnswIndex(e.filter(F.col("vec_id") % 2 === 0),
      "vec_id", "embedding", maxNav = 16, m = 8, efConstruction = 48)
      .save(hDir)
    Hnsw.appendToHnswIndex(spark, hDir,
      e.filter(F.col("vec_id") % 2 =!= 0), "vec_id", "embedding")
    def hIds() = Hnsw.loadHnswIndex(spark, hDir).assigned
      .select(F.col("neighbor_id").cast("long")).as[Long].collect().sorted.toSeq
    val hBefore = hIds()
    val hre = Hnsw.retrainHnswIndex(spark, hDir, maxNav = 24, m = 8,
      efConstruction = 48)
    assert(hre.graph.vecs.length === 24)
    assert(hIds() === hBefore)
    val hProbe = e.limit(3)
      .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
    Hnsw.hnswTopK(hre, hProbe, "vec_id", "embedding", 1,
        efSearch = 16, minProbe = 1, probeMass = 0.0)
      .select("query_id", "neighbor_id").collect()
      .foreach(r => assert(r.getLong(1) === r.getLong(0) - 100000L))

    // PQ: OPQ -> plain retrain must DELETE the stale rotation (it
    // would silently rotate queries against unrotated codes)
    val pDir = java.nio.file.Files.createTempDirectory("graft_mx_prt").toString
    ProductQuantization.buildOpqIvfPq(e, "vec_id", "embedding",
      nlist = 8, m = 16, ksub = 16, iterations = 2, opqIters = 2).save(pDir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$pDir/rotation")))
    val plain = ProductQuantization.retrainIvfPq(spark, pDir, e,
      "vec_id", "embedding", nlist = 8, m = 16, ksub = 16, iterations = 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$pDir/rotation")),
      "stale rotation survived the OPQ -> plain retrain")
    assert(plain.encoded.count() === e.count())
    // ... and plain -> OPQ brings it back, probing rank-1 on copies
    val opq = ProductQuantization.retrainOpqIvfPq(spark, pDir, e,
      "vec_id", "embedding", nlist = 8, m = 16, ksub = 16,
      iterations = 2, opqIters = 2)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$pDir/rotation")))
    val pProbe = e.limit(3)
      .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
    ProductQuantization.opqIvfPqTopK(opq, e, pProbe, "vec_id", "embedding",
        1, nprobe = 2, poolSize = 64)
      .select("query_id", "neighbor_id").collect()
      .foreach(r => assert(r.getLong(1) === r.getLong(0) - 100000L))
  }

  test("lock renewal: a live holder past the staleness horizon survives a break attempt") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mx_renew").toString
    val lockPath = new org.apache.hadoop.fs.Path(s"$dir/_maintenance_lock")
    val staleMs = 1200L // renewal period = staleMs/4 = 300ms
    val started = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(1)
    @volatile var holderErr: Throwable = null
    val holder = new Thread(() => {
      try Maintenance.withLockAt(spark, lockPath, staleMs) {
        started.countDown()
        done.await(30, java.util.concurrent.TimeUnit.SECONDS)
        ()
      } catch { case e: Throwable => holderErr = e }
    })
    holder.start()
    assert(started.await(10, java.util.concurrent.TimeUnit.SECONDS))
    // well past the ACQUIRE-time horizon: without renewal this lock
    // would be judged stale and broken; renewal keeps the stamp fresh
    Thread.sleep(3 * staleMs)
    val ex = intercept[IllegalStateException] {
      Maintenance.withLockAt(spark, lockPath, staleMs) { () }
    }
    assert(ex.getMessage.contains("fresh lock"),
      s"live holder was stale-broken: ${ex.getMessage}")
    done.countDown()
    holder.join(30000)
    assert(holderErr == null, s"holder failed: $holderErr")
    // released cleanly once the holder finished
    assert(!fs.exists(lockPath))
    // the crashed-holder path is UNCHANGED: a never-renewed stamp past
    // the horizon still breaks
    writeFile(lockPath.toString, s"${System.currentTimeMillis() - 10 * staleMs} 1")
    Maintenance.withLockAt(spark, lockPath, staleMs) { () }
    assert(!fs.exists(lockPath))
  }

  test("release verifies the holder token: a stolen lock is never clobbered") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mx_steal").toString
    val lockPath = new org.apache.hadoop.fs.Path(s"$dir/_maintenance_lock")
    // huge staleMs so the renewal timer never fires during the test
    Maintenance.withLockAt(spark, lockPath, 3600000L) {
      // simulate a (mis-dialed) breaker stealing and re-creating the
      // lock mid-hold: the old holder's release must NOT delete it
      writeFile(lockPath.toString, s"${System.currentTimeMillis()} 999999 FOREIGN")
    }
    assert(fs.exists(lockPath), "release clobbered a re-created lock")
    val content = {
      val in = fs.open(lockPath)
      val b = new Array[Byte](64)
      val n = try in.read(b) finally in.close()
      new String(b, 0, n, "UTF-8")
    }
    assert(content.contains("FOREIGN"))
  }

  test("sink-side gate: refused inside a writer-exclusive window, open after; orphan markers ignored") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mx_excl").toString
    buildIvf(dir)
    var refused: Option[Throwable] = None
    Maintenance.withExclusiveLock(spark, dir) {
      refused = Some(intercept[IllegalStateException] {
        Maintenance.requireNoExclusiveMaintenance(spark, dir)
      })
    }
    assert(refused.exists(_.getMessage.contains("writer-exclusive")))
    // marker dropped with the lock: sinks proceed
    Maintenance.requireNoExclusiveMaintenance(spark, dir)
    // an orphan marker (crashed op, lock gone) must not wedge the
    // stream; with a STALE lock beside it, likewise
    writeFile(s"$dir/_writer_exclusive", "1")
    Maintenance.requireNoExclusiveMaintenance(spark, dir)
    writeFile(s"$dir/_maintenance_lock",
      s"${System.currentTimeMillis() - Maintenance.LockStaleMs - 60000L} 1")
    Maintenance.requireNoExclusiveMaintenance(spark, dir)
    // with a FRESH lock beside it: a live op — refuse
    writeFile(s"$dir/_maintenance_lock", s"${System.currentTimeMillis()} 1")
    intercept[IllegalStateException] {
      Maintenance.requireNoExclusiveMaintenance(spark, dir)
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_maintenance_lock"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_writer_exclusive"), false)
  }

  test("a micro-batch arriving inside a held removal window is refused, replays after release") {
    import spark.implicits._
    val emb = sf("sf0.001", "embeddings").filter(F.col("embedding").isNotNull)
      .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mx_sink").toString
    Similarity.buildIvfIndex(emb.filter(F.col("vec_id") % 2 === 0),
      "vec_id", "embedding", nlist = 8, iterations = 2).save(dir)
    val odd = emb.filter(F.col("vec_id") % 2 =!= 0)
    val src = java.nio.file.Files.createTempDirectory("graft_mx_sinksrc").toString
    odd.repartition(2).write.mode("overwrite").parquet(src)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mx_sinkck").toString
    def runStream(): Unit = {
      val q = Similarity.streamToIvfIndex(
          spark.readStream.schema(odd.schema)
            .option("maxFilesPerTrigger", 1).parquet(src),
          dir, "vec_id", "embedding")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
    }
    // simulate an in-flight writer-exclusive removal: fresh lock +
    // marker carrying the lock's nonce (exactly what withExclusiveLock
    // leaves while its body runs) — the arriving micro-batches must be
    // REFUSED
    writeFile(s"$dir/_maintenance_lock", s"${System.currentTimeMillis()} 1")
    writeFile(s"$dir/_writer_exclusive", "1")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (String.valueOf(t.getMessage).contains("writer-exclusive") ||
        mentions(t.getCause))
    assert(mentions(ex), s"unexpected stream failure: $ex")
    // nothing from the refused batches landed
    assert(Similarity.loadIvfIndex(spark, dir).assigned
      .filter(F.col("neighbor_id").cast("long") % 2 =!= 0).count() === 0L)
    // release (the op finished) and restart from the same checkpoint:
    // the refused batches replay and land exactly once
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_maintenance_lock"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_writer_exclusive"), false)
    runStream()
    val got = Similarity.loadIvfIndex(spark, dir).assigned
      .select(F.col("neighbor_id").cast("long")).as[Long].collect()
    assert(got.length === got.distinct.length, "a batch landed twice")
    assert(got.toSet === emb.select("vec_id").as[Long].collect().toSet)
    Maintenance.releaseWriterLease(spark, dir)
  }

  test("SketchView backfill drops the exclusive marker; view sinks refuse inside it") {
    val ev = sf("sf0.001", "events")
      .select(F.col("ts"), F.col("event_type"), F.col("value"))
    val vdir = java.nio.file.Files.createTempDirectory("graft_mx_bf").toString
    graft.sketch.SketchView.materialize(
      ev, "ts", Seq("event_type"), "value", vdir)
    val span = graft.sketch.SketchView.DefaultPartSpanMs
    val lo = ev.agg(F.min(F.unix_millis(F.col("ts")))).head().getLong(0)
    val from = lo - java.lang.Math.floorMod(lo, span)
    // inside the backfill window (marker + fresh _compact_lock) a
    // view sink's gate refuses; before and after it passes
    Maintenance.requireNoExclusiveMaintenance(spark, vdir)
    var refused: Option[Throwable] = None
    graft.sketch.SketchView.backfillImpl(ev, "ts", Seq("event_type"), "value",
      vdir, from, from + span, "hour",
      graft.sketch.SketchView.ViewFamily.ddsketch(),
      span,
      afterSnapshot = () => {
        refused = Some(intercept[IllegalStateException] {
          Maintenance.requireNoExclusiveMaintenance(spark, vdir)
        })
      },
      afterJournal = () => ())
    assert(refused.exists(_.getMessage.contains("writer-exclusive")))
    Maintenance.requireNoExclusiveMaintenance(spark, vdir) // released
  }

  test("journal paths containing commas survive crash recovery exactly") {
    // a data-file path may legally contain ',' — the journal parse must
    // be quote-aware or recovery prunes/skips the wrong files
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mx_a,b").toString
    assert(dir.contains(","), "fixture needs a comma in the path")
    buildIvf(dir)
    def content() = Similarity.loadIvfIndex(spark, dir).assigned
      .select(F.col("neighbor_id").cast("long"), F.col("__cell"))
      .as[(Long, Int)].collect().sorted.toSeq
    val before = content()
    intercept[RuntimeException] {
      CellTable.compact(spark, dir, s"$dir/assigned",
        afterJournal = () => throw new RuntimeException("boom"))
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/assigned/_compact_pending.json")))
    assert(content() === before, "journal-aware read wrong with commas")
    Similarity.compactIvfIndex(spark, dir) // recovers via the journal
    assert(content() === before, "recovery corrupted by comma paths")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/assigned/_compact_pending.json")))
  }
}
