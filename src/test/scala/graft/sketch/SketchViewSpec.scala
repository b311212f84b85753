package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

class SketchViewSpec extends SparkTestBase {
  import spark.implicits._

  private def events = sf("sf0.001", "events")

  private def viewMap(df: org.apache.spark.sql.DataFrame)
      : Map[(Long, String), Seq[Byte]] =
    df.select(F.col("bucket_ms"), F.col("event_type"), F.col("sketch"))
      .as[(Long, String, Array[Byte])].collect()
      .map { case (b, k, s) => (b, k) -> s.toSeq }.toMap

  test("materialize + append is byte-identical to a full rebuild") {
    val ev = events
    val evenHour =
      F.pmod(F.unix_millis(F.date_trunc("hour", F.col("ts"))) / 3600000L, F.lit(2)) === 0
    val dir = java.nio.file.Files.createTempDirectory("graft_skview").toString
    SketchView.materialize(ev.filter(evenHour), "ts", Seq("event_type"), "value", dir)
    SketchView.append(ev.filter(!evenHour), "ts", Seq("event_type"), "value", dir)
    val incremental = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    val rebuilt = viewMap(
      SketchView.rollup(ev, "ts", Seq("event_type"), "value"))
    assert(incremental.keySet === rebuilt.keySet)
    assert(incremental.nonEmpty)
    incremental.foreach { case (k, bytes) =>
      assert(bytes === rebuilt(k), s"sketch bytes differ at $k") }
  }

  test("merge-on-read collapses repeated appends of the same bucket") {
    val ev = events.limit(200)
    val dir = java.nio.file.Files.createTempDirectory("graft_skview2").toString
    SketchView.materialize(ev, "ts", Seq("event_type"), "value", dir)
    SketchView.append(ev, "ts", Seq("event_type"), "value", dir)   // same rows again
    val merged = SketchView.read(spark, dir, Seq("event_type"))
    // one row per (bucket, key) after the merge...
    val perKey = merged.groupBy("bucket_ms", "event_type")
      .count().filter(F.col("count") > 1).count()
    assert(perKey === 0L)
    // ...and every count doubled (merge added the second batch's bins)
    val doubled = merged.select(G.ddsketch_count(F.col("sketch")).as("n"),
        F.col("bucket_ms"), F.col("event_type"))
    val direct = SketchView.rollup(ev, "ts", Seq("event_type"), "value")
      .select(G.ddsketch_count(F.col("sketch")).as("n1"),
        F.col("bucket_ms"), F.col("event_type"))
    val joined = doubled.join(direct, Seq("bucket_ms", "event_type"))
      .select((F.col("n") === F.col("n1") * 2).as("ok")).as[Boolean].collect()
    assert(joined.nonEmpty && joined.forall(identity))
  }

  test("compact rewrites to one physical row per (bucket, key), same bytes") {
    val ev = events
    val dir = java.nio.file.Files.createTempDirectory("graft_skview3").toString
    SketchView.materialize(ev.filter(F.col("user_id") % 2 === 0),
      "ts", Seq("event_type"), "value", dir)
    SketchView.append(ev.filter(F.col("user_id") % 2 =!= 0),
      "ts", Seq("event_type"), "value", dir)
    val before = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    SketchView.compact(spark, dir, Seq("event_type"))
    val after = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    assert(after === before)
    // physically one row per (bucket, key) now
    val raw = spark.read.parquet(dir)
    assert(raw.count() === before.size)
  }

  test("regrain(day) over the hourly view equals a direct daily rollup") {
    val ev = events
    val dir = java.nio.file.Files.createTempDirectory("graft_skview4").toString
    SketchView.materialize(ev, "ts", Seq("event_type"), "value", dir)
    val daily = viewMap(SketchView.regrain(
      SketchView.read(spark, dir, Seq("event_type")), Seq("event_type"), "day"))
    val direct = viewMap(
      SketchView.rollup(ev, "ts", Seq("event_type"), "value", bucket = "day"))
    assert(daily === direct)
    assert(daily.nonEmpty)
  }

  test("readRange returns exactly the window's buckets and prunes partitions") {
    val ev = events
    val dir = java.nio.file.Files.createTempDirectory("graft_skview5").toString
    SketchView.materialize(ev, "ts", Seq("event_type"), "value", dir)
    val all = SketchView.read(spark, dir, Seq("event_type"))
      .select("bucket_ms").as[Long].collect().sorted
    assert(all.length > 10)
    val (from, until) = (all(3), all(all.length - 4) + 1)
    val ranged = SketchView.readRange(spark, dir, Seq("event_type"), from, until)
    val got = ranged.select("bucket_ms").as[Long].collect().toSet
    assert(got === all.filter(b => b >= from && b < until).toSet)
    // the window's __part predicate reaches the scan's partition filters
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__part"),
      s"no partition pruning in:\n$plan")
  }

  test("streamAppend replay lands the same view as a direct rollup") {
    val ev = events.filter(F.col("ts").isNotNull)
      .select(F.col("ts"), F.col("event_type"), F.col("value"))
    val src = java.nio.file.Files.createTempDirectory("graft_skview_src").toString
    ev.write.mode("overwrite").parquet(src)
    val dir = java.nio.file.Files.createTempDirectory("graft_skview_s").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_skview_ck").toString
    val q = SketchView.streamAppend(
        spark.readStream.schema(ev.schema).parquet(src),
        "ts", Seq("event_type"), "value", dir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    val direct = viewMap(SketchView.rollup(ev, "ts", Seq("event_type"), "value"))
    assert(streamed === direct)
    assert(streamed.nonEmpty)
  }

  test("a replayed micro-batch overwrites itself — the view never double-counts") {
    val ev = events.limit(300)
    val dir = java.nio.file.Files.createTempDirectory("graft_skview_i").toString
    SketchView.appendBatch(ev, "ts", Seq("event_type"), "value", dir,
      "hour", SketchView.ViewFamily.ddsketch(), SketchView.DefaultPartSpanMs, batchId = 7L)
    val once = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    // the at-least-once replay: same batch id, same rows, written again
    SketchView.appendBatch(ev, "ts", Seq("event_type"), "value", dir,
      "hour", SketchView.ViewFamily.ddsketch(), SketchView.DefaultPartSpanMs, batchId = 7L)
    val twice = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    assert(twice === once)
    // a DIFFERENT batch id adds
    SketchView.appendBatch(ev, "ts", Seq("event_type"), "value", dir,
      "hour", SketchView.ViewFamily.ddsketch(), SketchView.DefaultPartSpanMs, batchId = 8L)
    val merged = SketchView.read(spark, dir, Seq("event_type"))
      .join(SketchView.rollup(ev, "ts", Seq("event_type"), "value")
        .withColumnRenamed("sketch", "sk1"), Seq("bucket_ms", "event_type"))
      .select((G.ddsketch_count(F.col("sketch")) ===
        G.ddsketch_count(F.col("sk1")) * 2).as("ok")).as[Boolean].collect()
    assert(merged.nonEmpty && merged.forall(identity))
  }

  test("kmvDistinct family: incremental view yields exact hourly uniques") {
    val ev = events
    val fam = SketchView.ViewFamily.kmvDistinct()
    val dir = java.nio.file.Files.createTempDirectory("graft_skview_kmv").toString
    SketchView.materialize(ev.filter(F.col("event_id") % 2 === 0),
      "ts", Seq("event_type"), "user_id", dir, family = fam)
    SketchView.append(ev.filter(F.col("event_id") % 2 =!= 0),
      "ts", Seq("event_type"), "user_id", dir, family = fam)
    val view = SketchView.read(spark, dir, Seq("event_type"), fam)
    // byte-identical to a rebuild (exact min-hash set union)
    val rebuilt = viewMap(
      SketchView.rollup(ev, "ts", Seq("event_type"), "user_id", family = fam))
    assert(viewMap(view) === rebuilt)
    // and the estimates are EXACT below k distinct
    val got = view.select(F.col("bucket_ms"), F.col("event_type"),
        kmv.kmv_distinct(F.col("sketch")).cast("long").as("u"))
      .as[(Long, String, Long)].collect().toMap2
    val exact = ev
      .groupBy(F.unix_millis(F.date_trunc("hour", F.col("ts"))).as("b"),
        F.col("event_type"))
      .agg(F.countDistinct(F.col("user_id")).as("u"))
      .as[(Long, String, Long)].collect().toMap2
    assert(got === exact)
    assert(got.nonEmpty)
  }

  implicit private class Tup3Map[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map { case (a, b, c) => (a, b) -> c }.toMap
  }

  test("expire drops exactly the partitions older than the retention floor") {
    val ev = events
    val dir = java.nio.file.Files.createTempDirectory("graft_skview_exp").toString
    SketchView.materialize(ev, "ts", Seq("event_type"), "value", dir)
    val all = SketchView.read(spark, dir, Seq("event_type"))
      .select("bucket_ms").as[Long].collect().sorted
    val span = SketchView.DefaultPartSpanMs
    val parts = all.map(b => b - java.lang.Math.floorMod(b, span)).distinct.sorted
    assert(parts.length > 3)
    val keepFrom = parts(2)   // keep from the 3rd partition's floor on
    val dropped = SketchView.expire(spark, dir, keepFrom)
    assert(dropped === 2)
    val left = SketchView.read(spark, dir, Seq("event_type"))
      .select("bucket_ms").as[Long].collect().toSet
    assert(left === all.filter(b => b - java.lang.Math.floorMod(b, span) >= keepFrom).toSet)
    assert(SketchView.expire(spark, dir, keepFrom) === 0)   // idempotent
  }

  test("backfill replaces a partition range, fixing a double-counted window") {
    val ev = events
    val dir = java.nio.file.Files.createTempDirectory("graft_skview_bf").toString
    SketchView.materialize(ev, "ts", Seq("event_type"), "value", dir)
    val clean = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    val span = SketchView.DefaultPartSpanMs
    val parts = clean.keySet.map(_._1)
      .map(b => b - java.lang.Math.floorMod(b, span)).toSeq.distinct.sorted
    val (from, until) = (parts(1), parts(1) + span)   // one middle partition
    // corrupt that window: a stray duplicate append double-counts it
    SketchView.append(
      ev.filter(F.unix_millis(F.col("ts")).between(from, until - 1)),
      "ts", Seq("event_type"), "value", dir)
    val corrupted = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    assert(corrupted !== clean)
    // backfill the range from the source of truth
    SketchView.backfill(ev, "ts", Seq("event_type"), "value", dir, from, until)
    val repaired = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    assert(repaired === clean)
    // misaligned ranges are refused
    intercept[IllegalArgumentException] {
      SketchView.backfill(ev, "ts", Seq("event_type"), "value", dir,
        from + 1, until)
    }
  }

  test("manifest: wrong family / geometry / partSpan / keys fail fast") {
    val ev = events.limit(300)
    val dir = java.nio.file.Files.createTempDirectory("graft_skview_m").toString
    SketchView.materialize(ev, "ts", Seq("event_type"), "value", dir)
    // wrong family: a CMS probe of a DDSketch view is silent garbage
    // without the manifest (merge aggs skip mismatched blobs)
    intercept[IllegalArgumentException] {
      SketchView.read(spark, dir, Seq("event_type"),
        SketchView.ViewFamily.cmsFrequency())
    }
    // right family, wrong geometry
    intercept[IllegalArgumentException] {
      SketchView.read(spark, dir, Seq("event_type"),
        SketchView.ViewFamily.ddsketch(accuracy = 0.05))
    }
    // wrong partSpan: the readRange pruning floor would lie
    intercept[IllegalArgumentException] {
      SketchView.readRange(spark, dir, Seq("event_type"), 0L, Long.MaxValue,
        partSpanMs = 3600000L)
    }
    // wrong key columns
    intercept[IllegalArgumentException] {
      SketchView.read(spark, dir, Seq("user_id"))
    }
    // wrong bucket grain on append (hour view, day rollup)
    intercept[IllegalArgumentException] {
      SketchView.append(ev, "ts", Seq("event_type"), "value", dir,
        bucket = "day")
    }
    // wrong partSpan on expire: the floor would land mid-partition
    intercept[IllegalArgumentException] {
      SketchView.expire(spark, dir, 0L, partSpanMs = 3600000L)
    }
    // the matching calls still work
    assert(SketchView.read(spark, dir, Seq("event_type")).count() > 0)
  }

  test("readAuto opens a view from its manifest alone") {
    val ev = events.limit(500)
    val fam = SketchView.ViewFamily.kmvDistinct(k = 512)
    val dir = java.nio.file.Files.createTempDirectory("graft_skview_ra").toString
    SketchView.materialize(ev, "ts", Seq("event_type"), "user_id", dir,
      family = fam)
    val (view, m) = SketchView.readAuto(spark, dir)
    assert(m.family === "kmv" && m.geometry === Map("k" -> "512") &&
      m.keyCols === Seq("event_type") && m.bucket === "hour")
    assert(viewMap(view) ===
      viewMap(SketchView.read(spark, dir, Seq("event_type"), fam)))
  }

  test("append after compact still matches the rebuild byte-for-byte") {
    val ev = events
    val half = F.col("event_id") % 2 === 0
    val dir = java.nio.file.Files.createTempDirectory("graft_skview_ac").toString
    SketchView.materialize(ev.filter(half), "ts", Seq("event_type"), "value", dir)
    SketchView.compact(spark, dir, Seq("event_type"))
    SketchView.append(ev.filter(!half), "ts", Seq("event_type"), "value", dir)
    val incremental = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    val rebuilt = viewMap(SketchView.rollup(ev, "ts", Seq("event_type"), "value"))
    assert(incremental === rebuilt)
    assert(incremental.nonEmpty)
  }

  test("a micro-batch replayed AFTER a compact folded it writes nothing") {
    val ev = events.limit(300)
    val dir = java.nio.file.Files.createTempDirectory("graft_skview_cf").toString
    val fam = SketchView.ViewFamily.ddsketch()
    // three committed-to-disk micro-batches...
    for (b <- 0L to 2L)
      SketchView.appendBatch(ev, "ts", Seq("event_type"), "value", dir,
        "hour", fam, SketchView.DefaultPartSpanMs, batchId = b)
    val before = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    // ...maintenance folds 0 and 1 into __batch=-1 — the NEWEST
    // streaming id (2) is never folded (it could be a concurrent
    // writer's mid-commit batch), so the watermark stops below it
    SketchView.compact(spark, dir, Seq("event_type"))
    assert(SketchView.readManifest(spark, dir).get.foldedThroughBatch === 1L)
    // a replay of FOLDED batch 1 writes nothing (watermark no-op)...
    SketchView.appendBatch(ev, "ts", Seq("event_type"), "value", dir,
      "hour", fam, SketchView.DefaultPartSpanMs, batchId = 1L)
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) === before)
    // ...a replay of the UNFOLDED batch 2 overwrites itself (no change)...
    SketchView.appendBatch(ev, "ts", Seq("event_type"), "value", dir,
      "hour", fam, SketchView.DefaultPartSpanMs, batchId = 2L)
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) === before)
    // ...and a genuinely NEW batch id still lands
    SketchView.appendBatch(ev, "ts", Seq("event_type"), "value", dir,
      "hour", fam, SketchView.DefaultPartSpanMs, batchId = 3L)
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) !== before)
  }

  test("backfill with a bucket coarser than partSpan never leaks below the range") {
    // week buckets over day partitions: the week's truncation can land
    // BELOW the backfilled range — those rows must be filtered, not
    // appended into partitions the backfill never dropped
    val hour = 3600000L
    val rows = (0 until 21 * 24).map { h =>
      (new java.sql.Timestamp(1700000000000L + h * hour), "t", 1.0)
    }
    val df = rows.toDF("ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_skview_wk").toString
    SketchView.materialize(df, "ts", Seq("event_type"), "value", dir,
      bucket = "week")
    val clean = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    val span = SketchView.DefaultPartSpanMs
    val from = {
      val t0 = 1700000000000L
      val f0 = t0 - java.lang.Math.floorMod(t0, span)
      f0 + 7 * span // a mid-corpus day boundary
    }
    SketchView.backfill(df, "ts", Seq("event_type"), "value", dir,
      from, from + span, bucket = "week")
    val after = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    // week buckets truncating below `from` were dropped by the delete
    // and NOT re-written by the filtered rollup output: every bucket
    // outside [from, from+span) is untouched, none double-counts
    after.foreach { case (k @ (b, _), bytes) =>
      if (b < from || b >= from + span)
        assert(bytes === clean(k), s"bucket $b changed outside the range")
    }
  }

  test("moments family: incremental view is value-exact vs direct aggregation") {
    val ev = events.filter(F.col("user_id").isNotNull)
    val fam = SketchView.ViewFamily.moments()
    val dir = java.nio.file.Files.createTempDirectory("graft_skview_mom").toString
    SketchView.materialize(ev.filter(F.col("event_id") % 2 === 0),
      "ts", Seq("event_type"), "user_id", dir, family = fam)
    SketchView.append(ev.filter(F.col("event_id") % 2 =!= 0),
      "ts", Seq("event_type"), "user_id", dir, family = fam)
    // readAuto reconstructs the family from the manifest
    val (view, m) = SketchView.readAuto(spark, dir)
    assert(m.family === "moments")
    val got = view.select(F.col("bucket_ms"), F.col("event_type"),
        F.col("sketch.n"), F.col("sketch.s"), F.col("sketch.s2"))
      .as[(Long, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val exact = ev
      .groupBy(F.unix_millis(F.date_trunc("hour", F.col("ts"))).as("b"),
        F.col("event_type"))
      .agg(F.count(F.col("user_id")).as("n"),
        F.sum(F.col("user_id").cast("double")).as("s"),
        F.sum(F.col("user_id").cast("double") * F.col("user_id").cast("double"))
          .as("s2"))
      .as[(Long, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // integer-valued sums: EXACT equality through the split + merge
    assert(got === exact)
    assert(got.nonEmpty)
    // mean/variance helpers agree with a direct formula
    val mv = view.select(
        SketchOps.momentsMean(F.col("sketch")).as("m"),
        SketchOps.momentsVariance(F.col("sketch")).as("v"),
        F.col("sketch.n"), F.col("sketch.s"), F.col("sketch.s2"))
      .as[(Double, Double, Long, Double, Double)].collect()
    mv.foreach { case (mean, varr, n, s2sum, sq) =>
      assert(mean === s2sum / n.toDouble)
      assert(varr >= 0.0)
      assert(math.abs(varr - (sq / n - mean * mean)) <= 1e-12 * math.max(1.0, varr))
    }
  }

  test("trendingItems: exact per-item deltas between two view windows, topN cut") {
    val span = SketchView.DefaultPartSpanMs
    val d0 = 472224L * 3600000L // day-aligned
    def ts(day: Int, h: Int) = new java.sql.Timestamp(d0 + day * span + h * 3600000L)
    // day 0: a=3 b=1 ; day 1: a=1 b=4 c=2 → deltas a=-2 b=3 c=2
    val rows =
      Seq.fill(3)(("t", ts(0, 1), "a")) ++ Seq(("t", ts(0, 2), "b")) ++
      Seq(("t", ts(1, 1), "a")) ++ Seq.fill(4)(("t", ts(1, 2), "b")) ++
      Seq.fill(2)(("t", ts(1, 3), "c"))
    val df = rows.toDF("event_type", "ts", "item")
    val fam = SketchView.ViewFamily.topkItems(capacity = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_skview_tr").toString
    SketchView.materialize(df, "ts", Seq("event_type"), "item", dir, family = fam)
    val out = SketchOps.trendingItems(spark, dir, Seq("event_type"),
        d0, d0 + span, d0 + span, d0 + 2 * span, capacity = 16)
      .select("item", "count_a", "count_b", "delta")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out === Map(
      "a" -> (("a", 3L, 1L, -2L)),
      "b" -> (("b", 1L, 4L, 3L)),
      "c" -> (("c", 0L, 2L, 2L))))
    val top1 = SketchOps.trendingItems(spark, dir, Seq("event_type"),
        d0, d0 + span, d0 + span, d0 + 2 * span, capacity = 16, topN = 1)
      .select("item").as[String].collect()
    assert(top1.toSeq === Seq("b"))
  }

  test("NULL timestamps are dropped, NULL values skipped") {
    val df = Seq(
      (Some(java.sql.Timestamp.valueOf("2024-01-01 10:15:00")), "a", Some(1.0)),
      (Some(java.sql.Timestamp.valueOf("2024-01-01 10:45:00")), "a", None),
      (None, "a", Some(9.0)))
      .toDF("ts", "event_type", "value")
    val r = SketchView.rollup(df, "ts", Seq("event_type"), "value")
      .select(G.ddsketch_count(F.col("sketch"))).as[Long].collect()
    assert(r.toSeq === Seq(1L))
  }

  test("seasonalResiduals: exact counts vs the same bucket a period ago") {
    val hour = 3600000L
    val base = 472224L * hour
    // day 0: 2 events at hour 1; day 1: 3 events at hour 1, 1 at hour 2
    val rows =
      Seq.fill(2)(("t", new java.sql.Timestamp(base + hour), 1.0)) ++
      Seq.fill(3)(("t", new java.sql.Timestamp(base + 86400000L + hour), 1.0)) ++
      Seq(("t", new java.sql.Timestamp(base + 86400000L + 2 * hour), 1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_seas").toString
    SketchView.materialize(rows.toDF("event_type", "ts", "value"),
      "ts", Seq("event_type"), "value", dir)
    val out = SketchOps.seasonalResiduals(spark, dir, Seq("event_type"),
        periodMs = 86400000L)
      .select("bucket_ms", "n", "n_prev", "ratio")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    val first = out(base + hour)                                  // no prior day
    assert(first._1 === 2L && first._2 === -1L && first._3.isNaN)
    assert(out(base + 86400000L + hour) === ((3L, 2L, 1.5)))      // 3 vs 2
    assert(out(base + 86400000L + 2 * hour)._2 === -1L)           // no aligned bucket
  }

  // --- compact vs concurrent appends: interleaved ≡ serialized -------

  private def splitThirds(ev: org.apache.spark.sql.DataFrame) = (
    ev.filter(F.col("event_id") % 3 === 0),
    ev.filter(F.col("event_id") % 3 === 1),
    ev.filter(F.col("event_id") % 3 === 2))

  private def serializedReference(ev: org.apache.spark.sql.DataFrame)
      : Map[(Long, String), Seq[Byte]] = {
    // compact(a) then append(b) then append(c): the serialized schedule
    // every interleaving must equal byte-for-byte
    val (a, b, c) = splitThirds(ev)
    val dir = java.nio.file.Files.createTempDirectory("graft_cpt_ser").toString
    SketchView.materialize(a, "ts", Seq("event_type"), "value", dir)
    SketchView.compact(spark, dir, Seq("event_type"))
    SketchView.append(b, "ts", Seq("event_type"), "value", dir)
    SketchView.append(c, "ts", Seq("event_type"), "value", dir)
    viewMap(SketchView.read(spark, dir, Seq("event_type")))
  }

  test("appends landing INSIDE a compact survive: interleaved == serialized") {
    val ev = events
    val (a, b, c) = splitThirds(ev)
    val expected = serializedReference(ev)
    val fam = SketchView.ViewFamily.ddsketch()
    val dir = java.nio.file.Files.createTempDirectory("graft_cpt_race").toString
    SketchView.materialize(a, "ts", Seq("event_type"), "value", dir)
    // append b after the file snapshot (pre-fold), c after the journal
    // (mid-prune) — the two windows the old whole-directory overwrite
    // silently lost
    SketchView.compactImpl(spark, dir, Seq("event_type"), fam,
      SketchView.DefaultPartSpanMs, None,
      afterSnapshot =
        () => SketchView.append(b, "ts", Seq("event_type"), "value", dir),
      afterJournal =
        () => SketchView.append(c, "ts", Seq("event_type"), "value", dir))
    val got = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    assert(got.nonEmpty)
    assert(got === expected)
    // and the view is physically folded: a's groups are one row each
    val aGroups = SketchView.rollup(a, "ts", Seq("event_type"), "value").count()
    val raw = spark.read.parquet(dir)
    assert(raw.count() < aGroups + b.count() + c.count())
  }

  test("a compact crash after the journal is finished by the next compact") {
    val ev = events
    val (a, b, c) = splitThirds(ev)
    val expected = serializedReference(ev)
    val fam = SketchView.ViewFamily.ddsketch()
    val dir = java.nio.file.Files.createTempDirectory("graft_cpt_crash").toString
    SketchView.materialize(a, "ts", Seq("event_type"), "value", dir)
    final class Boom extends RuntimeException("crash between journal and prune")
    intercept[Boom](SketchView.compactImpl(spark, dir, Seq("event_type"), fam,
      SketchView.DefaultPartSpanMs, None,
      afterSnapshot = () => (),
      afterJournal = () => throw new Boom))
    // an append lands while the view sits in its crashed state
    SketchView.append(b, "ts", Seq("event_type"), "value", dir)
    // the next compact first finishes the crashed one (idempotent
    // prune+move from the journal), then folds — nothing lost, nothing
    // double-counted
    SketchView.compact(spark, dir, Seq("event_type"))
    SketchView.append(c, "ts", Seq("event_type"), "value", dir)
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) === expected)
    // explicit repair API is a no-op once clean
    assert(!SketchView.recoverPendingCompact(spark, dir))
  }

  test("a crash DURING the journal write (truncated json) is discarded safely") {
    val ev = events.limit(200)
    val dir = java.nio.file.Files.createTempDirectory("graft_cpt_trunc").toString
    SketchView.materialize(ev, "ts", Seq("event_type"), "value", dir)
    val before = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // simulate the half-written journal + a leftover staging dir
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dir, "_compact_pending.json"), true)
    try out.write("""{"folded": 3, "files": ["__part=""".getBytes("UTF-8"))
    finally out.close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "_compact_fold/__part=0"))
    // recovery discards the corrupt journal and staging, touches no data
    assert(!SketchView.recoverPendingCompact(spark, dir))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_compact_pending.json")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_compact_fold")))
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) === before)
    // and a full compact afterwards still lands the same view
    SketchView.compact(spark, dir, Seq("event_type"))
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) === before)
  }

  test("a STREAMING micro-batch landing mid-compact survives; its replay no-ops") {
    val ev = events.limit(300)
    val fam = SketchView.ViewFamily.ddsketch()
    val dir = java.nio.file.Files.createTempDirectory("graft_cpt_stream").toString
    // batches 0 and 1 on disk; 0 is foldable, 1 is the newest (never
    // folded — could be a mid-commit writer)
    SketchView.appendBatch(ev, "ts", Seq("event_type"), "value", dir,
      "hour", fam, SketchView.DefaultPartSpanMs, batchId = 0L)
    SketchView.appendBatch(ev, "ts", Seq("event_type"), "value", dir,
      "hour", fam, SketchView.DefaultPartSpanMs, batchId = 1L)
    SketchView.compactImpl(spark, dir, Seq("event_type"), fam,
      SketchView.DefaultPartSpanMs, None,
      afterSnapshot = () => SketchView.appendBatch(ev, "ts", Seq("event_type"),
        "value", dir, "hour", fam, SketchView.DefaultPartSpanMs, batchId = 2L),
      afterJournal = () => ())
    // batch 2 landed after the snapshot and batch 1 was excluded as the
    // newest: the watermark stops at 0, and both survive the prune
    assert(SketchView.readManifest(spark, dir).get.foldedThroughBatch === 0L)
    val after = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    val thrice = viewMap(SketchView.rollup(
      ev.union(ev).union(ev), "ts", Seq("event_type"), "value"))
    assert(after === thrice)
    // a replay of the FOLDED batch 0 writes nothing...
    SketchView.appendBatch(ev, "ts", Seq("event_type"), "value", dir,
      "hour", fam, SketchView.DefaultPartSpanMs, batchId = 0L)
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) === after)
    // ...while replays of the SURVIVING batches overwrite themselves
    for (b <- 1L to 2L) {
      SketchView.appendBatch(ev, "ts", Seq("event_type"), "value", dir,
        "hour", fam, SketchView.DefaultPartSpanMs, batchId = b)
      assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) === after)
    }
  }

  test("a fresh compact lock blocks a second compact; a stale one is broken") {
    val ev = events.limit(200)
    val dir = java.nio.file.Files.createTempDirectory("graft_cpt_lock").toString
    SketchView.materialize(ev, "ts", Seq("event_type"), "value", dir)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def writeLock(ts: Long): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_compact_lock"), true)
      try out.write(ts.toString.getBytes("UTF-8")) finally out.close()
    }
    // fresh lock (now): a concurrent compact fails fast
    writeLock(System.currentTimeMillis())
    intercept[IllegalStateException](
      SketchView.compact(spark, dir, Seq("event_type")))
    // stale lock (past the stale horizon): broken and compact proceeds,
    // releasing its own lock afterwards
    writeLock(System.currentTimeMillis() - SketchView.CompactLockStaleMs - 60000L)
    val before = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    SketchView.compact(spark, dir, Seq("event_type"))
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) === before)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_compact_lock")))
    // an in-process failure mid-compact also releases the lock
    val fam = SketchView.ViewFamily.ddsketch()
    final class Boom2 extends RuntimeException("mid-compact")
    intercept[Boom2](SketchView.compactImpl(spark, dir, Seq("event_type"), fam,
      SketchView.DefaultPartSpanMs, None,
      afterSnapshot = () => throw new Boom2, afterJournal = () => ()))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_compact_lock")))
  }

  test("appends landing INSIDE a backfill survive: interleaved == serialized") {
    val ev = events
    val (a, b, c) = splitThirds(ev)
    val span = SketchView.DefaultPartSpanMs
    val fam = SketchView.ViewFamily.ddsketch()
    val parts = SketchView.rollup(ev, "ts", Seq("event_type"), "value")
      .select("bucket_ms").as[Long].collect()
      .map(x => x - java.lang.Math.floorMod(x, span)).distinct.sorted
    assert(parts.length > 2)
    val (from, until) = (parts(1), parts(1) + span)
    // serialized schedule: backfill the range, THEN the two appends
    val ser = {
      val d = java.nio.file.Files.createTempDirectory("graft_bf_ser").toString
      SketchView.materialize(a, "ts", Seq("event_type"), "value", d)
      SketchView.backfill(ev, "ts", Seq("event_type"), "value", d, from, until)
      SketchView.append(b, "ts", Seq("event_type"), "value", d)
      SketchView.append(c, "ts", Seq("event_type"), "value", d)
      viewMap(SketchView.read(spark, d, Seq("event_type")))
    }
    // interleaved: b lands after the range snapshot (pre-stage), c
    // after the journal (mid-prune) — the windows the old
    // whole-partition delete silently lost
    val dir = java.nio.file.Files.createTempDirectory("graft_bf_race").toString
    SketchView.materialize(a, "ts", Seq("event_type"), "value", dir)
    SketchView.backfillImpl(ev, "ts", Seq("event_type"), "value", dir,
      from, until, "hour", fam, span,
      afterSnapshot =
        () => SketchView.append(b, "ts", Seq("event_type"), "value", dir),
      afterJournal =
        () => SketchView.append(c, "ts", Seq("event_type"), "value", dir))
    val got = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    assert(got.nonEmpty)
    assert(got === ser)
  }

  test("a backfill crash after the journal is finished by the next maintenance") {
    val ev = events
    val span = SketchView.DefaultPartSpanMs
    val fam = SketchView.ViewFamily.ddsketch()
    val dir = java.nio.file.Files.createTempDirectory("graft_bf_crash").toString
    SketchView.materialize(ev, "ts", Seq("event_type"), "value", dir)
    val clean = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    val parts = clean.keySet.map(_._1)
      .map(x => x - java.lang.Math.floorMod(x, span)).toSeq.distinct.sorted
    val (from, until) = (parts(1), parts(1) + span)
    // corrupt the window with a stray duplicate append
    SketchView.append(
      ev.filter(F.unix_millis(F.col("ts")).between(from, until - 1)),
      "ts", Seq("event_type"), "value", dir)
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) !== clean)
    final class Boom extends RuntimeException("crash between journal and prune")
    intercept[Boom](SketchView.backfillImpl(ev, "ts", Seq("event_type"),
      "value", dir, from, until, "hour", fam, span,
      afterSnapshot = () => (), afterJournal = () => throw new Boom))
    // the journal is on disk; the explicit repair (or any next
    // maintenance call) finishes the backfill idempotently
    assert(SketchView.recoverPendingCompact(spark, dir))
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) === clean)
    assert(!SketchView.recoverPendingCompact(spark, dir))
  }

  test("appends landing INSIDE an expire survive: interleaved == serialized") {
    val ev = events
    val (a, b, _) = splitThirds(ev)
    val span = SketchView.DefaultPartSpanMs
    val parts = SketchView.rollup(a, "ts", Seq("event_type"), "value")
      .select("bucket_ms").as[Long].collect()
      .map(x => x - java.lang.Math.floorMod(x, span)).distinct.sorted
    assert(parts.length > 2)
    val keepFrom = parts(2)
    // serialized: expire a's old partitions, then append b (which
    // re-populates some of them — late data is the append's business)
    val ser = {
      val d = java.nio.file.Files.createTempDirectory("graft_exp_ser").toString
      SketchView.materialize(a, "ts", Seq("event_type"), "value", d)
      assert(SketchView.expire(spark, d, keepFrom) === 2)
      SketchView.append(b, "ts", Seq("event_type"), "value", d)
      viewMap(SketchView.read(spark, d, Seq("event_type")))
    }
    // interleaved: b lands after the expire's file snapshot — its
    // files (old partitions included) must survive the deletes
    val dir = java.nio.file.Files.createTempDirectory("graft_exp_race").toString
    SketchView.materialize(a, "ts", Seq("event_type"), "value", dir)
    val touched = SketchView.expireImpl(spark, dir, keepFrom, span,
      afterSnapshot =
        () => SketchView.append(b, "ts", Seq("event_type"), "value", dir))
    assert(touched === 2)
    val got = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    assert(got === ser)
    // b's rows in the expired window did survive (they landed late)
    val oldBuckets = got.keySet.map(_._1)
      .filter(x => x - java.lang.Math.floorMod(x, span) < keepFrom)
    assert(oldBuckets.nonEmpty)
  }

  test("reads stay correct through a crashed compact's recovery window") {
    val ev = events.limit(400)
    val fam = SketchView.ViewFamily.ddsketch()
    val dir = java.nio.file.Files.createTempDirectory("graft_read_rec").toString
    SketchView.materialize(ev.filter(F.col("event_id") % 2 === 0),
      "ts", Seq("event_type"), "value", dir)
    SketchView.append(ev.filter(F.col("event_id") % 2 =!= 0),
      "ts", Seq("event_type"), "value", dir)
    val before = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    final class Boom extends RuntimeException("crash between journal and prune")
    intercept[Boom](SketchView.compactImpl(spark, dir, Seq("event_type"), fam,
      SketchView.DefaultPartSpanMs, None,
      afterSnapshot = () => (), afterJournal = () => throw new Boom))
    // journal + staged fold on disk, prune not started: read is exact
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) === before)
    // harsher: mimic a crash MID-PRUNE by deleting one journaled data
    // file by hand — a plain listing would now silently under-count;
    // the journal-aware read never touches the doomed files at all
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val firstFile = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__part="))
      .flatMap(p => fs.listStatus(p.getPath))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__batch="))
      .flatMap(b => fs.listStatus(b.getPath))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .head.getPath
    fs.delete(firstFile, false)
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) === before)
    // recovery completes the compact; the plain path is stable again
    assert(SketchView.recoverPendingCompact(spark, dir))
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) === before)
  }

  test("readResilient re-plans through a compact pruning its planned files") {
    val ev = events.limit(400)
    val dir = java.nio.file.Files.createTempDirectory("graft_read_res").toString
    SketchView.materialize(ev.filter(F.col("event_id") % 2 === 0),
      "ts", Seq("event_type"), "value", dir)
    SketchView.append(ev.filter(F.col("event_id") % 2 =!= 0),
      "ts", Seq("event_type"), "value", dir)
    val before = viewMap(SketchView.read(spark, dir, Seq("event_type")))
    var calls = 0
    val got = SketchView.readResilient(spark, dir, Seq("event_type")) { df =>
      calls += 1
      // first attempt: a compact prunes every file this plan listed
      if (calls == 1) SketchView.compact(spark, dir, Seq("event_type"))
      viewMap(df)
    }
    assert(got === before)
    assert(calls <= 3, s"readResilient looped: $calls attempts")
  }

  test("compact adopts a manifest for pre-manifest views when bucket is passed") {
    val ev = events.limit(200)
    val dir = java.nio.file.Files.createTempDirectory("graft_cpt_adopt").toString
    SketchView.materialize(ev, "ts", Seq("event_type"), "value", dir)
    // simulate a pre-manifest layout
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_view.json"), false)
    assert(SketchView.readManifest(spark, dir).isEmpty)
    SketchView.compact(spark, dir, Seq("event_type"), bucket = Some("hour"))
    val m = SketchView.readManifest(spark, dir)
    assert(m.nonEmpty && m.get.bucket === "hour" && m.get.family === "ddsketch")
    assert(viewMap(SketchView.read(spark, dir, Seq("event_type"))) ===
      viewMap(SketchView.rollup(ev, "ts", Seq("event_type"), "value")))
  }
}
