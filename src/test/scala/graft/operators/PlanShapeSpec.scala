package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/**
 * Physical-plan shape assertions: the scale story of each operator is
 * its shuffle count, and these pin it against regressions. (An operator
 * that silently gains an exchange is correct-but-wrong at 100 TB.)
 */
class PlanShapeSpec extends SparkTestBase {
  import spark.implicits._

  // Distribution exchanges are inserted by EnsureRequirements during
  // plan preparation, so count them in the prepared (executed) plan's
  // rendering — works identically with and without AQE wrapping. Only
  // hash exchanges count: the tests' repartition(4) inputs add
  // round-robin exchanges that are scaffolding, not operator cost.
  private def exchanges(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  private val left = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "t", "tag")
    .repartition(4)
  private val right = Seq((1L, 5L, 1.0), (2L, 6L, 2.0)).toDF("k", "t", "v")
    .repartition(4)

  test("asofJoin plans exactly one shuffle (union + single window)") {
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(exchanges(out) === 1)
  }

  test("sessionStats groupBy reuses the window's hash partitioning") {
    val df = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("u", "ts").repartition(4)
    val out = Sessionize.sessionStats(df, F.col("u"), F.col("ts"), 100L)
    // window partitionBy(key) hash-partitions by key; grouping on
    // (key, session_id) is satisfied by that partitioning -> the rollup
    // must not add a second exchange
    assert(exchanges(out) === 1)
  }

  test("asofJoinSalted still plans exactly one shuffle") {
    // replicating the right side into salt buckets happens inside the
    // union feeding the one window exchange — salting must not add a
    // second shuffle
    val out = AsOfJoin.asofJoinSalted(left, right, Seq("k"), "t", "t", Seq("v"), 8)
    assert(exchanges(out) === 1)
  }

  test("withSessionIdBucketed shuffles the event-sized side exactly once") {
    val df = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("u", "ts").repartition(4)
    val out = Sessionize.withSessionIdBucketed(df, F.col("u"), F.col("ts"), 100L, 50L)
    val plan = out.queryExecution.executedPlan.toString
    // 3 hash exchanges total: ONE on the event-sized side feeding the
    // (key, bucket) window — the summary groupBy reuses that
    // partitioning — plus two on the summary-sized side (the per-key
    // stitch window and its re-shuffle to the join keys). The summary
    // side is O(keys x buckets) rows, not event-sized.
    assert(exchanges(out) === 3, plan)
    // and the stitch must not have broken the summary partition reuse:
    // the aggregate over (key, bucket) sits directly on the window
    // output with no exchange in between
    val segments = plan.split("Exchange hashpartitioning")
    assert(segments.length === 4)
  }

  test("bandJoin with broadcastRight plans a broadcast join and zero hash exchanges") {
    val out = RangeJoin.bandJoin(left, right, Seq("k"), "t", "t", 10L,
      Seq("v"), broadcastRight = true)
    val plan = out.queryExecution.executedPlan.toString
    assert(exchanges(out) === 0, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("intervalJoin with broadcastRight leaves the point side shuffle-free") {
    val points = Seq((10L, 1L), (20L, 2L)).toDF("p", "pid").repartition(4)
    val ivs = Seq((5L, 15L, 1L)).toDF("s", "e", "iid")
    val out = RangeJoin.intervalJoin(points, ivs, "p", "s", "e", Seq("iid"),
      10L, broadcastRight = true)
    val plan = out.queryExecution.executedPlan.toString
    assert(exchanges(out) === 0, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("rebalanceToDistribution keeps the kept-rows side shuffle-free") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("id", "dom").repartition(4)
    val out = graft.pipeline.Sampling
      .rebalanceToDistribution(df, F.col("dom"), F.col("id"), Map("a" -> 0.5, "b" -> 0.5))
    val plan = out.queryExecution.executedPlan.toString
    // the tiny count/min aggregates shuffle (2 hash exchanges on the
    // fraction side); the corpus-sized side must join the fractions by
    // BROADCAST and carry no window/rank — no rank exchange at all
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(exchanges(out) <= 2, plan)
  }

  test("PQ ADC query scans the code table without shuffling it") {
    val emb = Seq(
      (1L, Array(1.0f, 0f, 0f, 2f)), (2L, Array(0.9f, 0.1f, 0f, 2f)),
      (3L, Array(0f, 1f, 1f, 0f)), (4L, Array(0.5f, 0.5f, 0f, 1f)))
      .toDF("vec_id", "embedding").repartition(4)
    val pq = graft.pipeline.ProductQuantization
    val cb = pq.trainPq(emb, "vec_id", "embedding", m = 2, ksub = 2, iterations = 1)
    val enc = pq.pqEncode(emb, "vec_id", "embedding", cb)
    val out = pq.pqTopKEncoded(cb, enc, emb.filter($"vec_id" === 1L),
      "vec_id", "embedding", 2)
    val plan = out.queryExecution.executedPlan.toString
    // queries broadcast onto the code scan; the only hash exchange is
    // the candidate-sized top-k window
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(exchanges(out) === 1, plan)
  }

  test("dedupParagraphs plans exactly two hash exchanges (dup hash + fused per-doc agg)") {
    val docs = Seq((1L, "a b\nc d"), (2L, "c d\ne f")).toDF("doc_id", "text")
      .repartition(4)
    val out = graft.pipeline.Dedup.dedupParagraphs(docs, "doc_id", "text")
    assert(exchanges(out) === 2, out.queryExecution.executedPlan.toString)
  }

  test("hammingPairs shuffles only (band, bits) keys: 3 hash exchanges, no payload") {
    // sizes agg (1) + the self-join's two sides re-using the pruned
    // chunk table (2) — all keyed on the 8-byte (band, bits) pair; a
    // 4th exchange would mean a payload-sized shuffle crept in
    val sigs = Seq((1L, 100L), (2L, 101L), (3L, 900L))
      .toDF("id", "sig").repartition(4)
    val out = graft.pipeline.Dedup.hammingPairs(sigs, "id", "sig", maxHamming = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(exchanges(out) <= 3, plan)
    // signature chunking is shiftrightunsigned/bitwiseAND Column
    // arithmetic — no ScalaUDF breaking whole-stage codegen
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("incremental hamming probe never shuffles the index side") {
    val hist = Seq((1L, 100L), (2L, 200L)).toDF("id", "sig").repartition(4)
    val idx = graft.pipeline.Dedup.buildHashIndex(hist, "id", "sig")
      .localCheckpoint(eager = false)
    idx.count()
    val batch = Seq((10L, 101L)).toDF("id", "sig").repartition(4)
    val out = graft.pipeline.Dedup.incrementalHammingMatches(
      batch, idx, "id", "sig", maxHamming = 3)
    // stateless chunk-explode + join: zero hash exchanges when the
    // batch side broadcasts (checkpointed index scans in place)
    val plan = out.queryExecution.executedPlan.toString
    assert(exchanges(out) <= 2, plan)
    assert(plan.contains("Join"), plan)
    // geometry guard: probing with the wrong band count (e.g. a
    // bands=4 scale-dial index probed with the default 8) fails fast
    // instead of silently collapsing recall
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Dedup.incrementalHammingMatches(
        batch, idx, "id", "sig", maxHamming = 3, bands = 4)
    }
    assert(e.getMessage.contains("bands"), e.getMessage)
    // a pre-metadata index (no `bands` column) still probes unchecked
    val legacy = idx.drop("bands")
    graft.pipeline.Dedup.incrementalHammingMatches(
      legacy, legacy, "id", "sig", maxHamming = 3, bands = 4).count()
  }

  test("co-located join of bucketed tables plans zero exchanges") {
    val B = graft.sources.Bucketed
    B.writeBucketed(sf("sf0.001", "orders"), "pst_orders_b",
      Seq("o_orderkey"), 4, Seq("o_orderkey"))
    B.writeBucketed(sf("sf0.001", "lineitem"), "pst_lineitem_b",
      Seq("l_orderkey"), 4, Seq("l_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the bucketed-SMJ path is what gets planned
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = B.colocatedJoin(spark, "pst_orders_b", "pst_lineitem_b",
        F.col("o_orderkey") === F.col("l_orderkey"))
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the write-side shuffle was paid once; the join itself adds none
      assert(exchanges(out) === 0, plan)
      assert(plan.contains("SelectedBucketsCount"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS pst_orders_b")
      spark.sql("DROP TABLE IF EXISTS pst_lineitem_b")
    }
  }

  test("lag and running sum share one Window exec in withSessionId") {
    val df = Seq((1L, 10L), (1L, 20L)).toDF("u", "ts").repartition(4)
    val out = Sessionize.withSessionId(df, F.col("u"), F.col("ts"), 100L)
    val windows = "Window ".r
      .findAllIn(out.queryExecution.executedPlan.toString).size
    // lag needs the plain frame, the running sum needs rows-unbounded:
    // same partition/order spec, so Catalyst may fuse or stack them —
    // but both must sit over a single exchange
    assert(exchanges(out) === 1)
    assert(windows >= 1)
  }

  test("ivfRadiusPairs plans a broadcast probe join, never a cartesian") {
    val emb = (0 until 40).map(i =>
      (i.toLong, Array(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat)))
      .toDF("vec_id", "embedding").repartition(4)
    val idx = graft.pipeline.Similarity.buildIvfIndex(emb, "vec_id", "embedding", 4)
    val out = graft.pipeline.Similarity
      .ivfRadiusPairs(idx, emb, "vec_id", "embedding", 0.9, probeMass = 1.0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // candidate join is map-side (broadcast): zero hash exchanges
    assert(exchanges(out) === 0, plan)
  }

  test("per-cell prototypicality rule rides one exchange for both windows") {
    val scored = Seq((1L, 0, 0.1), (2L, 0, 0.2), (3L, 1, 0.3))
      .toDF("vec_id", "cell", "proto_score").repartition(4)
    val out = graft.pipeline.Diversity.keepLeastPrototypical(scored, "vec_id", 0.5)
    // row_number (cell, ordered) and count (cell) share
    // HashPartitioning(cell) -> exactly one exchange
    assert(exchanges(out) === 1)
  }

  test("SketchView.read merges on one exchange; readRange prunes before it") {
    val ev = sf("sf0.001", "events").limit(500)
    val dir = java.nio.file.Files.createTempDirectory("graft_ps_skview").toString
    graft.sketch.SketchView.materialize(
      ev, "ts", Seq("event_type"), "value", dir)
    val view = graft.sketch.SketchView.read(spark, dir, Seq("event_type"))
    // scan → partial merge → ONE exchange on (bucket, keys) → final
    assert(exchanges(view) === 1)
    val plan = view.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("DataCard.sourceCards rides one exchange for both aggregates and the join") {
    val docs = Seq(("A", "en", "x"), ("A", "de", "y"), ("B", "en", "z"))
      .toDF("source", "lang", "text").repartition(4)
    val out = graft.pipeline.DataCard.sourceCards(docs, "source", "lang", "text")
    val plan = out.queryExecution.executedPlan.toString
    // each join branch shuffles ONCE on source (the lang-filter
    // pushdown keeps the two branch exchanges from unifying), and —
    // the part that matters — no countDistinct expand+gid exchange
    // keyed on (source, lang, text, gid) re-shuffles the full corpus
    assert(exchanges(out) === 2, plan)
    assert(!plan.contains("gid"), plan)
  }

  test("cardsFromViews and multiWindowBurn plans read ONLY view rows — no corpus scan") {
    // the nightly-ops contract: maintenance scans the corpus, reads
    // never do. A documents/events file in either read plan means an
    // accidental rescan snuck in.
    val docs = sf("sf0.001", "documents").limit(300)
      .withColumn("ts",
        F.lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    val cardBase = java.nio.file.Files
      .createTempDirectory("graft_ps_card").toString
    graft.pipeline.DataCard.materializeCardViews(
      docs, "source", "lang", "text", "ts", cardBase)
    val card = graft.pipeline.DataCard.cardsFromViews(spark, cardBase)
    val cardPlan = card.queryExecution.executedPlan.toString
    assert(!cardPlan.contains("documents"), cardPlan)
    assert(cardPlan.contains("graft_ps_card"), cardPlan)

    val ev = sf("sf0.001", "events").limit(500)
    val sloDir = java.nio.file.Files
      .createTempDirectory("graft_ps_slo").toString
    graft.sketch.SketchView.materialize(
      ev, "ts", Seq("event_type"), "value", sloDir)
    val burn = graft.sketch.Slo.multiWindowBurn(spark, sloDir,
      Seq("event_type"), objective = 100.0, budget = 0.25,
      untilMs = 4102444800000L, shortMs = 3600000L, longMs = 7200000L)
    val burnPlan = burn.queryExecution.executedPlan.toString
    assert(!burnPlan.contains("events"), burnPlan)
    assert(burnPlan.contains("graft_ps_slo"), burnPlan)
  }

  test("edit-k probe and incremental splits plan hash joins, never a cartesian") {
    val keys = (0L until 200L).map(i => (i,
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString))
      .toDF("id", "s").repartition(4)
    val ek = graft.pipeline.Dedup.editKPairs(keys, "id", "s", k = 2)
    val ekPlan = ek.queryExecution.executedPlan.toString
    assert(!ekPlan.contains("CartesianProduct"), ekPlan)
    assert(!ekPlan.contains("BroadcastNestedLoop"), ekPlan)

    val docs = sf("sf0.001", "documents").limit(150)
      .filter(F.col("text").isNotNull).select("doc_id", "text")
    val hist = graft.pipeline.Sampling.splitByHash(
      docs, F.col("doc_id"), Seq(("train", 0.9), ("val", 0.1)))
    val index = graft.pipeline.Dedup
      .buildSignatureIndex(hist, "doc_id", "text", 5, 16, 8)
      .localCheckpoint(eager = false)
    val out = graft.pipeline.Dedup.incrementalLeakFreeSplits(
      docs.select((F.col("doc_id") + 9000L).as("doc_id"), F.col("text")),
      "doc_id", "text", index, hist, "doc_id", "text", "split",
      Seq(("train", 0.9), ("val", 0.1)), 5, 0.8, 16, 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("snapshot diff is one full-outer hash join over hash-only projections") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "txt").repartition(4)
    val b = Seq((2L, "y"), (3L, "z")).toDF("k", "txt").repartition(4)
    val out = graft.pipeline.Snapshot.diffSnapshots(a, b, "k", Seq("txt"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // two sides each shuffle on the key for the sort-merge/hash join —
    // and nothing else (payloads are projected away before the join)
    assert(exchanges(out) <= 2, plan)
  }

  test("winnowOverlapPairs shuffles fp once then pairs once (repartition reuse)") {
    val docs = sf("sf0.001", "documents").select($"doc_id", $"text")
    val out = graft.pipeline.Dedup.winnowOverlapPairs(docs, "doc_id", "text")
    // repartition(fp) feeds distinct AND the bucket groupBy; the pair
    // groupBy is the only other hash exchange
    assert(exchanges(out) === 2,
      out.queryExecution.executedPlan.toString)
  }

  test("knnClassifyIndexed: vote aggregate and top-1 window share one exchange") {
    val emb = sf("sf0.001", "embeddings")
      .select($"vec_id".cast("long").as("vec_id"), $"embedding",
        ($"vec_id" % 7).cast("int").as("label"))
    val idx = graft.pipeline.Similarity.buildIvfIndex(
      emb, "vec_id", "embedding", nlist = 8)
    val out = graft.pipeline.Similarity.knnClassifyIndexed(
      idx, emb, emb.filter($"vec_id" < 5), "vec_id", "embedding", "label", 3)
    // probe window (1) + vote repartition serving groupBy AND window (1)
    assert(exchanges(out) === 2,
      out.queryExecution.executedPlan.toString)
  }

  test("binaryTopK: coarse window prunes partially before its shuffle; scans push filters") {
    val emb = sf("sf0.001", "embeddings")
      .select($"vec_id".cast("long").as("vec_id"), $"embedding")
    val out = graft.pipeline.BinaryQuant.binaryTopK(
      emb, emb.filter($"vec_id" < 5), "vec_id", "embedding", 5, poolSize = 50)
    val plan = out.queryExecution.executedPlan.toString
    assert(exchanges(out) === 2, plan)
    // Spark 4 WindowGroupLimit: the per-partition partial top-pool
    // prunes BEFORE the coarse shuffle — the property that keeps the
    // coarse pass from shipping corpus x queries rows
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("bm25TopKProximity: the bm25 sum, proximity group, and join ride ONE id exchange") {
    val docs = sf("sf0.001", "documents").select($"doc_id", $"text")
    val out = graft.pipeline.Retrieval.bm25TopKProximity(
      docs, "doc_id", "text", Seq("slow", "merge", "window"), 10)
    val plan = out.queryExecution.executedPlan.toString
    // exactly one hash exchange keyed on the document id ALONE (the
    // fused bm25+proximity aggregate); a second one means the fusion
    // regressed to separate groupBys or a join. (corpusStats' distinct
    // partitions on (id, dl) — excluded by the exact-arity pattern.)
    val idExchanges =
      "Exchange hashpartitioning\\(id#\\d+L?, \\d+\\)".r.findAllIn(plan).size
    assert(idExchanges === 1, plan)
  }

  test("assembleContextBatch: snippet group and prefix window share ONE query_id exchange") {
    val docs = sf("sf0.001", "documents").select($"doc_id", $"text")
    val ranked = Seq((0L, 1, 1L), (0L, 2, 2L), (1L, 1, 3L))
      .toDF("query_id", "rank", "id")
    val queries = Seq((0L, Seq("slow", "merge")), (1L, Seq("window")))
      .toDF("query_id", "terms")
    val out = graft.pipeline.Retrieval.assembleContextBatch(
      docs, "doc_id", "text", ranked, queries,
      window = 12, budgetTokens = 60)
    val plan = out.queryExecution.executedPlan.toString
    // exactly TWO query_id exchanges: the snippet grouping's
    // repartition and the final prefix window — every bounded side
    // (spans, rendered snippets) broadcasts, so no join re-shuffles
    // the serving data
    val qidExchanges =
      "Exchange hashpartitioning\\(query_id#".r.findAllIn(plan).size
    assert(qidExchanges === 2, plan)
  }

  test("maxSimRerank: max and sum aggregates share the (query, doc) exchange") {
    // REAL query-id values (a literal query_id degenerates the
    // repartition key to a constant and EnsureRequirements re-shuffles
    // — degenerate input, not the serving shape)
    val emb = sf("sf0.001", "embeddings")
    val dv = emb.select(
      org.apache.spark.sql.functions.floor($"vec_id" / 4).cast("long").as("doc_id"),
      $"vec_id", $"embedding")
    val qv = emb.filter($"vec_id" < 8)
      .select(org.apache.spark.sql.functions.floor($"vec_id" / 4)
        .cast("long").as("query_id"), $"vec_id", $"embedding")
    val cand = qv.select("query_id").distinct()
      .crossJoin(dv.select("doc_id").distinct())
    val out = graft.pipeline.Similarity.maxSimRerank(cand, qv, dv, 10)
    val plan = out.queryExecution.executedPlan.toString
    // the (query_id, doc_id) repartition serves BOTH aggregates: no
    // exchange anywhere keys on the per-query-vector column — a
    // (q, d, qv) exchange means the sharing regressed
    assert("Exchange hashpartitioning\\([^\\n]*__qvid".r
      .findAllIn(plan).isEmpty, plan)
    // 4 hash exchanges total: the two candidate-building distincts
    // (broadcast side), the explicit (q, d) repartition, the final
    // per-query window re-key over pool-sized rows
    assert(exchanges(out) === 4, plan)
    assert("BroadcastExchange".r.findAllIn(plan).size >= 2, plan)
  }

  test("fuseScoresMinMax: serving lists fuse with one grouped-sum exchange") {
    val a = Seq((1L, 1, 3.0), (2L, 2, 2.0)).toDF("id", "rank", "score")
    val b = Seq((2L, 1, 0.9), (3L, 2, 0.1)).toDF("id", "rank", "score")
    val out = graft.pipeline.Retrieval.fuseScoresMinMax(
      Seq(a -> 0.6, b -> 0.4), 10)
    val plan = out.queryExecution.executedPlan.toString
    // the two 1-row min/max aggregates broadcast back (SinglePartition
    // globals, never hash shuffles of the lists); the union's per-id
    // sum is the ONE hash exchange in the whole fuse
    assert(exchanges(out) === 1, plan)
    assert("BroadcastExchange".r.findAllIn(plan).size >= 2, plan)
  }
}
