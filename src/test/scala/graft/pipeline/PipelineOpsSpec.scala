package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("profileColumns reports exact rows/nulls and accurate distincts in one scan") {
    val df = Seq(
      (Some("a"), Some(1L)), (Some("b"), Some(2L)), (Some("a"), None),
      (None, Some(2L)), (Some("c"), Some(3L)))
      .toDF("s", "v")
    val out = Profile.profileColumns(df, Seq("s", "v"))
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("s")._2 === 5L && out("s")._3 === 1L)
    assert(out("v")._2 === 5L && out("v")._3 === 1L)
    // below-k cardinalities: KMV is exact
    assert(out("s")._4 === 3.0)
    assert(out("v")._4 === 3.0)
    // one scan: a single aggregate, no join, one exchange at most
    val plan = Profile.profileColumns(df, Seq("s", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty, plan)
  }

  test("profileColumns handles column names with dots, spaces, and quotes") {
    val df = Seq((Some("x"), Some(1L)), (None, Some(2L)))
      .toDF("a.b c", "it's")
    val out = Profile.profileColumns(df, Seq("a.b c", "it's"))
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("a.b c")._2 === 2L && out("a.b c")._3 === 1L && out("a.b c")._4 === 1.0)
    assert(out("it's")._2 === 2L && out("it's")._3 === 0L && out("it's")._4 === 2.0)
  }

  test("incrementalEmbeddingDuplicates skips self-pairs on re-ingested ids") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val index = Dedup.buildVectorSignatureIndex(vecs, "vec_id", "embedding")
    // probing the exact same batch (same ids) must report nothing:
    // a row is not a duplicate of itself
    val self = Dedup.incrementalEmbeddingDuplicates(
      vecs, index, "vec_id", "embedding", 0.9)
    assert(self.count() === 0L)
    // the same vector under a NEW id is still caught
    val renamed = Seq((10L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val hits = Dedup.incrementalEmbeddingDuplicates(
        renamed, index, "vec_id", "embedding", 0.9)
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    assert(hits === Set((10L, 1L)))
  }

  test("incrementalExactDuplicates: bloom prune + semi-join verify is exactly set membership") {
    val hist = Seq.tabulate(300)(i => (i.toLong, s"hist doc $i")).toDF("doc_id", "text")
    val fresh = (Seq.tabulate(100)(i => (1000L + i, s"fresh doc $i")) ++
      Seq((2000L, "hist doc 7"), (2001L, "hist doc 42"), (2002L, "hist doc 7")))
      .toDF("doc_id", "text")
    val index = Dedup.buildContentHashIndex(hist, "text")
    // a deliberately tiny, high-fpp filter floods the verify join with
    // false positives — the semi-join must still return the exact set
    val dups = Dedup.incrementalExactDuplicates(
        fresh, index, "doc_id", "text", expectedItems = 10L, fpp = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(dups === Set(2000L, 2001L, 2002L))
    // and with sane parameters too
    val dups2 = Dedup.incrementalExactDuplicates(fresh, index, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(dups2 === Set(2000L, 2001L, 2002L))
  }

  // --------------------------------------------- embedding near-dup

  test("embeddingNearDuplicatePairs finds exact and near copies, skips far pairs") {
    val base = Array(1.0f, 0.0f, 2.0f, -1.0f)
    val near = Array(1.01f, 0.01f, 1.99f, -1.0f)   // cos ~ 0.9999
    val far  = Array(-2.0f, 1.0f, 0.5f, 3.0f)
    val df = Seq(
      (1L, base), (2L, base.clone()), (3L, near), (4L, far))
      .toDF("id", "vec").repartition(2)
    val pairs = Dedup.embeddingNearDuplicatePairs(df, "id", "vec", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))           // exact copy: recall guaranteed
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    val cos = Dedup.embeddingNearDuplicatePairs(df, "id", "vec", 0.99)
      .filter($"id_a" === 1L && $"id_b" === 2L)
      .select("cos").as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-9)
  }

  test("embeddingNearDuplicatePairs ignores NULL embeddings instead of crashing") {
    val v = Array(1.0f, 2.0f)
    val df = Seq((1L, Option(v)), (2L, Option(v.clone())), (3L, Option.empty[Array[Float]]))
      .toDF("id", "vec")
    val pairs = Dedup.embeddingNearDuplicatePairs(df, "id", "vec", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))   // the NULL row neither crashes nor pairs
  }

  test("embeddingNearDuplicatePairs emits each pair once despite multi-table collisions") {
    val v = Array(0.5f, -0.25f, 1.5f)
    val df = Seq((10L, v), (20L, v.clone())).toDF("id", "vec")
    val rows = Dedup.embeddingNearDuplicatePairs(df, "id", "vec", 0.5).collect()
    assert(rows.length === 1)
  }

  // --------------------------------------------------- IVF index reuse

  test("ivfTopKIndexed over a prebuilt index matches the one-shot ivfTopK") {
    val emb = sf("sf0.001", "embeddings")
    val queries = emb.filter(F.col("vec_id") < 3)
    val oneShot = Similarity
      .ivfTopK(emb, queries, "vec_id", "embedding", 5, nlist = 8, nprobe = 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8)
    val indexed = Similarity
      .ivfTopKIndexed(idx, queries, "vec_id", "embedding", 5, nprobe = 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(indexed === oneShot)
    assert(indexed.nonEmpty)
  }

  test("IvfIndex save/load roundtrip preserves centroids and query results") {
    val emb = sf("sf0.001", "embeddings")
    val queries = emb.filter(F.col("vec_id") < 3)
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    idx.save(dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    assert(loaded.centroids.map(_.toSeq).toSeq === idx.centroids.map(_.toSeq).toSeq)
    def res(i: Similarity.IvfIndex) = Similarity
      .ivfTopKIndexed(i, queries, "vec_id", "embedding", 5, nprobe = 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val fromMem = res(idx)
    assert(fromMem.nonEmpty)
    assert(res(loaded) === fromMem)
  }

  test("appendToIvfIndex grows a saved index with frozen-centroid assignments") {
    val emb = sf("sf0.001", "embeddings").filter(F.col("embedding").isNotNull)
    val even = emb.filter(F.col("vec_id") % 2 === 0)
    val odd  = emb.filter(F.col("vec_id") % 2 =!= 0)
    val idx = Similarity.buildIvfIndex(even, "vec_id", "embedding", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString
    idx.save(dir)
    val grown = Similarity.appendToIvfIndex(spark, dir, odd, "vec_id", "embedding")
    // centroids are frozen by the append
    assert(grown.centroids.map(_.toSeq).toSeq === idx.centroids.map(_.toSeq).toSeq)
    // every corpus row lands exactly once, in the cell the frozen
    // centroids dictate — append ≡ a full frozen-centroid assignment
    val got = grown.assigned
      .select(F.col("neighbor_id").cast("long"), F.col("__cell"))
      .as[(Long, Int)].collect()
    val expected = emb.select(F.col("vec_id").cast("long"), F.col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        id -> Similarity.nearestCentroids(idx.centroids, v, 1).head }
      .toMap
    assert(got.length === expected.size)
    got.foreach { case (id, cell) => assert(cell === expected(id), s"vec_id $id") }
    // a radius probe of an appended exact copy finds itself even at
    // nprobe=1 (identical vector → same frozen cell; self-matches kept)
    val probeQ = odd.limit(3).select(F.col("vec_id"), F.col("embedding"))
    val selfHits = Similarity
      .ivfRadiusPairs(grown, probeQ, "vec_id", "embedding", 0.999, nprobe = 1)
      .filter(F.col("query_id") === F.col("neighbor_id"))
      .select("query_id").as[Long].collect().toSet
    assert(selfHits.size === 3)
  }

  test("streamToIvfIndex: micro-batches equal the batch append, replays idempotent") {
    val emb = sf("sf0.001", "embeddings").filter(F.col("embedding").isNotNull)
    val even = emb.filter(F.col("vec_id") % 2 === 0)
    val odd  = emb.filter(F.col("vec_id") % 2 =!= 0)
      .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
    val idx = Similarity.buildIvfIndex(even, "vec_id", "embedding", nlist = 8)
    val dirA = java.nio.file.Files.createTempDirectory("graft_ivf_ba").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivf_st").toString
    idx.save(dirA); idx.save(dirB)
    Similarity.appendToIvfIndex(spark, dirA, odd, "vec_id", "embedding")

    val src = java.nio.file.Files.createTempDirectory("graft_ivf_src").toString
    odd.repartition(3).write.mode("overwrite").parquet(src)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivf_ck").toString
    val stream = spark.readStream.schema(odd.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = Similarity.streamToIvfIndex(stream, dirB, "vec_id", "embedding")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()

    def content(dir: String) = Similarity.loadIvfIndex(spark, dir).assigned
      .select(F.col("neighbor_id").cast("long"), F.col("__cell"))
      .as[(Long, Int)].collect().toSet
    val batchSet = content(dirA)
    assert(content(dirB) === batchSet && batchSet.nonEmpty)
    // the stream landed per-micro-batch partitions (>= 3 files → >= 3 ids)
    val batches = spark.read.parquet(s"$dirB/assigned")
      .select(F.col("__batch").cast("long")).distinct()
      .as[Long].collect().sorted
    assert(batches.head === -1L && batches.count(_ >= 0L) >= 3)

    // at-least-once redelivery: replaying a micro-batch id with the
    // same rows replaces exactly its own partitions — content unchanged
    val extra = odd.limit(5)
    val nextId = batches.max + 1
    Similarity.appendToIvfIndexTouched(
      spark, dirB, extra, "vec_id", "embedding", batchId = nextId)
    val afterOnce = content(dirB)
    Similarity.appendToIvfIndexTouched(
      spark, dirB, extra, "vec_id", "embedding", batchId = nextId)
    assert(content(dirB) === afterOnce)

    // a removal advances the watermark; a crash-replay of the mutated
    // micro-batch must write nothing (removed ids stay gone). The
    // writer is stopped — release its lease (removals REFUSE while a
    // writer heartbeat is fresh; pinned in MaintenanceSpec)
    Maintenance.releaseWriterLease(spark, dirB)
    val doomedIds = extra.select("vec_id").as[Long].collect().toSet
    Similarity.removeFromIvfIndex(spark, dirB,
      extra.select("vec_id"), "vec_id")
    val afterRemove = content(dirB)
    assert(afterRemove.forall { case (id, _) => !doomedIds.contains(id) })
    Similarity.appendToIvfIndexTouched(
      spark, dirB, extra, "vec_id", "embedding", batchId = nextId)
    assert(content(dirB) === afterRemove, "replay resurrected removed vectors")

    // the code-table sibling follows the same protocol
    val pqDir = java.nio.file.Files.createTempDirectory("graft_pq_st").toString
    ProductQuantization.buildIvfPq(even, "vec_id", "embedding",
      nlist = 8, m = 16, ksub = 16, iterations = 2).save(pqDir)
    ProductQuantization.appendBatchToIvfPq(
      spark, pqDir, extra, "vec_id", "embedding", batchId = 0L)
    val pqOnce = ProductQuantization.loadIvfPq(spark, pqDir).encoded
      .select(F.col("neighbor_id").cast("long")).as[Long].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    ProductQuantization.appendBatchToIvfPq(
      spark, pqDir, extra, "vec_id", "embedding", batchId = 0L)
    val pqTwice = ProductQuantization.loadIvfPq(spark, pqDir).encoded
      .select(F.col("neighbor_id").cast("long")).as[Long].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(pqTwice === pqOnce)
    assert(doomedIds.forall(id => pqOnce.getOrElse(id, 0) === 1))
  }

  test("compactIvfIndex folds retired batches; newest stays; crash recovery exact") {
    val emb = sf("sf0.001", "embeddings").filter(F.col("embedding").isNotNull)
      .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
    val base = emb.filter(F.col("vec_id") % 4 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_cp").toString
    Similarity.buildIvfIndex(base, "vec_id", "embedding", nlist = 8).save(dir)
    (1 to 3).foreach { m =>
      Similarity.appendToIvfIndexTouched(spark, dir,
        emb.filter(F.col("vec_id") % 4 === m), "vec_id", "embedding",
        batchId = m.toLong - 1L)
    }
    def content() = Similarity.loadIvfIndex(spark, dir).assigned
      .select(F.col("neighbor_id").cast("long"), F.col("__cell"))
      .as[(Long, Int)].collect().sorted.toSeq
    def batches() = spark.read.parquet(s"$dir/assigned")
      .select(F.col("__batch").cast("long")).distinct().as[Long].collect().toSet
    val before = content()
    assert(batches() === Set(-1L, 0L, 1L, 2L))

    val folded = Similarity.compactIvfIndex(spark, dir)
    // newest streaming batch (2) stays merge-on-read; 0 and 1 folded
    assert(batches() === Set(-1L, 2L))
    assert(content() === before)
    assert(folded.centroids.length === 8)
    // one file per cell in the folded base layer
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val cellDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/assigned"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__cell="))
    cellDirs.foreach { c =>
      val baseDir = new org.apache.hadoop.fs.Path(c.getPath, "__batch=-1")
      if (fs.exists(baseDir)) {
        val n = fs.listStatus(baseDir).count(st =>
          st.isFile && !st.getPath.getName.startsWith("_"))
        assert(n <= 1, s"cell ${c.getPath.getName} has $n base files")
      }
    }
    // a crash-replay of a FOLDED batch writes nothing (watermark)
    Similarity.appendToIvfIndexTouched(spark, dir,
      emb.filter(F.col("vec_id") % 4 === 1), "vec_id", "embedding", batchId = 0L)
    assert(content() === before, "folded-batch replay resurrected rows")

    // crash AFTER the journal commits: the next maintenance call
    // finishes the fold idempotently and content is exact
    Similarity.appendToIvfIndexTouched(spark, dir,
      emb.filter(F.col("vec_id") % 4 === 1)
        .select((F.col("vec_id") + 500000L).as("vec_id"), F.col("embedding")),
      "vec_id", "embedding", batchId = 7L)
    val before2 = content()
    intercept[RuntimeException] {
      CellTable.compact(spark, dir, s"$dir/assigned",
        afterJournal = () => throw new RuntimeException("boom"))
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/assigned/_compact_pending.json")))
    // journal-aware reads are EXACT inside the crash window — before
    // any move (staged ∪ live-minus-journaled) ...
    assert(content() === before2, "pre-move crash window read is wrong")
    // ... and mid-move (rename one staged file live by hand)
    val stagedFile = {
      def firstFile(p: org.apache.hadoop.fs.Path): Option[org.apache.hadoop.fs.Path] = {
        val sts = fs.listStatus(p).sortBy(_.getPath.getName)
        sts.collectFirst {
          case st if st.isFile && !st.getPath.getName.startsWith("_") => st.getPath
        }.orElse(sts.filter(_.isDirectory).iterator
          .flatMap(d => firstFile(d.getPath)).nextOption())
      }
      firstFile(new org.apache.hadoop.fs.Path(s"$dir/assigned/_compact_fold")).get
    }
    // staged layout: _compact_fold/__cell=C/__batch=-1/<file>
    val cellName = stagedFile.getParent.getParent.getName
    val dest = new org.apache.hadoop.fs.Path(
      s"$dir/assigned/$cellName/__batch=-1/${stagedFile.getName}")
    fs.mkdirs(dest.getParent)
    assert(fs.rename(stagedFile, dest))
    assert(content() === before2, "mid-move crash window read is wrong")
    val again = Similarity.compactIvfIndex(spark, dir) // recovers, reloads
    assert(content() === before2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/assigned/_compact_pending.json")))
    assert(again.assigned.count().toInt === before2.size)
    // idempotent: a further compact with nothing to fold is a no-op
    Similarity.compactIvfIndex(spark, dir)
    assert(content() === before2)

    // the code-table sibling folds and probes identically
    val pqDir = java.nio.file.Files.createTempDirectory("graft_pq_cp").toString
    ProductQuantization.buildIvfPq(base, "vec_id", "embedding",
      nlist = 8, m = 16, ksub = 16, iterations = 2).save(pqDir)
    (1 to 3).foreach { m =>
      ProductQuantization.appendBatchToIvfPq(spark, pqDir,
        emb.filter(F.col("vec_id") % 4 === m), "vec_id", "embedding",
        batchId = m.toLong - 1L)
    }
    def pqContent() = ProductQuantization.loadIvfPq(spark, pqDir).encoded
      .select(F.col("neighbor_id").cast("long")).as[Long].collect().sorted.toSeq
    val pqBefore = pqContent()
    ProductQuantization.compactIvfPq(spark, pqDir)
    assert(pqContent() === pqBefore)
    val pqBatches = spark.read.parquet(s"$pqDir/encoded")
      .select(F.col("__batch").cast("long")).distinct().as[Long].collect().toSet
    assert(pqBatches === Set(-1L, 2L))
  }

  // --------------------------------------------- canonical selection

  test("keepCanonical keeps the best row per group with deterministic ties") {
    val df = Seq(
      (1L, "a  b", 10), (2L, "a b", 20), (3L, "a b", 20),   // same normalized group
      (4L, "c", 5))
      .toDF("id", "text", "quality").repartition(3)
    val kept = Dedup.keepCanonical(df,
        TextFunctions.normalizeText(F.col("text")),
        Seq(F.col("quality").desc, F.col("id").asc))
      .select("id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))   // quality 20 beats 10; id 2 beats 3
  }

  test("keepTopK caps each group at k with deterministic order") {
    val df = Seq(
      ("a", 1L, 30), ("a", 2L, 20), ("a", 3L, 20), ("a", 4L, 10),
      ("b", 5L, 1))
      .toDF("g", "id", "score").repartition(3)
    val kept = Dedup.keepTopK(df, F.col("g"),
        Seq(F.col("score").desc, F.col("id").asc), 2)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 5L))   // score 30, then tie broken by id; b keeps its only row
  }

  // ----------------------------------------------------- normalize

  test("normalizeText collapses whitespace, strips control chars, lowercases") {
    val df = Seq("  Hello\t\tWORLD \u0001x\n", "hello world x").toDF("t")
    val out = df.select(TextFunctions.normalizeText(F.col("t"))).as[String].collect()
    // control char dropped, whitespace collapsed, trimmed, lowercased:
    // both variants normalize to the same key
    assert(out(0) === "hello world x")
    assert(out(0) === out(1))
  }

  test("foldUnicode: NFKC compat forms, accent strip, typographic punctuation") {
    def fold(s: String) = TextFunctions.foldUnicodeKernel(s)
    assert(fold("ﬁle ﬂow") == "file flow")                  // ligatures
    assert(fold("Ｔｅｓｔ　ｗｉｄｅ") == "Test wide")        // fullwidth + ideographic space
    assert(fold("café naïve Müller") == "cafe naive Muller") // accents
    assert(fold("“quoted” – x — y") == "\"quoted\" - x - y")
    assert(fold("it’s … done") == "it's ... done")
    assert(fold("½ № Ⅸ") == "1/2 No IX")                     // compat digits/numerals
    assert(fold("a b") == "a b")                        // nbsp -> space (NFKC)
    assert(fold("plain ascii 123") == "plain ascii 123")     // identity on ASCII
    assert(fold("") == "")
    assert(fold(null) == null)
    // idempotent
    assert(fold(fold("café ﬁle ½")) == fold("café ﬁle ½"))
    // Column surface: map-only, null discipline
    val df = Seq("café", null.asInstanceOf[String]).toDF("t")
    val out = df.select(TextFunctions.foldUnicode(F.col("t")).as("f"))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("cafe", null))
  }

  // ---------------------------------------------------- multimodal

  test("sampleFrames explodes bounded fixed-size frames; resize caps payloads") {
    import graft.pipeline.Multimodal
    import graft.pipeline.Multimodal.MediaRecord
    val media = Seq(
      MediaRecord(1L, "video", Array.fill[Byte](1000)(7), 1000L, "s"),  // 3 frames of 256
      MediaRecord(2L, "video", Array.fill[Byte](100)(7), 100L, "s"),    // too short: 0
      MediaRecord(3L, "video", Array.fill[Byte](6000)(7), 6000L, "s"))  // 23 -> every 4 -> 6
      .toDS().repartition(2)
    val frames = Multimodal.sampleFrames(media, 256, everyNth = 4, maxFrames = 5)
      .collect()
    val byId = frames.groupBy(_.media_id).view.mapValues(_.map(_.frame_idx).sorted).toMap
    assert(byId(1L).toSeq === Seq(0))              // frames 0..2, every 4th -> just 0
    assert(!byId.contains(2L))
    assert(byId(3L).toSeq === Seq(0, 4, 8, 12, 16))  // capped at maxFrames=5
    assert(frames.forall(_.payload.length === 256))

    val resized = Multimodal.resize(media, 500).collect()
    assert(resized.forall(_.payload.length <= 500))
    assert(resized.find(_.media_id == 2L).get.payload.length === 100)  // untouched
  }

  // ------------------------------------------------------ sampling

  test("deterministicSample is stable and close to the target fraction") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.deterministicSample(df, F.col("id"), 0.25).as[Long].collect().toSet
    val b = Sampling.deterministicSample(df, F.col("id"), 0.25).as[Long].collect().toSet
    assert(a === b)                                  // deterministic
    assert(math.abs(a.size - 2500) < 250)            // ~fraction
    val sup = Sampling.deterministicSample(df, F.col("id"), 0.5).as[Long].collect().toSet
    assert(a.subsetOf(sup))                          // nested samples
  }

  test("stratifiedSample applies per-stratum fractions") {
    val df = spark.range(8000)
      .withColumn("src", F.when(F.col("id") % 2 === 0, "a").otherwise("b"))
    val out = Sampling.stratifiedSample(df, F.col("src"), F.col("id"),
        Map("a" -> 0.5, "b" -> 0.1))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(math.abs(out("a") - 2000) < 300)
    assert(math.abs(out("b") - 400) < 150)
    // edge fractions
    assert(Sampling.deterministicSample(df, F.col("id"), 1.0).count() === 8000)
    assert(Sampling.deterministicSample(df, F.col("id"), 0.0).count() === 0)
    // fractions rounding to the full 65536 must keep everything — the
    // naive %04x threshold would emit a 5-char string that sorts below
    // most 4-char prefixes and invert the predicate
    assert(Sampling.deterministicSample(df, F.col("id"), 0.999999).count() === 8000)
    assert(Sampling.stratifiedSample(df, F.col("src"), F.col("id"),
      Map("a" -> 1.0), defaultFraction = 1.0).count() === 8000)
  }

  test("repeatToBudget: full epochs + md5-prefix partial, clamped, budget-exact") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),   // T_a = 30
      ("b", 4L, 100L),                                  // T_b = 100
      ("c", 5L, 10L))                                   // no budget -> dropped
      .toDF("src", "id", "tok")
    val out = Sampling.repeatToBudget(df, F.col("src"), F.col("id"), F.col("tok"),
        Map("a" -> 75L, "b" -> 100L))
      .select("src", "id", "epoch").as[(String, Long, Long)].collect()
    val a = out.filter(_._1 == "a")
    // 75 // 30 = 2 full epochs (90 rows... 2 epochs x 3 docs), rem 15
    // -> partial epoch keeps the md5-prefix with cum <= 15 (1 doc)
    assert(a.count(_._3 == 0L) === 3 && a.count(_._3 == 1L) === 3)
    assert(a.count(_._3 == 2L) === 1)
    val b = out.filter(_._1 == "b")
    assert(b.map(_._3).sorted.toSeq === Seq(0L))        // exactly 1 epoch, rem 0
    assert(!out.exists(_._1 == "c"))
    // emitted token mass <= budget, and maximal without splitting docs
    val aTok = a.length * 10L
    assert(aTok === 70L)                                // 75 budget -> 70 achievable

    // nested budgets nest: the 75-budget output contains the 45-budget one
    val small = Sampling.repeatToBudget(df, F.col("src"), F.col("id"), F.col("tok"),
        Map("a" -> 45L)).select("src", "id", "epoch")
      .as[(String, Long, Long)].collect().toSet
    assert(small.subsetOf(out.toSet))

    // clamping: a 10-token domain with a 10^9 budget stays bounded
    val big = Sampling.repeatToBudget(
      Seq(("z", 1L, 10L)).toDF("src", "id", "tok"),
      F.col("src"), F.col("id"), F.col("tok"),
      Map("z" -> 1000000000L), maxEpochs = 5)
    assert(big.count() === 6L)                          // 5 full + 1 partial(all)
  }

  test("weightedSample keeps proportionally to the weight, nested and exact at edges") {
    val df = spark.range(10000).toDF("id")
    assert(Sampling.weightedSample(df, F.col("id"), F.lit(1.0)).count() === 10000)
    assert(Sampling.weightedSample(df, F.col("id"), F.lit(0.0)).count() === 0)
    val half = Sampling.weightedSample(df, F.col("id"), F.lit(0.5)).as[Long].collect().toSet
    assert(math.abs(half.size - 5000) < 400)
    // monotone in the weight: lower-weight sample nests in higher-weight
    val low = Sampling.weightedSample(df, F.col("id"), F.lit(0.2)).as[Long].collect().toSet
    assert(low.subsetOf(half))
    // matches the fraction-based sample at the same constant weight —
    // including 0.3, where 0.3*65536 is not an integer and a floor/round
    // mismatch between the two APIs would show
    for (f <- Seq(0.3, 0.5, 0.999999)) {
      val byWeight = Sampling.weightedSample(df, F.col("id"), F.lit(f)).as[Long].collect().toSet
      val byFrac = Sampling.deterministicSample(df, F.col("id"), f).as[Long].collect().toSet
      assert(byWeight === byFrac, s"weight/fraction mismatch at $f")
    }
  }

  test("bottomK returns exactly k rows, deterministic and nested in larger k") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.bottomK(df, F.col("id"), 100).select("id").as[Long].collect().toSet
    val b = Sampling.bottomK(df, F.col("id"), 100).select("id").as[Long].collect().toSet
    assert(a === b && a.size === 100)
    val sup = Sampling.bottomK(df, F.col("id"), 500).select("id").as[Long].collect().toSet
    assert(a.subsetOf(sup) && sup.size === 500)
    // k beyond the row count returns everything
    assert(Sampling.bottomK(df.limit(7), F.col("id"), 100).count() === 7)
    // the plan is a TakeOrdered, not a global sort
    val plan = Sampling.bottomK(df, F.col("id"), 100).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("rebalanceToDistribution hits the target mixture without upsampling") {
    val df = spark.range(9000)
      .withColumn("dom", F.when(F.col("id") % 3 === 0, "a")
        .when(F.col("id") % 3 === 1, "b").otherwise("c"))
    // 3000 rows each; weights 2:1 over {a, b}; c is dropped.
    // T = min(3000/(2/3), 3000/(1/3)) = 4500 → a keeps 3000 (all), b 1500
    val out = Sampling.rebalanceToDistribution(df, F.col("dom"), F.col("id"),
        Map("a" -> 2.0, "b" -> 1.0))
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(!out.contains("c"))
    assert(out("a") === 3000)                       // limiting domain: kept whole
    assert(math.abs(out("b") - 1500) < 200)         // half, within sampling noise
    // scale shrinks the total but preserves the mixture
    val scaled = Sampling.rebalanceToDistribution(df, F.col("dom"), F.col("id"),
        Map("a" -> 2.0, "b" -> 1.0), scale = 0.5)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(math.abs(scaled("a") - 1500) < 200)
    assert(math.abs(scaled("b") - 750) < 150)
    // deterministic: same rows both runs
    val r1 = Sampling.rebalanceToDistribution(df, F.col("dom"), F.col("id"),
      Map("a" -> 2.0, "b" -> 1.0)).select("id").as[Long].collect().toSet
    val r2 = Sampling.rebalanceToDistribution(df, F.col("dom"), F.col("id"),
      Map("a" -> 2.0, "b" -> 1.0)).select("id").as[Long].collect().toSet
    assert(r1 === r2)
  }

  test("temperatureRebalance: alpha=1 is identity, small alpha flattens, smallest domain kept whole") {
    val df = spark.range(13000)
      .withColumn("dom", F.when(F.col("id") < 9000, "big")
        .when(F.col("id") < 12000, "mid").otherwise("small"))
    // alpha = 1 keeps the natural mixture: every frac is exactly 1
    assert(Sampling.temperatureRebalance(df, F.col("dom"), F.col("id"), alpha = 1.0)
      .count() === 13000)
    // alpha = 0.5: w_d = sqrt(n_d), T = min(sqrt(n)) = sqrt(1000)
    // → kept_d ≈ sqrt(n_d * 1000): big ≈ 3000, mid ≈ 1732, small = 1000
    val out = Sampling.temperatureRebalance(df, F.col("dom"), F.col("id"), alpha = 0.5)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(out("small") === 1000)                   // limiting domain: kept whole
    assert(math.abs(out("big") - 3000) < 250, out.toString)
    assert(math.abs(out("mid") - 1732) < 200, out.toString)
    // flatter than the natural mixture, and deterministic across runs
    assert(out("big").toDouble / out("small") < 9000.0 / 1000.0)
    val again = Sampling.temperatureRebalance(df, F.col("dom"), F.col("id"), alpha = 0.5)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(again === out)
  }

  test("takeTokenBudget keeps the md5-ordered prefix within the inclusive budget") {
    val rows = Seq(
      ("a", 1L, 40L), ("a", 2L, 40L), ("a", 3L, 40L), ("a", 4L, 40L),
      ("b", 10L, 100L), ("b", 11L, 100L),
      ("c", 20L, 500L))
    val df = rows.toDF("dom", "id", "tok")
    val out = Sampling.takeTokenBudget(df, F.col("dom"), F.col("id"),
      F.col("tok"), budget = 100L)
    val kept = out.select("dom", "id").as[(String, Long)].collect().toSet
    // expected: per-domain md5(id) order, cumulative tok <= 100
    val expected = rows.groupBy(_._1).flatMap { case (_, rs) =>
      val ordered = rs.sortBy(r => (java.security.MessageDigest.getInstance("MD5")
        .digest(r._2.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, r._2))
      var cum = 0L
      ordered.takeWhile { r => cum += r._3; cum <= 100L }
    }.map(r => (r._1, r._2)).toSet
    assert(kept === expected)
    assert(kept.count(_._1 == "a") === 2)           // 40+40 <= 100, third exceeds
    assert(kept.count(_._1 == "b") === 1)           // first 100 fits exactly
    assert(kept.count(_._1 == "c") === 0)           // 500 > 100: nothing fits
    // schema passes through without the internal running-total column
    assert(out.columns.toSeq === Seq("dom", "id", "tok"))
  }

  test("scriptProfile: counts, declaration-order dominance, und, mixed") {
    val rows = Seq(
      ("latin only", "hello World"),
      // \u0416 x3 cyrillic vs 2 latin -> cyrillic dominates
      ("cyr dom", "ab \u0416\u0416\u0416"),
      // 2 latin vs 2 cjk tie -> latin (declaration order)
      ("tie", "ab \u4E16\u754C"),
      ("digits only", "123 456"),
      ("empty-ish", " .,!?"))
      .toDF("name", "t")
      .select(F.col("name"), TextFunctions.scriptProfile(F.col("t")).as("p"))
      .select(F.col("name"), F.col("p.latin"), F.col("p.cyrillic"),
        F.col("p.cjk"), F.col("p.digit"), F.col("p.dominant"), F.col("p.mixed"))
      .as[(String, Long, Long, Long, Long, String, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows("latin only") === (("latin only", 10L, 0L, 0L, 0L, "latin", false)))
    assert(rows("cyr dom")._6 === "cyrillic")
    assert(rows("cyr dom")._7 === true)
    assert(rows("tie")._6 === "latin")
    assert(rows("digits only") === (("digits only", 0L, 0L, 0L, 6L, "und", false)))
    assert(rows("empty-ish")._6 === "und")
  }

  test("leakFreeSplits: clusters land wholly in one split, singletons by own id") {
    // three exact-duplicate docs + two singletons
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "the quick brown fox jumps over the lazy dog again"),
      (10L, "completely different content about mountains and rivers flowing"),
      (11L, "yet another unrelated document concerning deep sea exploration"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text",
      shingleSize = 5, threshold = 0.8, bands = 16, rowsPerBand = 8)
    assert(pairs.count() === 3L) // (1,2) (1,3) (2,3)
    val splits = Seq(("train", 0.5), ("val", 0.25), ("test", 0.25))
    val out = Dedup.leakFreeSplits(docs, "doc_id", pairs, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // the whole duplicate cluster shares one split (keyed by min id 1)
    assert(out(1L) === out(2L) && out(2L) === out(3L))
    // and it is exactly the md5-range assignment of the representative
    val direct = Sampling.splitByHash(
        Seq(1L, 10L, 11L).toDF("k"), F.col("k"), splits)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === direct(1L))
    assert(out(10L) === direct(10L) && out(11L) === direct(11L))
    // deterministic across invocations
    val again = Dedup.leakFreeSplits(docs, "doc_id", pairs, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again === out)
  }

  test("incrementalLeakFreeSplits: inherit, bridge-quarantine, novel fallback") {
    val splits = Seq(("train", 0.5), ("val", 0.25), ("test", 0.25))
    // history with IMMUTABLE (caller-provided) splits; h1/h2 identical
    // texts but different splits — any fresh copy bridges them
    val hist = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "train"),
      (2L, "alpha beta gamma delta epsilon zeta", "test"),
      (3L, "completely different historical content here", "val"))
      .toDF("doc_id", "text", "split")
    val index = Dedup.buildSignatureIndex(hist, "doc_id", "text", 5, 16, 8)
      .localCheckpoint(eager = false)
    val fresh = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),      // bridges h1/h2
      (11L, "completely different historical content here"), // inherits val
      (12L, "a genuinely novel fresh document body"),     // novel singleton
      (13L, "another brand new shared fresh body text"),  // novel cluster...
      (14L, "another brand new shared fresh body text"),  // ...of two
      (15L, "completely different historical content here")) // clusters with 11
      .toDF("doc_id", "text")
    val out = Dedup.incrementalLeakFreeSplits(
        fresh, "doc_id", "text", index, hist, "doc_id", "text", "split",
        splits, shingleSize = 5, threshold = 0.8, bands = 16, rowsPerBand = 8)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out(10L) === "quarantine")
    assert(out(11L) === "val" && out(15L) === "val")
    // novel docs take the md5-range rule on their cluster representative
    val direct = Sampling.splitByHash(
        Seq(12L, 13L).toDF("k"), F.col("k"), splits)
      .as[(Long, String)].collect().toMap
    assert(out(12L) === direct(12L))
    assert(out(13L) === direct(13L) && out(14L) === out(13L)) // cluster rep 13
    assert(out.size === 6)
  }

  test("canaries: deterministic plant, exact scan recovery, foreign tokens unowned") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val planted = Canary.plant(docs, "doc_id", "text", "rel-a", 0.9)
    // re-planting the same release marks the same docs with the same tokens
    val again = Canary.plant(docs, "doc_id", "text", "rel-a", 0.9)
    assert(planted.collect().map(_.toString).sorted.toSeq ===
      again.collect().map(_.toString).sorted.toSeq)
    val scanned = Canary.scan(planted, "doc_id", "text")
    val got = scanned.as[(Long, String)].collect().toMap
    assert(got.nonEmpty && got.values.forall(_.matches("canary[0-9a-f]{32}")))
    // verify: own release resolves source ids; a foreign release owns none
    val own = Canary.verify(scanned, "rel-a", docs.select("doc_id"), "doc_id")
      .select("doc_id", "source_id").as[(Long, Option[Long])].collect()
    assert(own.nonEmpty && own.forall { case (id, src) => src === Some(id) })
    val foreign = Canary.verify(scanned, "rel-b", docs.select("doc_id"), "doc_id")
      .select("source_id").as[Option[Long]].collect()
    assert(foreign.forall(_.isEmpty))
    // NULL text is never planted
    assert(!got.contains(4L))
  }
}
