package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown cat naps"),
    (3L, "slow green turtle walks under the quick sun"),
    (4L, "dog dog dog"),
    (5L, ""),
    (6L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  // Local reference BM25 (same formula, straight scala) for exact
  // cross-checking of the distributed path.
  private def localBm25(
      corpus: Seq[(Long, String)], q: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> Option(t).getOrElse("").toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.filter(_._2.nonEmpty).toMap
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    val dfs = q.map(t => t -> toks.values.count(_.contains(t))).toMap
    toks.flatMap { case (id, ts) =>
      val s = q.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0 || dfs(t) == 0) 0.0
        else {
          val idf = math.log(1 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
          idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * ts.size / avgdl))
        }
      }.sum
      if (s > 0) Some(id -> s) else None
    }
  }

  test("buildIndex: postings carry tf, dl, sorted positions; null/empty docs absent") {
    val idx = Retrieval.buildIndex(docs, "doc_id", "text")
    val rows = idx.collect().map(r =>
      (r.getAs[String]("term"), r.getAs[Long]("id"), r.getAs[Long]("tf"),
        r.getAs[Int]("dl"), r.getAs[scala.collection.Seq[Int]]("positions").toSeq)).toSeq
    assert(!rows.exists(r => r._2 == 5L || r._2 == 6L))
    val theDoc1 = rows.find(r => r._1 == "the" && r._2 == 1L).get
    assert(theDoc1._3 == 2L && theDoc1._4 == 9 && theDoc1._5 == Seq(0, 6))
    val dogDoc4 = rows.find(r => r._1 == "dog" && r._2 == 4L).get
    assert(dogDoc4._3 == 3L && dogDoc4._5 == Seq(0, 1, 2))
  }

  test("bm25TopK matches the local reference exactly") {
    val corpus = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown cat naps",
      3L -> "slow green turtle walks under the quick sun",
      4L -> "dog dog dog")
    val q = Seq("quick", "dog")
    val want = localBm25(corpus, q)
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", q, 10)
      .select("id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (id, s, _) => assert(math.abs(s - want(id)) < 1e-12, s"doc $id") }
    // ranks follow (score desc, id asc)
    val sorted = got.sortBy(_._3)
    assert(sorted.map(_._1) ==
      want.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1).take(got.size))
  }

  test("case-insensitive query terms; no-hit query returns empty, not error") {
    val hit = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("QUICK"), 10)
    assert(hit.count() == 3)
    val miss = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("zzz"), 10)
    assert(miss.count() == 0)
  }

  test("TextIndex save/load round-trips and the probe partition-prunes") {
    val path = java.nio.file.Files.createTempDirectory("graft_tidx").toString
    val built = Retrieval.buildTextIndex(docs, "doc_id", "text", buckets = 8)
    built.save(path)
    val loaded = Retrieval.loadTextIndex(spark, path)
    assert(loaded.buckets == 8 && loaded.nDocs == built.nDocs &&
      math.abs(loaded.avgdl - built.avgdl) < 1e-12)

    val q = Seq("quick", "dog")
    val direct = Retrieval.bm25TopK(docs, "doc_id", "text", q, 10)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val indexed = Retrieval.bm25TopKIndexed(loaded, q, 10)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(indexed.keySet == direct.keySet)
    indexed.foreach { case (id, s) => assert(math.abs(s - direct(id)) < 1e-12) }

    // the __bucket filter must reach the scan as a PARTITION filter
    val pruned = loaded.postings.filter(F.col("__bucket")
      .isin(q.map(t => Retrieval.localTermBucket(t, 8)).distinct: _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bucket"),
      s"expected partition filter on __bucket in:\n$plan")
  }

  test("appendToTextIndex: probe of (saved + appended batch) equals a full rebuild") {
    val path = java.nio.file.Files.createTempDirectory("graft_tidx_inc").toString
    val first = docs.filter(F.col("doc_id") <= 3)
    val second = docs.filter(F.col("doc_id") > 3)
    Retrieval.buildTextIndex(first, "doc_id", "text", buckets = 8).save(path)
    val updated = Retrieval.appendToTextIndex(spark, path, second, "doc_id", "text")
    val full = Retrieval.buildTextIndex(docs, "doc_id", "text", buckets = 8)
    assert(updated.nDocs == full.nDocs)
    assert(math.abs(updated.avgdl - full.avgdl) < 1e-12)
    val q = Seq("quick", "dog")
    val inc = Retrieval.bm25TopKIndexed(updated, q, 10)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val direct = Retrieval.bm25TopK(docs, "doc_id", "text", q, 10)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(inc.keySet == direct.keySet)
    inc.foreach { case (id, s) => assert(math.abs(s - direct(id)) < 1e-12, s"doc $id") }
  }

  test("removeFromTextIndex: probe of the pruned index equals a rebuild on survivors") {
    val path = java.nio.file.Files.createTempDirectory("graft_tidx_rm").toString
    Retrieval.buildTextIndex(docs, "doc_id", "text", buckets = 8).save(path)
    val doomed = docs.filter(F.col("doc_id") % 2 === 0).select("doc_id")
    val pruned = Retrieval.removeFromTextIndex(spark, path, doomed, "doc_id")
    val remaining = docs.filter(F.col("doc_id") % 2 =!= 0)
    val rebuilt = Retrieval.buildTextIndex(remaining, "doc_id", "text", buckets = 8)
    assert(pruned.nDocs == rebuilt.nDocs)
    assert(math.abs(pruned.avgdl - rebuilt.avgdl) < 1e-9)
    // identical posting sets...
    val pp = pruned.postings.select("term", "id", "tf", "dl")
      .collect().map(_.toSeq).toSet
    val rp = rebuilt.postings.select("term", "id", "tf", "dl")
      .collect().map(_.toSeq).toSet
    assert(pp === rp && pp.nonEmpty)
    // ...and identical probe scores to float noise
    val q = Seq("quick", "dog")
    val a = Retrieval.bm25TopKIndexed(pruned, q, 10)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = Retrieval.bm25TopK(remaining, "doc_id", "text", q, 10)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (id, s) => assert(math.abs(s - b(id)) < 1e-9, s"doc $id") }
    // removing ids not present is a no-op; removing EVERYTHING empties
    // the postings and zeroes the stats, deleting the bucket dirs
    assert(Retrieval.removeFromTextIndex(spark, path,
      Seq(999L).toDF("doc_id"), "doc_id").nDocs == pruned.nDocs)
    val emptied = Retrieval.removeFromTextIndex(spark, path,
      remaining.select("doc_id"), "doc_id")
    assert(emptied.nDocs === 0L && emptied.avgdl === 0.0)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/postings"))
      .map(_.getPath.getName).filter(_.startsWith("__bucket="))
    assert(dirs.isEmpty)
  }

  test("syncTextIndex from a snapshot diff equals a rebuild on the new snapshot") {
    val path = java.nio.file.Files.createTempDirectory("graft_tidx_sync").toString
    // old: missing doc 1 (added later), doc 2's text changed, plus a
    // phantom doc 99 that today's snapshot dropped
    val session = spark
    import session.implicits._
    val old = docs.filter(F.col("doc_id") =!= 1L)
      .withColumn("text", F.when(F.col("doc_id") === 2L,
        F.concat(F.lit("edited "), F.col("text"))).otherwise(F.col("text")))
      .select("doc_id", "text")
      .unionByName(Seq((99L, "phantom quick dog")).toDF("doc_id", "text"))
    Retrieval.buildTextIndex(old, "doc_id", "text", buckets = 8).save(path)
    val synced = Retrieval.syncTextIndex(spark, path, old,
      docs.select("doc_id", "text"), "doc_id", "text")
    val rebuilt = Retrieval.buildTextIndex(docs, "doc_id", "text", buckets = 8)
    assert(synced.nDocs == rebuilt.nDocs)
    assert(math.abs(synced.avgdl - rebuilt.avgdl) < 1e-9)
    val sp = synced.postings.select("term", "id", "tf", "dl")
      .collect().map(_.toSeq).toSet
    val rp = rebuilt.postings.select("term", "id", "tf", "dl")
      .collect().map(_.toSeq).toSet
    assert(sp === rp && sp.nonEmpty)
    assert(!sp.exists(_(1) == 99L)) // the phantom is gone
  }

  test("a micro-batch replayed AFTER a removal mutated it cannot resurrect docs") {
    val session = spark
    import session.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_tidx_res").toString
    Retrieval.buildTextIndex(docs.filter(F.col("doc_id") <= 3),
      "doc_id", "text", buckets = 8).save(path)
    // micro-batch 0 committed to disk (checkpoint pending) with doc 99
    val b0 = Seq((99L, "quick quick dog"), (98L, "lazy dog sleeps"))
      .toDF("doc_id", "text")
    Retrieval.appendBatchToTextIndex(spark, path, b0, "doc_id", "text", 0L)
    // nightly takedown removes doc 99 (stream writer stopped)
    val pruned = Retrieval.removeFromTextIndex(spark, path,
      Seq(99L).toDF("doc_id"), "doc_id")
    assert(!pruned.postings.select("id").as[Long].collect().contains(99L))
    val after = pruned.postings.select("term", "id", "tf")
      .collect().map(_.toSeq).toSet
    // the stream restarts and REPLAYS batch 0: the maintenance
    // watermark makes it a no-op — doc 99 stays gone, nothing doubles
    val replayed = Retrieval.appendBatchToTextIndex(
      spark, path, b0, "doc_id", "text", 0L)
    assert(!replayed.postings.select("id").as[Long].collect().contains(99L))
    assert(replayed.postings.select("term", "id", "tf")
      .collect().map(_.toSeq).toSet === after)
    assert(replayed.nDocs === pruned.nDocs && replayed.dlSum === pruned.dlSum)
    // a genuinely NEW batch id still lands
    val b1 = Seq((97L, "fresh arrival")).toDF("doc_id", "text")
    assert(Retrieval.appendBatchToTextIndex(spark, path, b1, "doc_id", "text", 1L)
      .postings.select("id").as[Long].collect().contains(97L))
  }

  test("compactTextIndex folds retired batches; probe, stats, and replays exact") {
    val session = spark
    import session.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_tidx_cp").toString
    val corpus = sf("sf0.001", "documents").select("doc_id", "text")
    Retrieval.buildTextIndex(corpus.filter(F.col("doc_id") % 4 === 0),
      "doc_id", "text").save(path)
    (1 to 3).foreach { m =>
      Retrieval.appendBatchToTextIndex(spark, path,
        corpus.filter(F.col("doc_id") % 4 === m), "doc_id", "text",
        batchId = m.toLong - 1L)
    }
    val before = Retrieval.loadTextIndex(spark, path)
    def probe(ix: Retrieval.TextIndex) = Retrieval
      .bm25TopKIndexed(ix, Seq("slow", "merge", "window"), 10)
      .select("rank", "id").as[(Int, Long)].collect().toSeq
    val beforeProbe = probe(before)
    val beforeStats = (before.nDocs, before.dlSum)

    val folded = Retrieval.compactTextIndex(spark, path)
    // newest streaming batch (2) stays; 0 and 1 folded into -1
    val batches = spark.read.parquet(s"$path/postings")
      .select(F.col("__batch").cast("long")).distinct().as[Long].collect().toSet
    assert(batches === Set(-1L, 2L))
    assert(probe(folded) === beforeProbe)
    assert((folded.nDocs, folded.dlSum) === beforeStats)
    // stats: one base row + the excluded batch's own delta row
    val statRows = spark.read.parquet(s"$path/stats")
      .select(F.col("__batch").cast("long")).as[Long].collect().sorted.toSeq
    assert(statRows === Seq(-1L, 2L))
    // replay of a FOLDED batch: watermark no-op (postings AND stats)
    val replayed = Retrieval.appendBatchToTextIndex(spark, path,
      corpus.filter(F.col("doc_id") % 4 === 1), "doc_id", "text", batchId = 0L)
    assert(probe(replayed) === beforeProbe)
    assert((replayed.nDocs, replayed.dlSum) === beforeStats)
    // replay of the EXCLUDED batch: dynamic overwrite of its own
    // postings and stats partitions — still exact, nothing doubles
    val replayed2 = Retrieval.appendBatchToTextIndex(spark, path,
      corpus.filter(F.col("doc_id") % 4 === 3), "doc_id", "text", batchId = 2L)
    assert(probe(replayed2) === beforeProbe)
    assert((replayed2.nDocs, replayed2.dlSum) === beforeStats)
    // one posting file per bucket in the folded base layer
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/postings"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__bucket="))
      .foreach { b =>
        val baseDir = new org.apache.hadoop.fs.Path(b.getPath, "__batch=-1")
        if (fs.exists(baseDir)) {
          val n = fs.listStatus(baseDir).count(st =>
            st.isFile && !st.getPath.getName.startsWith("_"))
          assert(n <= 1, s"bucket ${b.getPath.getName} has $n base files")
        }
      }
  }

  test("reconcileTextIndexStats repairs a lost removal delta exactly") {
    val session = spark
    import session.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_tidx_rec").toString
    Retrieval.buildTextIndex(docs, "doc_id", "text", buckets = 8).save(path)
    val before = Retrieval.loadTextIndex(spark, path)
    // simulate the crash window: postings mutated, stats delta LOST —
    // append a bogus positive delta to knock stats out of sync
    Seq((8, 5L, 100L, -1L)).toDF("buckets", "n_delta", "dl_delta", "__batch")
      .write.partitionBy("__batch").mode("append").parquet(s"$path/stats")
    val skewed = Retrieval.loadTextIndex(spark, path)
    assert(skewed.nDocs === before.nDocs + 5)
    val fixed = Retrieval.reconcileTextIndexStats(spark, path)
    assert(fixed.nDocs === before.nDocs && fixed.dlSum === before.dlSum)
    assert(fixed.avgdl === before.avgdl)
  }

  test("an all-empty batch append never breaks an emptied index") {
    val session = spark
    import session.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_tidx_emp").toString
    Retrieval.buildTextIndex(docs, "doc_id", "text", buckets = 8).save(path)
    Retrieval.removeFromTextIndex(spark, path, docs.select("doc_id"), "doc_id")
    // empty / all-NULL batches must not clear the schema sentinel
    val emptied = Retrieval.appendToTextIndex(spark, path,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    assert(emptied.nDocs === 0L)
    val nullish = Retrieval.appendToTextIndex(spark, path,
      Seq((1L, null.asInstanceOf[String]), (2L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(nullish.nDocs === 0L)
    // a real batch then lands and the index is whole again
    val back = Retrieval.appendToTextIndex(spark, path,
      Seq((5L, "quick dog")).toDF("doc_id", "text"), "doc_id", "text")
    assert(back.nDocs === 1L && back.dlSum === 2L)
    assert(Retrieval.bm25TopKIndexed(back, Seq("quick"), 5)
      .select("id").as[Long].collect().toSeq === Seq(5L))
  }

  test("localTermBucket agrees with the in-plan xxhash64 bucketing") {
    val terms = Seq("quick", "dog", "the", "ümlaut", "", "a b")
    val inPlan = terms.toDF("t")
      .select(F.col("t"), Retrieval.termBucket(F.col("t"), 64).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach { t =>
      assert(Retrieval.localTermBucket(t, 64) == inPlan(t), s"term '$t'")
    }
  }

  test("phraseCount: exact, positional, counts overlaps, repeated-term phrases") {
    val d = Seq(
      (1L, "a b c a b"),       // "a b" twice
      (2L, "a a a"),           // "a a" overlapping: starts 0 and 1
      (3L, "b a"),             // no "a b"
      (4L, "a b")              // once
    ).toDF("doc_id", "text")
    val idx = Retrieval.buildIndex(d, "doc_id", "text")
    val ab = Retrieval.phraseCount(idx, Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ab == Map(1L -> 2L, 4L -> 1L))
    val aa = Retrieval.phraseCount(idx, Seq("a", "a")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa == Map(2L -> 2L))
    val abc = Retrieval.phraseCount(idx, Seq("a", "b", "c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(abc == Map(1L -> 1L))
  }

  test("rrfFuse: scores sum reciprocal ranks; singletons fused correctly") {
    val r1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val r2 = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq(r1, r2), k = 10, kRrf = 60).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("rrf_score"), r.getAs[Long]("n_lists")))
    val byId = fused.map(f => f._1 -> f).toMap
    assert(math.abs(byId(10L)._2 - (1.0 / 61 + 1.0 / 62)) < 1e-15)
    assert(math.abs(byId(20L)._2 - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(byId(30L)._3 == 1L && byId(40L)._3 == 1L)
    // 10 and 20 tie exactly; tie-break by id puts 10 first
    val order = fused.sortBy(f => byId(f._1)._1).map(_._1)
    val ranked = Retrieval.rrfFuse(Seq(r1, r2), k = 10).collect()
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("id")).toSeq
    assert(ranked.take(2) == Seq(10L, 20L))
    assert(order.toSet == Set(10L, 20L, 30L, 40L))
  }

  test("bm25 on testdata sf0.001 is stable and well-separated at the top") {
    val d = sf("sf0.001", "documents")
    val top = Retrieval.bm25TopK(d, "doc_id", "text", Seq("slow", "merge", "window"), 15)
      .orderBy("rank").collect()
    assert(top.length == 15)
    val scores = top.map(_.getAs[Double]("score"))
    scores.sliding(2).foreach { case Array(a, b) =>
      assert(a - b > 1e-9, s"adjacent top-15 scores nearly tied: $a vs $b")
    }
  }

  test("bm25fTopK: cross-field tf sums before saturation; driver reference exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple pie", "apple apple banana"),
      (2L, "banana split", "cherry cherry cherry apple"),
      (3L, "cherry tart", "banana banana apple pie crust")
    ).toDF("id", "title", "body")
    val fields = Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75))
    val got = Retrieval.bm25fTopK(docs, "id", fields, Seq("apple"), 3, k1 = 1.2)
      .select("rank", "id", "score").as[(Int, Long, Double)].collect()
      .sortBy(_._1)

    // driver reference
    val title = Map(1L -> Seq("apple", "pie"), 2L -> Seq("banana", "split"),
      3L -> Seq("cherry", "tart"))
    val body = Map(1L -> Seq("apple", "apple", "banana"),
      2L -> Seq("cherry", "cherry", "cherry", "apple"),
      3L -> Seq("banana", "banana", "apple", "pie", "crust"))
    val tAvg = title.values.map(_.size).sum.toDouble / 3
    val bAvg = body.values.map(_.size).sum.toDouble / 3
    def tfn(toks: Map[Long, Seq[String]], avg: Double, w: Double, b: Double,
        id: Long, term: String): Double = {
      val tf = toks(id).count(_ == term)
      if (tf == 0) 0.0 else w * tf / ((1 - b) + b * toks(id).size / avg)
    }
    val n = 3.0
    val df = 3.0 // apple is in every doc (title or body)
    val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    val expect = Seq(1L, 2L, 3L).map { id =>
      val t = tfn(title, tAvg, 2.0, 0.5, id, "apple") +
        tfn(body, bAvg, 1.0, 0.75, id, "apple")
      id -> idf * t / (1.2 + t)
    }.toMap
    got.foreach { case (_, id, sc) =>
      assert(math.abs(sc - expect(id)) < 1e-12, s"doc $id")
    }
    // rank order by the reference
    val order = expect.toSeq.sortBy { case (id, sc) => (-sc, id) }.map(_._1)
    assert(got.map(_._2).toSeq == order)
    // saturation property: doc 1 (apple in BOTH fields) must score
    // LESS than the sum of its two single-field BM25F scores (tft
    // saturates once) — the defining BM25F inequality
    val tOnly = {
      val t = tfn(title, tAvg, 2.0, 0.5, 1L, "apple")
      idf * t / (1.2 + t)
    }
    val bOnly = {
      val t = tfn(body, bAvg, 1.0, 0.75, 1L, "apple")
      idf * t / (1.2 + t)
    }
    assert(expect(1L) < tOnly + bOnly)
  }

  test("filtered BM25: corpus-level stats; equals filter-then-rank of full scoring") {
    val d = sf("sf0.001", "documents")
    val q = Seq("slow", "merge", "window")
    val allowed = d.filter(F.col("doc_id") % 3 === 0).select("doc_id")
    // the contract: score the FULL corpus, drop rows outside the
    // filter, re-rank — row for row (df/N/avgdl untouched by the filter)
    val idx = Retrieval.buildIndex(d, "doc_id", "text")
    val full = Retrieval.bm25Scores(idx, Retrieval.corpusStats(idx), q)
    val wantScores = full.join(allowed.select(F.col("doc_id").as("id")), "id")
      .select("id", "score", "tf_total", "n_terms_hit").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2), r.getLong(3))))
      .toMap
    val wantOrder = wantScores.toSeq
      .sortBy { case (id, (s, _, _)) => (-s, id) }.take(10).map(_._1)
    val got = Retrieval.bm25TopKFiltered(d, "doc_id", "text", q, 10, allowed)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"),
        r.getAs[Long]("tf_total"), r.getAs[Long]("n_terms_hit")))
    assert(got.map(_._1).toSeq == wantOrder)
    got.foreach { case (id, s, tf, nh) =>
      val (ws, wtf, wnh) = wantScores(id)
      assert(math.abs(s - ws) < 1e-12 && tf == wtf && nh == wnh, s"doc $id")
    }
    // every returned doc satisfies the filter
    assert(got.forall(_._1 % 3 == 0))
  }

  test("filtered BM25 probe of a saved index: equal to one-shot, still partition-pruned") {
    val d = sf("sf0.001", "documents")
    val q = Seq("slow", "merge", "window")
    val allowed = d.filter(F.col("doc_id") % 3 === 0).select("doc_id")
    val path = java.nio.file.Files.createTempDirectory("graft_tidx_filt").toString
    Retrieval.buildTextIndex(d, "doc_id", "text", buckets = 32).save(path)
    val loaded = Retrieval.loadTextIndex(spark, path)
    val oneShot = Retrieval.bm25TopKFiltered(d, "doc_id", "text", q, 10, allowed)
      .select("rank", "id", "tf_total", "n_terms_hit").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val probed = Retrieval.bm25TopKFilteredIndexed(loaded, q, 10, allowed)
      .select("rank", "id", "tf_total", "n_terms_hit").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(probed == oneShot)
    // the filter must not widen the probe: the scan keeps the
    // __bucket partition filter of the unfiltered probe
    val plan = Retrieval.bm25TopKFilteredIndexed(loaded, q, 10, allowed)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bucket"),
      s"expected partition filter on __bucket in:\n$plan")
    // degenerate filters: empty allowed set -> empty result, no error
    assert(Retrieval.bm25TopKFilteredIndexed(loaded, q, 10,
      allowed.limit(0)).count() == 0L)
  }

  test("bm25TopKBatch equals per-query indexed probes row for row") {
    import spark.implicits._
    val d = sf("sf0.001", "documents")
    val path = java.nio.file.Files.createTempDirectory("graft_tidx_batch").toString
    Retrieval.buildTextIndex(d, "doc_id", "text", buckets = 32).save(path)
    val idx = Retrieval.loadTextIndex(spark, path)
    val qs: Seq[(Long, Seq[String])] = Seq(
      0L -> Seq("slow", "merge", "window"),
      1L -> Seq("hash", "batch"),
      2L -> Seq("QUICK", "zzz_nohit"),     // case-folding + partial miss
      3L -> Seq("zzz_nohit"))              // full miss: zero rows, no error
    val got = Retrieval.bm25TopKBatch(idx, qs.toDF("query_id", "terms"), 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("id"), r.getAs[Double]("score"),
        r.getAs[Long]("tf_total"), r.getAs[Long]("n_terms_hit")))
      .groupBy(_._1)
    qs.foreach { case (qid, ts) =>
      val single = Retrieval.bm25TopKIndexed(idx, ts, 10).collect()
        .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"),
          r.getAs[Double]("score"), r.getAs[Long]("tf_total"),
          r.getAs[Long]("n_terms_hit"))).toSeq.sortBy(_._1)
      val batch = got.getOrElse(qid, Array.empty)
        .map(t => (t._2, t._3, t._4, t._5, t._6)).toSeq.sortBy(_._1)
      assert(batch.map(x => (x._1, x._2, x._4, x._5)) ==
        single.map(x => (x._1, x._2, x._4, x._5)), s"query $qid rows differ")
      batch.zip(single).foreach { case (bRow, sRow) =>
        assert(math.abs(bRow._3 - sRow._3) < 1e-12, s"query $qid score") }
    }
    assert(!got.contains(3L)) // no-hit query contributes nothing
    // the union-of-terms probe still partition-prunes the saved scan
    val plan = Retrieval.bm25TopKBatch(idx, qs.toDF("query_id", "terms"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bucket"))
    // filtered batch == per-query filtered probes
    val allowed = d.filter(F.col("doc_id") % 3 === 0).select("doc_id")
    val fGot = Retrieval.bm25TopKBatchFiltered(
        idx, qs.take(2).toDF("query_id", "terms"), 10, allowed)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("id"), r.getAs[Long]("tf_total"),
        r.getAs[Long]("n_terms_hit")))
      .groupBy(_._1)
    qs.take(2).foreach { case (qid, ts) =>
      val single = Retrieval.bm25TopKFilteredIndexed(idx, ts, 10, allowed)
        .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"),
          r.getAs[Long]("tf_total"), r.getAs[Long]("n_terms_hit")))
        .toSeq.sortBy(_._1)
      assert(fGot.getOrElse(qid, Array.empty)
        .map(t => (t._2, t._3, t._4, t._5)).toSeq.sortBy(_._1) == single,
        s"filtered batch differs for query $qid")
    }
    fGot.values.flatten.foreach(t => assert(t._3 % 3 == 0))
  }

  test("snippetSpans: exact best window, leftmost ties, brute-force reference") {
    import spark.implicits._
    val fix = Seq(
      // terms at 0(a), 5(b), 6(a), 20(c): width 4 -> [5,9) covers {b,a}
      (1L, "a x x x x b a x x x x x x x x x x x x x c"),
      // all three inside one window anchored at 2
      (2L, "x x a b c x x x x x"),
      // tie on distinct count: leftmost anchor wins
      (3L, "a x x x x x x x x x a x x"),
      (4L, "x x x x"), // no hits: absent from output
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val idx = Retrieval.buildIndex(fix, "doc_id", "text")
    val got = Retrieval.snippetSpans(idx, Seq("a", "b", "c"), 4)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("start"), r.getAs[Int]("end"),
          r.getAs[Int]("n_terms"), r.getAs[Int]("n_hits")))).toMap
    assert(got(1L) == ((5, 9, 2, 2)))
    assert(got(2L) == ((2, 6, 3, 3)))
    assert(got(3L) == ((0, 4, 1, 1))) // leftmost of the two singleton hits
    assert(!got.contains(4L) && !got.contains(5L))

    // brute-force cross-check on real data: every emitted window is
    // OPTIMAL (no start has more distinct terms; no earlier start ties)
    val d = sf("sf0.001", "documents").limit(80)
    val q = Seq("slow", "merge", "window")
    val w = 12
    val spans = Retrieval.snippets(d, "doc_id", "text", q, w).collect()
    val toksOf = d.select(F.col("doc_id"),
        Retrieval.terms(F.col("text")).as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[String]]("t"))
      .toMap
    spans.foreach { r =>
      val id = r.getAs[Long]("id")
      val ts = toksOf(id)
      val hitPos = ts.zipWithIndex.filter(p => q.contains(p._1)).map(_._2)
      def distinctIn(s: Int) =
        ts.slice(s, s + w).filter(q.contains).distinct.size
      val bestBrute = hitPos.map(distinctIn).max
      val start = r.getAs[Int]("start")
      assert(distinctIn(start) == bestBrute, s"doc $id suboptimal window")
      assert(!hitPos.exists(p => p < start && distinctIn(p) == bestBrute),
        s"doc $id not leftmost")
      // the rendered snippet is exactly the token slice
      assert(r.getAs[String]("snippet") ==
        ts.slice(start, r.getAs[Int]("end")).mkString(" "))
    }
  }

  test("fielded index: bm25fTopKIndexed ranks exactly like one-shot bm25f") {
    val d = sf("sf0.001", "documents")
    val toks = F.filter(F.split(F.col("text"), "\\s+"),
      (t: org.apache.spark.sql.Column) => F.length(t) > 0)
    val two = d.filter(F.col("text").isNotNull)
      .select(F.col("doc_id"),
        F.array_join(F.slice(toks, 1, 3), " ").as("title"),
        F.col("text").as("body"))
    val fields = Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75))
    val q = Seq("slow", "merge", "window")
    val path = java.nio.file.Files.createTempDirectory("graft_ftidx").toString
    val idx = Retrieval.saveFieldedTextIndex(
      two, "doc_id", Seq("title", "body"), path, buckets = 16)
    assert(idx.fields == Seq("title", "body") && idx.nDocs == two.count())
    // reload round-trips the manifest
    val re = Retrieval.loadFieldedTextIndex(spark, path)
    assert(re.fields == idx.fields && re.nDocs == idx.nDocs)
    val oneShot = Retrieval.bm25fTopK(two, "doc_id", fields, q, 10)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"),
        r.getAs[Double]("score"))).sortBy(_._1)
    val probed = Retrieval.bm25fTopKIndexed(re, fields, q, 10)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"),
        r.getAs[Double]("score"))).sortBy(_._1)
    assert(probed.map(t => (t._1, t._2)).toSeq ==
      oneShot.map(t => (t._1, t._2)).toSeq)
    probed.zip(oneShot).foreach { case (p, o) =>
      assert(math.abs(p._3 - o._3) < 1e-9, s"rank ${p._1} score") }
    // append + takedown per field keep the probe equal to a rebuild
    val firstHalf = two.filter(F.col("doc_id") % 2 === 0)
    val secondHalf = two.filter(F.col("doc_id") % 2 =!= 0)
    val path2 = java.nio.file.Files.createTempDirectory("graft_ftidx2").toString
    Retrieval.saveFieldedTextIndex(firstHalf, "doc_id",
      Seq("title", "body"), path2, buckets = 16)
    val grown = Retrieval.appendToFieldedTextIndex(spark, path2,
      secondHalf, "doc_id")
    assert(grown.nDocs == two.count())
    val grownRanks = Retrieval.bm25fTopKIndexed(grown, fields, q, 10)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"))).toSeq
    assert(grownRanks == probed.map(t => (t._1, t._2)).toSeq)
    val doomed = two.filter(F.col("doc_id") % 37 === 0).select("doc_id")
    val pruned = Retrieval.removeFromFieldedTextIndex(
      spark, path2, doomed, "doc_id")
    assert(pruned.nDocs == two.count() - doomed.count())
    val rebuilt = Retrieval.saveFieldedTextIndex(
      two.filter(F.col("doc_id") % 37 =!= 0), "doc_id",
      Seq("title", "body"),
      java.nio.file.Files.createTempDirectory("graft_ftidx3").toString,
      buckets = 16)
    assert(
      Retrieval.bm25fTopKIndexed(pruned, fields, q, 10)
        .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"))).toSeq ==
      Retrieval.bm25fTopKIndexed(rebuilt, fields, q, 10)
        .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"))).toSeq)
    // unknown field: loud error, not silent garbage
    intercept[IllegalArgumentException] {
      Retrieval.bm25fTopKIndexed(re, Seq(("nope", 1.0, 0.5)), q, 5)
    }
  }

  test("assembleContext: greedy rank-prefix under budget, stops at first overflow") {
    import spark.implicits._
    val fix = Seq(
      (1L, "a b c d e f g h i j"),          // hit; window 4 -> 4 tokens
      (2L, "a x"),                          // hit; 2 tokens
      (3L, "a b c x y z q r s t u v w"),    // hit; 4 tokens
      (4L, "x y z")                         // no hit
    ).toDF("doc_id", "text")
    val ranked = Seq((1, 1L), (2, 2L), (3, 3L)).toDF("rank", "id")
    def ctx(budget: Int) = Retrieval.assembleContext(
        fix, "doc_id", "text", ranked, Seq("a", "b"), window = 4, budget)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"),
        r.getAs[Long]("cum_tokens"), r.getAs[String]("snippet")))
    // budget fits all three (4 + 2 + 4 = 10)
    assert(ctx(10).map(_._2).toSeq == Seq(1L, 2L, 3L))
    // budget 7: ranks 1-2 fit (6); rank 3 overflows and STOPS the fill
    assert(ctx(7).map(_._2).toSeq == Seq(1L, 2L))
    // budget 5: rank 1 fits (4); rank 2 would reach 6 > 5 -> stop; the
    // smaller rank-3 snippet must NOT leapfrog
    assert(ctx(5).map(_._2).toSeq == Seq(1L))
    // budget below the first snippet: empty context, no error
    assert(ctx(3).isEmpty)
    // snippets are the best windows ("a b c d" for doc 1)
    assert(ctx(10).head._4 == "a b c d")
  }

  test("filtered BM25F equals filter-then-rank of full BM25F scoring") {
    val d = sf("sf0.001", "documents")
    // synthesize a title field deterministically from the text (first
    // 3 tokens) — same shape as the q_bm25f gate
    val toks = F.filter(F.split(F.col("text"), "\\s+"),
      (t: org.apache.spark.sql.Column) => F.length(t) > 0)
    val two = d.filter(F.col("text").isNotNull)
      .select(F.col("doc_id"),
        F.array_join(F.slice(toks, 1, 3), " ").as("title"),
        F.col("text").as("body"))
    val fields = Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75))
    val q = Seq("slow", "merge", "window")
    val allowed = two.filter(F.col("doc_id") % 3 === 0).select("doc_id")
    val okIds = allowed.as[Long].collect().toSet
    val full = Retrieval.bm25fTopK(two, "doc_id", fields, q,
        k = two.count().toInt)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score")))
    val wantOrder = full.filter(p => okIds.contains(p._1))
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSeq
    val got = Retrieval.bm25fTopKFiltered(two, "doc_id", fields, q, 10, allowed)
      .orderBy("rank").collect().map(_.getAs[Long]("id")).toSeq
    assert(got == wantOrder)
  }

  test("bm25TopKPrf: expansion excludes originals; indexed ≡ one-shot") {
    val d = sf("sf0.001", "documents").select($"doc_id", $"text")
    val q = Seq("slow", "merge", "window") // measured-gap query set
    val one = Retrieval.bm25TopKPrf(d, "doc_id", "text", q, 10)
      .orderBy("rank").collect()
    val exp = one.head.getSeq[String](5).toSeq
    assert(exp.size == 5, "fbTerms bound")
    assert(exp.forall(t => !q.contains(t)), "originals excluded")
    assert(one.forall(_.getSeq[String](5).toSeq == exp),
      "one expansion list per query, constant across rows")
    val path = java.nio.file.Files
      .createTempDirectory("graft_prf_idx").toString
    Retrieval.buildTextIndex(d, "doc_id", "text", buckets = 16).save(path)
    val idx = Retrieval.loadTextIndex(spark, path)
    val two = Retrieval.bm25TopKPrfIndexed(idx, q, 10)
      .orderBy("rank").collect()
    assert(one.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      two.map(r => (r.getInt(0), r.getLong(1))).toSeq,
      "indexed ranks equal the one-shot (measured-gap argument)")
    assert(two.head.getSeq[String](5).toSeq == exp)
  }

  test("assembleContextBatch: learned-BPE token budget prices the prefix") {
    val corpus = Seq(
      (1L, "the dog barks at the dog door"),
      (2L, "quick brown cat naps in the sun"),
      (3L, "dog dog dog dog"),
      (4L, "the the the the the the")
    ).toDF("doc_id", "text")
    // ranked by hand so a NO-HIT doc (2: no 'dog') sits mid-prefix
    val ranked = Seq((0L, 1, 1L), (0L, 2, 2L), (0L, 3, 3L), (0L, 4, 4L))
      .toDF("query_id", "rank", "id")
    val queries = Seq((0L, Seq("dog"))).toDF("query_id", "terms")
    val merges = Seq(("t", "h"), ("th", "e"), ("d", "o"), ("do", "g"))
    val ranks = merges.zipWithIndex.map { case (m, i) => m -> i }.toMap
    def bpeLen(s: String): Long =
      if (s.isEmpty) 0L
      else s.split("\\s+").filter(_.nonEmpty)
        .map(w => Vocab.applyBpeRanked(ranks, w).length.toLong).sum
    val cost = Vocab.bpeTokenCount(merges)
    def run(budget: Int) = Retrieval.assembleContextBatch(
        corpus, "doc_id", "text", ranked, queries,
        window = 4, budgetTokens = budget, tokenCost = Some(cost))
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"),
        r.getAs[String]("snippet")))
    val all = run(1000)
    // every row's charge is the snippet's BPE token count, replayed
    assert(all.forall { case (_, _, n, _, sn) => n == bpeLen(sn) })
    // the no-hit doc stays in the prefix at zero charge
    val noHit = all.find(_._2 == 2L).get
    assert(noHit._3 == 0L && noHit._5 == "")
    // cum is the rank-ordered prefix sum
    assert(all.map(_._3).scanLeft(0L)(_ + _).tail.toSeq ==
      all.map(_._4).toSeq)
    // the fill stops at the FIRST overflow, later cheaper rows do not
    // leapfrog: budget = doc1's charge alone cuts everything after the
    // first row whose cum exceeds it
    val b1 = all.head._3.toInt
    val cut = run(b1)
    assert(cut.map(_._2).toSeq == all.takeWhile(_._4 <= b1).map(_._2).toSeq)
    // window-token pricing differs from BPE pricing on this corpus
    // (doc 4's window is 4 'the' tokens = 4 words but 4 BPE tokens of
    // 1 symbol each — craft a case where they diverge: doc 2 no-hit is
    // enough to show the option switches the charge column)
    val win = Retrieval.assembleContextBatch(
        corpus, "doc_id", "text", ranked, queries,
        window = 4, budgetTokens = 1000)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_tokens")))
    assert(win.find(_._1 == 1L).get._2 == 4L) // window tokens
    assert(all.find(_._2 == 1L).get._3 == bpeLen(all.head._5))
  }
}
