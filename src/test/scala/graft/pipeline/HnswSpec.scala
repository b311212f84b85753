package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/**
 * Graph ANN (HNSW-class): driver-built navigation graph + distributed
 * cell probe. Pins: deterministic builds, graph-search quality on the
 * nav layer, planted-copy rank-1 through save/load, recall floor vs
 * brute force, frozen-graph append ≡ rebuild-free growth, takedown via
 * the shared cell-table pass.
 */
class HnswSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = sf("sf0.001", "embeddings")
    .filter(F.col("embedding").isNotNull)
    .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))

  test("build is deterministic; graph search finds the true nearest nav node") {
    val vecs = emb.limit(200).select("embedding")
      .as[Array[Float]].collect()
    val g1 = Hnsw.build(vecs, m = 8, efConstruction = 48)
    val g2 = Hnsw.build(vecs, m = 8, efConstruction = 48)
    assert(g1.levels.toSeq === g2.levels.toSeq)
    assert(g1.neighbors.map(_.map(_.toSeq).toSeq).toSeq ===
      g2.neighbors.map(_.map(_.toSeq).toSeq).toSeq)
    assert(g1.entry === g2.entry)
    // layer-0 beam at full width recovers the exact nearest for every
    // node's own vector (distance 0 to itself)
    vecs.indices.take(50).foreach { i =>
      val hit = Hnsw.search(g1, vecs(i), ef = 16).head
      assert(hit._2 <= 1e-9, s"node $i not its own nearest (d=${hit._2})")
    }
    // high-ef search ≈ exhaustive: top-1 matches brute force on navs
    val norm = vecs.map { v =>
      val s = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (s == 0) v else v.map(x => (x / s).toFloat)
    }
    def bruteNearest(qi: Int): Int = {
      val q = norm(qi)
      vecs.indices.filter(_ != qi).minBy { j =>
        val c = norm(j)
        c.zip(q).map { case (a, b) => (a.toDouble - b) * (a - b) }.sum
      }
    }
    var agree = 0
    val probeIdx = vecs.indices.take(40)
    probeIdx.foreach { i =>
      val top = Hnsw.search(g1, vecs(i), ef = 64)
        .filter(_._1 != i).head._1
      if (top == bruteNearest(i)) agree += 1
    }
    assert(agree >= (probeIdx.size * 9) / 10,
      s"graph search agreed with brute force on only $agree/${probeIdx.size}")
  }

  test("planted copies probe rank-1 through save/load; recall floor vs brute force") {
    val idx = Hnsw.buildHnswIndex(emb, "vec_id", "embedding",
      maxNav = 32, m = 8, efConstruction = 48, efAssign = 16)
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw").toString
    idx.save(path)
    val loaded = Hnsw.loadHnswIndex(spark, path)
    assert(loaded.graph.levels.toSeq === idx.graph.levels.toSeq)
    assert(loaded.graph.m === idx.graph.m &&
      loaded.graph.efAssign === idx.graph.efAssign &&
      loaded.graph.entry === idx.graph.entry)
    assert(loaded.cellSizes.sum === emb.count())

    // exact copies: identical vector → identical assign walk → the
    // copy's cell is the FIRST probed cell → rank 1 at cos ~ 1
    val probes = emb.filter(F.col("vec_id") % 37 === 0)
      .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
    val hits = Hnsw.hnswTopK(loaded, probes, "vec_id", "embedding", 1,
        efSearch = 16, minProbe = 1, probeMass = 0.0)
      .select("query_id", "neighbor_id", "cos").collect()
    assert(hits.length === probes.count())
    hits.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) - 100000L, s"copy missed: $r")
      assert(r.getDouble(2) >= 0.999999)
    }

    // recall@10 vs brute force at the default mass dial
    val queries = emb.filter(F.col("vec_id") % 13 === 0)
    val approx = Hnsw.hnswTopK(loaded, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(approx.contains).toDouble / brute.size
    // measured 0.795 at sf0.001 vs ivfTopKAuto's 0.767 on the same
    // workload — recall tracks probed mass; the floor leaves margin
    // for testdata regeneration (bench pins the sf0.1 floor)
    assert(recall >= 0.7, s"hnsw recall@10 = $recall")
  }

  test("frozen-graph append grows the index; takedown removes through the shared pass") {
    val even = emb.filter(F.col("vec_id") % 2 === 0)
    val odd = emb.filter(F.col("vec_id") % 2 =!= 0)
    val path = java.nio.file.Files.createTempDirectory("graft_hnsw_ap").toString
    Hnsw.buildHnswIndex(even, "vec_id", "embedding",
      maxNav = 32, m = 8, efConstruction = 48).save(path)
    val grown = Hnsw.appendToHnswIndex(spark, path, odd, "vec_id", "embedding")
    assert(grown.assigned.count() === emb.count())
    // appended rows assign with the FROZEN graph — identical to what a
    // fresh assignment of the same rows against the loaded graph gives
    val g = grown.graph
    val expect = odd.as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, Hnsw.assignCell(g, v)) }.toMap
    val got = grown.assigned
      .join(odd.select(F.col("vec_id").as("neighbor_id")), "neighbor_id")
      .select(F.col("neighbor_id").cast("long"), F.col("__cell"))
      .as[(Long, Int)].collect().toMap
    assert(got === expect)
    // probe finds an appended exact copy at rank 1
    val probe = odd.limit(3)
      .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
    val hit = Hnsw.hnswTopK(grown, probe, "vec_id", "embedding", 1,
        efSearch = 16, minProbe = 1, probeMass = 0.0)
      .select("query_id", "neighbor_id", "cos").collect()
    hit.foreach(r => assert(r.getLong(1) === r.getLong(0) - 100000L))

    // takedown: the shared touched-cell removal pass
    val doomed = odd.limit(3).select("vec_id")
    val pruned = Hnsw.removeFromHnswIndex(spark, path, doomed, "vec_id")
    val doomedIds = doomed.as[Long].collect().toSet
    assert(pruned.assigned
      .filter(F.col("neighbor_id").isin(doomedIds.toSeq: _*)).isEmpty)
    assert(pruned.assigned.count() === emb.count() - 3)
  }

  test("streamToHnswIndex equals the batch append; replays are idempotent") {
    val even = emb.filter(F.col("vec_id") % 2 === 0)
    val odd = emb.filter(F.col("vec_id") % 2 =!= 0)
      .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
    val dirA = java.nio.file.Files.createTempDirectory("graft_hnsw_ba").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_hnsw_st").toString
    val built = Hnsw.buildHnswIndex(even, "vec_id", "embedding",
      maxNav = 16, m = 8, efConstruction = 48)
    built.save(dirA); built.save(dirB)
    Hnsw.appendToHnswIndex(spark, dirA, odd, "vec_id", "embedding")
    val src = java.nio.file.Files.createTempDirectory("graft_hnsw_src").toString
    odd.repartition(3).write.mode("overwrite").parquet(src)
    val q = Hnsw.streamToHnswIndex(
        spark.readStream.schema(odd.schema)
          .option("maxFilesPerTrigger", 1).parquet(src),
        dirB, "vec_id", "embedding")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_hnsw_ck").toString)
      .start()
    q.awaitTermination()
    def content(dir: String) = Hnsw.loadHnswIndex(spark, dir).assigned
      .select(F.col("neighbor_id").cast("long"), F.col("__cell"))
      .as[(Long, Int)].collect().toSet
    val batchSet = content(dirA)
    assert(content(dirB) === batchSet && batchSet.nonEmpty)
    // at-least-once redelivery replaces exactly its own partitions
    val extra = odd.limit(4)
    Hnsw.appendBatchToHnswIndex(spark, dirB, extra, "vec_id", "embedding",
      batchId = 99L)
    val once = content(dirB)
    Hnsw.appendBatchToHnswIndex(spark, dirB, extra, "vec_id", "embedding",
      batchId = 99L)
    assert(content(dirB) === once)
    // removal advances the watermark; a replay of the mutated batch
    // writes nothing (writer stopped -> release the lease first)
    Maintenance.releaseWriterLease(spark, dirB)
    Hnsw.removeFromHnswIndex(spark, dirB, extra.select("vec_id"), "vec_id")
    val afterRm = content(dirB)
    Hnsw.appendBatchToHnswIndex(spark, dirB, extra, "vec_id", "embedding",
      batchId = 99L)
    assert(content(dirB) === afterRm, "replay resurrected removed vectors")
  }

  test("insertNav continues the build loop: grown graph deterministic, searchable") {
    val pts = Array.tabulate(24)(i =>
      Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))
    val extra = Array.tabulate(8)(i =>
      Array.tabulate(8)(d => math.cos(i * 8 + d + 100).toFloat))
    val g0 = Hnsw.build(pts, m = 4, efConstruction = 24, efAssign = 8)
    val g2 = Hnsw.insertNav(g0, extra)
    assert(g2.vecs.length == 32 && g2.m == g0.m &&
      g2.efAssign == g0.efAssign && g2.efConstruction == g0.efConstruction)
    // existing nodes keep their indices and vectors
    (0 until 24).foreach(i => assert(g2.vecs(i).toSeq == g0.vecs(i).toSeq))
    // deterministic: inserting twice gives the identical graph
    val g2b = Hnsw.insertNav(g0, extra)
    assert(g2.levels.toSeq == g2b.levels.toSeq && g2.entry == g2b.entry)
    (0 until 32).foreach(i =>
      assert(g2.neighbors(i).map(_.toSeq).toSeq ==
        g2b.neighbors(i).map(_.toSeq).toSeq))
    // a query identical to a NEW nav node walks to it (rank-1 exact)
    extra.indices.foreach { i =>
      assert(Hnsw.search(g2, extra(i), 16).head._1 == 24 + i,
        s"new nav $i not found by its own vector")
    }
    // the original graph is untouched (deep-copied adjacency)
    val g0again = Hnsw.build(pts, m = 4, efConstruction = 24, efAssign = 8)
    (0 until 24).foreach(i =>
      assert(g0.neighbors(i).map(_.toSeq).toSeq ==
        g0again.neighbors(i).map(_.toSeq).toSeq,
        s"insertNav mutated the source graph at node $i"))
  }

  test("addNavNodes: batch-trained cells inserted, corpus re-walked, staged crash-safe") {
    val e = emb
    val dir = java.nio.file.Files.createTempDirectory("graft_hnsw_nav").toString
    Hnsw.buildHnswIndex(e, "vec_id", "embedding",
      maxNav = 16, m = 8, efConstruction = 48, efAssign = 16).save(dir)
    // a drifted batch: shifted copies of a slice, appended first (the
    // documented order: absorb rows, then adapt the geometry)
    val shiftU = F.udf((v: Seq[Float]) => v.map(x => x + 25.0f).toArray)
    val drifted = e.filter(F.col("vec_id") < 60)
      .select((F.col("vec_id") + 500000L).as("vec_id"),
        shiftU(F.col("embedding")).as("embedding"))
      .localCheckpoint(false)
    Hnsw.appendToHnswIndex(spark, dir, drifted, "vec_id", "embedding")
    val nAll = e.count() + drifted.count()

    // crash BEFORE the journal: the old index stays live
    intercept[RuntimeException] {
      Hnsw.addNavNodesImpl(spark, dir, drifted, "vec_id", "embedding",
        maxNewNav = 8, iterations = 2, seed = 42L,
        afterStage = () => throw new RuntimeException("boom"), () => ())
    }
    assert(Hnsw.loadHnswIndex(spark, dir).graph.vecs.length == 16)

    // crash AFTER the journal: recovery finishes idempotently
    intercept[RuntimeException] {
      Hnsw.addNavNodesImpl(spark, dir, drifted, "vec_id", "embedding",
        maxNewNav = 8, iterations = 2, seed = 42L,
        () => (), afterJournal = () => throw new RuntimeException("boom"))
    }
    Hnsw.recoverRetrain(spark, dir)
    val grown = Hnsw.loadHnswIndex(spark, dir)
    assert(grown.graph.vecs.length == 24, "nav nodes not inserted")
    assert(grown.assigned.count() == nAll, "rows lost by the swap")
    // every row sits at its NEW-graph walk assignment (the exact-copy
    // guarantee survives the mutation) — the retrain self-consistency
    // pin on the grown graph
    val gB = spark.sparkContext.broadcast(grown.graph)
    val mis = grown.assigned.collect().count { r =>
      Hnsw.assignCell(gB.value,
        r.getAs[scala.collection.Seq[Float]]("__cv").toArray) != r.getInt(2)
    }
    assert(mis == 0, s"$mis rows off their new-graph assignment")
    // planted copies of the DRIFTED rows probe rank-1 (their region
    // now has its own navigation cells)
    val probes = drifted.limit(10)
      .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
    Hnsw.hnswTopK(grown, probes, "vec_id", "embedding", 1,
        efSearch = 24, minProbe = 1, probeMass = 0.0)
      .select("query_id", "neighbor_id").collect()
      .foreach(r => assert(r.getLong(1) === r.getLong(0) - 100000L))
    // the drifted region owns NEW navigation cells now: its rows land
    // in cells >= the old nav count, spread over several of them
    // (before the expansion they crammed into whatever old cell was
    // least far). PSI-vs-index stays high by construction — the batch
    // is a minority of the blended index — so cell ownership, not
    // occupancy similarity, is the post-expansion fact to pin.
    val driftedCells = grown.assigned
      .filter(F.col("neighbor_id").cast("long") >= 500000L)
      .select(F.col("__cell")).distinct()
      .collect().map(_.getInt(0))
    assert(driftedCells.forall(_ >= 16),
      s"drifted rows still in old cells: ${driftedCells.toSeq.sorted}")
    assert(driftedCells.length >= 4,
      s"drifted region not spread over its new cells: ${driftedCells.length}")
  }

  test("maybeExpandHnswIndex: quiet in-distribution, expands on drift") {
    val e = emb
    val dir = java.nio.file.Files.createTempDirectory("graft_hnsw_mx").toString
    Hnsw.buildHnswIndex(e, "vec_id", "embedding",
      maxNav = 16, m = 8, efConstruction = 48, efAssign = 16).save(dir)
    val (x1, psi1) = Hnsw.maybeExpandHnswIndex(spark, dir, e.limit(200),
      "vec_id", "embedding", psiThreshold = 0.2)
    assert(!x1 && psi1 < 0.05, s"psi=$psi1")
    assert(Hnsw.loadHnswIndex(spark, dir).graph.vecs.length == 16)
    val shiftU = F.udf((v: Seq[Float]) => v.map(x => x + 25.0f).toArray)
    val shifted = e.limit(300)
      .select(F.col("vec_id"), shiftU(F.col("embedding")).as("embedding"))
    val (x2, psi2) = Hnsw.maybeExpandHnswIndex(spark, dir, shifted,
      "vec_id", "embedding", psiThreshold = 0.2, maxNewNav = 8)
    assert(x2 && psi2 >= 0.2, s"psi=$psi2")
    assert(Hnsw.loadHnswIndex(spark, dir).graph.vecs.length == 24)
  }
}
