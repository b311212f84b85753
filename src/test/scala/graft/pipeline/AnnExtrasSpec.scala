package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Binary quantization, filtered ANN, kNN label propagation. */
class AnnExtrasSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = sf("sf0.001", "embeddings")

  test("signBits: deterministic, one word for dim<=64, bit = sign") {
    val rows = Seq(
      (1L, Array(1.0f, -1.0f, 0.0f, 2.0f)),
      (2L, Array(-1.0f, -1.0f, -1.0f, -1.0f))
    ).toDF("id", "v")
    val got = rows.select($"id", BinaryQuant.signBits($"v").as("sig"))
      .as[(Long, Array[Long])].collect().toMap
    // bits 0 and 3 set for row 1 (strictly positive only), none for row 2
    assert(got(1L).toSeq == Seq(1L | (1L << 3)))
    assert(got(2L).toSeq == Seq(0L))
    assert(BinaryQuant.wordsFor(64) == 1 && BinaryQuant.wordsFor(65) == 2)
  }

  test("hammingCol: single-word native path equals multi-word path") {
    val rows = Seq((Array(0xF0L), Array(0x0FL))).toDF("a", "b")
    val one = rows.select(BinaryQuant.hammingCol($"a", $"b", 1)).as[Int].head()
    val multi = rows.select(BinaryQuant.hammingCol($"a", $"b", 2)).as[Int].head()
    assert(one == 8 && multi == 8)
  }

  test("binaryTopK: planted exact copies are rank-1 with cos ~ 1") {
    val copies = emb.filter($"vec_id" < 5)
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding", $"label")
    val out = BinaryQuant.binaryTopK(emb.unionByName(copies), copies,
        "vec_id", "embedding", k = 3, poolSize = 50)
      .collect()
    assert(out.count(_.getAs[Int]("rank") == 1) == 5)
    out.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 10000L)
      assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-6)
    }
  }

  test("binaryTopK recall vs brute force at a generous pool") {
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = BinaryQuant.binaryTopK(emb, queries, "vec_id", "embedding", 5,
        poolSize = 100)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
    // pool = corpus makes the rerank exhaustive: must equal brute force
    val full = BinaryQuant.binaryTopK(emb, queries, "vec_id", "embedding", 5,
        poolSize = 1000)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
  }

  test("binaryTopKIndexed over a persisted signature table equals the one-shot form") {
    val base = emb.select($"vec_id".cast("long").as("vec_id"), $"embedding")
    val queries = base.filter($"vec_id" < 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_bq_sig").toString
    Dedup.saveSignatureIndex(
      BinaryQuant.buildBinarySignatures(base, "vec_id", "embedding"), dir)
    val sigs = Dedup.loadSignatureIndex(spark, dir)
    val a = BinaryQuant.binaryTopKIndexed(sigs, base, queries,
        "vec_id", "embedding", 5, poolSize = 100)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val b = BinaryQuant.binaryTopK(base, queries, "vec_id", "embedding", 5,
        poolSize = 100)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("binaryTopK centered thresholds keep exact copies rank-1") {
    val copies = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding", $"label")
    val out = BinaryQuant.binaryTopK(emb.unionByName(copies), copies,
        "vec_id", "embedding", k = 1, poolSize = 50, center = true)
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 10000L)
    }
  }

  test("ivfTopKFilteredIndexed: every neighbor satisfies the filter; pre-filter fills k") {
    val allowed = emb.filter($"vec_id" % 2 === 0).select($"vec_id")
    val queries = emb.filter($"vec_id" < 5)
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 16)
    val out = Similarity.ivfTopKFilteredIndexed(idx, queries, "vec_id", "embedding",
        allowed, k = 5, probeMass = 1.0)
      .collect()
    assert(out.length == 25) // full probe mass -> exact over the filtered half
    out.foreach(r => assert(r.getAs[Long]("neighbor_id") % 2 == 0))
    // exact within full probe mass: equals brute force over the filtered subset
    val exact = Similarity.bruteForceTopK(
        emb.filter($"vec_id" % 2 === 0 || $"vec_id" < 5), queries,
        "vec_id", "embedding", 5)
      .filter($"neighbor_id" % 2 === 0)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // brute force above ranks unfiltered then drops odd rows, so compare
    // only set containment of the filtered exact top-5 computed directly
    val trueExact = Similarity.bruteForceTopK(
        emb.filter($"vec_id" % 2 === 0).unionByName(queries).dropDuplicates("vec_id"),
        queries, "vec_id", "embedding", 5)
      .filter($"neighbor_id" % 2 === 0)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(trueExact ++ exact) || got == trueExact)
  }

  test("ivfTopKFilteredAuto: brute branch below threshold, probe branch above; both find planted copies") {
    val copies = emb.filter($"vec_id" < 4 && $"vec_id" % 2 === 0)
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding", $"label")
    val corpus = emb.unionByName(copies)
    val allowed = corpus.filter($"vec_id" % 2 === 0 && $"vec_id" < 10000L).select($"vec_id")
    val queries = copies
    val idx = Similarity.buildIvfIndex(corpus, "vec_id", "embedding", nlist = 16)
    for (thr <- Seq(100000L, 1L)) {
      val out = Similarity.ivfTopKFilteredAuto(idx, queries, "vec_id", "embedding",
          allowed, k = 3, baseMass = 0.45, bruteThreshold = thr)
        .collect()
      val top1 = out.filter(_.getAs[Int]("rank") == 1)
      assert(top1.length == 2, s"thr=$thr")
      top1.foreach { r =>
        assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 10000L)
        assert(r.getAs[Long]("neighbor_id") % 2 == 0)
      }
      out.foreach(r => assert(r.getAs[Long]("neighbor_id") % 2 == 0))
    }
  }

  test("pqTopKRerankedFiltered: planted copies rank-1, no disallowed neighbor") {
    val base = emb.select($"vec_id".cast("long").as("vec_id"), $"embedding")
    val copies = base.filter($"vec_id" < 10 && $"vec_id" % 2 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val corpus = base.unionByName(copies)
    val allowed = base.filter($"vec_id" % 2 === 0).select($"vec_id")
    val pq = ProductQuantization
    val cb = pq.trainPq(corpus, "vec_id", "embedding", m = 16, ksub = 16,
      iterations = 2)
    val enc = pq.pqEncode(corpus, "vec_id", "embedding", cb)
    val out = pq.pqTopKRerankedFiltered(cb, enc, corpus, copies,
        "vec_id", "embedding", allowed, k = 3, poolSize = 100)
      .collect()
    assert(out.length == 15)
    out.foreach { r =>
      val n = r.getAs[Long]("neighbor_id")
      assert(n % 2 == 0 && n < 100000L)
    }
    val top1 = out.filter(_.getAs[Int]("rank") == 1)
    assert(top1.length == 5)
    top1.foreach(r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 100000L))
  }

  test("ivfTopKFilteredAuto: a very selective filter forces the exact brute branch (mass >= 1)") {
    val base = emb.select($"vec_id".cast("long").as("vec_id"), $"embedding")
    val allowed = base.filter($"vec_id" < 8).select($"vec_id") // s ~ 1.6%
    val queries = base.filter($"vec_id" >= 8 && $"vec_id" < 11)
    val idx = Similarity.buildIvfIndex(base, "vec_id", "embedding", nlist = 16)
    // bruteThreshold = 0 would keep the probe branch, but mass
    // baseMass/s >= 1 must force the exact brute path anyway
    val out = Similarity.ivfTopKFilteredAuto(idx, queries, "vec_id", "embedding",
        allowed, k = 5, baseMass = 0.45, bruteThreshold = 0L)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(base.filter($"vec_id" < 8),
        queries, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(out == exact && out.size == 15)
  }

  test("hnswTopKFiltered: planted copies rank-1, no disallowed neighbor") {
    val base = emb.select($"vec_id".cast("long").as("vec_id"), $"embedding")
    val copies = base.filter($"vec_id" < 10 && $"vec_id" % 2 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val corpus = base.unionByName(copies)
    val allowed = base.filter($"vec_id" % 2 === 0).select($"vec_id")
    val idx = Hnsw.buildHnswIndex(corpus, "vec_id", "embedding",
      maxNav = 32, m = 8, efConstruction = 48, efAssign = 16)
    val out = Hnsw.hnswTopKFiltered(idx, copies, "vec_id", "embedding",
        allowed, k = 3, probeMass = 1.0)
      .collect()
    assert(out.length == 15)
    out.foreach { r =>
      val n = r.getAs[Long]("neighbor_id")
      assert(n % 2 == 0 && n < 100000L)
    }
    val top1 = out.filter(_.getAs[Int]("rank") == 1)
    assert(top1.length == 5)
    top1.foreach(r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 100000L))
  }

  test("mmrRerank: lambda=1 is relevance order; low lambda diversifies (planted angular clusters)") {
    def v(theta: Double) = Array(math.cos(theta).toFloat, math.sin(theta).toFloat)
    val corpus = Seq(
      (1L, v(0.05)), (2L, v(0.10)), (3L, v(0.50)), (4L, v(1.20))
    ).toDF("vec_id", "embedding")
    val q = Seq((0L, v(0.0))).toDF("vec_id", "embedding")
    def picks(lambda: Double): Seq[Long] =
      Similarity.mmrTopK(corpus, q, "vec_id", "embedding", k = 3,
          lambda = lambda, poolSize = 4)
        .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(picks(1.0) == Seq(1L, 2L, 3L))   // pure relevance
    assert(picks(0.2) == Seq(1L, 4L, 3L))   // diversity: far cluster second
  }

  test("mmrRerank matches a driver-side greedy reference on real embeddings") {
    val queries = emb.filter($"vec_id" < 3)
    val pool = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 20)
    val got = Similarity.mmrRerank(pool, emb, "vec_id", "embedding", k = 5,
        lambda = 0.6)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    def norm(x: Array[Float]): Array[Double] = {
      val d = x.map(_.toDouble); val n = math.sqrt(d.map(v => v * v).sum)
      if (n > 0) d.map(_ / n) else d
    }
    def cosd(a: Long, b: Long): Double =
      norm(vecs(a)).zip(norm(vecs(b))).map { case (x, y) => x * y }.sum
    val poolRows = pool.select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect().groupBy(_._1)
    poolRows.foreach { case (qid, rows) =>
      var cands = rows.map(r => (r._2, r._3)).sortBy(_._1).toBuffer
      val sel = scala.collection.mutable.ArrayBuffer[Long]()
      val maxSim = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      while (sel.size < 5 && cands.nonEmpty) {
        val scored = cands.map { case (id, rel) =>
          val s = if (sel.isEmpty) 0.6 * rel else 0.6 * rel - 0.4 * maxSim(id)
          (id, s)
        }
        val best = scored.minBy { case (id, s) => (-s, id) }._1
        sel += best
        cands = cands.filterNot(_._1 == best)
        cands.foreach { case (id, _) =>
          val s = cosd(id, best)
          if (s > maxSim(id)) maxSim(id) = s
        }
      }
      assert(got(qid) == sel.toSeq, s"query $qid")
    }
  }

  test("knnClassifyStream equals the batch form (frozen index, AvailableNow replay)") {
    val base = emb.select($"vec_id".cast("long").as("vec_id"), $"embedding", $"label")
    val dir = java.nio.file.Files.createTempDirectory("graft_knn_stream").toString
    Similarity.buildIvfIndex(base, "vec_id", "embedding", nlist = 16)
      .save(s"$dir/idx")
    val queries = base.filter($"vec_id" < 10)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    queries.repartition(2).write.mode("overwrite").parquet(s"$dir/src")
    val q = Similarity.knnClassifyStream(
        spark.readStream.schema(queries.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/src"),
        s"$dir/idx", base, s"$dir/out", "vec_id", "embedding", "label",
        k = 1, probeMass = 0.45)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$dir/out")
      .select("query_id", "label", "votes")
      .as[(Long, Int, Long)].collect().toSet
    val batch = Similarity.knnClassifyIndexed(
        Similarity.loadIvfIndex(spark, s"$dir/idx"), base, queries,
        "vec_id", "embedding", "label", k = 1, probeMass = 0.45)
      .select("query_id", "label", "votes")
      .as[(Long, Int, Long)].collect().toSet
    assert(streamed == batch && streamed.size == 10)
  }

  test("knnClassify: k=1 recovers the label of an exact copy; k=3 votes deterministically on planted geometry") {
    val copies = emb.filter($"vec_id" < 6)
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding", $"label")
    val got = Similarity.knnClassify(emb, copies, "vec_id", "embedding", "label",
        k = 1, probeMass = 0.45)
      .collect()
    val labels = emb.filter($"vec_id" < 6)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    assert(got.length == 6)
    got.foreach { r =>
      assert(r.getAs[Int]("label") == labels(r.getAs[Long]("query_id") - 10000L))
      assert(r.getAs[Long]("votes") == 1L)
    }
    // k=3 on a planted 3-cluster fixture: all three neighbors share the label
    val fix = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 7), (2L, Array(0.99f, 0.1f, 0f, 0f), 7),
      (3L, Array(0.98f, 0.15f, 0f, 0f), 7),
      (4L, Array(0f, 1f, 0f, 0f), 8), (5L, Array(0f, 0.99f, 0.1f, 0f), 8),
      (6L, Array(0f, 0.98f, 0.15f, 0f), 8)
    ).toDF("vec_id", "embedding", "label")
    val q = Seq((100L, Array(1f, 0.05f, 0f, 0f))).toDF("vec_id", "embedding")
    val pred = Similarity.knnClassify(fix, q, "vec_id", "embedding", "label",
        k = 3, probeMass = 1.0)
      .collect().head
    assert(pred.getAs[Int]("label") == 7 && pred.getAs[Long]("votes") == 3L)
  }

  test("SQ8: codes reconstruct within step/2; clamping only past sigma bounds") {
    val rows = Seq(
      (1L, Array(0.0f, 10.0f, -5.0f, 100.0f)),
      (2L, Array(1.0f, 20.0f, 5.0f, 100.0f)),
      (3L, Array(2.0f, 30.0f, 15.0f, 100.0f))
    ).toDF("id", "v")
    val m = ScalarQuant.train(rows, "v", sigma = 3.0)
    assert(m.dim == 4)
    // constant dimension: degenerate span stays well-defined
    assert(m.step(3) > 0)
    val enc = ScalarQuant.encode(rows, "id", "v", m)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("code"), r.getDouble(2))).toMap
    val vecs = Map(1L -> Array(0.0, 10.0, -5.0, 100.0),
      2L -> Array(1.0, 20.0, 5.0, 100.0), 3L -> Array(2.0, 30.0, 15.0, 100.0))
    vecs.foreach { case (id, v) =>
      val (code, norm) = enc(id)
      assert(math.abs(norm - math.sqrt(v.map(x => x * x).sum)) < 1e-9)
      v.indices.foreach { d =>
        // in-bounds values (all of these: 3 sigma covers a 3-point set)
        // reconstruct within half a step
        val recon = m.lo(d) + (code(d) & 0xFF) * m.step(d)
        assert(math.abs(recon - v(d)) <= m.step(d) / 2 + 1e-9,
          s"id $id dim $d: $recon vs ${v(d)}")
      }
    }
    // NULL and ragged vectors drop out, never error
    val bad = Seq((9L, null.asInstanceOf[Array[Float]]),
      (10L, Array(1.0f, 2.0f))).toDF("id", "v")
    assert(ScalarQuant.encode(bad, "id", "v", m).count() == 0L)
  }

  test("SQ8: pool-exhaustive equals brute force; copies rank-1; save/load exact") {
    val e = emb.filter(F.col("embedding").isNotNull)
      .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
    val queries = e.filter(F.col("vec_id") < 12)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = pairs(Similarity.bruteForceTopK(e, queries,
      "vec_id", "embedding", 8))
    val exhaustive = pairs(ScalarQuant.sq8TopK(e, queries,
      "vec_id", "embedding", 8, poolSize = 1 << 20))
    assert(exhaustive == exact, "pool >= corpus must be exactly brute force")
    // a moderate pool keeps near-perfect order (int8 direction error)
    val pooled = pairs(ScalarQuant.sq8TopK(e, queries,
      "vec_id", "embedding", 8, poolSize = 64))
    val per = exact.groupBy(_._1).map { case (q, ts) =>
      val got = pooled.filter(_._1 == q).map(_._3)
      ts.count(t => got.contains(t._3)).toDouble / ts.size }
    assert(per.sum / per.size >= 0.9, s"sq8 recall@8 ${per.sum / per.size}")
    // planted copies rank-1 through the persisted path
    val copies = e.filter(F.col("vec_id") < 5)
      .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_sq8").toString
    val m = ScalarQuant.saveSq8Index(e.unionByName(copies),
      "vec_id", "embedding", dir)
    val (reM, reCodes) = ScalarQuant.loadSq8Index(spark, dir)
    assert(reM.lo.toSeq == m.lo.toSeq && reM.step.toSeq == m.step.toSeq)
    ScalarQuant.sq8TopKIndexed(reM, reCodes, e.unionByName(copies), copies,
        "vec_id", "embedding", 1, poolSize = 50)
      .select("query_id", "neighbor_id").collect()
      .foreach(r => assert(r.getLong(1) == r.getLong(0) - 100000L))
  }
}
