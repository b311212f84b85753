package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}
import graft.pipeline.{ProductQuantization => PQ}

class PqSpec extends SparkTestBase {
  import spark.implicits._

  // 6 distinct dim-8 vectors; with ksub = corpus size the seeds ARE the
  // corpus, every subvector is its own centroid (Lloyd is a fixed
  // point), so ADC dot products are EXACT and PQ ranking must equal
  // brute force.
  private def corpus6 = Seq(
    (1L, Array(1.0f, 0f, 0f, 0f, 2f, 0f, 1f, 0f)),
    (2L, Array(0.9f, 0.1f, 0f, 0f, 2f, 0f, 1f, 0f)),
    (3L, Array(0f, 1f, 1f, 0f, 0f, 2f, 0f, 1f)),
    (4L, Array(0f, 1f, 1f, 0.1f, 0f, 2f, 0f, 0.9f)),
    (5L, Array(-1f, 0f, 0f, 1f, 0f, 0f, -2f, 0f)),
    (6L, Array(0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f)))
    .toDF("vec_id", "embedding").repartition(2)

  test("trainPq shapes: m subspaces, ksub codes, dim/m sub-centroid width") {
    val cb = PQ.trainPq(corpus6, "vec_id", "embedding", m = 4, ksub = 6, iterations = 2)
    assert(cb.m === 4)
    assert(cb.subDim === 2)
    assert(cb.ksub === 6)
    assert(cb.centroids.forall(_.forall(_.length === 2)))
  }

  test("ADC ranking equals brute force when every subvector is a centroid") {
    val cb = PQ.trainPq(corpus6, "vec_id", "embedding", m = 4, ksub = 6, iterations = 2)
    val enc = PQ.pqEncode(corpus6, "vec_id", "embedding", cb)
    val queries = corpus6.filter($"vec_id" <= 2)
    val adc = PQ.pqTopKEncoded(cb, enc, queries, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(corpus6, queries, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(adc === exact)
    // and the ADC cosines are the exact cosines (codes reconstruct exactly)
    val cosAdc = PQ.pqTopKEncoded(cb, enc, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val cosExact = Similarity.bruteForceTopK(corpus6, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    cosAdc.foreach { case (k, v) => assert(math.abs(v - cosExact(k)) < 1e-5, k) }
  }

  test("reranked PQ with a full-corpus pool is exactly brute force") {
    // even with a LOSSY codebook (ksub 2), rerank over a pool covering
    // the whole corpus must return the exact answer
    val cb = PQ.trainPq(corpus6, "vec_id", "embedding", m = 4, ksub = 2, iterations = 2)
    val enc = PQ.pqEncode(corpus6, "vec_id", "embedding", cb)
    val queries = corpus6.filter($"vec_id" === 1L)
    val rr = PQ.pqTopKReranked(cb, enc, corpus6, queries, "vec_id", "embedding", 3, poolSize = 6)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(corpus6, queries, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(rr === exact)
  }

  test("NULL and ragged vectors encode to NULL codes and never score") {
    val df = Seq(
      (1L, Option(Array(1.0f, 0f, 0f, 2f))),
      (2L, Option(Array(0.9f, 0.1f, 0f, 2f))),
      (3L, Option.empty[Array[Float]]),
      (4L, Option(Array(1.0f, 2.0f))))            // ragged: wrong dim
      .toDF("vec_id", "embedding")
    val cb = PQ.trainPq(df, "vec_id", "embedding", m = 2, ksub = 2, iterations = 1)
    val enc = PQ.pqEncode(df, "vec_id", "embedding", cb)
    val codes = enc.select("neighbor_id", "__code")
      .as[(Long, Option[Array[Byte]])].collect().toMap
    assert(codes(1L).isDefined && codes(1L).get.length === 2)
    assert(codes(3L).isEmpty)
    assert(codes(4L).isEmpty)
    val out = PQ.pqTopKEncoded(cb, enc, df.filter($"vec_id" === 1L),
        "vec_id", "embedding", 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out === Set(2L))   // 3/4 dropped, self excluded
  }

  test("IVF-PQ with full-coverage probes and pool reproduces brute force") {
    // nlist=2 cells, probe BOTH, pool covers the whole corpus → the
    // rerank stage must recover the exact answer regardless of how
    // lossy the residual codes are
    val idx = PQ.buildIvfPq(corpus6, "vec_id", "embedding",
      nlist = 2, m = 4, ksub = 2, iterations = 2)
    assert(idx.encoded.columns.toSeq ===
      Seq("neighbor_id", "__cell", "__code", "__norm"))
    val queries = corpus6.filter($"vec_id" <= 2)
    val got = PQ.ivfPqTopK(idx, corpus6, queries, "vec_id", "embedding", 3,
        nprobe = 2, poolSize = 6)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(corpus6, queries, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got === exact)
  }

  test("IVF-PQ probing restricts the scan to the probed cells") {
    val idx = PQ.buildIvfPq(corpus6, "vec_id", "embedding",
      nlist = 2, m = 4, ksub = 2, iterations = 2)
    val cells = idx.encoded.select("__cell").distinct().as[Int].collect().toSet
    assert(cells.size === 2)   // both cells populated on this corpus
    // nprobe=1: results only come from one cell per query
    val queries = corpus6.filter($"vec_id" === 1L)
    val got = PQ.ivfPqTopK(idx, corpus6, queries, "vec_id", "embedding", 6,
        nprobe = 1, poolSize = 6)
      .select("neighbor_id").as[Long].collect().toSet
    val byCell = idx.encoded.select("neighbor_id", "__cell")
      .as[(Long, Int)].collect().groupBy(_._2).map { case (c, g) => c -> g.map(_._1).toSet }
    // the result set must be a subset of a single cell (minus self)
    assert(byCell.values.exists(cell => got.subsetOf(cell - 1L)), s"$got vs $byCell")
  }

  test("IVF-PQ mass-adaptive probing holds recall on the real corpus") {
    val emb = sf("sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val idx = PQ.buildIvfPq(emb, "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 16, iterations = 2)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = PQ.ivfPqTopK(idx, emb, queries, "vec_id", "embedding", 5,
        nprobe = 4, poolSize = 100, probeMass = 0.45)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.6, s"mass-probed ivfpq recall=$recall")
    // probeMass = 1.0 probes every cell: with a corpus-wide pool the
    // rerank recovers brute force exactly
    val full = PQ.ivfPqTopK(idx, emb, queries, "vec_id", "embedding", 5,
        nprobe = 1, poolSize = 500, probeMass = 1.0)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full === exact)
  }

  test("IVF-PQ save/load roundtrips and answers identically") {
    val idx = PQ.buildIvfPq(corpus6, "vec_id", "embedding",
      nlist = 2, m = 4, ksub = 2, iterations = 2)
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq_rt").toString
    idx.save(path)
    val loaded = PQ.loadIvfPq(spark, path)
    assert(loaded.centroids.map(_.toSeq).toSeq === idx.centroids.map(_.toSeq).toSeq)
    assert(loaded.cb.m === idx.cb.m && loaded.cb.subDim === idx.cb.subDim)
    assert(loaded.cb.centroids.map(_.map(_.toSeq).toSeq).toSeq ===
      idx.cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    val queries = corpus6.filter($"vec_id" <= 2)
    def ans(i: PQ.IvfPqIndex) =
      PQ.ivfPqTopK(i, corpus6, queries, "vec_id", "embedding", 3, 2, 6)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
    assert(ans(loaded) === ans(idx))
  }

  test("training tolerates NULL/ragged vectors in the corpus") {
    val df = Seq(
      (1L, Option(Array(1.0f, 0f, 0f, 2f))),
      (2L, Option(Array(0.9f, 0.1f, 0f, 2f))),
      (3L, Option.empty[Array[Float]]),
      (4L, Option(Array(1.0f, 2.0f))))
      .toDF("vec_id", "embedding")
    val cb = PQ.trainPq(df, "vec_id", "embedding", m = 2, ksub = 2, iterations = 2)
    assert(cb.m === 2 && cb.subDim === 2)
  }

  // ------------------------------------------------------------ OPQ

  // Anisotropic fixture: latent z with a steep variance spectrum,
  // observed through a FIXED dense rotation Q — plain PQ must quantize
  // correlated coordinates; OPQ's learned rotation recovers (a basis
  // equivalent to) Q^T and quantizes near-independent ones. Seeded —
  // bit-identical across runs.
  private def anisotropic(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    // random orthogonal Q via Gram-Schmidt on a Gaussian matrix
    val q = Array.fill(dim, dim)(rnd.nextGaussian())
    for (i <- 0 until dim) {
      for (j <- 0 until i) {
        var d = 0.0
        for (k <- 0 until dim) d += q(i)(k) * q(j)(k)
        for (k <- 0 until dim) q(i)(k) -= d * q(j)(k)
      }
      val nrm = math.sqrt(q(i).map(x => x * x).sum)
      for (k <- 0 until dim) q(i)(k) /= nrm
    }
    Seq.tabulate(n) { i =>
      val z = Array.tabulate(dim)(j => rnd.nextGaussian() / (1.0 + j))
      val x = Array.tabulate(dim) { r =>
        var s = 0.0
        for (k <- 0 until dim) s += q(k)(r) * z(k)
        s.toFloat
      }
      (i.toLong, x)
    }
  }

  private def quantError(
      vecs: Seq[Array[Float]], cb: PQ.PqCodebooks): Double =
    vecs.map { v =>
      var err = 0.0
      for (sub <- 0 until cb.m) {
        val off = sub * cb.subDim
        val best = cb.centroids(sub).map { c =>
          var d = 0.0
          for (j <- 0 until cb.subDim) { val t = c(j) - v(off + j); d += t * t }
          d
        }.min
        err += best
      }
      err
    }.sum

  test("OPQ rotation is orthogonal and lowers quantization error on correlated data") {
    val rows = anisotropic(400, 16, seed = 5)
    val df = rows.toDF("vec_id", "embedding").repartition(4)
    val rot = PQ.trainOpqRotation(df, "vec_id", "embedding",
      m = 8, ksub = 8, opqIters = 8)
    val dim = 16
    assert(rot.length === dim && rot.forall(_.length === dim))
    // R R^T == I
    for (i <- 0 until dim; j <- 0 until dim) {
      var s = 0.0
      for (k <- 0 until dim) s += rot(i)(k).toDouble * rot(j)(k).toDouble
      assert(math.abs(s - (if (i == j) 1.0 else 0.0)) < 1e-4,
        s"R R^T deviates at ($i,$j): $s")
    }
    // deterministic retrain
    val rot2 = PQ.trainOpqRotation(df, "vec_id", "embedding",
      m = 8, ksub = 8, opqIters = 8)
    assert(rot.map(_.toSeq).toSeq === rot2.map(_.toSeq).toSeq)
    // error comparison on identical geometry
    def rotate(v: Array[Float]) = Array.tabulate(dim) { i =>
      var s = 0.0
      for (j <- 0 until dim) s += rot(i)(j).toDouble * v(j)
      s.toFloat
    }
    val rotatedDf = rows.map { case (id, v) => (id, rotate(v)) }
      .toDF("vec_id", "embedding").repartition(4)
    val cbPlain = PQ.trainPq(df, "vec_id", "embedding", m = 8, ksub = 8, iterations = 4)
    val cbOpq = PQ.trainPq(rotatedDf, "vec_id", "embedding", m = 8, ksub = 8, iterations = 4)
    val errPlain = quantError(rows.map(_._2), cbPlain)
    val errOpq = quantError(rows.map(_._2).map(rotate), cbOpq)
    assert(errOpq < errPlain * 0.9,
      s"OPQ should cut quantization error >= 10%: plain=$errPlain opq=$errOpq")
  }

  test("OPQ IVF-PQ: exact copies found, rerank cosines match brute force, save/load") {
    val rows = anisotropic(300, 16, seed = 9)
    val df = rows.toDF("vec_id", "embedding").repartition(4)
    val idx = PQ.buildOpqIvfPq(df, "vec_id", "embedding",
      nlist = 6, m = 8, ksub = 8, iterations = 2, opqIters = 4)
    val queries = df.filter(F.col("vec_id") < 8)
    val got = PQ.opqIvfPqTopK(idx, df, queries, "vec_id", "embedding", 5,
        nprobe = 6, poolSize = 300)
      .select(F.col("query_id").cast("long"), F.col("rank"),
        F.col("neighbor_id").cast("long"), F.col("cos"))
      .as[(Long, Int, Long, Double)].collect()
    // full-coverage probes + full pool == brute force ranking, and the
    // rerank cosines are the ORIGINAL-space cosines (orthogonality)
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select(F.col("query_id").cast("long"), F.col("rank"),
        F.col("neighbor_id").cast("long"), F.col("cos"))
      .as[(Long, Int, Long, Double)].collect()
    val gm = got.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val bm = brute.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(gm.keySet === bm.keySet)
    gm.foreach { case (k, (id, cos)) =>
      assert(id === bm(k)._1, s"rank mismatch at $k")
      assert(math.abs(cos - bm(k)._2) < 1e-5, s"cos drifted at $k")
    }
    // save/load answers identically
    val dir = java.nio.file.Files.createTempDirectory("graft_opq").toString
    idx.save(dir)
    val loaded = PQ.loadOpqIvfPq(spark, dir)
    assert(loaded.rotation.map(_.toSeq).toSeq === idx.rotation.map(_.toSeq).toSeq)
    val got2 = PQ.opqIvfPqTopK(loaded, df, queries, "vec_id", "embedding", 5,
        nprobe = 6, poolSize = 300)
      .select(F.col("query_id").cast("long"), F.col("rank"),
        F.col("neighbor_id").cast("long"))
      .as[(Long, Int, Long)].collect().toSet
    assert(got2 === got.map(r => (r._1, r._2, r._3)).toSet)
  }

  test("appendToOpqIvfPq: frozen-geometry growth, full coverage == brute force") {
    val rows = anisotropic(240, 16, seed = 13)
    val df = rows.toDF("vec_id", "embedding").repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("graft_opq_app").toString
    PQ.buildOpqIvfPq(df.filter(F.col("vec_id") % 2 === 0), "vec_id", "embedding",
      nlist = 5, m = 8, ksub = 8, iterations = 2, opqIters = 3).save(dir)
    val grown = PQ.appendToOpqIvfPq(
      spark, dir, df.filter(F.col("vec_id") % 2 =!= 0), "vec_id", "embedding")
    assert(grown.index.encoded.count() === 240L)
    // full coverage over the GROWN index ranks exactly like brute force
    // over the full corpus — appended rows are correctly encoded
    val queries = df.filter(F.col("vec_id") < 6)
    val got = PQ.opqIvfPqTopK(grown, df, queries, "vec_id", "embedding", 5,
        nprobe = 5, poolSize = 240)
      .select(F.col("query_id").cast("long"), F.col("rank"),
        F.col("neighbor_id").cast("long"))
      .as[(Long, Int, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select(F.col("query_id").cast("long"), F.col("rank"),
        F.col("neighbor_id").cast("long"))
      .as[(Long, Int, Long)].collect().toSet
    assert(got === brute)
    // an exact copy of an APPENDED vector finds its original at rank 1
    // even at nprobe = 1 (identical rotated vectors share a cell)
    val planted = df.filter(F.col("vec_id") % 2 =!= 0 && F.col("vec_id") < 8)
      .select((F.col("vec_id") + 1000L).as("vec_id"), F.col("embedding"))
    val hits = PQ.opqIvfPqTopK(grown, df, planted, "vec_id", "embedding", 1,
        nprobe = 1, poolSize = 64)
      .select(F.col("query_id").cast("long"), F.col("neighbor_id").cast("long"),
        F.col("cos"))
      .as[(Long, Long, Double)].collect()
    assert(hits.length === planted.count().toInt)
    hits.foreach { case (q, n, c) =>
      assert(n === q - 1000L, s"copy $q found $n")
      assert(c > 0.999999)
    }
  }

  test("streamToOpqIvfPq: micro-batched stream equals the batch OPQ append") {
    val rows = anisotropic(240, 16, seed = 17)
    val df = rows.toDF("vec_id", "embedding")
    val even = df.filter(F.col("vec_id") % 2 === 0)
    val odd = df.filter(F.col("vec_id") % 2 =!= 0)
      .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
    val dirA = java.nio.file.Files.createTempDirectory("graft_opq_sa").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_opq_sb").toString
    val built = PQ.buildOpqIvfPq(even, "vec_id", "embedding",
      nlist = 5, m = 8, ksub = 8, iterations = 2, opqIters = 2)
    built.save(dirA); built.save(dirB)
    PQ.appendToOpqIvfPq(spark, dirA, odd, "vec_id", "embedding")
    val src = java.nio.file.Files.createTempDirectory("graft_opq_src").toString
    odd.repartition(3).write.mode("overwrite").parquet(src)
    val q = PQ.streamToOpqIvfPq(
        spark.readStream.schema(odd.schema)
          .option("maxFilesPerTrigger", 1).parquet(src),
        dirB, "vec_id", "embedding")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_opq_ck").toString)
      .start()
    q.awaitTermination()
    // identical code tables: same ids, same cells, same codes
    def rowsOf(dir: String) = PQ.loadIvfPq(spark, dir).encoded
      .select(F.col("neighbor_id").cast("long"), F.col("__cell"),
        F.col("__code"), F.col("__norm"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getAs[Array[Byte]](2).toSeq, r.getDouble(3))).sortBy(_._1).toSeq
    assert(rowsOf(dirB) === rowsOf(dirA))
  }

  test("removeFromIvfIndex/IvfPq: touched-cell rewrite, emptied cells deleted") {
    // two tight direction groups -> two stable cells; removing ALL of
    // one group must empty (and delete) its cell directory
    val rows = (0L until 40L).map { i =>
      val v =
        if (i < 25) Array(1.0f, (i % 5) * 0.01f)
        else Array((i % 5) * 0.01f, 1.0f)
      (i, v)
    }
    val df = rows.toDF("vec_id", "embedding").repartition(3)
    val ivfDir = java.nio.file.Files.createTempDirectory("graft_rm_ivf").toString
    val pqDir = java.nio.file.Files.createTempDirectory("graft_rm_pq").toString
    Similarity.buildIvfIndex(df, "vec_id", "embedding", nlist = 2, iterations = 3)
      .save(ivfDir)
    PQ.buildIvfPq(df, "vec_id", "embedding", nlist = 2, m = 2, ksub = 4,
      iterations = 3).save(pqDir)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def cellDirs(p: String) = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .map(_.getPath.getName).filter(_.startsWith("__cell=")).toSet
    assert(cellDirs(s"$ivfDir/assigned").size === 2)
    // remove the whole +y group plus two +x members
    val doomed = df.filter(F.col("vec_id") >= 25 || F.col("vec_id") < 2)
      .select("vec_id")
    val ivf = Similarity.removeFromIvfIndex(spark, ivfDir, doomed, "vec_id")
    val ivfpq = PQ.removeFromIvfPq(spark, pqDir, doomed, "vec_id")
    assert(ivf.assigned.count() === 23L)
    assert(ivfpq.encoded.count() === 23L)
    assert(cellDirs(s"$ivfDir/assigned").size === 1) // emptied dir GONE
    assert(cellDirs(s"$pqDir/encoded").size === 1)
    val left = ivf.assigned.select(F.col("neighbor_id").cast("long"))
      .as[Long].collect().toSet
    assert(left === (2L until 25L).toSet)
    // removing ids absent from the index is a no-op
    val again = Similarity.removeFromIvfIndex(spark, ivfDir,
      Seq(999L).toDF("vec_id"), "vec_id")
    assert(again.assigned.count() === 23L)
  }

  test("removing EVERY id leaves a loadable empty index; the next append revives it") {
    val rows = (0L until 30L).map { i =>
      val v =
        if (i < 15) Array(1.0f, (i % 5) * 0.01f)
        else Array((i % 5) * 0.01f, 1.0f)
      (i, v)
    }
    val df = rows.toDF("vec_id", "embedding").repartition(3)
    val ivfDir = java.nio.file.Files.createTempDirectory("graft_rmall_ivf").toString
    val pqDir = java.nio.file.Files.createTempDirectory("graft_rmall_pq").toString
    Similarity.buildIvfIndex(df, "vec_id", "embedding", nlist = 2, iterations = 3)
      .save(ivfDir)
    PQ.buildIvfPq(df, "vec_id", "embedding", nlist = 2, m = 2, ksub = 4,
      iterations = 3).save(pqDir)
    // total takedown: every id removed — the schema sentinel must keep
    // both tables loadable (a partitioned write of 0 rows lands no
    // files; all-dirs-deleted parquet is uninferrable)
    val ivfEmpty = Similarity.removeFromIvfIndex(spark, ivfDir, df.select("vec_id"), "vec_id")
    val pqEmpty = PQ.removeFromIvfPq(spark, pqDir, df.select("vec_id"), "vec_id")
    assert(ivfEmpty.assigned.count() === 0L)
    assert(pqEmpty.encoded.count() === 0L)
    // append clears the sentinel and the index works again end-to-end
    val revived = Similarity.appendToIvfIndex(spark, ivfDir,
      df.filter(F.col("vec_id") < 10), "vec_id", "embedding")
    assert(revived.assigned.count() === 10L)
    val probe = Similarity.ivfTopKIndexed(revived,
      df.filter(F.col("vec_id") === 0L), "vec_id", "embedding", k = 3, nprobe = 2)
    assert(probe.count() === 3L)
    val revivedPq = PQ.appendToIvfPq(spark, pqDir,
      df.filter(F.col("vec_id") >= 20), "vec_id", "embedding")
    assert(revivedPq.encoded.count() === 10L)
    // an all-empty batch must not clear a sentinel (keep it loadable)
    val d2 = java.nio.file.Files.createTempDirectory("graft_rmall_ivf2").toString
    Similarity.buildIvfIndex(df, "vec_id", "embedding", nlist = 2, iterations = 3)
      .save(d2)
    Similarity.removeFromIvfIndex(spark, d2, df.select("vec_id"), "vec_id")
    val still = Similarity.appendToIvfIndex(spark, d2,
      df.filter(F.col("vec_id") < 0), "vec_id", "embedding")
    assert(still.assigned.count() === 0L)
  }

  test("rerank joins broadcast the bounded pool — corpus side never shuffles") {
    val emb = sf("sf0.001", "embeddings").limit(400)
    val queries = emb.limit(3)
    val cb = PQ.trainPq(emb, "vec_id", "embedding", m = 2, ksub = 4)
    val enc = PQ.pqEncode(emb, "vec_id", "embedding", cb)
    val rerank = PQ.pqTopKReranked(cb, enc, emb, queries,
      "vec_id", "embedding", 3, poolSize = 8)
    val plan = rerank.queryExecution.executedPlan.toString
    // every join in the rerank path is a broadcast join — a stats miss
    // must never be able to shuffle the corpus behind the tiny pool
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus-side shuffle join in rerank plan:\n$plan")
    val idx = PQ.buildIvfPq(emb, "vec_id", "embedding", nlist = 4, m = 2, ksub = 4)
    val plan2 = PQ.ivfPqTopK(idx, emb, queries, "vec_id", "embedding", 3,
      nprobe = 2, poolSize = 8).queryExecution.executedPlan.toString
    assert(!plan2.contains("SortMergeJoin") && !plan2.contains("ShuffledHashJoin"),
      s"corpus-side shuffle join in ivfPqTopK plan:\n$plan2")
  }
}
