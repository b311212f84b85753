package graft.pipeline

import org.apache.spark.sql.{functions => F}
import graft.SparkTestBase

/**
 * Recall-target probe controller: the measured mass→recall curve, the
 * massFor solver, persistence, and the on-sample achievement contract
 * (the solved mass reproduces the measured recall exactly, because
 * calibration replays the family's probe rule bit-for-bit).
 */
class CalibrationSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = sf("sf0.001", "embeddings")
    .filter(F.col("embedding").isNotNull)
    .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))

  private def pairs(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select(F.col("query_id").cast("long"), F.col("neighbor_id").cast("long"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallOf(
      got: Map[Long, Set[Long]], gt: Map[Long, Set[Long]]): Double = {
    val per = gt.map { case (q, tr) =>
      got.getOrElse(q, Set.empty).intersect(tr).size.toDouble / tr.size }
    per.sum / per.size
  }

  /** The calibration sample, re-derived (the hash-ordered prefix is
    * deterministic). */
  private def sampleOf(idx: Similarity.IvfIndex, n: Int) =
    idx.assigned
      .orderBy(F.xxhash64(F.col("neighbor_id").cast("string")),
        F.col("neighbor_id").cast("string"))
      .limit(n)
      .select(F.col("neighbor_id").as("vec_id"), F.col("__cv").as("embedding"))
      .localCheckpoint(false)

  test("IVF curve is monotone in mass and reaches 1.0 at full mass") {
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nlist = 16, iterations = 2)
    val cal = Similarity.calibrateIvfProbe(idx, k = 10, nSample = 48)
    assert(cal.grid.map(_._1) == cal.grid.map(_._1).sorted)
    cal.grid.sliding(2).foreach {
      case Vector((m1, r1), (m2, r2)) =>
        assert(r2 >= r1, s"recall fell from $r1@$m1 to $r2@$m2")
      case _ =>
    }
    // mass 1.0 probes every cell: exact on the IVF family
    assert(cal.grid.last._1 == 1.0 && cal.grid.last._2 == 1.0)
  }

  test("massFor: smallest satisfying mass, monotone in target, 1.0 fallback") {
    val cal = Similarity.ProbeCalibration(10,
      Vector(0.1 -> 0.4, 0.3 -> 0.7, 0.6 -> 0.9))
    assert(cal.massFor(0.3) == 0.1)
    assert(cal.massFor(0.4) == 0.1)
    assert(cal.massFor(0.5) == 0.3)
    assert(cal.massFor(0.9) == 0.6)
    assert(cal.massFor(0.95) == 1.0) // unreachable -> probe everything
    val targets = Seq(0.1, 0.4, 0.6, 0.8, 0.95)
    assert(targets.map(cal.massFor) == targets.map(cal.massFor).sorted)
  }

  test("IVF: the solved mass achieves the target on the calibration sample") {
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nlist = 16, iterations = 2)
    val cal = Similarity.calibrateIvfProbe(idx, k = 10, nSample = 64)
    val sample = sampleOf(idx, 64)
    val gt = pairs(Similarity.bruteForceTopK(emb, sample,
      "vec_id", "embedding", 10))
    Seq(0.6, 0.85).foreach { target =>
      val got = pairs(Similarity.ivfTopKTarget(idx, sample,
        "vec_id", "embedding", 10, target, cal))
      val achieved = recallOf(got, gt)
      assert(achieved >= target,
        s"target $target, solved mass ${cal.massFor(target)}, achieved $achieved")
    }
  }

  test("calibration persists beside the geometry and round-trips exactly") {
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nlist = 8, iterations = 1)
    val cal = Similarity.calibrateIvfProbe(idx, k = 5, nSample = 32)
    val dir = java.nio.file.Files.createTempDirectory("graft_cal").toString
    assert(Similarity.loadCalibration(spark, dir).isEmpty)
    Similarity.saveCalibration(spark, dir, cal)
    assert(Similarity.loadCalibration(spark, dir).contains(cal))
  }

  test("geometry-replacing ops refresh a calibrated curve in place") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cal_stale").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nlist = 4, iterations = 1).save(dir)
    Similarity.recalibrateIvfIndex(spark, dir, k = 5, nSample = 32)
    assert(Similarity.loadCalibrationMeta(spark, dir).exists(_._2 == 4))
    // an IVF retrain replaces the cells: the STALE curve must not
    // survive — since the index was calibrated, the retrain
    // recalibrates in place (same k, fresh cells stamp), so the new
    // geometry never sits behind an old curve OR a missing one
    Similarity.retrainIvfIndex(spark, dir, nlist = 8, iterations = 1)
    val meta = Similarity.loadCalibrationMeta(spark, dir)
    assert(meta.exists(m => m._2 == 8 && m._1.k == 5),
      "retrain must leave a FRESH curve for the 8-cell geometry")
    intercept[IllegalStateException] {
      Similarity.loadCalibrationValidated(spark, dir, 4)
    }

    // the HNSW twins: retrain AND incremental nav growth both re-route
    // — a calibrated graph refreshes at the SAME efSearch stamp
    val hDir = java.nio.file.Files.createTempDirectory("graft_cal_hstale").toString
    Hnsw.buildHnswIndex(emb, "vec_id", "embedding",
      maxNav = 16, m = 8, efConstruction = 48, efAssign = 16).save(hDir)
    Hnsw.recalibrateHnswIndex(spark, hDir, k = 5, nSample = 32, efSearch = 16)
    Hnsw.retrainHnswIndex(spark, hDir, maxNav = 16, m = 8, efConstruction = 48)
    val hMeta = Similarity.loadCalibrationMeta(spark, hDir)
    assert(hMeta.exists(m => m._3 == 16 && m._1.k == 5),
      "HNSW retrain must refresh the curve at the stored efSearch")
    Hnsw.addNavNodes(spark, hDir, emb.limit(100), "vec_id", "embedding",
      maxNewNav = 4)
    val grownMeta = Similarity.loadCalibrationMeta(spark, hDir)
    assert(grownMeta.exists(m => m._2 == 20 && m._3 == 16),
      "nav growth must re-stamp the curve for the grown graph")
  }

  test("HNSW: walk-ordered probe calibrates and hits the target on-sample") {
    val hidx = Hnsw.buildHnswIndex(emb, "vec_id", "embedding",
      maxNav = 32, m = 8, efConstruction = 48, efAssign = 16)
    val cal = Hnsw.calibrateProbe(hidx, k = 10, nSample = 48, efSearch = 32)
    cal.grid.sliding(2).foreach {
      case Vector((_, r1), (_, r2)) => assert(r2 >= r1)
      case _ =>
    }
    val sample = hidx.assigned
      .orderBy(F.xxhash64(F.col("neighbor_id").cast("string")),
        F.col("neighbor_id").cast("string"))
      .limit(48)
      .select(F.col("neighbor_id").as("vec_id"), F.col("__cv").as("embedding"))
      .localCheckpoint(false)
    val gt = pairs(Similarity.bruteForceTopK(emb, sample,
      "vec_id", "embedding", 10))
    val got = pairs(Hnsw.hnswTopKTarget(hidx, sample,
      "vec_id", "embedding", 10, 0.6, cal, efSearch = 32))
    assert(recallOf(got, gt) >= 0.6)
  }

  test("IVF-PQ: coarse-cell calibration hits the target with a covering pool") {
    val pidx = ProductQuantization.buildIvfPq(emb, "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 16, iterations = 2)
    val cal = ProductQuantization.calibrateIvfPqProbe(pidx, emb,
      "vec_id", "embedding", k = 10, nSample = 48)
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nlist = 16, iterations = 2)
    val sample = sampleOf(idx, 48)
    val gt = pairs(Similarity.bruteForceTopK(emb, sample,
      "vec_id", "embedding", 10))
    val got = pairs(ProductQuantization.ivfPqTopKTarget(pidx, emb, sample,
      "vec_id", "embedding", 10, 0.6, cal, poolSize = 1024))
    assert(recallOf(got, gt) >= 0.6)
  }

  test("PoolCalibration: poolFor picks the smallest reaching pool") {
    val cal = Similarity.PoolCalibration(10,
      Vector((50, 0.4), (100, 0.7), (200, 0.7), (400, 0.95)))
    assert(cal.poolFor(0.3) == 50)
    assert(cal.poolFor(0.7) == 100) // smallest, not any, reaching pool
    assert(cal.poolFor(0.9) == 400)
    assert(cal.poolFor(0.99) == Int.MaxValue) // nothing reaches: exact
  }

  test("pool calibration: binary/SQ8/PQ achieve the solved target on-sample") {
    val sample = Similarity.poolCalibrationSample(emb, "vec_id", "embedding", 48)
    val gt = pairs(Similarity.bruteForceTopK(emb, sample,
      "vec_id", "embedding", 10))
    val bcal = BinaryQuant.calibratePool(emb, "vec_id", "embedding",
      k = 10, nSample = 48)
    assert(bcal.grid.sliding(2).forall {
      case Vector((_, r1), (_, r2)) => r2 >= r1
      case _ => true
    }, "pool curve is monotone (deeper pools never lose a true neighbor)")
    val b = pairs(BinaryQuant.binaryTopKTarget(emb, sample,
      "vec_id", "embedding", 10, 0.85, bcal))
    assert(recallOf(b, gt) >= 0.85)
    val m = ScalarQuant.train(emb, "embedding")
    val codes = ScalarQuant.encode(emb, "vec_id", "embedding", m)
      .localCheckpoint(false)
    val scal = ScalarQuant.calibratePool(m, codes, emb, "vec_id",
      "embedding", k = 10, nSample = 48)
    val sq = pairs(ScalarQuant.sq8TopKTarget(m, codes, emb, sample,
      "vec_id", "embedding", 10, 0.85, scal))
    assert(recallOf(sq, gt) >= 0.85)
    val cb = ProductQuantization.trainPq(emb, "vec_id", "embedding",
      m = 16, ksub = 16, iterations = 2)
    val enc = ProductQuantization.pqEncode(emb, "vec_id", "embedding", cb)
      .localCheckpoint(false)
    val pcal = ProductQuantization.calibratePqPool(cb, enc, emb,
      "vec_id", "embedding", k = 10, nSample = 48)
    val p = pairs(ProductQuantization.pqTopKTarget(cb, enc, emb, sample,
      "vec_id", "embedding", 10, 0.85, pcal))
    assert(recallOf(p, gt) >= 0.85)
  }

  test("retrain auto-recalibrates a calibrated index; stale curves refused") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_recal").toString + "/idx"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nlist = 8, iterations = 2).save(path)
    // uncalibrated index: retrain leaves NO curve (nothing to refresh)
    Similarity.retrainIvfIndex(spark, path, nlist = 8, iterations = 2)
    assert(Similarity.loadCalibration(spark, path).isEmpty)
    // calibrated index: a retrain to new geometry refreshes the curve
    // in place with the new cells stamp
    Similarity.recalibrateIvfIndex(spark, path, k = 10, nSample = 32)
    Similarity.retrainIvfIndex(spark, path, nlist = 16, iterations = 2)
    val meta = Similarity.loadCalibrationMeta(spark, path)
    assert(meta.nonEmpty && meta.get._2 == 16, "fresh curve, new stamp")
    assert(Similarity.loadCalibrationValidated(spark, path, 16).nonEmpty)
    // a stamp that mismatches the live geometry is refused loudly
    intercept[IllegalStateException] {
      Similarity.loadCalibrationValidated(spark, path, 8)
    }
  }

  test("SQ8 pool curve persists, round-trips, and refreshes on retrain") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sq8pool").toString
    val path = s"$base/idx"
    ScalarQuant.saveSq8Index(emb, "vec_id", "embedding", path)
    // uncalibrated index: a retrain leaves NO curve
    ScalarQuant.retrainSq8Index(spark, path, emb, "vec_id", "embedding")
    assert(Similarity.loadPoolCalibration(spark, path).isEmpty)
    val cal = ScalarQuant.recalibrateSq8Pool(spark, path, emb,
      "vec_id", "embedding", k = 10, nSample = 32)
    assert(Similarity.loadPoolCalibration(spark, path).contains(cal))
    // calibrated index: the retrain refreshes the curve in place at
    // the same k (fresh bounds reorder the coarse scan)
    ScalarQuant.retrainSq8Index(spark, path,
      emb.filter(F.col("vec_id") % 2 === 0), "vec_id", "embedding")
    val re = Similarity.loadPoolCalibration(spark, path)
    assert(re.nonEmpty && re.get.k == 10, "retrain must refresh the curve")
    // the solved pool achieves the target on the rebuilt index's own
    // sample (the deterministic on-sample replay argument — the
    // refresh measures at the DEFAULT 64-sample rule, so the check
    // re-derives the same 64)
    val half = emb.filter(F.col("vec_id") % 2 === 0)
    val sample = Similarity.poolCalibrationSample(half, "vec_id",
      "embedding", 64)
    val gt = pairs(Similarity.bruteForceTopK(half, sample,
      "vec_id", "embedding", 10))
    val (m, codes) = ScalarQuant.loadSq8Index(spark, path)
    val got = pairs(ScalarQuant.sq8TopKTarget(m, codes, half, sample,
      "vec_id", "embedding", 10, 0.85, re.get))
    assert(recallOf(got, gt) >= 0.85)
  }

  test("SQ8 lifecycle: clip dial quiet/fires; mutations keep model+codes paired") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sq8life").toString
    val path = s"$base/idx"
    val m0 = ScalarQuant.saveSq8Index(emb.filter(F.col("vec_id") % 2 === 0),
      "vec_id", "embedding", path)
    // in-distribution fresh batch: well under the clip threshold
    assert(ScalarQuant.clipFraction(m0, emb.limit(100), "embedding") < 0.05)
    val (m1, grown) = ScalarQuant.appendToSq8Index(spark, path,
      emb.filter(F.col("vec_id") % 2 =!= 0), "vec_id", "embedding")
    assert(java.util.Arrays.equals(m1.lo, m0.lo), "append keeps the bounds")
    assert(grown.count() == emb.count())
    val (_, pruned) = ScalarQuant.removeFromSq8Index(spark, path,
      emb.filter(F.col("vec_id") % 7 === 0).select("vec_id"), "vec_id")
    val expect = emb.filter(F.col("vec_id") % 7 =!= 0).count()
    assert(pruned.count() == expect)
    val (m2, compacted) = ScalarQuant.compactSq8Index(spark, path, 2)
    assert(java.util.Arrays.equals(m2.lo, m0.lo) && compacted.count() == expect)
    // the policy dial: quiet at a loose file budget, fires at a tight
    // one, quiet again after the fold
    assert(!ScalarQuant.maybeCompactSq8Index(spark, path, maxFiles = 50))
    assert(ScalarQuant.maybeCompactSq8Index(spark, path,
      maxFiles = 1, targetFiles = 1))
    assert(!ScalarQuant.maybeCompactSq8Index(spark, path, maxFiles = 1))
    // a +25 shift clips nearly everything -> the dial fires and the
    // rebuilt bounds absorb the corpus it was given
    val shiftU = F.udf((v: Seq[Float]) => v.map(x => x + 25.0f).toArray)
    val shifted = emb.limit(100).select(F.col("vec_id"),
      shiftU(F.col("embedding")).as("embedding"))
    val (fired, frac) = ScalarQuant.maybeRetrainSq8Index(spark, path,
      shifted, emb, "vec_id", "embedding")
    assert(fired && frac > 0.5)
    val (m3, re) = ScalarQuant.loadSq8Index(spark, path)
    assert(!java.util.Arrays.equals(m3.lo, m0.lo), "bounds retrained")
    assert(re.count() == emb.count(), "rebuild absorbed the full corpus")
  }
}
