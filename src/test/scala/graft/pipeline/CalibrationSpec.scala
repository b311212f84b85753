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

  test("geometry-replacing ops delete the stale curve; recalibrate rebuilds it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cal_stale").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nlist = 4, iterations = 1).save(dir)
    Similarity.recalibrateIvfIndex(spark, dir, k = 5, nSample = 32)
    assert(Similarity.loadCalibration(spark, dir).isDefined)
    // an IVF retrain replaces the cells: the curve must NOT survive
    // (a stale curve would solve masses against dead geometry — the
    // stale-rotation rule applied to calibration)
    Similarity.retrainIvfIndex(spark, dir, nlist = 8, iterations = 1)
    assert(Similarity.loadCalibration(spark, dir).isEmpty,
      "stale calibration survived the retrain")
    val re = Similarity.recalibrateIvfIndex(spark, dir, k = 5, nSample = 32)
    assert(Similarity.loadCalibration(spark, dir).contains(re))

    // the HNSW twins: retrain AND incremental nav growth both re-route
    val hDir = java.nio.file.Files.createTempDirectory("graft_cal_hstale").toString
    Hnsw.buildHnswIndex(emb, "vec_id", "embedding",
      maxNav = 16, m = 8, efConstruction = 48, efAssign = 16).save(hDir)
    val hcal = Hnsw.calibrateProbe(Hnsw.loadHnswIndex(spark, hDir),
      k = 5, nSample = 32, efSearch = 16)
    Similarity.saveCalibration(spark, hDir, hcal)
    Hnsw.retrainHnswIndex(spark, hDir, maxNav = 16, m = 8, efConstruction = 48)
    assert(Similarity.loadCalibration(spark, hDir).isEmpty,
      "stale calibration survived the HNSW retrain")
    Similarity.saveCalibration(spark, hDir, hcal)
    Hnsw.addNavNodes(spark, hDir, emb.limit(100), "vec_id", "embedding",
      maxNewNav = 4)
    assert(Similarity.loadCalibration(spark, hDir).isEmpty,
      "stale calibration survived nav growth")
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
}
