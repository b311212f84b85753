package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  private def exactKs(xs: Seq[Double], ys: Seq[Double]): (Long, Long, Long) = {
    val na = xs.size.toLong; val nb = ys.size.toLong
    val pts = (xs ++ ys).distinct.sorted
    val d = pts.map { p =>
      val ca = xs.count(_ <= p).toLong; val cb = ys.count(_ <= p).toLong
      math.abs(ca * nb - cb * na)
    }.max
    (d, na, nb)
  }

  test("ksStatistic matches driver-exact KS, independent of bucket count") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      // ties on purpose: quantized gaussians with different spread
      val xs = Seq.fill(300)(math.round(rnd.nextGaussian() * 10) / 4.0)
      val ys = Seq.fill(200)(math.round(rnd.nextGaussian() * 14 + 4) / 4.0)
      val (dn, na, nb) = exactKs(xs, ys)
      val a = xs.toDF("v"); val b = ys.toDF("v")
      for (buckets <- Seq(1, 4, 64)) {
        val row = Drift.ksStatistic(a, b, "v", buckets).first()
        assert(row.getLong(0) == dn, s"seed=$seed buckets=$buckets")
        assert(row.getLong(1) == na && row.getLong(2) == nb)
        assert(math.abs(row.getDouble(3) - dn.toDouble / (na * nb)) < 1e-15)
      }
    }
  }

  test("ksStatistic: identical inputs give d = 0; nulls and NaNs excluded") {
    val a = Seq(Some(1.0), Some(2.0), None, Some(Double.NaN)).toDF("v")
    val row = Drift.ksStatistic(a, a, "v").first()
    assert(row.getLong(0) == 0L && row.getLong(1) == 2L && row.getLong(2) == 2L)
    assert(row.getDouble(3) == 0.0)
  }

  test("ksStatisticSketch tracks the exact statistic within sketch error") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(2000)(math.exp(rnd.nextGaussian()))
    val ys = Seq.fill(2000)(math.exp(rnd.nextGaussian() * 1.3 + 0.4))
    val (dn, na, nb) = exactKs(xs, ys)
    val exact = dn.toDouble / (na * nb)
    val est = Drift.ksStatisticSketch(xs.toDF("v"), ys.toDF("v"), "v", 0.01)
      .first().getDouble(0)
    assert(math.abs(est - exact) < 0.05, s"exact=$exact est=$est")
  }

  test("psiBins: exact counts over the full bin range, empty bins included") {
    val a = Seq(0.1, 0.2, 0.6, 1.5, 9.0).toDF("v")
    val b = Seq(0.5, 2.5, 2.6).toDF("v")
    val got = Drift.psiBins(a, b, "v", Seq(0.5, 2.0, 5.0))
      .orderBy("bin").as[(Int, Long, Long)].collect().toSeq
    // bins: (-inf,0.5] (0.5,2] (2,5] (5,inf)
    assert(got == Seq((0, 2L, 1L), (1, 2L, 0L), (2, 0L, 2L), (3, 1L, 0L)))
  }

  test("psiStatistic matches the smoothed driver formula at 4dp") {
    val a = Seq(0.1, 0.2, 0.6, 1.5, 9.0); val b = Seq(0.5, 2.5, 2.6)
    val counts = Seq((2L, 1L), (2L, 0L), (0L, 2L), (1L, 0L))
    val (na, nb2) = (5.0, 3.0); val k = 4
    val expected = counts.map { case (ca, cb) =>
      val pa = (ca + 1) / (na + k); val pb = (cb + 1) / (nb2 + k)
      (pa - pb) * math.log(pa / pb)
    }.sum
    val got = Drift.psiStatistic(a.toDF("v"), b.toDF("v"), "v", Seq(0.5, 2.0, 5.0))
      .first().getDouble(0)
    assert(math.abs(got - math.rint(expected * 1e4) / 1e4) < 1e-12)
  }

  test("chiSquareDrift: exact counts, zero contribution when mixes match") {
    val a = Seq("x", "x", "y").toDF("c")
    val b = Seq("x", "x", "x", "x", "y", "y").toDF("c")
    val got = Drift.chiSquareDrift(a, b, "c").orderBy("category")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(("x", 2L, 4L, Some(0.0)), ("y", 1L, 2L, Some(0.0))))
  }

  test("chiSquareDrift contribution matches the driver formula") {
    val a = Seq("x", "x", "x", "y").toDF("c")
    val b = Seq("x", "y", "y", "y", "y").toDF("c")
    val got = Drift.chiSquareDrift(a, b, "c").orderBy("category")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    def contrib(oa: Double, ob: Double, na: Double, nb: Double) = {
      val ea = (oa + ob) * na / (na + nb); val eb = (oa + ob) * nb / (na + nb)
      (oa - ea) * (oa - ea) / ea + (ob - eb) * (ob - eb) / eb
    }
    val ex = Seq("x" -> contrib(3, 1, 4, 5), "y" -> contrib(1, 4, 4, 5))
    got.zip(ex).foreach { case ((c, _, _, Some(v)), (ec, ev)) =>
      assert(c == ec && math.abs(v - math.rint(ev * 1e4) / 1e4) < 1e-12)
    }
  }

  test("embeddingDrift: hand-computed PSI, zero on identical distribution") {
    // hand fixture: frozen centroids +x/+y, occupancies planted directly
    val centroids = Array(Array(1f, 0f), Array(0f, 1f))
    val assigned = Seq(
      (1L, Array(0.9f, 0.1f), 0), (2L, Array(0.8f, 0.0f), 0),
      (3L, Array(1.0f, 0.2f), 0), (4L, Array(0.1f, 0.9f), 1))
      .toDF("neighbor_id", "__cv", "__cell")
    val idx = Similarity.IvfIndex(centroids, assigned)
    // batch occupancy (1, 3): vectors assign by nearest centroid
    val batch = Seq(
      Array(0.9f, 0.0f),
      Array(0.0f, 1.0f), Array(0.1f, 0.8f), Array(0.2f, 0.9f),
      null.asInstanceOf[Array[Float]]) // NULL skipped
      .toDF("embedding")
    val row = Drift.embeddingDrift(idx, batch, "embedding").head()
    assert(row.getLong(0) === 4L && row.getLong(1) === 4L)
    // pi = (4/6, 2/6), pb = (2/6, 4/6) with add-one smoothing (k = 2):
    // psi = 2 * (1/3) * ln(2) = 0.4621 at 4dp
    val expected = BigDecimal(2.0 * (1.0 / 3.0) * math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(2) === expected)
    // a batch with the index's own occupancy proportions is EXACTLY 0
    val same = assigned.select(F.col("__cv").as("embedding"))
    assert(Drift.embeddingDrift(idx, same, "embedding")
      .head().getDouble(2) === 0.0)
    // collapse onto one cell: psi rises well past the same-dist zero
    val skew = Seq.fill(20)(Array(1.0f, 0.0f)).toDF("embedding")
    assert(Drift.embeddingDrift(idx, skew, "embedding")
      .head().getDouble(2) > 0.3)
  }
}
