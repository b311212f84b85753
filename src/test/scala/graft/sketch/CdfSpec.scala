package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

class CdfSpec extends SparkTestBase {
  import spark.implicits._

  private def sketchOf(values: Seq[Double]): Array[Byte] = {
    val s = DDSketch(0.01)
    values.foreach(s.add)
    DataDogCodec.encode(s)
  }

  test("cdf brackets the exact fraction within relative accuracy") {
    val values = (1 to 1000).map(_.toDouble)
    val s = DDSketch(0.01)
    values.foreach(s.add)
    // 3.5% margins: bin_to_value overshoots the bin upper bound, so the
    // guaranteed-counted set is v <= x/(gamma*(1+a)) ~= x*0.97
    for (x <- Seq(10.0, 100.0, 500.0, 999.0)) {
      val got = s.cdf(x)
      val lo = values.count(_ <= x * 0.965) / 1000.0
      val hi = values.count(_ <= x * 1.035) / 1000.0
      assert(got >= lo && got <= hi, s"cdf($x) = $got outside [$lo, $hi]")
    }
    assert(s.cdf(10000.0) === 1.0)
    assert(s.cdf(0.5) === 0.0)
    assert(s.cdf(0.0) === 0.0)      // all values positive
    assert(s.cdf(-5.0) === 0.0)
  }

  test("cdf handles negatives and zeros") {
    val s = DDSketch(0.01)
    Seq(-10.0, -1.0, 0.0, 0.0, 1.0, 10.0).foreach(s.add)
    assert(s.cdf(-20.0) === 0.0)
    assert(math.abs(s.cdf(-0.5) - 2.0 / 6.0) < 0.01)   // the two negatives
    assert(math.abs(s.cdf(0.0) - 4.0 / 6.0) < 0.01)    // negatives + zeros
    assert(s.cdf(100.0) === 1.0)
  }

  test("cdf is the approximate inverse of quantile") {
    val s = DDSketch(0.01)
    (1 to 10000).foreach(i => s.add(i.toDouble))
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val v = s.quantile(q)
      assert(math.abs(s.cdf(v) - q) < 0.03, s"cdf(quantile($q))")
    }
  }

  test("expression surface: NULL discipline and SQL registration") {
    Graft.register(spark)
    val blob = sketchOf((1 to 100).map(_.toDouble))
    val df = Seq(Tuple1(blob)).toDF("sk")
    val out = df.select(
      G.ddsketch_cdf(F.col("sk"), 50.0).as("c50"),
      G.ddsketch_cdf(F.lit(null).cast("binary"), F.lit(1.0)).isNull.as("null_ok"),
      G.ddsketch_cdf(F.lit(Array[Byte](9, 9)), F.lit(1.0)).isNull.as("garbage_ok"),
      G.ddsketch_cdf(F.col("sk"), F.lit(Double.NaN)).isNull.as("nan_ok"))
      .as[(Double, Boolean, Boolean, Boolean)].head()
    assert(math.abs(out._1 - 0.5) < 0.03)
    assert(out._2 && out._3 && out._4)

    df.createOrReplaceTempView("cdf_t")
    val sqlOut = spark.sql("SELECT ddsketch_cdf(sk, 25) AS c FROM cdf_t")
      .as[Double].head()
    assert(math.abs(sqlOut - 0.25) < 0.03)
  }

  // ------------------------------------------------------- histogram

  test("histogram buckets approximate exact counts and sum to in-range mass") {
    val values = (1 to 1000).map(_.toDouble)
    val blob = sketchOf(values)
    val h = SketchKernels.histogram(blob, 0.0, 1000.0, 10)
    assert(h.length === 10)
    // bucketing is on DECODED values, which overshoot by up to ~2α:
    // stored values just under 1000 can decode past the upper bound,
    // so in-range mass sits in the accuracy-bounded band
    assert(h.sum <= 999.0 + 1e-9 && h.sum >= values.count(_ <= 1000.0 / 1.04))
    // per-bucket: exact count ± the values within the ~2α edge blur
    for (i <- 0 until 10) {
      val exact = values.count(v => v >= i * 100.0 && v < (i + 1) * 100.0)
      val blur = 0.04 * (i + 1) * 100.0 * 2 + 1   // both edges
      assert(math.abs(h(i) - exact) <= blur, s"bucket $i: ${h(i)} vs $exact")
    }
  }

  test("histogram splits negative/zero/positive mass correctly") {
    val blob = sketchOf(Seq(-10.0, -1.0, 0.0, 0.0, 1.0, 10.0))
    val h = SketchKernels.histogram(blob, -20.0, 20.0, 4)
    // buckets: [-20,-10) [-10,0) [0,10) [10,20). Stored values decode
    // with ±α overshoot, so ±10 can land either side of a ±10 edge —
    // but the ZERO edge is exact (zeros are a dedicated store and
    // decoded signs never flip), so sign-level masses are exact.
    assert(math.abs(h.sum - 6.0) < 1e-9)
    assert(math.abs(h(0) + h(1) - 2.0) < 1e-9)   // the two negatives
    assert(math.abs(h(2) + h(3) - 4.0) < 1e-9)   // zeros + positives
  }

  test("histogram NULL discipline: bad range, empty sketch, garbage blob") {
    val blob = sketchOf(Seq(1.0, 2.0))
    assert(SketchKernels.histogram(blob, 5.0, 5.0, 4) === null)
    assert(SketchKernels.histogram(blob, 5.0, 1.0, 4) === null)
    assert(SketchKernels.histogram(blob, 1.0, 5.0, 0) === null)
    assert(SketchKernels.histogram(Array[Byte](9, 9), 0.0, 1.0, 4) === null)
    assert(SketchKernels.histogram(SketchKernels.create(0.01), 0.0, 1.0, 4) === null)
    // Column + SQL surface
    Graft.register(spark)
    val df = Seq(Tuple1(blob)).toDF("sk")
    val arr = df.select(G.ddsketch_histogram(F.col("sk"), 0.0, 4.0, 4).as("h"))
      .as[Seq[Double]].head()
    assert(arr.length === 4 && math.abs(arr.sum - 2.0) < 1e-9)
    df.createOrReplaceTempView("hist_t")
    val viaSql = spark.sql(
      "SELECT ddsketch_histogram(sk, CAST(0.0 AS DOUBLE), CAST(4.0 AS DOUBLE), 4) AS h FROM hist_t")
      .as[Seq[Double]].head()
    assert(viaSql === arr)
  }
}
