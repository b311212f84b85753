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
}
