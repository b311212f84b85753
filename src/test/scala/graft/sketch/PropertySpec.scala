package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/**
 * Property-style checks (FIXTURES.md plan A) over seeded random inputs:
 * encode/decode stability, merge algebra, quantile accuracy bound,
 * codec robustness. Deterministic (fixed seeds), 200 cases per law.
 */
class PropertySpec extends AnyFunSuite {

  private val Cases = 200

  private def mixedVals(rnd: Random): Array[Double] = {
    val n = 1 + rnd.nextInt(60)
    Array.fill(n) {
      rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 2e6 - 1e6
        case 1 => 0.0
        case 2 => rnd.nextDouble() * 1e-3 + 1e-9
        case _ => rnd.nextDouble() * 1e9 + 1e-6
      }
    }
  }

  private def positiveVals(rnd: Random): Array[Double] = {
    val n = 1 + rnd.nextInt(200)
    Array.fill(n)(math.exp(rnd.nextDouble() * 20 - 6)) // 1e-3 .. 1e6, log-spread
  }

  private def mk(vals: Seq[Double]): DDSketch = {
    val s = DDSketch(0.01)
    vals.foreach(s.add)
    s
  }

  test("encode-decode preserves count exactly and bins structurally") {
    val rnd = new Random(1)
    (1 to Cases).foreach { _ =>
      val s = mk(mixedVals(rnd))
      val d = DataDogCodec.decode(DataDogCodec.encode(s))
      assert(d.count == s.count)
      assert(d.zeroCount == s.zeroCount)
      assert(d.positives.size == s.positives.size)
      assert(d.negatives.size == s.negatives.size)
    }
  }

  test("encode is stable: decode-encode round-trip is byte-identical") {
    val rnd = new Random(2)
    (1 to Cases).foreach { _ =>
      val b1 = DataDogCodec.encode(mk(mixedVals(rnd)))
      val b2 = DataDogCodec.encode(DataDogCodec.decode(b1))
      assert(java.util.Arrays.equals(b1, b2))
    }
  }

  test("merge is commutative on encoded form") {
    val rnd = new Random(3)
    (1 to Cases).foreach { _ =>
      val (va, vb) = (mixedVals(rnd), mixedVals(rnd))
      val ab = mk(va); ab.merge(mk(vb))
      val ba = mk(vb); ba.merge(mk(va))
      assert(java.util.Arrays.equals(DataDogCodec.encode(ab), DataDogCodec.encode(ba)))
    }
  }

  test("merge is associative on encoded form") {
    val rnd = new Random(4)
    (1 to Cases).foreach { _ =>
      val (va, vb, vc) = (mixedVals(rnd), mixedVals(rnd), mixedVals(rnd))
      val l = mk(va); l.merge(mk(vb)); l.merge(mk(vc))
      val bc = mk(vb); bc.merge(mk(vc))
      val r = mk(va); r.merge(bc)
      assert(java.util.Arrays.equals(DataDogCodec.encode(l), DataDogCodec.encode(r)))
    }
  }

  test("quantile stays within relative accuracy of the rank order statistic") {
    val rnd = new Random(5)
    (1 to Cases).foreach { _ =>
      val vals = positiveVals(rnd)
      val q = rnd.nextDouble()
      val s = mk(vals)
      val sorted = vals.sorted
      val exact = sorted(math.floor(q * (vals.length - 1)).toInt)
      val approx = s.quantile(q)
      // bin value lands within ~2.1% above the true value for alpha=0.01
      // (gamma overshoot, SURVEY.md §1.2); 3.5% leaves fp slack
      assert(math.abs(approx - exact) <= exact * 0.035 + 1e-12,
        s"q=$q exact=$exact approx=$approx n=${vals.length}")
    }
  }

  test("decoder never crashes on arbitrary byte garbage") {
    val rnd = new Random(6)
    (1 to 2000).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      try { DataDogCodec.decode(bytes); () }
      catch { case _: DataDogCodec.CodecException => () }
    }
  }

  test("varint/varfloat primitives round-trip for arbitrary values") {
    val rnd = new Random(7)
    (1 to Cases).foreach { _ =>
      val v = rnd.nextLong()
      val o = new java.io.ByteArrayOutputStream()
      DataDogCodec.writeVarint(o, v)
      assert(DataDogCodec.readVarint(new DataDogCodec.ByteReader(o.toByteArray)) == v)
      val d = (rnd.nextDouble() - 0.5) * 2e12
      val o2 = new java.io.ByteArrayOutputStream()
      DataDogCodec.writeVarfloat(o2, d)
      val back = DataDogCodec.readVarfloat(new DataDogCodec.ByteReader(o2.toByteArray))
      assert(back == d, s"varfloat $d -> $back")
    }
  }
}
