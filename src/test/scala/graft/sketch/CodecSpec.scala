package graft.sketch

import java.io.ByteArrayOutputStream
import org.scalatest.funsuite.AnyFunSuite
import DataDogCodec._

/**
 * Primitive codec vectors ported from the reference test suite
 * (reference: src/datadog_encoding.rs:773-861), themselves derived from
 * DataDog sketches-go encoding_test.go.
 */
class CodecSpec extends AnyFunSuite {

  private def uvarintBytes(v: Long): Array[Byte] = {
    val o = new ByteArrayOutputStream(); writeUvarint(o, v); o.toByteArray
  }
  private def varintBytes(v: Long): Array[Byte] = {
    val o = new ByteArrayOutputStream(); writeVarint(o, v); o.toByteArray
  }
  private def varfloatBytes(v: Double): Array[Byte] = {
    val o = new ByteArrayOutputStream(); writeVarfloat(o, v); o.toByteArray
  }

  test("uvarint DataDog vectors") {
    val cases: Seq[(Long, Seq[Int])] = Seq(
      0L -> Seq(0x00),
      127L -> Seq(0x7F),
      128L -> Seq(0x80, 0x01),
      -1L /* u64::MAX */ -> Seq(0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0x01)
    )
    for ((value, expected) <- cases) {
      assert(uvarintBytes(value).map(_ & 0xFF).toSeq == expected, s"encode $value")
      assert(readUvarint(new ByteReader(expected.map(_.toByte).toArray)) == value, s"decode $value")
    }
  }

  test("zig-zag varint DataDog vectors") {
    val cases: Seq[(Long, Seq[Int])] = Seq(
      0L -> Seq(0x00),
      1L -> Seq(0x02),
      -1L -> Seq(0x01),
      -64L -> Seq(0x7F),
      Long.MaxValue -> Seq(0xFE, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0x01)
    )
    for ((value, expected) <- cases) {
      assert(varintBytes(value).map(_ & 0xFF).toSeq == expected, s"encode $value")
      assert(readVarint(new ByteReader(expected.map(_.toByte).toArray)) == value, s"decode $value")
    }
  }

  test("uvarint roundtrip") {
    for (v <- Seq(0L, 1L, 127L, 128L, 16383L, 16384L, -1L)) {
      assert(readUvarint(new ByteReader(uvarintBytes(v))) == v)
    }
  }

  test("varint roundtrip") {
    for (v <- Seq(0L, 1L, -1L, 63L, -64L, 64L, -65L, Long.MinValue, Long.MaxValue)) {
      assert(readVarint(new ByteReader(varintBytes(v))) == v)
    }
  }

  test("varfloat64 roundtrip incl f64 extremes") {
    for (v <- Seq(0.0, 1.0, -1.0, math.Pi, Double.MinValue, Double.MaxValue,
                  1.5e-300, 123456789.0, 6235.0)) {
      val decoded = readVarfloat(new ByteReader(varfloatBytes(v)))
      assert(math.abs(v - decoded) < 1e-15 || v == decoded, s"varfloat roundtrip $v -> $decoded")
    }
  }

  test("float64 LE roundtrip") {
    for (v <- Seq(0.0, 1.0202020202020203, -3.5, Double.MaxValue)) {
      val o = new ByteArrayOutputStream(); writeFloat64LE(o, v)
      assert(readFloat64LE(new ByteReader(o.toByteArray)) == v)
    }
  }
}
