package graft.sketch

import java.io.ByteArrayOutputStream

/**
 * DataDog DDSketch wire format (sketches-go v1.4.7 compatible).
 *
 * Format semantics per the reference extension's codec
 * (reference: src/datadog_encoding.rs:27-595):
 *  - stream of flag-prefixed sections; flag byte = (subflag << 2) | type,
 *    type in the 2 LSB: SketchFeatures=0b00, PositiveStore=0b01,
 *    IndexMapping=0b10, NegativeStore=0b11 (rs:33-96)
 *  - IndexMapping payload: gamma, indexOffset as f64-LE (rs:342-349)
 *  - store bin encodings on decode: IndexDeltasAndCounts=1, IndexDeltas=2,
 *    ContiguousCounts=3 (rs:80-86, 511-565); encoder writes only
 *    IndexDeltasAndCounts (rs:351-378)
 *  - SketchFeatures subflags: ZeroCount=1 (varfloat64), Sum=0x21,
 *    Min=0x22, Max=0x23 (f64-LE), Count=0x28 (varfloat64) (rs:54-68,
 *    567-595); the encoder deliberately writes only ZeroCount — decoders
 *    recompute stats from bins (Go-compat quirk, rs:327-339)
 *  - primitives: LSB-first uvarint; zig-zag varint; varfloat64 =
 *    rotl((v+1).bits - 1.0.bits, 6) emitted MSB-first 7 bits/byte,
 *    max 9 bytes (rs:103-205)
 */
object DataDogCodec {

  // Flag types (2 LSB)
  private final val TypeSketchFeatures = 0x00
  private final val TypePositiveStore = 0x01
  private final val TypeIndexMapping = 0x02
  private final val TypeNegativeStore = 0x03

  // Subflags
  private final val SubLogarithmicMapping = 0
  private final val SubZeroCount = 0x01
  private final val SubSum = 0x21
  private final val SubMin = 0x22
  private final val SubMax = 0x23
  private final val SubCount = 0x28
  private final val BinIndexDeltasAndCounts = 1
  private final val BinIndexDeltas = 2
  private final val BinContiguousCounts = 3

  private final val VarfloatRotate = 6
  private final val MaxVarLen64 = 9

  private def makeFlag(tpe: Int, subflag: Int): Int = (subflag << 2) | tpe

  final class CodecException(msg: String) extends RuntimeException(msg)

  // ---------------------------------------------------------------- writers

  def writeUvarint(out: ByteArrayOutputStream, value0: Long): Unit = {
    var value = value0
    // unsigned comparison: loop while value >= 0x80 as unsigned 64-bit
    while (java.lang.Long.compareUnsigned(value, 0x80L) >= 0) {
      out.write(((value & 0x7F) | 0x80).toInt)
      value >>>= 7
    }
    out.write(value.toInt)
  }

  def writeVarint(out: ByteArrayOutputStream, value: Long): Unit =
    writeUvarint(out, (value << 1) ^ (value >> 63))

  def writeVarfloat(out: ByteArrayOutputStream, v: Double): Unit = {
    val floatBits1 = java.lang.Double.doubleToLongBits(1.0)
    var x = java.lang.Long.rotateLeft(
      java.lang.Double.doubleToLongBits(v + 1.0) - floatBits1, VarfloatRotate)
    var i = 0
    while (i < MaxVarLen64 - 1) {
      val n = (x >>> (64 - 7)).toInt
      x <<= 7
      if (x == 0L) { out.write(n); return }
      out.write(n | 0x80)
      i += 1
    }
    out.write((x >>> (8 * 7)).toInt)
  }

  def writeFloat64LE(out: ByteArrayOutputStream, v: Double): Unit = {
    var bits = java.lang.Double.doubleToLongBits(v)
    var i = 0
    while (i < 8) { out.write((bits & 0xFF).toInt); bits >>>= 8; i += 1 }
  }

  // ---------------------------------------------------------------- reader

  /** Minimal positional reader over the input array. */
  final class ByteReader(val data: Array[Byte]) {
    var pos: Int = 0
    def hasMore: Boolean = pos < data.length
    def readByte(): Int = {
      if (pos >= data.length) throw new CodecException("unexpected end of input")
      val b = data(pos) & 0xFF
      pos += 1
      b
    }
  }

  def readUvarint(r: ByteReader): Long = {
    var result = 0L
    var shift = 0
    var done = false
    while (!done) {
      val b = r.readByte()
      result |= (b & 0x7FL) << shift
      if (b < 0x80) done = true
      else {
        shift += 7
        if (shift >= 64) throw new CodecException("varint overflow")
      }
    }
    result
  }

  def readVarint(r: ByteReader): Long = {
    val z = readUvarint(r)
    (z >>> 1) ^ -(z & 1L)
  }

  def readVarfloat(r: ByteReader): Double = {
    var x = 0L
    var s = 64 - 7
    var i = 0
    var done = false
    while (!done && i < MaxVarLen64) {
      val n = r.readByte()
      if (i == MaxVarLen64 - 1) { x |= n.toLong; done = true }
      else if (n < 0x80) { x |= n.toLong << s; done = true }
      else {
        x |= (n & 0x7FL) << s
        s = math.max(s - 7, 0)
      }
      i += 1
    }
    val floatBits1 = java.lang.Double.doubleToLongBits(1.0)
    val bits = java.lang.Long.rotateRight(x, VarfloatRotate) + floatBits1
    java.lang.Double.longBitsToDouble(bits) - 1.0
  }

  def readFloat64LE(r: ByteReader): Double = {
    var bits = 0L
    var i = 0
    while (i < 8) { bits |= (r.readByte().toLong & 0xFF) << (8 * i); i += 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  // ---------------------------------------------------------------- encode

  def encode(s: DDSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    // 1. index mapping: f64-LE gamma + indexOffset
    out.write(makeFlag(TypeIndexMapping, SubLogarithmicMapping))
    writeFloat64LE(out, s.gamma)
    writeFloat64LE(out, s.indexOffset)
    // 2./3. stores, delta-encoded indices + varfloat counts
    if (s.positives.size > 0) writeStore(out, TypePositiveStore, s.positives)
    if (s.negatives.size > 0) writeStore(out, TypeNegativeStore, s.negatives)
    // 4. zero count; Sum/Count/Min/Max intentionally never written
    if (s.zeroCount > 0.0) {
      out.write(makeFlag(TypeSketchFeatures, SubZeroCount))
      writeVarfloat(out, s.zeroCount)
    }
    out.toByteArray
  }

  private def writeStore(out: ByteArrayOutputStream, tpe: Int, bins: BinStore): Unit = {
    out.write(makeFlag(tpe, BinIndexDeltasAndCounts))
    writeUvarint(out, bins.size.toLong)
    var prev = 0
    var i = 0
    while (i < bins.size) {
      val index = bins.indexAt(i)
      writeVarint(out, (index - prev).toLong)
      writeVarfloat(out, bins.countAt(i))
      prev = index
      i += 1
    }
  }

  // ---------------------------------------------------------------- decode

  /** Decode a sketch; throws [[CodecException]] on malformed input. */
  def decode(data: Array[Byte]): DDSketch = decode(data, 0)

  /** Decode starting at `offset` (for formats embedding a sketch). */
  def decode(data: Array[Byte], offset: Int): DDSketch = {
    val r = new ByteReader(data)
    r.pos = offset
    val s = DDSketch(DDSketch.DefaultRelativeAccuracy)
    var hasExplicitCount = false
    var hasExplicitSum = false

    while (r.hasMore) {
      val flag = r.readByte()
      val subflag = flag >> 2
      (flag & 0x03) match {
        case TypeIndexMapping =>
          // subflags 0-4 all carry two f64-LE values
          if (subflag < 0 || subflag > 4)
            throw new CodecException(s"Unknown index mapping subflag: $subflag")
          s.gamma = readFloat64LE(r)
          s.indexOffset = readFloat64LE(r)
        case TypePositiveStore =>
          readStoreInto(r, subflag, s.positives)
        case TypeNegativeStore =>
          readStoreInto(r, subflag, s.negatives)
        case TypeSketchFeatures =>
          subflag match {
            case SubZeroCount => s.zeroCount = readVarfloat(r)
            case SubSum => s.sum = readFloat64LE(r); hasExplicitSum = true
            case SubMin => s.min = readFloat64LE(r)
            case SubMax => s.max = readFloat64LE(r)
            case SubCount => s.count = readVarfloat(r); hasExplicitCount = true
            case _ => () // unknown feature: ignored (matches reference rs:588-592)
          }
      }
    }

    if (!hasExplicitCount) s.recomputeCountFromBins()
    if (!hasExplicitSum) s.recomputeSumFromBins()
    if (s.min.isInfinite || s.max.isInfinite || s.min.isNaN || s.max.isNaN)
      s.recomputeMinMaxFromBins()
    s
  }

  private def readStoreInto(r: ByteReader, subflag: Int, store: BinStore): Unit = {
    store.clear()
    subflag match {
      case BinIndexDeltasAndCounts =>
        val numBins = readUvarint(r).toInt
        var prev = 0
        var i = 0
        while (i < numBins) {
          val index = prev + readVarint(r).toInt
          val c = readVarfloat(r)
          storeAddDecoded(store, index, c)
          prev = index
          i += 1
        }
      case BinIndexDeltas =>
        val numBins = readUvarint(r).toInt
        var prev = 0
        var i = 0
        while (i < numBins) {
          val index = prev + readVarint(r).toInt
          storeAddDecoded(store, index, 1.0)
          prev = index
          i += 1
        }
      case BinContiguousCounts =>
        val numBins = readUvarint(r).toInt
        val startIndex = readVarint(r).toInt
        val indexDelta = readVarint(r).toInt
        var index = startIndex
        var i = 0
        while (i < numBins) {
          storeAddDecoded(store, index, readVarfloat(r))
          index += indexDelta
          i += 1
        }
      case other =>
        throw new CodecException(s"Unknown bin encoding subflag: $other")
    }
  }

  // Deltas are normally ascending → O(1) append; fall back to sorted insert.
  private def storeAddDecoded(store: BinStore, index: Int, c: Double): Unit = {
    if (store.size == 0 || index > store.indexAt(store.size - 1)) store.append(index, c)
    else store.add(index, c)
  }

  // ---------------------------------------------------------------- helpers

  def hexToBytes(hex: String): Array[Byte] = {
    val n = hex.length / 2
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  def bytesToHex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xFF}%02x"))
    sb.toString
  }
}
