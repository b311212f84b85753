package graft.sketch

/**
 * Static kernels invoked from generated code by the native scalar
 * expressions ([[DDSketchScalarExprs]]). Boxed returns keep the codegen
 * templates trivial: `null` means SQL NULL (decode failure or
 * empty-sketch semantics per the reference, lib.rs:191-602).
 */
object SketchKernels {

  private def decodeOrNull(blob: Array[Byte]): DDSketch =
    try DataDogCodec.decode(blob)
    catch { case _: Exception => null }

  def count(blob: Array[Byte]): java.lang.Long = {
    val s = decodeOrNull(blob)
    if (s == null) null else java.lang.Long.valueOf(s.countLong)
  }

  def cdf(blob: Array[Byte], x: Double): java.lang.Double = {
    val s = decodeOrNull(blob)
    if (s == null || s.count <= 0.0 || x.isNaN) null
    else java.lang.Double.valueOf(s.cdf(x))
  }

  def sum(blob: Array[Byte]): java.lang.Double = {
    val s = decodeOrNull(blob)
    if (s == null || s.count <= 0.0) null else java.lang.Double.valueOf(s.sum)
  }

  def min(blob: Array[Byte]): java.lang.Double = {
    val s = decodeOrNull(blob)
    if (s == null) null
    else s.minOpt match {
      case Some(v) => java.lang.Double.valueOf(v)
      case None => null
    }
  }

  def max(blob: Array[Byte]): java.lang.Double = {
    val s = decodeOrNull(blob)
    if (s == null) null
    else s.maxOpt match {
      case Some(v) => java.lang.Double.valueOf(v)
      case None => null
    }
  }

  def avg(blob: Array[Byte]): java.lang.Double = {
    val s = decodeOrNull(blob)
    if (s == null || s.count <= 0.0) null
    else java.lang.Double.valueOf(s.sum / s.count)
  }

  def quantile(blob: Array[Byte], q: Double): java.lang.Double = {
    val s = decodeOrNull(blob)
    if (s == null) null
    else {
      val v = s.quantile(q)
      if (java.lang.Double.isNaN(v)) null else java.lang.Double.valueOf(v)
    }
  }

  def add(blob: Array[Byte], value: Double): Array[Byte] = {
    val s = decodeOrNull(blob)
    if (s == null) null
    else {
      s.add(value)
      DataDogCodec.encode(s)
    }
  }

  /** Weighted insert, the reference's `add_with_count` semantics
    * (datadog_encoding.rs:718-747): `count <= 0` or NaN is a no-op,
    * not an error. */
  def addWeighted(blob: Array[Byte], value: Double, count: Double): Array[Byte] = {
    val s = decodeOrNull(blob)
    if (s == null) null
    else {
      if (!count.isNaN) s.addWithCount(value, count)
      DataDogCodec.encode(s)
    }
  }

  def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    val s1 = decodeOrNull(b1)
    val s2 = decodeOrNull(b2)
    if (s1 == null || s2 == null) null
    else {
      try { s1.merge(s2); DataDogCodec.encode(s1) }
      catch { case _: Exception => null }
    }
  }

  def create(accuracy: Double): Array[Byte] = {
    val a = if (accuracy > 0.0 && accuracy < 1.0) accuracy
            else DDSketch.DefaultRelativeAccuracy
    DataDogCodec.encode(DDSketch(a))
  }

  /** 5-field stats struct from ONE decode as a catalyst InternalRow —
    * the kernel behind the native `ddsketch_stats` expression. Field
    * order (count, sum, min, max, avg) per the reference lib.rs:609-615;
    * NULL struct on decode failure, NULL numeric fields on an empty
    * sketch. */
  def statsRow(blob: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val s = decodeOrNull(blob)
    if (s == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      s.countLong,
      s.sumOpt.map(Double.box).orNull,
      s.minOpt.map(Double.box).orNull,
      s.maxOpt.map(Double.box).orNull,
      s.avgOpt.map(Double.box).orNull))
  }

  /** [[histogram]] boxed as catalyst ArrayData for the native
    * `ddsketch_histogram` expression. */
  def histogramArray(
      blob: Array[Byte], lo: Double, hi: Double, nbins: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val a = histogram(blob, lo, hi, nbins)
    if (a == null) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(a)
  }

  /** Approximate equi-width histogram from one decode: bucket i of
    * nbins covers [lo + i*w, lo + (i+1)*w) with w = (hi-lo)/nbins, and
    * gets count * (cdf(right) - cdf(left)) — mass outside [lo, hi)
    * lands in no bucket. Each bucket's error is bounded by the sketch
    * mass within relative accuracy α of its edges. NULL on bad input,
    * empty sketch, or a degenerate range. */
  def histogram(blob: Array[Byte], lo: Double, hi: Double, nbins: Int): Array[Double] = {
    val s = decodeOrNull(blob)
    if (s == null || s.count <= 0.0 || nbins <= 0 || !(hi > lo) ||
        lo.isNaN || hi.isNaN || lo.isInfinite || hi.isInfinite) null
    else {
      val out = new Array[Double](nbins)
      val w = (hi - lo) / nbins
      // cdf is inclusive (P[X <= x]); approximate the half-open bucket
      // with consecutive cdf differences — edge mass lands exactly once
      var prev = s.cdf(math.nextDown(lo))
      var i = 0
      while (i < nbins) {
        val edge = if (i == nbins - 1) hi else lo + (i + 1) * w
        val c = s.cdf(math.nextDown(edge))
        out(i) = (c - prev) * s.count
        prev = c
        i += 1
      }
      out
    }
  }
}
