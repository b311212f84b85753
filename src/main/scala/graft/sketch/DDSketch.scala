package graft.sketch

import java.util.Arrays

/**
 * A store of (bin index → count) pairs kept sorted by index, backed by
 * parallel primitive arrays (no per-bin boxing; cheap to serialize).
 *
 * Semantics mirror the reference's sorted `Vec<(i32, f64)>` store
 * (reference: src/datadog_encoding.rs:231-235, 755-765) but the
 * representation is our own: amortized-growth arrays with binary-search
 * insertion and linear two-way merge.
 */
final class BinStore extends Serializable {
  private var idx: Array[Int] = new Array[Int](8)
  private var cnt: Array[Double] = new Array[Double](8)
  private var n: Int = 0

  def size: Int = n
  def indexAt(i: Int): Int = idx(i)
  def countAt(i: Int): Double = cnt(i)
  def isEmpty: Boolean = n == 0

  def clear(): Unit = n = 0

  private def grow(minCap: Int): Unit = {
    if (minCap > idx.length) {
      val newCap = math.max(minCap, idx.length * 2)
      idx = Arrays.copyOf(idx, newCap)
      cnt = Arrays.copyOf(cnt, newCap)
    }
  }

  /** Add `count` to bin `index`, inserting it in sorted position if absent. */
  def add(index: Int, count: Double): Unit = {
    val pos = Arrays.binarySearch(idx, 0, n, index)
    if (pos >= 0) {
      cnt(pos) += count
    } else {
      val ins = -pos - 1
      grow(n + 1)
      System.arraycopy(idx, ins, idx, ins + 1, n - ins)
      System.arraycopy(cnt, ins, cnt, ins + 1, n - ins)
      idx(ins) = index
      cnt(ins) = count
      n += 1
    }
  }

  /** Append a bin known to have index greater than every existing one. */
  def append(index: Int, count: Double): Unit = {
    grow(n + 1)
    idx(n) = index
    cnt(n) = count
    n += 1
  }

  def totalCount: Double = {
    var s = 0.0
    var i = 0
    while (i < n) { s += cnt(i); i += 1 }
    s
  }

  /** Index-wise count addition of two sorted stores (linear merge). */
  def mergeFrom(other: BinStore): Unit = {
    if (other.n == 0) return
    if (n == 0) {
      grow(other.n)
      System.arraycopy(other.idx, 0, idx, 0, other.n)
      System.arraycopy(other.cnt, 0, cnt, 0, other.n)
      n = other.n
      return
    }
    val ri = new Array[Int](n + other.n)
    val rc = new Array[Double](n + other.n)
    var i = 0; var j = 0; var k = 0
    while (i < n && j < other.n) {
      val a = idx(i); val b = other.idx(j)
      if (a == b) { ri(k) = a; rc(k) = cnt(i) + other.cnt(j); i += 1; j += 1 }
      else if (a < b) { ri(k) = a; rc(k) = cnt(i); i += 1 }
      else { ri(k) = b; rc(k) = other.cnt(j); j += 1 }
      k += 1
    }
    while (i < n) { ri(k) = idx(i); rc(k) = cnt(i); i += 1; k += 1 }
    while (j < other.n) { ri(k) = other.idx(j); rc(k) = other.cnt(j); j += 1; k += 1 }
    idx = ri; cnt = rc; n = k
  }

  def copy(): BinStore = {
    val s = new BinStore
    s.idx = Arrays.copyOf(idx, math.max(n, 8))
    s.cnt = Arrays.copyOf(cnt, math.max(n, 8))
    s.n = n
    s
  }
}

/**
 * Mergeable quantile sketch with bounded relative error, wire-compatible
 * with DataDog sketches-go v1.4.7 (via [[DataDogCodec]]).
 *
 * Semantics match the reference extension's in-memory model
 * (reference: src/datadog_encoding.rs:224-766):
 *  - gamma = 1 + 2a/(1-a) for relative accuracy a (rs:265-271)
 *  - value→bin: ceil(ln(v)/ln(gamma) + indexOffset) (rs:750-753)
 *  - bin→value: gamma^(index-indexOffset) * (1 + (1 - 2/(1+gamma))) (rs:709-715)
 *  - quantile: rank = q*(count-1); negative store scanned with reversed
 *    rank; bin chosen by strict `cumulative > rank` (rs:646-715)
 *  - merge requires |gamma1-gamma2| <= 1e-10 and same indexOffset (rs:598-607)
 */
final class DDSketch(
    private var _gamma: Double,
    var indexOffset: Double
) extends Serializable {

  val positives: BinStore = new BinStore
  val negatives: BinStore = new BinStore
  var zeroCount: Double = 0.0
  var sum: Double = 0.0
  var count: Double = 0.0
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  // Cached ln(gamma); 0.0 marks "not yet computed" so the cache
  // self-heals after any serialization path that skips transient fields.
  // The mapping divides by it (never multiplies by a reciprocal) to stay
  // last-ulp-identical with the reference's ln(v)/ln(gamma).
  @transient private var logGammaCache: Double = 0.0

  private def logGamma: Double = {
    if (logGammaCache == 0.0) logGammaCache = math.log(_gamma)
    logGammaCache
  }

  def gamma: Double = _gamma
  def gamma_=(g: Double): Unit = { _gamma = g; logGammaCache = 0.0 }

  def isEmpty: Boolean = count == 0.0

  def relativeAccuracy: Double = 1.0 - 2.0 / (1.0 + _gamma)

  def valueToBin(value: Double): Int = {
    val d = math.ceil(math.log(value) / logGamma + indexOffset)
    if (d.isNaN) 0
    else if (d >= Int.MaxValue.toDouble) Int.MaxValue
    else if (d <= Int.MinValue.toDouble) Int.MinValue
    else d.toInt
  }

  def binToValue(index: Int): Double = {
    val lowerBound = math.pow(_gamma, index.toDouble - indexOffset)
    lowerBound * (1.0 + relativeAccuracy)
  }

  def add(value: Double): Unit = addWithCount(value, 1.0)

  def addWithCount(value: Double, c: Double): Unit = {
    if (c.isNaN || c <= 0.0) return   // reference skips non-positive counts (datadog_encoding.rs:723-726)
    count += c
    sum += value * c
    if (value < min) min = value
    if (value > max) max = value
    if (value == 0.0) zeroCount += c
    else if (value > 0.0) positives.add(valueToBin(value), c)
    else negatives.add(valueToBin(-value), c)
  }

  /** Merge `other` into this sketch; throws on mapping mismatch. */
  def merge(other: DDSketch): Unit = {
    if (math.abs(_gamma - other._gamma) > 1e-10)
      throw new IllegalArgumentException("Cannot merge sketches with different gamma values")
    if (math.abs(indexOffset - other.indexOffset) > 1e-10)
      throw new IllegalArgumentException("Cannot merge sketches with different index_offset values")
    positives.mergeFrom(other.positives)
    negatives.mergeFrom(other.negatives)
    zeroCount += other.zeroCount
    sum += other.sum
    count += other.count
    min = math.min(min, other.min)
    max = math.max(max, other.max)
  }

  /** Value at quantile q in [0,1]; NaN if empty or q out of range. */
  def quantile(q: Double): Double = {
    if (count == 0.0 || q < 0.0 || q > 1.0) return Double.NaN
    val rank: Double = q * (count - 1.0)
    val negativeCount = negatives.totalCount
    if (rank < negativeCount) {
      val negRank = negativeCount - 1.0 - rank
      return -keyAtRank(negatives, negRank)
    }
    if (rank < negativeCount + zeroCount) return 0.0
    val posRank = rank - zeroCount - negativeCount
    keyAtRank(positives, posRank)
  }

  // Strict `cumulative > rank` bin selection (Go KeyAtRank compatibility).
  private def keyAtRank(bins: BinStore, rank0: Double): Double = {
    val rank = if (rank0 < 0.0) 0.0 else rank0
    var cumulative = 0.0
    var i = 0
    val n = bins.size
    while (i < n) {
      cumulative += bins.countAt(i)
      if (cumulative > rank) return binToValue(bins.indexAt(i))
      i += 1
    }
    if (n > 0) binToValue(bins.indexAt(n - 1)) else 0.0
  }

  /**
   * Approximate CDF: fraction of values <= x (the inverse of
   * [[quantile]]; e.g. SLO compliance "share of requests under 100ms").
   * Accuracy is in the value domain: the result is the exact fraction
   * of values whose bin representative (bin_to_value, which overshoots
   * the bin's upper bound by the accuracy margin) is <= x. Every value
   * counted satisfies v < x, and every v <= x/(gamma*(1+a)) — about
   * x*0.97 at the default a=0.01 — is guaranteed counted, mirroring
   * the forward quantile's bin_to_value overshoot. NaN if empty.
   */
  def cdf(x: Double): Double = {
    if (count == 0.0 || x.isNaN) return Double.NaN
    var c = 0.0
    var i = 0
    val nn = negatives.size
    while (i < nn) {
      if (-binToValue(negatives.indexAt(i)) <= x) c += negatives.countAt(i)
      i += 1
    }
    if (x >= 0.0) c += zeroCount
    i = 0
    val np = positives.size
    while (i < np) {
      if (binToValue(positives.indexAt(i)) <= x) c += positives.countAt(i)
      i += 1
    }
    c / count
  }

  def countLong: Long = count.toLong
  def sumOpt: Option[Double] = if (count > 0.0) Some(sum) else None
  def minOpt: Option[Double] = if (count > 0.0 && !min.isInfinite && !min.isNaN) Some(min) else None
  def maxOpt: Option[Double] = if (count > 0.0 && !max.isInfinite && !max.isNaN) Some(max) else None
  def avgOpt: Option[Double] = if (count > 0.0) Some(sum / count) else None

  /** Post-decode recomputation of count from bin counts (exact). */
  def recomputeCountFromBins(): Unit =
    count = positives.totalCount + negatives.totalCount + zeroCount

  /** Post-decode recomputation of sum from bin midpoints (lossy). */
  def recomputeSumFromBins(): Unit = {
    var s = 0.0
    var i = 0
    while (i < positives.size) { s += binToValue(positives.indexAt(i)) * positives.countAt(i); i += 1 }
    i = 0
    while (i < negatives.size) { s -= binToValue(negatives.indexAt(i)) * negatives.countAt(i); i += 1 }
    sum = s
  }

  /** Post-decode recomputation of min/max from bin midpoints. */
  def recomputeMinMaxFromBins(): Unit = {
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < negatives.size) {
      if (negatives.countAt(i) > 0.0) {
        val v = -binToValue(negatives.indexAt(i))
        if (v < mn) mn = v
        if (v > mx) mx = v
      }
      i += 1
    }
    if (zeroCount > 0.0) {
      if (0.0 < mn) mn = 0.0
      if (0.0 > mx) mx = 0.0
    }
    i = 0
    while (i < positives.size) {
      if (positives.countAt(i) > 0.0) {
        val v = binToValue(positives.indexAt(i))
        if (v < mn) mn = v
        if (v > mx) mx = v
      }
      i += 1
    }
    if (!mn.isInfinite) min = mn
    if (!mx.isInfinite) max = mx
  }

  def copySketch(): DDSketch = {
    val s = new DDSketch(_gamma, indexOffset)
    s.positives.mergeFrom(positives)
    s.negatives.mergeFrom(negatives)
    s.zeroCount = zeroCount
    s.sum = sum
    s.count = count
    s.min = min
    s.max = max
    s
  }
}

object DDSketch {
  val DefaultRelativeAccuracy = 0.01

  /** New empty sketch for the given relative accuracy. */
  def apply(relativeAccuracy: Double = DefaultRelativeAccuracy): DDSketch =
    new DDSketch(1.0 + 2.0 * relativeAccuracy / (1.0 - relativeAccuracy), 0.0)
}
