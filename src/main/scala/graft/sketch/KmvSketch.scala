package graft.sketch

import java.io.ByteArrayOutputStream

/**
 * KMV (k minimum values) sketch for approximate distinct counting and
 * containment/Jaccard similarity (pattern per GB-KMV, ICDE 2019 — see
 * PAPERS.md): keep the k smallest 64-bit element hashes; the k-th
 * smallest normalized hash estimates density, and the k-min set of a
 * union supports set-overlap estimation.
 *
 * Mergeable monoid (union = merge of hash sets, re-truncated to k), so
 * it composes with Spark partial aggregation exactly like DDSketch.
 */
final class KmvSketch(val k: Int) extends Serializable {
  require(k > 1, "k must exceed 1")

  // sorted ascending by UNSIGNED hash value; size <= k
  private var hashes: Array[Long] = new Array[Long](math.min(k, 16))
  private var n: Int = 0

  def size: Int = n
  def hashAt(i: Int): Long = hashes(i)
  def isEmpty: Boolean = n == 0

  private def unsignedLess(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  /** Current inclusion threshold (largest stored hash) if full. */
  private def thresholdExceeded(h: Long): Boolean =
    n == k && !unsignedLess(h, hashes(n - 1))

  def add(h: Long): Unit = {
    if (thresholdExceeded(h)) return
    // unsigned binary search
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (unsignedLess(hashes(mid), h)) lo = mid + 1 else hi = mid
    }
    if (lo < n && hashes(lo) == h) return // distinct-set semantics
    if (n < k && n == hashes.length)
      hashes = java.util.Arrays.copyOf(hashes, math.min(k, hashes.length * 2))
    val insert = lo
    val newN = math.min(n + 1, k)
    System.arraycopy(hashes, insert, hashes, insert + 1,
      math.min(n, k - 1) - insert)
    hashes(insert) = h
    n = newN
  }

  def merge(other: KmvSketch): Unit = {
    require(other.k == k, s"cannot merge KMV sketches with different k ($k vs ${other.k})")
    var i = 0
    while (i < other.n) { add(other.hashes(i)); i += 1 }
  }

  /** Approximate distinct count: exact while n < k, else (k-1)/u_k. */
  def distinctEstimate: Double = {
    if (n < k) n.toDouble
    else {
      val kth = hashes(n - 1)
      // map unsigned 64-bit hash to (0,1]
      val u = (kth >>> 11).toDouble / (1L << 53).toDouble +
        java.lang.Double.MIN_VALUE
      (k - 1).toDouble / u
    }
  }

  def containsHash(h: Long): Boolean = {
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (unsignedLess(hashes(mid), h)) lo = mid + 1 else hi = mid
    }
    lo < n && hashes(lo) == h
  }

  def copySketch(): KmvSketch = {
    val s = new KmvSketch(k)
    s.hashes = java.util.Arrays.copyOf(hashes, math.max(n, 1))
    s.n = n
    s
  }
}

object KmvSketch {
  val DefaultK = 1024

  def apply(k: Int = DefaultK): KmvSketch = new KmvSketch(k)

  /**
   * Jaccard estimate of two KMV sketches: take the k smallest hashes of
   * the union, count those present in both (standard k-min estimator).
   */
  def jaccard(a: KmvSketch, b: KmvSketch): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val k = math.min(a.k, b.k)
    val union = new KmvSketch(k)
    union.merge(if (a.k == k) a else truncate(a, k))
    union.merge(if (b.k == k) b else truncate(b, k))
    var both = 0
    var i = 0
    while (i < union.size) {
      val h = union.hashAt(i)
      if (a.containsHash(h) && b.containsHash(h)) both += 1
      i += 1
    }
    both.toDouble / union.size
  }

  /** Containment estimate |A∩B| / |A|. */
  def containment(a: KmvSketch, b: KmvSketch): Double = {
    if (a.isEmpty) return 0.0
    val j = jaccard(a, b)
    if (j == 0.0) return 0.0
    val da = a.distinctEstimate
    val db = b.distinctEstimate
    // |A∩B| = j/(1+j) * (|A|+|B|)
    val inter = j / (1.0 + j) * (da + db)
    math.min(inter / da, 1.0)
  }

  private def truncate(s: KmvSketch, k: Int): KmvSketch = {
    val t = new KmvSketch(k)
    var i = 0
    while (i < s.size) { t.add(s.hashAt(i)); i += 1 }
    t
  }

  // ------------------------------------------------------------- codec
  // Our own compact format (no external compatibility constraint):
  // 'K', uvarint k, uvarint n, delta-uvarint sorted hashes.

  def encode(s: KmvSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream(16 + s.size * 5)
    out.write('K'.toInt)
    DataDogCodec.writeUvarint(out, s.k.toLong)
    DataDogCodec.writeUvarint(out, s.size.toLong)
    var prev = 0L
    var i = 0
    while (i < s.size) {
      val h = s.hashAt(i)
      DataDogCodec.writeUvarint(out, h - prev) // unsigned ascending: delta >= 0
      prev = h
      i += 1
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): KmvSketch = {
    val r = new DataDogCodec.ByteReader(bytes)
    val magic = r.readByte()
    if (magic != 'K'.toInt)
      throw new DataDogCodec.CodecException(s"bad KMV magic: $magic")
    val k = DataDogCodec.readUvarint(r).toInt
    if (k <= 1 || k > (1 << 24))
      throw new DataDogCodec.CodecException(s"bad KMV k: $k")
    val n = DataDogCodec.readUvarint(r).toInt
    if (n < 0 || n > k)
      throw new DataDogCodec.CodecException(s"bad KMV size: $n")
    val s = new KmvSketch(k)
    var prev = 0L
    var i = 0
    while (i < n) {
      prev += DataDogCodec.readUvarint(r)
      s.add(prev)
      i += 1
    }
    s
  }
}
