package graft.sketch

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/**
 * SpaceSaving top-k frequent-items sketch (Metwally et al.): at most
 * `capacity` tracked counters; an untracked arrival evicts the minimum
 * counter and inherits its count as overestimation error.
 *
 * Guarantee (maintained across merges): for every reported item,
 * count_true <= count and count - error <= count_true; error stays 0 —
 * counts exact — while every contributing partial has seen at most
 * `capacity` distinct items. Merging follows the mergeable-summaries
 * construction: an item absent from a full side contributes that side's
 * minimum counter as both count and error, then the union is truncated
 * back to `capacity` (surviving counters keep their bounds).
 *
 * Eviction uses a count -> keys ordered index, so updates are
 * O(log capacity) instead of a linear min scan.
 *
 * Training-data use: frequent shingles/URLs/lines = boilerplate
 * detection.
 */
final class TopKSketch(val capacity: Int) extends Serializable {
  require(capacity > 0)

  private[sketch] val counters = mutable.HashMap.empty[String, TopKSketch.Counter]
  // count -> keys with that count, for O(log n) min eviction with
  // deterministic (smallest-key) tie-breaking
  @transient private var byCount: java.util.TreeMap[Long, java.util.TreeSet[String]] = _

  private def index: java.util.TreeMap[Long, java.util.TreeSet[String]] = {
    if (byCount == null) {
      byCount = new java.util.TreeMap[Long, java.util.TreeSet[String]]()
      counters.foreach { case (k, c) => indexAdd(k, c.count) }
    }
    byCount
  }

  private def indexAdd(key: String, count: Long): Unit = {
    val set = index.computeIfAbsent(count, _ => new java.util.TreeSet[String]())
    set.add(key)
  }

  private def indexRemove(key: String, count: Long): Unit = {
    val set = index.get(count)
    if (set != null) {
      set.remove(key)
      if (set.isEmpty) index.remove(count)
    }
  }

  def size: Int = counters.size

  /** Minimum tracked count (0 when not full — absent items are true zeros). */
  private[sketch] def minCountIfFull: Long =
    if (counters.size >= capacity && !index.isEmpty) index.firstKey() else 0L

  def add(item: String, weight: Long = 1L): Unit = {
    if (item == null || weight <= 0) return
    counters.get(item) match {
      case Some(c) =>
        indexRemove(item, c.count)
        c.count += weight
        indexAdd(item, c.count)
      case None =>
        if (counters.size < capacity) {
          counters(item) = new TopKSketch.Counter(weight, 0L)
          indexAdd(item, weight)
        } else {
          val minCount = index.firstKey()
          val minKey = index.firstEntry().getValue.first()
          counters.remove(minKey)
          indexRemove(minKey, minCount)
          counters(item) = new TopKSketch.Counter(minCount + weight, minCount)
          indexAdd(item, minCount + weight)
        }
    }
  }

  /**
   * Mergeable-summaries combine: items absent from a full side inherit
   * that side's minimum counter as count AND error, then truncate to
   * the top `capacity` by (count desc, key asc).
   */
  def merge(other: TopKSketch): Unit = {
    val mThis = minCountIfFull
    val mOther = other.minCountIfFull
    val keys = counters.keySet ++ other.counters.keySet
    val combined = keys.toSeq.map { k =>
      val (c1, e1) = counters.get(k)
        .map(c => (c.count, c.error)).getOrElse((mThis, mThis))
      val (c2, e2) = other.counters.get(k)
        .map(c => (c.count, c.error)).getOrElse((mOther, mOther))
      k -> new TopKSketch.Counter(c1 + c2, e1 + e2)
    }
    val kept =
      if (combined.size <= capacity) combined
      else combined.sortBy { case (k, c) => (-c.count, k) }.take(capacity)
    counters.clear()
    byCount = null
    kept.foreach { case (k, c) => counters(k) = c }
  }

  /** (item, count, error) descending by count, deterministic ties. */
  def topK(k: Int): Seq[(String, Long, Long)] =
    counters.toSeq
      .map { case (key, c) => (key, c.count, c.error) }
      .sortBy { case (key, count, _) => (-count, key) }
      .take(k)
}

object TopKSketch {
  final class Counter(var count: Long, var error: Long) extends Serializable

  val DefaultCapacity = 256

  def encode(s: TopKSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    out.write('T'.toInt)
    DataDogCodec.writeUvarint(out, s.capacity.toLong)
    DataDogCodec.writeUvarint(out, s.counters.size.toLong)
    // deterministic order for byte-stable encoding
    s.counters.toSeq.sortBy(_._1).foreach { case (k, c) =>
      val bytes = k.getBytes(StandardCharsets.UTF_8)
      DataDogCodec.writeUvarint(out, bytes.length.toLong)
      out.write(bytes, 0, bytes.length)
      DataDogCodec.writeUvarint(out, c.count)
      DataDogCodec.writeUvarint(out, c.error)
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): TopKSketch = {
    val r = new DataDogCodec.ByteReader(bytes)
    val magic = r.readByte()
    if (magic != 'T'.toInt)
      throw new DataDogCodec.CodecException(s"bad topk magic: $magic")
    val capL = DataDogCodec.readUvarint(r)
    if (capL <= 0L || capL > (1L << 24))
      throw new DataDogCodec.CodecException(s"bad topk capacity: $capL")
    val cap = capL.toInt
    val nL = DataDogCodec.readUvarint(r)
    if (nL < 0L || nL > capL)
      throw new DataDogCodec.CodecException(s"bad topk size: $nL")
    val n = nL.toInt
    val s = new TopKSketch(cap)
    var i = 0
    while (i < n) {
      val lenL = DataDogCodec.readUvarint(r)
      if (lenL < 0L || lenL > (bytes.length - r.pos).toLong)
        throw new DataDogCodec.CodecException("bad topk item length")
      val len = lenL.toInt
      val item = new String(bytes, r.pos, len, StandardCharsets.UTF_8)
      r.pos += len
      val count = DataDogCodec.readUvarint(r)
      val error = DataDogCodec.readUvarint(r)
      s.counters(item) = new Counter(count, error)
      i += 1
    }
    s
  }
}
