package graft.sketch

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/**
 * SpaceSaving top-k frequent-items sketch (Metwally et al.): at most
 * `capacity` tracked counters; an untracked arrival evicts the minimum
 * counter and inherits its count as overestimation error. Guarantees:
 * count_true <= count <= count_true + error, exact (error 0) whenever
 * distinct items <= capacity. Mergeable (entrywise counter sum +
 * re-truncation), so it composes with partial aggregation like the
 * other sketches. Training-data use: frequent shingles/URLs/lines =
 * boilerplate detection.
 */
final class TopKSketch(val capacity: Int) extends Serializable {
  require(capacity > 0)

  private[sketch] val counters = mutable.HashMap.empty[String, TopKSketch.Counter]

  def size: Int = counters.size

  def add(item: String, weight: Long = 1L): Unit = {
    if (item == null || weight <= 0) return
    counters.get(item) match {
      case Some(c) => c.count += weight
      case None =>
        if (counters.size < capacity) {
          counters(item) = new TopKSketch.Counter(weight, 0L)
        } else {
          // evict the minimum counter; inherit its count as error
          var minKey: String = null
          var minCount = Long.MaxValue
          counters.foreach { case (k, c) =>
            if (c.count < minCount || (c.count == minCount && (minKey == null || k < minKey))) {
              minCount = c.count; minKey = k
            }
          }
          counters.remove(minKey)
          counters(item) = new TopKSketch.Counter(minCount + weight, minCount)
        }
    }
  }

  def merge(other: TopKSketch): Unit = {
    other.counters.foreach { case (k, c) =>
      counters.get(k) match {
        case Some(mine) => mine.count += c.count; mine.error += c.error
        case None => counters(k) = new TopKSketch.Counter(c.count, c.error)
      }
    }
    if (counters.size > capacity) {
      // keep the top `capacity` by count (deterministic tie-break on key)
      val keep = counters.toSeq
        .sortBy { case (k, c) => (-c.count, k) }
        .take(capacity)
      val dropped = counters.size - capacity
      counters.clear()
      keep.foreach { case (k, c) => counters(k) = c }
      if (dropped > 0) () // bounds loosen; documented behavior
    }
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
    val cap = DataDogCodec.readUvarint(r).toInt
    if (cap <= 0 || cap > (1 << 24))
      throw new DataDogCodec.CodecException(s"bad topk capacity: $cap")
    val n = DataDogCodec.readUvarint(r).toInt
    if (n < 0 || n > cap)
      throw new DataDogCodec.CodecException(s"bad topk size: $n")
    val s = new TopKSketch(cap)
    var i = 0
    while (i < n) {
      val len = DataDogCodec.readUvarint(r).toInt
      if (len < 0 || r.pos + len > bytes.length)
        throw new DataDogCodec.CodecException("bad topk item length")
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
