package graft.sketch

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Aggregation buffers and finalizers for the sketch aggregates.
 *
 * The reference implements these as DuckDB C-API aggregate callbacks
 * (reference: src/lib.rs:625-1037). DuckDB's
 * state/init/update/combine/finalize contract maps 1:1 onto Spark's
 * `Aggregator` (`zero/reduce/merge/finish`), which Catalyst plans as
 * map-side partial aggregation + shuffle of the (kryo-serialized)
 * buffer + final merge — so sketch state stays deserialized across all
 * rows of a partition, amortizing the per-row decode the reference pays.
 *
 * Error discipline mirrors the reference:
 *  - NULL / empty-blob / undecodable rows are skipped (lib.rs:699-726)
 *  - the first decoded sketch is adopted as state, inheriting its gamma
 *    (lib.rs:727-734)
 *  - merge failures (gamma mismatch) are silently ignored (lib.rs:729)
 *  - empty group → NULL result (lib.rs:798-802)
 */
object SketchAggs {

  /** Uninitialized-state sentinel: gamma 0 can never come from a real sketch. */
  private[sketch] def uninit: DDSketch = new DDSketch(0.0, 0.0)
  private[sketch] def isUninit(s: DDSketch): Boolean = s.gamma == 0.0

  private[sketch] def mergeBuffers(b1: DDSketch, b2: DDSketch): DDSketch = {
    if (isUninit(b1)) b2
    else if (isUninit(b2)) b1
    else {
      try b1.merge(b2) catch { case _: IllegalArgumentException => () }
      b1
    }
  }

  private[sketch] def reduceBlob(b: DDSketch, blob: Array[Byte]): DDSketch = {
    if (blob == null || blob.isEmpty) return b
    val decoded =
      try DataDogCodec.decode(blob)
      catch { case _: Exception => return b }
    if (isUninit(b)) decoded
    else {
      try b.merge(decoded) catch { case _: Exception => () }
      b
    }
  }

  /** 12-field result of `ddsketch_stats_agg` (field order per lib.rs:819-831). */
  case class StatsAggResult(
      sketch: Array[Byte],
      count: Long,
      sum: Option[Double],
      avg: Option[Double],
      min: Option[Double],
      max: Option[Double],
      p25: Option[Double],
      p50: Option[Double],
      p75: Option[Double],
      p90: Option[Double],
      p95: Option[Double],
      p99: Option[Double])

  private[sketch] def statsOf(s: DDSketch): StatsAggResult = {
    def q(p: Double): Option[Double] = {
      val v = s.quantile(p)
      if (v.isNaN) None else Some(v)
    }
    StatsAggResult(
      sketch = DataDogCodec.encode(s),
      count = s.countLong,
      sum = s.sumOpt,
      avg = s.avgOpt,
      min = s.minOpt,
      max = s.maxOpt,
      p25 = q(0.25), p50 = q(0.50), p75 = q(0.75),
      p90 = q(0.90), p95 = q(0.95), p99 = q(0.99))
  }
}

/** `ddsketch_agg(sketch BLOB) → BLOB`: merges all sketches in a group. */
class DDSketchMergeAgg extends Aggregator[Array[Byte], DDSketch, Array[Byte]] {
  import SketchAggs._
  override def zero: DDSketch = uninit
  override def reduce(b: DDSketch, a: Array[Byte]): DDSketch = reduceBlob(b, a)
  override def merge(b1: DDSketch, b2: DDSketch): DDSketch = mergeBuffers(b1, b2)
  override def finish(r: DDSketch): Array[Byte] =
    if (isUninit(r)) null else DataDogCodec.encode(r)
  override def bufferEncoder: Encoder[DDSketch] = Encoders.kryo[DDSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** `ddsketch_stats_agg(sketch BLOB) → STRUCT(...)`: merge + one-pass stats. */
class DDSketchStatsAgg
    extends Aggregator[Array[Byte], DDSketch, SketchAggs.StatsAggResult] {
  import SketchAggs._
  override def zero: DDSketch = uninit
  override def reduce(b: DDSketch, a: Array[Byte]): DDSketch = reduceBlob(b, a)
  override def merge(b1: DDSketch, b2: DDSketch): DDSketch = mergeBuffers(b1, b2)
  override def finish(r: DDSketch): StatsAggResult =
    if (isUninit(r)) null else statsOf(r)
  override def bufferEncoder: Encoder[DDSketch] = Encoders.kryo[DDSketch]
  override def outputEncoder: Encoder[StatsAggResult] =
    Encoders.product[StatsAggResult]
}

/**
 * `ddsketch_agg_values(value DOUBLE) → BLOB`: builds a sketch directly
 * from raw values — the idiomatic Spark ingestion path replacing the
 * reference's create-then-`UPDATE` idiom (reference README.md:245-247
 * lists "no direct way to add multiple values" as a limitation).
 */
class DDSketchValuesAgg(relativeAccuracy: Double)
    extends Aggregator[java.lang.Double, DDSketch, Array[Byte]] {
  import SketchAggs._
  def this() = this(DDSketch.DefaultRelativeAccuracy)
  override def zero: DDSketch = DDSketch(relativeAccuracy)
  override def reduce(b: DDSketch, a: java.lang.Double): DDSketch = {
    if (a != null) b.add(a.doubleValue())
    b
  }
  override def merge(b1: DDSketch, b2: DDSketch): DDSketch = mergeBuffers(b1, b2)
  override def finish(r: DDSketch): Array[Byte] = DataDogCodec.encode(r)
  override def bufferEncoder: Encoder[DDSketch] = Encoders.kryo[DDSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** `ddsketch_stats_values_agg(value DOUBLE) → STRUCT(...)`: raw values in,
  * full stats struct out, one aggregation pass. */
class DDSketchValuesStatsAgg(relativeAccuracy: Double)
    extends Aggregator[java.lang.Double, DDSketch, SketchAggs.StatsAggResult] {
  import SketchAggs._
  def this() = this(DDSketch.DefaultRelativeAccuracy)
  override def zero: DDSketch = DDSketch(relativeAccuracy)
  override def reduce(b: DDSketch, a: java.lang.Double): DDSketch = {
    if (a != null) b.add(a.doubleValue())
    b
  }
  override def merge(b1: DDSketch, b2: DDSketch): DDSketch = mergeBuffers(b1, b2)
  override def finish(r: DDSketch): StatsAggResult = statsOf(r)
  override def bufferEncoder: Encoder[DDSketch] = Encoders.kryo[DDSketch]
  override def outputEncoder: Encoder[StatsAggResult] =
    Encoders.product[StatsAggResult]
}
