package graft.sketch

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * Native stats aggregates: same state machine as the blob aggregates,
 * finalizing into the reference's 12-field struct (field order per
 * lib.rs:819-831).
 *
 * Shuffle-buffer format: the DataDog wire bytes prefixed with the exact
 * in-memory count/sum/min/max ('S' + 4×f64-LE + wire). The wire format
 * deliberately drops exact stats (Go-compat quirk); without the prefix
 * a partial buffer crossing an exchange would silently degrade the
 * struct's sum/avg/min/max to bin-midpoint approximations. The prefix
 * never appears in user-visible output — `sketch` field bytes are pure
 * wire format.
 */
object SketchStatsLayout {
  val schema: StructType = StructType(Seq(
    StructField("sketch", BinaryType),
    StructField("count", LongType),
    StructField("sum", DoubleType),
    StructField("avg", DoubleType),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("p25", DoubleType),
    StructField("p50", DoubleType),
    StructField("p75", DoubleType),
    StructField("p90", DoubleType),
    StructField("p95", DoubleType),
    StructField("p99", DoubleType)))

  private[sketch] def toRow(s: DDSketch): GenericInternalRow = {
    def q(p: Double): Any = {
      val v = s.quantile(p)
      if (java.lang.Double.isNaN(v)) null else v
    }
    def opt(o: Option[Double]): Any = o.orNull
    new GenericInternalRow(Array[Any](
      DataDogCodec.encode(s),
      s.countLong,
      opt(s.sumOpt),
      opt(s.avgOpt),
      opt(s.minOpt),
      opt(s.maxOpt),
      q(0.25), q(0.50), q(0.75), q(0.90), q(0.95), q(0.99)))
  }

  private[sketch] def serializeWithStats(s: DDSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    out.write('S'.toInt)
    DataDogCodec.writeFloat64LE(out, s.count)
    DataDogCodec.writeFloat64LE(out, s.sum)
    DataDogCodec.writeFloat64LE(out, s.min)
    DataDogCodec.writeFloat64LE(out, s.max)
    val wire = DataDogCodec.encode(s)
    out.write(wire, 0, wire.length)
    out.toByteArray
  }

  private[sketch] def deserializeWithStats(bytes: Array[Byte]): DDSketch = {
    val r = new DataDogCodec.ByteReader(bytes)
    val magic = r.readByte()
    if (magic != 'S'.toInt)
      throw new DataDogCodec.CodecException(s"bad stats-buffer magic: $magic")
    val count = DataDogCodec.readFloat64LE(r)
    val sum = DataDogCodec.readFloat64LE(r)
    val min = DataDogCodec.readFloat64LE(r)
    val max = DataDogCodec.readFloat64LE(r)
    val s = DataDogCodec.decode(bytes, r.pos)
    s.count = count
    s.sum = sum
    s.min = min
    s.max = max
    s
  }
}

abstract class SketchStatsAggBase
    extends TypedImperativeAggregate[DDSketch]
    with UnaryLike[Expression] {

  protected def expectedInputType: DataType

  override def dataType: DataType = SketchStatsLayout.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == expectedInputType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires $expectedInputType input, got ${child.dataType}")

  override def serialize(buffer: DDSketch): Array[Byte] =
    SketchStatsLayout.serializeWithStats(buffer)
  override def deserialize(bytes: Array[Byte]): DDSketch =
    SketchStatsLayout.deserializeWithStats(bytes)
}

/** `ddsketch_stats_agg(sketch BLOB) → STRUCT(...)` */
case class DDSketchStatsAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends SketchStatsAggBase {

  override protected def expectedInputType: DataType = BinaryType
  override def prettyName: String = "ddsketch_stats_agg"

  override def createAggregationBuffer(): DDSketch = SketchAggs.uninit

  override def update(buffer: DDSketch, input: InternalRow): DDSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else SketchAggs.reduceBlob(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: DDSketch, other: DDSketch): DDSketch =
    SketchAggs.mergeBuffers(buffer, other)

  override def eval(buffer: DDSketch): Any =
    if (SketchAggs.isUninit(buffer)) null else SketchStatsLayout.toRow(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketchStatsAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketchStatsAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DDSketchStatsAggExpr =
    copy(child = newChild)
}

/** `ddsketch_stats_agg_values(value DOUBLE[, acc]) → STRUCT(...)` */
case class DDSketchStatsValuesAggExpr(
    child: Expression,
    relativeAccuracy: Double = DDSketch.DefaultRelativeAccuracy,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends SketchStatsAggBase {

  override protected def expectedInputType: DataType = DoubleType
  override def prettyName: String = "ddsketch_stats_agg_values"

  override def createAggregationBuffer(): DDSketch =
    DDSketch(
      if (relativeAccuracy > 0.0 && relativeAccuracy < 1.0) relativeAccuracy
      else DDSketch.DefaultRelativeAccuracy)

  override def update(buffer: DDSketch, input: InternalRow): DDSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: DDSketch, other: DDSketch): DDSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: DDSketch): Any = SketchStatsLayout.toRow(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketchStatsValuesAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketchStatsValuesAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DDSketchStatsValuesAggExpr =
    copy(child = newChild)
}
