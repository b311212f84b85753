package graft.sketch

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/**
 * Native Catalyst forms of the hot sketch aggregates.
 *
 * DuckDB's aggregate callback contract (state/init/update/combine/
 * finalize, reference: src/lib.rs:625-804) maps 1:1 onto Spark's
 * `TypedImperativeAggregate` (`createAggregationBuffer/update/merge/
 * eval` + `serialize/deserialize`); the DataDog wire codec doubles as
 * the shuffle/spill buffer format, so a partial buffer crossing an
 * exchange is exactly a serialized sketch. Compared to the
 * `Aggregator`+udaf route these avoid the per-row encoder conversion
 * (no boxing of the input double, no kryo on the buffer).
 */
abstract class DDSketchAggBase
    extends TypedImperativeAggregate[DDSketch]
    with UnaryLike[Expression] {

  /** Required input type for the single child. */
  protected def expectedInputType: DataType

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == expectedInputType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires $expectedInputType input, got ${child.dataType}")

  override def serialize(buffer: DDSketch): Array[Byte] = DataDogCodec.encode(buffer)
  override def deserialize(bytes: Array[Byte]): DDSketch = DataDogCodec.decode(bytes)
}

/**
 * `ddsketch_agg_values(value DOUBLE) → BLOB`: build a sketch directly
 * from raw values.
 */
case class DDSketchAggValuesExpr(
    child: Expression,
    relativeAccuracy: Double = DDSketch.DefaultRelativeAccuracy,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends DDSketchAggBase {

  override protected def expectedInputType: DataType = DoubleType
  override def prettyName: String = "ddsketch_agg_values"

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

  override def eval(buffer: DDSketch): Any = DataDogCodec.encode(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketchAggValuesExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketchAggValuesExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DDSketchAggValuesExpr =
    copy(child = newChild)
}

/**
 * `ddsketch_agg_weighted(value DOUBLE, count DOUBLE) → BLOB`: build a
 * sketch from pre-aggregated (value, count) rows — the warehouse shape
 * where input is already grouped. Semantics are the reference core's
 * `add_with_count` (datadog_encoding.rs:718-747): NULL value, NULL
 * count, or `count <= 0` rows contribute nothing.
 */
case class DDSketchAggWeightedExpr(
    left: Expression,
    right: Expression,
    relativeAccuracy: Double = DDSketch.DefaultRelativeAccuracy,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DDSketch]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def prettyName: String = "ddsketch_agg_weighted"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires DOUBLE value, got ${left.dataType}")
    else if (right.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires DOUBLE count, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): DDSketch =
    DDSketch(
      if (relativeAccuracy > 0.0 && relativeAccuracy < 1.0) relativeAccuracy
      else DDSketch.DefaultRelativeAccuracy)

  override def update(buffer: DDSketch, input: InternalRow): DDSketch = {
    val v = left.eval(input)
    val c = right.eval(input)
    if (v != null && c != null) {
      val cd = c.asInstanceOf[Double]
      if (!cd.isNaN) buffer.addWithCount(v.asInstanceOf[Double], cd)
    }
    buffer
  }

  override def merge(buffer: DDSketch, other: DDSketch): DDSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: DDSketch): Any = DataDogCodec.encode(buffer)

  override def serialize(buffer: DDSketch): Array[Byte] = DataDogCodec.encode(buffer)
  override def deserialize(bytes: Array[Byte]): DDSketch = DataDogCodec.decode(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketchAggWeightedExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketchAggWeightedExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DDSketchAggWeightedExpr =
    copy(left = newLeft, right = newRight)
}

/**
 * `ddsketch_agg(sketch BLOB) → BLOB`: merge stored sketches. Mirrors the
 * reference's error discipline (lib.rs:687-804): NULL/empty/undecodable
 * rows skipped, first sketch adopted (gamma inherited), merge mismatches
 * ignored, NULL for an empty group.
 */
case class DDSketchMergeAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends DDSketchAggBase {

  override protected def expectedInputType: DataType = BinaryType
  override def prettyName: String = "ddsketch_agg"

  override def createAggregationBuffer(): DDSketch = SketchAggs.uninit

  override def update(buffer: DDSketch, input: InternalRow): DDSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else SketchAggs.reduceBlob(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: DDSketch, other: DDSketch): DDSketch =
    SketchAggs.mergeBuffers(buffer, other)

  override def eval(buffer: DDSketch): Any =
    if (SketchAggs.isUninit(buffer)) null else DataDogCodec.encode(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketchMergeAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketchMergeAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DDSketchMergeAggExpr =
    copy(child = newChild)
}
