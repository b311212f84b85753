package graft.pipeline

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * `vec_sum(arr) → ARRAY<DOUBLE>`: element-wise sum aggregate over a
 * float/double array column.
 *
 * Scale rationale: a k-means training step needs per-cell mean vectors.
 * Expressing that as `dim` separate `sum(element_at(v, i))` aggregate
 * columns blows past codegen limits and crawls at real embedding widths
 * (768-1536 dims); this aggregate carries ONE buffer of `dim` doubles
 * per group with map-side partial aggregation, so the shuffle payload
 * is cells x dim regardless of corpus size — the same mergeable-monoid
 * architecture as the sketch aggregates (graft.sketch.DDSketchAgg).
 *
 * NULL discipline: NULL vectors, vectors whose length disagrees with
 * the first vector seen by the group, and vectors containing NULL
 * elements contribute nothing (like SQL SUM skipping NULLs) — callers
 * that care should pre-filter on `size(vec) = dim`. An all-skipped
 * group evaluates to NULL.
 */
case class VecSumAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumAggExpr.Buf]
    with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"

  // def, not val: registry-built instances carry unresolved children at
  // construction time, and dataType on an unresolved child throws
  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => DoubleType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects ARRAY<FLOAT> or ARRAY<DOUBLE>, got $other")
  }

  override def createAggregationBuffer(): VecSumAggExpr.Buf =
    new VecSumAggExpr.Buf(null)

  override def update(buffer: VecSumAggExpr.Buf, input: InternalRow): VecSumAggExpr.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buffer.sums == null || buffer.sums.length == n) {
        var hasNull = false
        var i = 0
        while (i < n && !hasNull) { hasNull = arr.isNullAt(i); i += 1 }
        if (!hasNull) {
          if (buffer.sums == null) buffer.sums = new Array[Double](n)
          val s = buffer.sums
          val float = elemType == FloatType
          i = 0
          while (i < n) {
            s(i) += (if (float) arr.getFloat(i).toDouble else arr.getDouble(i))
            i += 1
          }
        }
      }
    }
    buffer
  }

  override def merge(buffer: VecSumAggExpr.Buf, other: VecSumAggExpr.Buf): VecSumAggExpr.Buf = {
    if (other.sums != null) {
      if (buffer.sums == null) buffer.sums = other.sums.clone()
      else if (buffer.sums.length == other.sums.length) {
        var i = 0
        while (i < buffer.sums.length) { buffer.sums(i) += other.sums(i); i += 1 }
      }
    }
    buffer
  }

  override def eval(buffer: VecSumAggExpr.Buf): Any =
    if (buffer.sums == null) null else new GenericArrayData(buffer.sums)

  override def serialize(buffer: VecSumAggExpr.Buf): Array[Byte] = {
    if (buffer.sums == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(8 * buffer.sums.length)
      bb.asDoubleBuffer().put(buffer.sums)
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): VecSumAggExpr.Buf = {
    if (bytes.isEmpty) new VecSumAggExpr.Buf(null)
    else {
      val out = new Array[Double](bytes.length / 8)
      java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
      new VecSumAggExpr.Buf(out)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumAggExpr =
    copy(child = newChild)
}

object VecSumAggExpr {
  /** Mutable element-wise-sum buffer; `sums` stays null until the first
    * non-skipped vector fixes the dimensionality. */
  final class Buf(var sums: Array[Double])
}

/** Column + SQL surface for vector aggregates. */
object VectorAgg {

  /** Element-wise sum of a float/double array column. */
  def vec_sum(vec: Column): Column =
    GraftBridge.column(
      VecSumAggExpr(GraftBridge.expression(vec)).toAggregateExpression())

  /** Every vector-agg function as an expression builder. */
  private[graft] def allBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_sum" -> {
      case Seq(v) => VecSumAggExpr(v)
      case other => throw new IllegalArgumentException(
        s"vec_sum expects 1 argument, got ${other.size}")
    })

  /** SQL registration (also done by Graft.register). */
  def register(spark: SparkSession): Unit =
    allBuilders.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }
}
