package graft.sketch

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

/** Validation for constant function arguments in SQL builders: clean
  * analysis-time errors for malformed ARGUMENTS (the NULL-out discipline
  * applies to malformed data, not to malformed function parameters). */
private[sketch] object ArgEval {
  def positiveInt(e: Expression, what: String): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$what must be a constant")
    val v = Cast(e, org.apache.spark.sql.types.IntegerType).eval(null)
    v match {
      case i: java.lang.Integer if i > 0 => i.intValue()
      case other =>
        throw new IllegalArgumentException(
          s"$what must be a positive integer literal, got $other")
    }
  }

  def fraction(e: Expression, what: String): Double = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$what must be a constant")
    val v = Cast(e, org.apache.spark.sql.types.DoubleType).eval(null)
    v match {
      case d: java.lang.Double if d > 0.0 && d < 1.0 => d.doubleValue()
      case other =>
        throw new IllegalArgumentException(
          s"$what must be a literal in (0, 1), got $other")
    }
  }
}

/** `topk_agg(item STRING[, capacity]) → BLOB`: SpaceSaving frequent-items
  * sketch aggregate. */
case class TopKAggExpr(
    child: Expression,
    capacity: Int = TopKSketch.DefaultCapacity,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKSketch]
    with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "topk_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_agg expects STRING input, got ${child.dataType}")

  override def createAggregationBuffer(): TopKSketch = new TopKSketch(capacity)

  override def update(buffer: TopKSketch, input: InternalRow): TopKSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: TopKSketch, other: TopKSketch): TopKSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TopKSketch): Any = TopKSketch.encode(buffer)
  override def serialize(buffer: TopKSketch): Array[Byte] = TopKSketch.encode(buffer)
  override def deserialize(bytes: Array[Byte]): TopKSketch = TopKSketch.decode(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAggExpr =
    copy(child = newChild)
}

/** Column + SQL surface for the top-k sketch. */
object topk {

  case class TopItem(item: String, count: Long, error: Long)

  /** Aggregate: SpaceSaving sketch of the column's item frequencies. */
  def topk_agg(item: Column): Column = topk_agg(item, TopKSketch.DefaultCapacity)

  def topk_agg(item: Column, capacity: Int): Column =
    GraftBridge.column(
      TopKAggExpr(GraftBridge.expression(item), capacity).toAggregateExpression())

  private[graft] val itemsUdf: UserDefinedFunction =
    F.udf { (b: Array[Byte], k: Int) =>
      val r: Seq[TopItem] =
        if (b == null) null
        else {
          try TopKSketch.decode(b).topK(k).map { case (i, c, e) => TopItem(i, c, e) }
          catch { case _: Exception => null }
        }
      r
    }.withName("topk_items")

  /** Scalar: array<struct<item,count,error>> of the k most frequent. */
  def topk_items(sketch: Column, k: Int): Column = itemsUdf(sketch, F.lit(k))

  private[graft] val mergeUdf: UserDefinedFunction =
    F.udf { (a: Array[Byte], b: Array[Byte]) =>
      val r: Array[Byte] =
        if (a == null || b == null) null
        else {
          try {
            val sa = TopKSketch.decode(a)
            sa.merge(TopKSketch.decode(b))
            TopKSketch.encode(sa)
          } catch { case _: Exception => null }
        }
      r
    }.withName("topk_merge")

  def topk_merge(a: Column, b: Column): Column = mergeUdf(a, b)

  /** Aggregate MERGE of stored TopK sketches (mergeable-summaries
    * combine) — regrain hourly heavy-hitter windows to days. First
    * capacity adopted; mismatches skipped; NULL for an empty group. */
  def topk_merge_agg(sketch: Column): Column =
    GraftBridge.column(
      TopKMergeAggExpr(GraftBridge.expression(sketch)).toAggregateExpression())

  private def mergeAggBuilder: Seq[Expression] => Expression = {
    case Seq(b) => TopKMergeAggExpr(b)
    case other =>
      throw new IllegalArgumentException(
        s"topk_merge_agg expects 1 argument, got ${other.size}")
  }

  private def aggBuilder: Seq[Expression] => Expression = {
    case Seq(v) => TopKAggExpr(v)
    case Seq(v, cap) => TopKAggExpr(v, ArgEval.positiveInt(cap, "topk_agg capacity"))
    case other =>
      throw new IllegalArgumentException(
        s"topk_agg expects 1 or 2 arguments, got ${other.size}")
  }

  /** Every topk function as an expression builder (extensions path). */
  private[graft] def allBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "topk_agg" -> aggBuilder,
    "topk_items" -> (es => GraftBridge.udfExpression(itemsUdf, es)),
    "topk_merge" -> (es => GraftBridge.udfExpression(mergeUdf, es)),
    "topk_merge_agg" -> mergeAggBuilder)

  def register(spark: SparkSession): Unit = {
    spark.udf.register("topk_items", itemsUdf)
    spark.udf.register("topk_merge", mergeUdf)
    GraftBridge.registerFunction(spark, "topk_agg", aggBuilder)
    GraftBridge.registerFunction(spark, "topk_merge_agg", mergeAggBuilder)
  }
}
