package graft.sketch

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, If, IsNull, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.sql.{functions => F}

/**
 * `kmv_agg(expr[, k]) → BLOB`: KMV distinct-count/similarity sketch
 * aggregate. The input is hashed by Catalyst's codegen'd XxHash64 (the
 * aggregate's child), so any hashable column type works and the hash
 * stays inside whole-stage codegen.
 */
case class KmvAggExpr(
    child: Expression,
    k: Int = KmvSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch]
    with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_agg expects a LONG hash child (wrap input in xxhash64), got ${child.dataType}")

  override def createAggregationBuffer(): KmvSketch = KmvSketch(k)

  override def update(buffer: KmvSketch, input: InternalRow): KmvSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvSketch, other: KmvSketch): KmvSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KmvSketch): Any = KmvSketch.encode(buffer)
  override def serialize(buffer: KmvSketch): Array[Byte] = KmvSketch.encode(buffer)
  override def deserialize(bytes: Array[Byte]): KmvSketch = KmvSketch.decode(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAggExpr =
    copy(child = newChild)
}

/** Column + SQL surface for the KMV sketch family. */
object kmv {

  // NULL inputs must not contribute an element: XxHash64 of a null child
  // returns the seed (a phantom "distinct value"), so gate on IsNull —
  // SQL COUNT(DISTINCT x) semantics ignore NULLs.
  private def hashed(e: Expression): Expression =
    If(IsNull(e), Literal(null, LongType), new XxHash64(Seq(e), 42L))

  private def decodeOrNull(b: Array[Byte]): KmvSketch =
    if (b == null) null
    else {
      try KmvSketch.decode(b)
      catch { case _: Exception => null }
    }

  /** Aggregate: KMV sketch of the column's distinct values. */
  def kmv_agg(value: Column): Column = kmv_agg(value, KmvSketch.DefaultK)

  def kmv_agg(value: Column, k: Int): Column =
    GraftBridge.column(
      KmvAggExpr(hashed(GraftBridge.expression(value)), k).toAggregateExpression())

  private[graft] val distinctUdf: UserDefinedFunction = F.udf { (b: Array[Byte]) =>
    val s = decodeOrNull(b)
    val r: java.lang.Double = if (s == null) null else s.distinctEstimate
    r
  }.withName("kmv_distinct")

  private[graft] val jaccardUdf: UserDefinedFunction =
    F.udf { (a: Array[Byte], b: Array[Byte]) =>
      val sa = decodeOrNull(a); val sb = decodeOrNull(b)
      val r: java.lang.Double =
        if (sa == null || sb == null) null else KmvSketch.jaccard(sa, sb)
      r
    }.withName("kmv_jaccard")

  private[graft] val containmentUdf: UserDefinedFunction =
    F.udf { (a: Array[Byte], b: Array[Byte]) =>
      val sa = decodeOrNull(a); val sb = decodeOrNull(b)
      val r: java.lang.Double =
        if (sa == null || sb == null) null else KmvSketch.containment(sa, sb)
      r
    }.withName("kmv_containment")

  private[graft] val mergeUdf: UserDefinedFunction =
    F.udf { (a: Array[Byte], b: Array[Byte]) =>
      val sa = decodeOrNull(a); val sb = decodeOrNull(b)
      val r: Array[Byte] =
        if (sa == null || sb == null) null
        else if (sa.k != sb.k) null
        else { sa.merge(sb); KmvSketch.encode(sa) }
      r
    }.withName("kmv_merge")

  def kmv_distinct(sketch: Column): Column = distinctUdf(sketch)
  def kmv_jaccard(a: Column, b: Column): Column = jaccardUdf(a, b)
  def kmv_containment(a: Column, b: Column): Column = containmentUdf(a, b)
  def kmv_merge(a: Column, b: Column): Column = mergeUdf(a, b)

  /** Aggregate MERGE of stored KMV sketches (exact min-hash set
    * union) — "daily uniques from hourly sketches". First sketch's k
    * adopted; k mismatches skipped; NULL for an empty group. */
  def kmv_merge_agg(sketch: Column): Column =
    GraftBridge.column(
      KmvMergeAggExpr(GraftBridge.expression(sketch)).toAggregateExpression())

  private def mergeAggBuilder: Seq[Expression] => Expression = {
    case Seq(b) => KmvMergeAggExpr(b)
    case other =>
      throw new IllegalArgumentException(
        s"kmv_merge_agg expects 1 argument, got ${other.size}")
  }

  private def aggBuilder: Seq[Expression] => Expression = {
    case Seq(v) => KmvAggExpr(hashed(v))
    case Seq(v, kExpr) => KmvAggExpr(hashed(v), ArgEval.positiveInt(kExpr, "kmv_agg k"))
    case other =>
      throw new IllegalArgumentException(
        s"kmv_agg expects 1 or 2 arguments, got ${other.size}")
  }

  /** Every kmv function as an expression builder (extensions path). */
  private[graft] def allBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "kmv_agg" -> aggBuilder,
    "kmv_distinct" -> (es => GraftBridge.udfExpression(distinctUdf, es)),
    "kmv_jaccard" -> (es => GraftBridge.udfExpression(jaccardUdf, es)),
    "kmv_containment" -> (es => GraftBridge.udfExpression(containmentUdf, es)),
    "kmv_merge" -> (es => GraftBridge.udfExpression(mergeUdf, es)),
    "kmv_merge_agg" -> mergeAggBuilder)

  /** SQL registration (also done by Graft.register). */
  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("kmv_distinct", distinctUdf)
    u.register("kmv_jaccard", jaccardUdf)
    u.register("kmv_containment", containmentUdf)
    u.register("kmv_merge", mergeUdf)
    GraftBridge.registerFunction(spark, "kmv_agg", aggBuilder)
    GraftBridge.registerFunction(spark, "kmv_merge_agg", mergeAggBuilder)
  }
}
