package graft.sketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, If, IsNull, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.util.sketch.CountMinSketch

/**
 * `cms_agg(expr[, eps[, confidence]]) → BLOB`: Count-Min frequency
 * sketch aggregate — the fifth mergeable sketch family (after DDSketch,
 * KMV, TopK, Bloom). Inputs are hashed to LONG by codegen'd XxHash64
 * (same discipline as bloom_agg/kmv_agg), so any hashable column works.
 * The buffer is Spark's public
 * `org.apache.spark.util.sketch.CountMinSketch`; its stream codec
 * doubles as the shuffle/spill format, and sketches built on different
 * partitions cell-wise-add in the standard partial/final contract
 * (same eps/confidence/seed → identical table geometry).
 *
 * Pipeline role at 100 TB: per-key frequency estimation where the key
 * space is too large to groupBy — "how often does this URL / shingle /
 * token appear corpus-wide?" — in O(depth × width) memory regardless of
 * cardinality. Guarantees: estimates never UNDERcount; overcount is
 * bounded by eps × totalCount with probability ≥ confidence. Probe with
 * `cms_estimate`, bound with `cms_total`, combine partial corpora with
 * `cms_merge`.
 */
case class CmsAggExpr(
    child: Expression,
    eps: Double = cms.DefaultEps,
    confidence: Double = cms.DefaultConfidence,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinSketch]
    with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_agg expects a LONG hash child (wrap input in xxhash64), got ${child.dataType}")

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, cms.Seed)

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buffer.addLong(v.asInstanceOf[Long])
    buffer
  }

  // both buffers come from createAggregationBuffer with identical
  // (eps, confidence, seed), so depth/width/row-hashes always line up
  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: CountMinSketch): Any = serialize(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsAggExpr =
    copy(child = newChild)
}

/** Column + SQL surface for the Count-Min frequency family. */
object cms {

  val DefaultEps: Double = 0.001
  val DefaultConfidence: Double = 0.99
  val Seed: Int = 42

  // same NULL discipline as bloom/kmv: a NULL input contributes nothing
  private def hashed(e: Expression): Expression =
    If(IsNull(e), Literal(null, LongType), new XxHash64(Seq(e), 42L))

  /** Aggregate: Count-Min sketch over the column's values. */
  def cms_agg(value: Column): Column = cms_agg(value, DefaultEps, DefaultConfidence)

  def cms_agg(value: Column, eps: Double, confidence: Double): Column =
    GraftBridge.column(
      CmsAggExpr(hashed(GraftBridge.expression(value)), eps, confidence)
        .toAggregateExpression())

  // Same dominant probe pattern as bloom_contains: one corpus-wide
  // sketch joined against millions of probe rows. The thread-local
  // most-recent-decode cache (memcmp identity, cloned key) turns a
  // per-row table deserialization into one decode per task.
  private val lastDecoded = new ThreadLocal[(Array[Byte], CountMinSketch)]

  private def decodeCached(b: Array[Byte]): CountMinSketch = {
    val cached = lastDecoded.get()
    if (cached != null && java.util.Arrays.equals(cached._1, b)) cached._2
    else {
      val s = CountMinSketch.readFrom(new ByteArrayInputStream(b))
      lastDecoded.set((b.clone(), s))
      s
    }
  }

  private[graft] val estimateHashedUdf: UserDefinedFunction =
    F.udf { (b: Array[Byte], h: java.lang.Long) =>
      val r: java.lang.Long =
        if (b == null || h == null) null
        else {
          try java.lang.Long.valueOf(decodeCached(b).estimateCount(h.longValue()))
          catch { case _: Exception => null }
        }
      r
    }.withName("cms_estimate")

  private[graft] val totalUdf: UserDefinedFunction =
    F.udf { (b: Array[Byte]) =>
      val r: java.lang.Long =
        if (b == null) null
        else {
          try java.lang.Long.valueOf(decodeCached(b).totalCount())
          catch { case _: Exception => null }
        }
      r
    }.withName("cms_total")

  private[graft] val mergeUdf: UserDefinedFunction =
    F.udf { (a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) null
      else {
        try {
          val left = CountMinSketch.readFrom(new ByteArrayInputStream(a))
          val right = CountMinSketch.readFrom(new ByteArrayInputStream(b))
          left.mergeInPlace(right)
          val out = new ByteArrayOutputStream()
          left.writeTo(out)
          out.toByteArray
        } catch { case _: Exception => null }
      }
    }.withName("cms_merge")

  /** Frequency estimate: NULL on NULL/undecodable input, never an
    * error. `value` is hashed exactly as `cms_agg` hashes its input. */
  def cms_estimate(sketch: Column, value: Column): Column =
    estimateHashedUdf(sketch,
      GraftBridge.column(hashed(GraftBridge.expression(value))))

  /** Exact total of all counts added to the sketch (for the eps×N
    * overcount bound). */
  def cms_total(sketch: Column): Column = totalUdf(sketch)

  /** Merge two sketches of identical geometry; NULL if either side is
    * NULL, undecodable, or incompatible. */
  def cms_merge(a: Column, b: Column): Column = mergeUdf(a, b)

  /** Aggregate MERGE of stored CMS sketches (exact counter addition) —
    * regrain hourly frequency windows to days. First geometry adopted;
    * incompatible rows skipped; NULL for an empty group. */
  def cms_merge_agg(sketch: Column): Column =
    GraftBridge.column(
      CmsMergeAggExpr(GraftBridge.expression(sketch)).toAggregateExpression())

  /** Every cms function as an expression builder — shared by the
    * per-session registration and the extensions path. */
  private[graft] def allBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cms_agg" -> {
      case Seq(v) => CmsAggExpr(hashed(v))
      case Seq(v, eps) =>
        CmsAggExpr(hashed(v), ArgEval.fraction(eps, "cms_agg eps"))
      case Seq(v, eps, conf) =>
        CmsAggExpr(hashed(v),
          ArgEval.fraction(eps, "cms_agg eps"),
          ArgEval.fraction(conf, "cms_agg confidence"))
      case other =>
        throw new IllegalArgumentException(
          s"cms_agg expects 1-3 arguments, got ${other.size}")
    },
    "cms_estimate" -> {
      case Seq(b, v) =>
        GraftBridge.udfExpression(estimateHashedUdf, Seq(b, hashed(v)))
      case other =>
        throw new IllegalArgumentException(
          s"cms_estimate expects 2 arguments, got ${other.size}")
    },
    "cms_total" -> {
      case Seq(b) => GraftBridge.udfExpression(totalUdf, Seq(b))
      case other =>
        throw new IllegalArgumentException(
          s"cms_total expects 1 argument, got ${other.size}")
    },
    "cms_merge" -> {
      case Seq(a, b) => GraftBridge.udfExpression(mergeUdf, Seq(a, b))
      case other =>
        throw new IllegalArgumentException(
          s"cms_merge expects 2 arguments, got ${other.size}")
    },
    "cms_merge_agg" -> {
      case Seq(b) => CmsMergeAggExpr(b)
      case other =>
        throw new IllegalArgumentException(
          s"cms_merge_agg expects 1 argument, got ${other.size}")
    })

  /** SQL registration (also done by Graft.register). */
  def register(spark: SparkSession): Unit =
    allBuilders.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }
}
