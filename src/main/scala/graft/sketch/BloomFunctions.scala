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
import org.apache.spark.util.sketch.BloomFilter

/**
 * `bloom_agg(expr[, items[, fpp]]) → BLOB`: Bloom-filter membership
 * sketch aggregate over any hashable column (hashed by codegen'd
 * XxHash64, like kmv_agg). The buffer is Spark's public
 * `org.apache.spark.util.sketch.BloomFilter`; its stream codec doubles
 * as the shuffle/spill format, so sketches built on different
 * partitions OR-merge in the standard partial/final contract.
 *
 * Pipeline role at 100 TB: a fourth mergeable-monoid family for
 * membership — build once over the corpus's content hashes, broadcast
 * the (MB-scale) filter, and pre-filter incoming batches for
 * probably-seen documents before any join or shuffle. No false
 * negatives; false-positive rate bounded by `fpp` at the configured
 * capacity.
 */
case class BloomAggExpr(
    child: Expression,
    expectedItems: Long = bloom.DefaultItems,
    fpp: Double = bloom.DefaultFpp,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter]
    with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a LONG hash child (wrap input in xxhash64), got ${child.dataType}")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  // both buffers come from createAggregationBuffer with identical
  // (items, fpp), so bit widths always line up
  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAggExpr =
    copy(child = newChild)
}

/** Column + SQL surface for the Bloom membership family. */
object bloom {

  val DefaultItems: Long = 1000000L
  val DefaultFpp: Double = 0.01

  // same NULL discipline as kmv: a NULL input contributes nothing
  // (XxHash64 of null would alias the seed value)
  private def hashed(e: Expression): Expression =
    If(IsNull(e), Literal(null, LongType), new XxHash64(Seq(e), 42L))

  /** Aggregate: Bloom filter over the column's values. */
  def bloom_agg(value: Column): Column = bloom_agg(value, DefaultItems, DefaultFpp)

  def bloom_agg(value: Column, expectedItems: Long, fpp: Double): Column =
    GraftBridge.column(
      BloomAggExpr(hashed(GraftBridge.expression(value)), expectedItems, fpp)
        .toAggregateExpression())

  // The dominant probe pattern is one corpus-wide filter checked against
  // millions of rows (crossJoin of a 1-row bloom), which would pay a
  // full MB-scale deserialization per row — the reference's known
  // per-call-decode flaw. A thread-local most-recent-decode cache turns
  // that into one decode (plus one memcmp per row) per task. The memcmp
  // is the sound identity check — any sampled-bytes shortcut could
  // alias two different filters — and it is ~50-100x cheaper than the
  // decode it replaces (no allocation, no bit-set reconstruction). The
  // key is cloned because Spark surfaces a fresh array per row, so the
  // caller's buffer can never be assumed stable.
  private val lastDecoded = new ThreadLocal[(Array[Byte], BloomFilter)]

  /** Counts full filter decodes (spec hook: the broadcast probe path
    * must decode once per QUERY, not once per row/executor). */
  private[graft] val decodeCount = new java.util.concurrent.atomic.AtomicLong

  private def decodeCached(b: Array[Byte]): BloomFilter = {
    val cached = lastDecoded.get()
    if (cached != null && java.util.Arrays.equals(cached._1, b)) cached._2
    else {
      decodeCount.incrementAndGet()
      val f = BloomFilter.readFrom(new ByteArrayInputStream(b))
      lastDecoded.set((b.clone(), f))
      f
    }
  }

  private[graft] val containsHashedUdf: UserDefinedFunction =
    F.udf { (b: Array[Byte], h: java.lang.Long) =>
      val r: java.lang.Boolean =
        if (b == null || h == null) null
        else {
          try java.lang.Boolean.valueOf(decodeCached(b).mightContainLong(h))
          catch { case _: Exception => null }
        }
      r
    }.withName("bloom_contains")

  /** Membership probe: NULL on NULL/undecodable input, never an error.
    * `value` is hashed exactly as `bloom_agg` hashes its input.
    *
    * This is the SQL-compatible per-row form: the filter BYTES flow
    * through the plan, so every probed row pays a fresh copy of the
    * serialized filter out of its InternalRow plus the cache-validation
    * memcmp — O(filter size) memory traffic per row, MB-scale at the
    * default capacity. Fine for row-scale probes and SQL registration;
    * for corpus-scale probes against ONE filter use [[decodeFilter]] +
    * [[contains_broadcast]] (or [[SketchOps.bloomPrune]]), which never
    * put the bytes in the plan. */
  def bloom_contains(sketch: Column, value: Column): Column =
    containsHashedUdf(sketch,
      GraftBridge.column(hashed(GraftBridge.expression(value))))

  /**
   * Materialize a 1-row filter DataFrame (single BINARY column — e.g.
   * the output of `df.agg(bloom_agg(...))`) and decode it ONCE on the
   * driver. Runs one tiny Spark job eagerly (the aggregate is a 1-row
   * collect; at 100 TB the build side still map-side-combines to one
   * row per partition before the final OR-merge). Returns null when the
   * frame is empty or the blob is NULL/undecodable — callers treat that
   * as "no filter" (NULL discipline, never an error).
   */
  def decodeFilter(filterDf: org.apache.spark.sql.DataFrame): BloomFilter = {
    val rows = filterDf.head(1)
    if (rows.isEmpty) return null
    val bytes = rows.head.get(0) match {
      case b: Array[Byte] => b
      case _ => null
    }
    if (bytes == null) return null
    try {
      decodeCount.incrementAndGet()
      BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /**
   * Corpus-scale membership probe against a broadcast of the DECODED
   * filter: O(1) per row — one xxhash64 (codegen'd, in-plan) plus one
   * bit-test against the executor-local broadcast value. The serialized
   * filter never enters the plan, so no per-row copy and no per-row
   * memcmp; each executor deserializes the broadcast exactly once.
   * NULL values probe to NULL. `bf` null (from an empty/undecodable
   * build side) yields all-NULL probes.
   */
  def contains_broadcast(
      bf: org.apache.spark.broadcast.Broadcast[BloomFilter],
      value: Column): Column = {
    val probe = F.udf { (h: java.lang.Long) =>
      val r: java.lang.Boolean =
        if (h == null || bf.value == null) null
        else java.lang.Boolean.valueOf(bf.value.mightContainLong(h))
      r
    }.withName("bloom_contains_broadcast")
    probe(GraftBridge.column(hashed(GraftBridge.expression(value))))
  }

  /** One-call convenience: build a filter over `keys`' single column,
    * decode it driver-side, and return the broadcast handle for
    * [[contains_broadcast]] probes. */
  def broadcastFilter(
      keys: org.apache.spark.sql.DataFrame,
      keyCol: String,
      expectedItems: Long = DefaultItems,
      fpp: Double = DefaultFpp): org.apache.spark.broadcast.Broadcast[BloomFilter] = {
    val filt = keys.agg(bloom_agg(F.col(keyCol), expectedItems, fpp).as("__bf"))
    keys.sparkSession.sparkContext.broadcast(decodeFilter(filt))
  }

  /** Aggregate MERGE of stored Bloom filters (bitwise OR) — union
    * nightly membership filters into the corpus filter. First bit
    * geometry adopted; incompatible rows skipped; NULL for an empty
    * group. */
  def bloom_merge_agg(sketch: Column): Column =
    GraftBridge.column(
      BloomMergeAggExpr(GraftBridge.expression(sketch)).toAggregateExpression())

  /** Every bloom function as an expression builder — shared by the
    * per-session registration and the extensions path. */
  private[graft] def allBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "bloom_merge_agg" -> {
      case Seq(b) => BloomMergeAggExpr(b)
      case other =>
        throw new IllegalArgumentException(
          s"bloom_merge_agg expects 1 argument, got ${other.size}")
    },
    "bloom_agg" -> {
      case Seq(v) => BloomAggExpr(hashed(v))
      case Seq(v, items) =>
        BloomAggExpr(hashed(v), ArgEval.positiveInt(items, "bloom_agg items").toLong)
      case Seq(v, items, fpp) =>
        BloomAggExpr(hashed(v),
          ArgEval.positiveInt(items, "bloom_agg items").toLong,
          ArgEval.fraction(fpp, "bloom_agg fpp"))
      case other =>
        throw new IllegalArgumentException(
          s"bloom_agg expects 1-3 arguments, got ${other.size}")
    },
    "bloom_contains" -> {
      case Seq(b, v) =>
        GraftBridge.udfExpression(containsHashedUdf, Seq(b, hashed(v)))
      case other =>
        throw new IllegalArgumentException(
          s"bloom_contains expects 2 arguments, got ${other.size}")
    })

  /** SQL registration (also done by Graft.register). */
  def register(spark: SparkSession): Unit =
    allBuilders.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }
}
