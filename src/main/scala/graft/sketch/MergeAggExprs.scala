package graft.sketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/**
 * Shared template for `*_merge_agg(sketch BLOB) → BLOB` aggregates:
 * merge ALREADY-BUILT sketches of one family — the rollup-view /
 * regrain path ("daily uniques from hourly KMV sketches", "daily heavy
 * hitters from hourly CMS+TopK windows") that `ddsketch_agg` covers
 * for quantile sketches. Error discipline mirrors it (reference
 * lib.rs:687-804): NULL and undecodable inputs are skipped, the first
 * decoded sketch is adopted (its geometry — k / eps / capacity / bits
 * — inherited), later geometry mismatches are skipped, NULL for an
 * empty group.
 *
 * The buffer starts as `null` (geometry unknown until the first
 * sketch decodes); serialize maps `null` to the empty byte array, the
 * one encoding no real sketch produces.
 */
abstract class SketchMergeAggBase[S >: Null <: AnyRef]
    extends TypedImperativeAggregate[S] with UnaryLike[Expression] {

  /** Decode or null (undecodable → skipped, never an error). */
  protected def decodeOrNull(bytes: Array[Byte]): S
  protected def encodeSketch(s: S): Array[Byte]
  /** Merge `other` into `buffer` when geometries line up; on mismatch
    * return `buffer` unchanged (the skip discipline). */
  protected def mergeInto(buffer: S, other: S): S

  def child: Expression
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a sketch BLOB column, got ${child.dataType}")

  override def createAggregationBuffer(): S = null

  override def update(buffer: S, input: InternalRow): S = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      // the decoded instance is fresh (owned here), safe to adopt/mutate
      val o = decodeOrNull(v.asInstanceOf[Array[Byte]])
      if (o == null) buffer
      else if (buffer == null) o
      else mergeInto(buffer, o)
    }
  }

  override def merge(buffer: S, other: S): S =
    if (other == null) buffer
    else if (buffer == null) other
    else mergeInto(buffer, other)

  override def eval(buffer: S): Any =
    if (buffer == null) null else encodeSketch(buffer)

  override def serialize(buffer: S): Array[Byte] =
    if (buffer == null) Array.emptyByteArray else encodeSketch(buffer)

  override def deserialize(bytes: Array[Byte]): S =
    if (bytes.isEmpty) null else decodeOrNull(bytes)
}

/** `kmv_merge_agg(sketch) → BLOB` — union of KMV distinct-count
  * sketches (exact min-hash set union, order-free). */
case class KmvMergeAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends SketchMergeAggBase[KmvSketch] {

  override def prettyName: String = "kmv_merge_agg"

  override protected def decodeOrNull(bytes: Array[Byte]): KmvSketch =
    try KmvSketch.decode(bytes) catch { case _: Exception => null }
  override protected def encodeSketch(s: KmvSketch): Array[Byte] =
    KmvSketch.encode(s)
  override protected def mergeInto(b: KmvSketch, o: KmvSketch): KmvSketch =
    if (b.k != o.k) b else { b.merge(o); b }

  override def withNewMutableAggBufferOffset(n: Int): KmvMergeAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvMergeAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KmvMergeAggExpr =
    copy(child = c)
}

/** `cms_merge_agg(sketch) → BLOB` — Count-Min counter addition
  * (exact long addition per cell, order-free). */
case class CmsMergeAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends SketchMergeAggBase[CountMinSketch] {

  override def prettyName: String = "cms_merge_agg"

  override protected def decodeOrNull(bytes: Array[Byte]): CountMinSketch =
    try CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    catch { case _: Exception => null }
  override protected def encodeSketch(s: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    s.writeTo(out)
    out.toByteArray
  }
  override protected def mergeInto(
      b: CountMinSketch, o: CountMinSketch): CountMinSketch =
    try { b.mergeInPlace(o); b }
    catch { case _: Exception => b }   // incompatible geometry → skip

  override def withNewMutableAggBufferOffset(n: Int): CmsMergeAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsMergeAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CmsMergeAggExpr =
    copy(child = c)
}

/** `topk_merge_agg(sketch) → BLOB` — mergeable-summaries combine of
  * space-saving heavy-hitter sketches (capacity mismatches skipped:
  * a cross-capacity combine silently loosens the error bounds). */
case class TopKMergeAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends SketchMergeAggBase[TopKSketch] {

  override def prettyName: String = "topk_merge_agg"

  override protected def decodeOrNull(bytes: Array[Byte]): TopKSketch =
    try TopKSketch.decode(bytes) catch { case _: Exception => null }
  override protected def encodeSketch(s: TopKSketch): Array[Byte] =
    TopKSketch.encode(s)
  override protected def mergeInto(b: TopKSketch, o: TopKSketch): TopKSketch =
    if (b.capacity != o.capacity) b else { b.merge(o); b }

  override def withNewMutableAggBufferOffset(n: Int): TopKMergeAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKMergeAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): TopKMergeAggExpr =
    copy(child = c)
}

/** `bloom_merge_agg(sketch) → BLOB` — bitwise OR of Bloom filters
  * (exact, order-free; incompatible bit widths skipped). */
case class BloomMergeAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends SketchMergeAggBase[BloomFilter] {

  override def prettyName: String = "bloom_merge_agg"

  override protected def decodeOrNull(bytes: Array[Byte]): BloomFilter =
    try BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    catch { case _: Exception => null }
  override protected def encodeSketch(s: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    s.writeTo(out)
    out.toByteArray
  }
  override protected def mergeInto(b: BloomFilter, o: BloomFilter): BloomFilter =
    try { b.mergeInPlace(o); b }
    catch { case _: Exception => b }   // incompatible geometry → skip

  override def withNewMutableAggBufferOffset(n: Int): BloomMergeAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomMergeAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BloomMergeAggExpr =
    copy(child = c)
}
