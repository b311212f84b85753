package graft.sketch

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the scalar sketch functions — these
 * run inside whole-stage codegen (each `doGenCode` emits a call to a
 * static [[SketchKernels]] method), replacing the Scala-UDF wrappers
 * and their serialization fence. NULL discipline per the reference
 * (lib.rs:191-602): NULL in, decode failure, or empty-sketch stat →
 * NULL out.
 */
object DDSketchScalarExprs {

  private[sketch] def checkType(
      name: String, e: Expression, expected: DataType): TypeCheckResult =
    if (e.dataType == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects $expected, got ${e.dataType}")
}

/** Base for BLOB → (boxed kernel result) expressions. */
abstract class SketchUnaryExpr extends UnaryExpression {
  def kernelMethod: String
  /** Unbox a non-null boxed kernel result to the internal value. */
  def unbox(r: AnyRef): Any
  def javaUnbox(resultVar: String): String

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    DDSketchScalarExprs.checkType(prettyName, child, BinaryType)

  override def nullSafeEval(blob: Any): Any = {
    val r = kernelInvoke(blob.asInstanceOf[Array[Byte]])
    if (r == null) null else unbox(r)
  }
  protected def kernelInvoke(blob: Array[Byte]): AnyRef

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kr = ctx.freshName("sketchKr")
      s"""
         |Object $kr = graft.sketch.SketchKernels.$kernelMethod($c);
         |if ($kr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${javaUnbox(kr)}; }
       """.stripMargin
    })
}

case class DDSketchCountExpr(child: Expression) extends SketchUnaryExpr {
  override def prettyName: String = "ddsketch_count"
  override def dataType: DataType = LongType
  override def kernelMethod: String = "count"
  override protected def kernelInvoke(b: Array[Byte]): AnyRef = SketchKernels.count(b)
  override def unbox(r: AnyRef): Any = r.asInstanceOf[java.lang.Long].longValue()
  override def javaUnbox(v: String): String = s"((java.lang.Long) $v).longValue()"
  override protected def withNewChildInternal(newChild: Expression): DDSketchCountExpr =
    copy(child = newChild)
}

abstract class SketchDoubleUnaryExpr extends SketchUnaryExpr {
  override def dataType: DataType = DoubleType
  override def unbox(r: AnyRef): Any = r.asInstanceOf[java.lang.Double].doubleValue()
  override def javaUnbox(v: String): String = s"((java.lang.Double) $v).doubleValue()"
}

case class DDSketchSumExpr(child: Expression) extends SketchDoubleUnaryExpr {
  override def prettyName: String = "ddsketch_sum"
  override def kernelMethod: String = "sum"
  override protected def kernelInvoke(b: Array[Byte]): AnyRef = SketchKernels.sum(b)
  override protected def withNewChildInternal(newChild: Expression): DDSketchSumExpr =
    copy(child = newChild)
}

case class DDSketchMinExpr(child: Expression) extends SketchDoubleUnaryExpr {
  override def prettyName: String = "ddsketch_min"
  override def kernelMethod: String = "min"
  override protected def kernelInvoke(b: Array[Byte]): AnyRef = SketchKernels.min(b)
  override protected def withNewChildInternal(newChild: Expression): DDSketchMinExpr =
    copy(child = newChild)
}

case class DDSketchMaxExpr(child: Expression) extends SketchDoubleUnaryExpr {
  override def prettyName: String = "ddsketch_max"
  override def kernelMethod: String = "max"
  override protected def kernelInvoke(b: Array[Byte]): AnyRef = SketchKernels.max(b)
  override protected def withNewChildInternal(newChild: Expression): DDSketchMaxExpr =
    copy(child = newChild)
}

case class DDSketchAvgExpr(child: Expression) extends SketchDoubleUnaryExpr {
  override def prettyName: String = "ddsketch_avg"
  override def kernelMethod: String = "avg"
  override protected def kernelInvoke(b: Array[Byte]): AnyRef = SketchKernels.avg(b)
  override protected def withNewChildInternal(newChild: Expression): DDSketchAvgExpr =
    copy(child = newChild)
}

/** `ddsketch_quantile(sketch BLOB, q DOUBLE) → DOUBLE` */
case class DDSketchQuantileExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "ddsketch_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = DDSketchScalarExprs.checkType(prettyName, left, BinaryType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else DDSketchScalarExprs.checkType(prettyName, right, DoubleType)
  }

  override def nullSafeEval(blob: Any, q: Any): Any = {
    val r = SketchKernels.quantile(blob.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, q) => {
      val kr = ctx.freshName("sketchKr")
      s"""
         |java.lang.Double $kr = graft.sketch.SketchKernels.quantile($b, $q);
         |if ($kr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $kr.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DDSketchQuantileExpr =
    copy(left = newLeft, right = newRight)
}

/** `ddsketch_cdf(sketch BLOB, x DOUBLE) → DOUBLE`: fraction of values
  * <= x — the inverse of `ddsketch_quantile`, with the same
  * value-domain relative-accuracy guarantee. A capability the
  * reference lacks but its sketch model supports directly. */
case class DDSketchCdfExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "ddsketch_cdf"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = DDSketchScalarExprs.checkType(prettyName, left, BinaryType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else DDSketchScalarExprs.checkType(prettyName, right, DoubleType)
  }

  override def nullSafeEval(blob: Any, x: Any): Any = {
    val r = SketchKernels.cdf(blob.asInstanceOf[Array[Byte]], x.asInstanceOf[Double])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, x) => {
      val kr = ctx.freshName("sketchKr")
      s"""
         |java.lang.Double $kr = graft.sketch.SketchKernels.cdf($b, $x);
         |if ($kr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $kr.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DDSketchCdfExpr =
    copy(left = newLeft, right = newRight)
}

/** `ddsketch_add(sketch BLOB, value DOUBLE) → BLOB` */
case class DDSketchAddExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "ddsketch_add"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = DDSketchScalarExprs.checkType(prettyName, left, BinaryType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else DDSketchScalarExprs.checkType(prettyName, right, DoubleType)
  }

  override def nullSafeEval(blob: Any, v: Any): Any =
    SketchKernels.add(blob.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v) => {
      val kr = ctx.freshName("sketchKr")
      s"""
         |byte[] $kr = graft.sketch.SketchKernels.add($b, $v);
         |if ($kr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $kr; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DDSketchAddExpr =
    copy(left = newLeft, right = newRight)
}

/** `ddsketch_add_weighted(sketch BLOB, value DOUBLE, count DOUBLE) →
  * BLOB`: weighted insert for pre-aggregated (value, count) inputs —
  * the reference core's `add_with_count` (datadog_encoding.rs:718-747)
  * surfaced to SQL/Column users. `count <= 0` (and NaN) inserts
  * nothing, matching the reference's skip semantics. */
case class DDSketchAddWeightedExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def prettyName: String = "ddsketch_add_weighted"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val a = DDSketchScalarExprs.checkType(prettyName, first, BinaryType)
    if (a != TypeCheckResult.TypeCheckSuccess) return a
    val b = DDSketchScalarExprs.checkType(prettyName, second, DoubleType)
    if (b != TypeCheckResult.TypeCheckSuccess) return b
    DDSketchScalarExprs.checkType(prettyName, third, DoubleType)
  }

  override def nullSafeEval(blob: Any, v: Any, c: Any): Any =
    SketchKernels.addWeighted(blob.asInstanceOf[Array[Byte]],
      v.asInstanceOf[Double], c.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v, c) => {
      val kr = ctx.freshName("sketchKr")
      s"""
         |byte[] $kr = graft.sketch.SketchKernels.addWeighted($b, $v, $c);
         |if ($kr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $kr; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): DDSketchAddWeightedExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `ddsketch_merge(s1 BLOB, s2 BLOB) → BLOB` */
case class DDSketchMergeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "ddsketch_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = DDSketchScalarExprs.checkType(prettyName, left, BinaryType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else DDSketchScalarExprs.checkType(prettyName, right, BinaryType)
  }

  override def nullSafeEval(b1: Any, b2: Any): Any =
    SketchKernels.merge(b1.asInstanceOf[Array[Byte]], b2.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val kr = ctx.freshName("sketchKr")
      s"""
         |byte[] $kr = graft.sketch.SketchKernels.merge($a, $b);
         |if ($kr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $kr; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DDSketchMergeExpr =
    copy(left = newLeft, right = newRight)
}

/** `ddsketch_stats(sketch BLOB) → STRUCT<count BIGINT, sum DOUBLE,
  * min DOUBLE, max DOUBLE, avg DOUBLE>`: all five stats from ONE
  * decode (field order per reference lib.rs:609-615). Native
  * expression — runs inside whole-stage codegen like the other
  * scalars; previously the last struct-returning Scala UDF. */
case class DDSketchStatsExpr(child: Expression) extends SketchUnaryExpr {
  override def prettyName: String = "ddsketch_stats"
  override def dataType: DataType = DDSketchStatsExpr.schema
  override def kernelMethod: String = "statsRow"
  override protected def kernelInvoke(b: Array[Byte]): AnyRef = SketchKernels.statsRow(b)
  override def unbox(r: AnyRef): Any = r
  override def javaUnbox(v: String): String =
    s"(org.apache.spark.sql.catalyst.InternalRow) $v"
  override protected def withNewChildInternal(newChild: Expression): DDSketchStatsExpr =
    copy(child = newChild)
}

object DDSketchStatsExpr {
  /** Same shape the UDF encoder produced for Stats5: non-null count,
    * nullable numeric stats (NULL on an empty sketch). */
  val schema: StructType = StructType(Seq(
    StructField("count", LongType, nullable = false),
    StructField("sum", DoubleType),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("avg", DoubleType)))
}

/** `ddsketch_histogram(sketch BLOB, lo DOUBLE, hi DOUBLE, nbins INT) →
  * ARRAY<DOUBLE>`: approximate equi-width histogram from one decode
  * (see [[SketchKernels.histogram]]). NULL on bad input, empty sketch,
  * or degenerate range — never an error. */
case class DDSketchHistogramExpr(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def prettyName: String = "ddsketch_histogram"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val a = DDSketchScalarExprs.checkType(prettyName, first, BinaryType)
    if (a != TypeCheckResult.TypeCheckSuccess) return a
    val b = DDSketchScalarExprs.checkType(prettyName, second, DoubleType)
    if (b != TypeCheckResult.TypeCheckSuccess) return b
    val c = DDSketchScalarExprs.checkType(prettyName, third, DoubleType)
    if (c != TypeCheckResult.TypeCheckSuccess) return c
    DDSketchScalarExprs.checkType(prettyName, fourth, IntegerType)
  }

  override def nullSafeEval(blob: Any, lo: Any, hi: Any, nbins: Any): Any =
    SketchKernels.histogramArray(blob.asInstanceOf[Array[Byte]],
      lo.asInstanceOf[Double], hi.asInstanceOf[Double], nbins.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, lo, hi, n) => {
      val kr = ctx.freshName("sketchKr")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $kr =
         |  graft.sketch.SketchKernels.histogramArray($b, $lo, $hi, $n);
         |if ($kr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $kr; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): DDSketchHistogramExpr =
    copy(first = f, second = s, third = t, fourth = q)
}

/** `ddsketch_create(accuracy DOUBLE) → BLOB` */
case class DDSketchCreateExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "ddsketch_create"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    DDSketchScalarExprs.checkType(prettyName, child, DoubleType)

  override def nullSafeEval(acc: Any): Any =
    SketchKernels.create(acc.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.sketch.SketchKernels.create($a);")

  override protected def withNewChildInternal(newChild: Expression): DDSketchCreateExpr =
    copy(child = newChild)
}
