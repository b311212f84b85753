package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, Encoders, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.{functions => F}

/**
 * Column-level API + SQL registration for the sketch function surface.
 *
 * Mirrors the reference extension's 11 SQL functions
 * (reference: src/lib.rs:53-1037) as Spark UDFs/UDAFs. Error discipline
 * matches the reference: every failure (NULL input, undecodable blob,
 * merge mismatch) yields NULL, never a query-time error
 * (lib.rs:191-194, 241-248, 296-300).
 */
object functions {

  /** 5-field result shape of the scalar `ddsketch_stats` (order per
    * lib.rs:609-615) — the typed mirror of [[DDSketchStatsExpr.schema]]
    * for Dataset users mapping the struct. */
  case class Stats5(
      count: Long,
      sum: Option[Double],
      min: Option[Double],
      max: Option[Double],
      avg: Option[Double])

  private def decodeOrNull(blob: Array[Byte]): DDSketch =
    if (blob == null) null
    else {
      try DataDogCodec.decode(blob)
      catch { case _: Exception => null }
    }

  // ------------------------------------------------------------- scalar UDFs
  // Scalar functions — including the struct-returning stats and the
  // array-returning histogram — are native Catalyst expressions
  // (DDSketchScalarExprs); only the fusion-rule targets below remain
  // UDFs (they exist to be rewritten in by MultiQuantileFusion).

  /** Invocation counter, exposed for tests asserting that codegen
    * common-subexpression elimination runs the fused UDF once per row. */
  val multiQuantileInvocations = new java.util.concurrent.atomic.AtomicLong

  /** Fused form rewritten in by [[graft.plans.MultiQuantileFusion]]: one
    * decode, many quantiles. Per-q failures surface as NaN (a sketch can
    * never legitimately produce NaN), re-mapped to NULL by the rewrite. */
  private[graft] val multiQuantileUdf: UserDefinedFunction =
    F.udf { (blob: Array[Byte], qs: Seq[Double]) =>
      multiQuantileInvocations.incrementAndGet()
      val s = decodeOrNull(blob)
      val r: Array[Double] =
        if (s == null) null
        else qs.map(q => s.quantile(q)).toArray
      r
    }.withName("ddsketch_multi_quantile")

  /** Column form of the fused call (also usable directly). */
  def ddsketch_quantiles(sketch: Column, qs: Seq[Double]): Column =
    multiQuantileUdf(sketch, F.array(qs.map(F.lit): _*))

  /** Invocation counter for the fused multi-cdf, mirroring
    * [[multiQuantileInvocations]]. */
  val multiCdfInvocations = new java.util.concurrent.atomic.AtomicLong

  /** Fused multi-threshold CDF rewritten in by the fusion rule: one
    * decode, many thresholds (the SLO-dashboard shape). Per-x failures
    * surface as NaN, re-mapped to NULL by the rewrite. */
  private[graft] val multiCdfUdf: UserDefinedFunction =
    F.udf { (blob: Array[Byte], xs: Seq[Double]) =>
      multiCdfInvocations.incrementAndGet()
      val s = decodeOrNull(blob)
      val r: Array[Double] =
        if (s == null) null
        else xs.map(x => s.cdf(x)).toArray
      r
    }.withName("ddsketch_multi_cdf")

  /** Column form of the fused multi-cdf (also usable directly). */
  def ddsketch_cdfs(sketch: Column, xs: Seq[Double]): Column =
    multiCdfUdf(sketch, F.array(xs.map(F.lit): _*))

  /** Approximate equi-width histogram over [lo, hi) from one decode
    * (native expression; see [[SketchKernels.histogram]]). Numeric
    * arguments are cast like the UDF's analyzer coercion was. */
  def ddsketch_histogram(sketch: Column, lo: Column, hi: Column, nbins: Column): Column =
    GraftBridge.column(DDSketchHistogramExpr(
      GraftBridge.expression(sketch),
      GraftBridge.expression(lo.cast("double")),
      GraftBridge.expression(hi.cast("double")),
      GraftBridge.expression(nbins.cast("int"))))
  def ddsketch_histogram(sketch: Column, lo: Double, hi: Double, nbins: Int): Column =
    ddsketch_histogram(sketch, F.lit(lo), F.lit(hi), F.lit(nbins))

  // ---------------------------------------------------------------- UDAFs
  // Aggregates are native TypedImperativeAggregates (DDSketchAggExprs,
  // DDSketchStatsAggExprs); the Aggregator classes in DDSketchAgg.scala
  // remain as the public Dataset-typed alternative.

  // ------------------------------------------------------------ Column API

  import org.apache.spark.sql.GraftBridge

  /** Empty serialized sketch with the given relative accuracy. */
  def ddsketch_create(accuracy: Column): Column =
    GraftBridge.column(DDSketchCreateExpr(GraftBridge.expression(accuracy)))
  def ddsketch_create(): Column = ddsketch_create(F.lit(DDSketch.DefaultRelativeAccuracy))

  /** 1-row DataFrame with an empty sketch — the faithful equivalent of the
    * reference's table function `ddsketch_create` (lib.rs:53-113). */
  def ddsketchCreateDF(spark: SparkSession, accuracy: Double = DDSketch.DefaultRelativeAccuracy): DataFrame =
    spark.range(1).select(ddsketch_create(F.lit(accuracy)).as("sketch"))

  private def e(c: Column) = GraftBridge.expression(c)

  def ddsketch_add(sketch: Column, value: Column): Column =
    GraftBridge.column(DDSketchAddExpr(e(sketch), e(value)))
  /** Weighted insert — `add_with_count` semantics: count <= 0 is a no-op. */
  def ddsketch_add_weighted(sketch: Column, value: Column, count: Column): Column =
    GraftBridge.column(DDSketchAddWeightedExpr(e(sketch), e(value), e(count)))
  def ddsketch_merge(s1: Column, s2: Column): Column =
    GraftBridge.column(DDSketchMergeExpr(e(s1), e(s2)))
  def ddsketch_quantile(sketch: Column, q: Column): Column =
    GraftBridge.column(DDSketchQuantileExpr(e(sketch), e(q)))
  def ddsketch_quantile(sketch: Column, q: Double): Column =
    ddsketch_quantile(sketch, F.lit(q))
  def ddsketch_cdf(sketch: Column, x: Column): Column =
    GraftBridge.column(DDSketchCdfExpr(e(sketch), e(x)))
  def ddsketch_cdf(sketch: Column, x: Double): Column =
    ddsketch_cdf(sketch, F.lit(x))
  def ddsketch_count(sketch: Column): Column =
    GraftBridge.column(DDSketchCountExpr(e(sketch)))
  def ddsketch_min(sketch: Column): Column =
    GraftBridge.column(DDSketchMinExpr(e(sketch)))
  def ddsketch_max(sketch: Column): Column =
    GraftBridge.column(DDSketchMaxExpr(e(sketch)))
  def ddsketch_sum(sketch: Column): Column =
    GraftBridge.column(DDSketchSumExpr(e(sketch)))
  def ddsketch_avg(sketch: Column): Column =
    GraftBridge.column(DDSketchAvgExpr(e(sketch)))
  def ddsketch_stats(sketch: Column): Column =
    GraftBridge.column(DDSketchStatsExpr(e(sketch)))

  /** Aggregate: merge all sketch blobs in the group (native Catalyst
    * TypedImperativeAggregate — codec-serialized buffers, no boxing). */
  def ddsketch_agg(sketch: Column): Column =
    GraftBridge.column(
      DDSketchMergeAggExpr(GraftBridge.expression(sketch)).toAggregateExpression())

  /** Aggregate: merge all sketch blobs, return 12-field stats struct. */
  def ddsketch_stats_agg(sketch: Column): Column =
    GraftBridge.column(
      DDSketchStatsAggExpr(GraftBridge.expression(sketch)).toAggregateExpression())

  /** Aggregate: build a sketch from pre-aggregated (value, count) rows —
    * the warehouse shape where inputs arrive already grouped. NULL or
    * non-positive counts contribute nothing. */
  def ddsketch_agg_weighted(value: Column, count: Column): Column =
    GraftBridge.column(
      DDSketchAggWeightedExpr(GraftBridge.expression(value),
        GraftBridge.expression(count)).toAggregateExpression())
  def ddsketch_agg_weighted(value: Column, count: Column, accuracy: Double): Column =
    GraftBridge.column(
      DDSketchAggWeightedExpr(GraftBridge.expression(value),
        GraftBridge.expression(count), accuracy).toAggregateExpression())

  /** Aggregate: build a sketch from a DOUBLE column (default accuracy). */
  def ddsketch_agg_values(value: Column): Column =
    GraftBridge.column(
      DDSketchAggValuesExpr(GraftBridge.expression(value)).toAggregateExpression())

  /** Aggregate: build a sketch from a DOUBLE column with explicit accuracy. */
  def ddsketch_agg_values(value: Column, accuracy: Double): Column =
    GraftBridge.column(
      DDSketchAggValuesExpr(GraftBridge.expression(value), accuracy).toAggregateExpression())

  /** Aggregate: raw DOUBLE column in, 12-field stats struct out. */
  def ddsketch_stats_agg_values(value: Column): Column =
    GraftBridge.column(
      DDSketchStatsValuesAggExpr(GraftBridge.expression(value)).toAggregateExpression())
  def ddsketch_stats_agg_values(value: Column, accuracy: Double): Column =
    GraftBridge.column(
      DDSketchStatsValuesAggExpr(GraftBridge.expression(value), accuracy)
        .toAggregateExpression())
}

/** SQL-name registration so every function is usable from `spark.sql`. */
object Graft {

  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types.{DoubleType, NumericType}

  // numeric args get an explicit cast: SQL literals arrive as
  // Decimal/Integer and, unlike UDFs, bare expressions receive no
  // implicit coercion from the analyzer
  private def toDouble(e: Expression): Expression = e.dataType match {
    case DoubleType => e
    case _: NumericType => Cast(e, DoubleType)
    case _ => e // let checkInputDataTypes report it
  }

  private def toInt(e: Expression): Expression = e.dataType match {
    case org.apache.spark.sql.types.IntegerType => e
    case _: NumericType => Cast(e, org.apache.spark.sql.types.IntegerType)
    case _ => e // let checkInputDataTypes report it
  }

  // SQL accuracy literals arrive as DecimalType: evaluate through a
  // cast; NULL / non-numeric / out-of-range fall back to the default
  // accuracy, matching the reference's lenient parameter parsing
  // (reference lib.rs:72-77)
  private def evalDouble(e: Expression): Double = {
    val v: Any = e.dataType match {
      case _: NumericType => toDouble(e).eval(null)
      case _ => null
    }
    v match {
      case d: java.lang.Double if d > 0.0 && d < 1.0 => d.doubleValue()
      case _ => DDSketch.DefaultRelativeAccuracy
    }
  }

  /** Expression builders for every sketch SQL function — shared by the
    * per-session [[register]] path and the [[graft.GraftExtensions]]
    * `spark.sql.extensions` injection path. */
  private[graft] def expressionBuilders: Seq[(String, Seq[Expression] => Expression)] = {
    def unary(name: String, f: Expression => Expression): (String, Seq[Expression] => Expression) =
      name -> (exprs => f(exprs.head))
    Seq(
      "ddsketch_create" -> ((exprs: Seq[Expression]) => DDSketchCreateExpr(toDouble(exprs.head))),
      unary("ddsketch_count", DDSketchCountExpr),
      unary("ddsketch_min", DDSketchMinExpr),
      unary("ddsketch_max", DDSketchMaxExpr),
      unary("ddsketch_sum", DDSketchSumExpr),
      unary("ddsketch_avg", DDSketchAvgExpr),
      unary("ddsketch_stats", DDSketchStatsExpr),
      "ddsketch_histogram" -> ((exprs: Seq[Expression]) =>
        DDSketchHistogramExpr(exprs.head, toDouble(exprs(1)),
          toDouble(exprs(2)), toInt(exprs(3)))),
      "ddsketch_add" -> ((exprs: Seq[Expression]) =>
        DDSketchAddExpr(exprs.head, toDouble(exprs(1)))),
      "ddsketch_add_weighted" -> ((exprs: Seq[Expression]) =>
        DDSketchAddWeightedExpr(exprs.head, toDouble(exprs(1)), toDouble(exprs(2)))),
      "ddsketch_merge" -> ((exprs: Seq[Expression]) =>
        DDSketchMergeExpr(exprs.head, exprs(1))),
      "ddsketch_quantile" -> ((exprs: Seq[Expression]) =>
        DDSketchQuantileExpr(exprs.head, toDouble(exprs(1)))),
      "ddsketch_cdf" -> ((exprs: Seq[Expression]) =>
        DDSketchCdfExpr(exprs.head, toDouble(exprs(1)))),
      // native aggregate expressions (analyzer wraps bare AggregateFunctions)
      "ddsketch_stats_agg" -> ((exprs: Seq[Expression]) => DDSketchStatsAggExpr(exprs.head)),
      "ddsketch_stats_agg_values" -> { (exprs: Seq[Expression]) => exprs match {
        case Seq(v) => DDSketchStatsValuesAggExpr(toDouble(v))
        case Seq(v, acc) => DDSketchStatsValuesAggExpr(toDouble(v), evalDouble(acc))
        case other =>
          throw new IllegalArgumentException(
            s"ddsketch_stats_agg_values expects 1 or 2 arguments, got ${other.size}")
      }},
      "ddsketch_agg" -> ((exprs: Seq[Expression]) => DDSketchMergeAggExpr(exprs.head)),
      "ddsketch_agg_weighted" -> { (exprs: Seq[Expression]) => exprs match {
        case Seq(v, c) => DDSketchAggWeightedExpr(toDouble(v), toDouble(c))
        case Seq(v, c, acc) => DDSketchAggWeightedExpr(toDouble(v), toDouble(c), evalDouble(acc))
        case other =>
          throw new IllegalArgumentException(
            s"ddsketch_agg_weighted expects 2 or 3 arguments, got ${other.size}")
      }},
      "ddsketch_agg_values" -> { (exprs: Seq[Expression]) => exprs match {
        case Seq(v) => DDSketchAggValuesExpr(toDouble(v))
        case Seq(v, acc) => DDSketchAggValuesExpr(toDouble(v), evalDouble(acc))
        case other =>
          throw new IllegalArgumentException(
            s"ddsketch_agg_values expects 1 or 2 arguments, got ${other.size}")
      }})
  }

  /** Table-valued functions: `SELECT sketch FROM ddsketch_create(0.01)`
    * — the reference's own surface shape (its ddsketch_create IS a
    * 1-row table function, lib.rs:53-113). The accuracy argument must
    * be a literal (it parameterizes the emitted row); the plan is a
    * 1-row LocalRelation, so there is nothing to execute distributively
    * — exactly like the reference's emit-once-then-done table state. */
  private[graft] def tableFunctionBuilders
      : Seq[(String, Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    Seq("ddsketch_create" -> { (exprs: Seq[Expression]) =>
      val acc = exprs.headOption.map(evalDouble)
        .getOrElse(DDSketch.DefaultRelativeAccuracy)
      LocalRelation(
        Seq(AttributeReference("sketch",
          org.apache.spark.sql.types.BinaryType, nullable = false)()),
        Seq(InternalRow(SketchKernels.create(acc))))
    })
  }

  /** EVERY graft SQL function as an expression builder (UDF-backed ones
    * wrapped through GraftBridge.udfExpression) — the complete set the
    * extensions path injects. */
  private[graft] def allFunctionBuilders: Seq[(String, Seq[Expression] => Expression)] =
    expressionBuilders ++
      kmv.allBuilders ++ topk.allBuilders ++ bloom.allBuilders ++
      cms.allBuilders ++ graft.pipeline.VectorAgg.allBuilders

  /** Idempotent; call once per SparkSession. (Sessions built with
    * `spark.sql.extensions=graft.GraftExtensions` need no call at all.) */
  def register(spark: SparkSession): Unit = {
    // optimizer rules (idempotent: extraOptimizations is replaced, not appended)
    spark.experimental.extraOptimizations =
      (spark.experimental.extraOptimizations.filterNot(
        _ eq graft.plans.MultiQuantileFusion) :+ graft.plans.MultiQuantileFusion)
    import org.apache.spark.sql.GraftBridge.{registerFunction => reg}
    expressionBuilders.foreach { case (name, builder) => reg(spark, name, builder) }
    tableFunctionBuilders.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftBridge.registerTableFunction(spark, name, builder)
    }
    kmv.register(spark)
    topk.register(spark)
    bloom.register(spark)
    cms.register(spark)
    graft.pipeline.VectorAgg.register(spark)
  }
}
