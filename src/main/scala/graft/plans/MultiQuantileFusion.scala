package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{Column, functions => F}

/**
 * Optimizer rule fusing repeated `ddsketch_quantile(sk, q_i)` — and
 * likewise `ddsketch_cdf(sk, x_i)` — calls over the same sketch
 * expression into a single fused multi-call plus per-argument array
 * extracts.
 *
 * The reference documents this exact optimization as a manual query
 * rewrite users should perform because every scalar call pays a full
 * sketch decode (reference: README.md:236-238, 265-295); here Catalyst
 * performs it automatically. After the rewrite all N extracts share one
 * identical ScalaUDF subtree, which whole-stage codegen's
 * common-subexpression elimination evaluates once per row: N decodes
 * become 1.
 *
 * Install via `spark.experimental.extraOptimizations` (done by
 * `Graft.register`) or `spark.sql.extensions=graft.plans.GraftExtensions`.
 */
object MultiQuantileFusion extends Rule[LogicalPlan] {

  /** One fusable scalar family: how to recognize a call and the fused
    * multi-call template (captured from an analyzed plan once, avoiding
    * hand-assembled input encoders). */
  private final class Spec(
      val isCall: Expression => Boolean,
      templateCol: => Column) {
    lazy val template: ScalaUDF = {
      val spark = SparkSession.active
      val df = spark.range(1).select(templateCol)
      df.queryExecution.analyzed.expressions
        .flatMap(_.collect { case u: ScalaUDF => u })
        .headOption
        .getOrElse(throw new IllegalStateException("fusion template not found"))
    }
  }

  // A fusable scalar argument: foldable non-NULL double (a NULL arg must
  // stay on the single-call path, which returns NULL; a null element
  // inside the fused array would error instead).
  private def fusableArg(e: Expression): Boolean =
    e.foldable && e.dataType == DoubleType &&
      (try e.eval(null) != null catch { case _: Exception => false })

  private lazy val specs: Seq[Spec] = Seq(
    new Spec(
      {
        // matches both the native expression form and (legacy) named UDFs
        case q: graft.sketch.DDSketchQuantileExpr => fusableArg(q.right)
        case u: ScalaUDF =>
          u.udfName.contains("ddsketch_quantile") && u.children.size == 2 &&
            fusableArg(u.children(1))
        case _ => false
      },
      graft.sketch.functions.ddsketch_quantiles(
        F.lit(null).cast("binary"), Seq(0.5))),
    new Spec(
      {
        case c: graft.sketch.DDSketchCdfExpr => fusableArg(c.right)
        case u: ScalaUDF =>
          u.udfName.contains("ddsketch_cdf") && u.children.size == 2 &&
            fusableArg(u.children(1))
        case _ => false
      },
      graft.sketch.functions.ddsketch_cdfs(
        F.lit(null).cast("binary"), Seq(0.5))))

  override def apply(plan: LogicalPlan): LogicalPlan =
    specs.foldLeft(plan)((p, spec) => fuse(p, spec))

  private def fuse(plan: LogicalPlan, spec: Spec): LogicalPlan = plan.transform {
    // `SELECT q(agg(x),.5), q(agg(x),.95) ... GROUP BY k` puts the
    // scalar calls directly in Aggregate.aggregateExpressions, where
    // result-projection CSE is not guaranteed — split: the (deduped)
    // sketch aggregate stays in the Aggregate, the fused extraction
    // moves into a Project above it (where codegen CSE applies).
    case a: Aggregate =>
      val topCalls = a.aggregateExpressions.collect {
        case al @ Alias(e, _) if spec.isCall(e) => al
      }
      val groups = topCalls.groupBy(_.child.children.head.canonicalized)
        .filter { case (_, als) =>
          als.map(_.child.children(1).canonicalized).distinct.size >= 2 }
      if (groups.isEmpty) a
      else {
        val fusedIds = groups.flatMap(_._2.map(_.exprId)).toSet
        // one alias per distinct sketch expression, kept in the
        // Aggregate — reusing any surviving alias of the same aggregate
        // (the user's own, or one a previous spec's pass created), so a
        // mixed quantile+cdf query still runs the sketch aggregation
        // once per group rather than once per family
        val sketchAliases: Map[Expression, Alias] = groups.map { case (canon, als) =>
          val existing = a.aggregateExpressions.collectFirst {
            case ex @ Alias(child, _)
                if child.canonicalized == canon && !fusedIds.contains(ex.exprId) => ex
          }
          canon -> existing.getOrElse(Alias(als.head.child.children.head, "__fused_sketch")())
        }
        val survivors = a.aggregateExpressions.filterNot(
          ne => fusedIds.contains(ne.exprId))
        val keptAggList = survivors ++
          sketchAliases.values.filterNot(al => survivors.exists(_.exprId == al.exprId))
        val aggNode = a.copy(aggregateExpressions = keptAggList)
        val projList: Seq[NamedExpression] = a.aggregateExpressions.map {
          case al @ Alias(e, name) if fusedIds.contains(al.exprId) =>
            val canon = e.children.head.canonicalized
            val als = groups(canon)
            val argExprs = als.map(_.child.children(1).canonicalized).distinct
            val argIndex = argExprs.zipWithIndex.toMap
            val fused = spec.template.copy(children = Seq(
              sketchAliases(canon).toAttribute,
              CreateArray(argExprs.map(_.asInstanceOf[Expression]))))
            val item = GetArrayItem(fused, Literal(argIndex(e.children(1).canonicalized)))
            Alias(CaseWhen(Seq((IsNaN(item), Literal(null, DoubleType))), item),
              name)(exprId = al.exprId)
          case ne => ne.toAttribute
        }
        Project(projList, aggNode)
      }

    case p: Project =>
      // group calls by canonicalized sketch expression
      val calls = p.projectList.flatMap(_.collect {
        case e: Expression if spec.isCall(e) => e
      })
      val groups = calls.groupBy(_.children.head.canonicalized)
        .filter { case (_, us) => us.map(_.children(1)).distinct.size >= 2 }
      if (groups.isEmpty) p
      else {
        // one fused call per sketch expression; arg -> array index
        val rewrites: Map[Expression, (ScalaUDF, Map[Expression, Int])] =
          groups.map { case (canonical, us) =>
            val sketchExpr = us.head.children.head
            val argExprs = us.map(_.children(1).canonicalized).distinct
            val argIndex = argExprs.zipWithIndex.toMap
            val fused = spec.template.copy(
              children = Seq(sketchExpr,
                CreateArray(argExprs.map(_.asInstanceOf[Expression]))))
            canonical -> (fused, argIndex)
          }
        val newList = p.projectList.map { ne =>
          ne.transformUp {
            case u: Expression if spec.isCall(u) &&
                rewrites.contains(u.children.head.canonicalized) =>
              val (fused, argIndex) = rewrites(u.children.head.canonicalized)
              val idx = argIndex(u.children(1).canonicalized)
              val item = GetArrayItem(fused, Literal(idx))
              // NaN sentinel -> NULL, matching single-call semantics
              CaseWhen(Seq((IsNaN(item), Literal(null, DoubleType))), item)
          }.asInstanceOf[NamedExpression]
        }
        Project(newList, p.child)
      }
  }
}
