package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{functions => F}

/**
 * Optimizer rule fusing repeated `ddsketch_quantile(sk, q_i)` calls over
 * the same sketch expression into a single `ddsketch_multi_quantile`
 * call plus per-q array extracts.
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

  /** Template ScalaUDF for the fused function, captured once from an
    * analyzed plan (avoids hand-assembling input encoders). */
  private lazy val template: ScalaUDF = {
    val spark = SparkSession.active
    val df = spark.range(1).select(
      graft.sketch.functions.ddsketch_quantiles(
        F.lit(null).cast("binary"), Seq(0.5)))
    df.queryExecution.analyzed.expressions
      .flatMap(_.collect { case u: ScalaUDF => u })
      .headOption
      .getOrElse(throw new IllegalStateException("multi_quantile template not found"))
  }

  // A fusable q argument: foldable non-NULL double (a NULL q must stay on
  // the single-call path, which returns NULL; a null element inside the
  // fused array would error instead).
  private def fusableQ(e: Expression): Boolean =
    e.foldable && e.dataType == DoubleType &&
      (try e.eval(null) != null catch { case _: Exception => false })

  // matches both the native expression form and (legacy) named UDF form
  private def isQuantileCall(e: Expression): Boolean = e match {
    case q: graft.sketch.DDSketchQuantileExpr => fusableQ(q.right)
    case u: ScalaUDF =>
      u.udfName.contains("ddsketch_quantile") && u.children.size == 2 &&
        fusableQ(u.children(1))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // `SELECT q(agg(x),.5), q(agg(x),.95) ... GROUP BY k` puts the
    // quantile calls directly in Aggregate.aggregateExpressions, where
    // result-projection CSE is not guaranteed — split: the (deduped)
    // sketch aggregate stays in the Aggregate, the fused extraction
    // moves into a Project above it (where codegen CSE applies).
    case a: Aggregate =>
      val topQuantiles = a.aggregateExpressions.collect {
        case al @ Alias(e, _) if isQuantileCall(e) => al
      }
      val groups = topQuantiles.groupBy(_.child.children.head.canonicalized)
        .filter { case (_, als) =>
          als.map(_.child.children(1).canonicalized).distinct.size >= 2 }
      if (groups.isEmpty) a
      else {
        val fusedIds = groups.flatMap(_._2.map(_.exprId)).toSet
        // one alias per distinct sketch expression, kept in the Aggregate
        val sketchAliases: Map[Expression, Alias] = groups.map { case (canon, als) =>
          canon -> Alias(als.head.child.children.head, "__fused_sketch")()
        }
        val keptAggList = a.aggregateExpressions.filterNot(
          ne => fusedIds.contains(ne.exprId)) ++ sketchAliases.values
        val aggNode = a.copy(aggregateExpressions = keptAggList)
        val projList: Seq[NamedExpression] = a.aggregateExpressions.map {
          case al @ Alias(e, name) if fusedIds.contains(al.exprId) =>
            val canon = e.children.head.canonicalized
            val als = groups(canon)
            val qExprs = als.map(_.child.children(1).canonicalized).distinct
            val qIndex = qExprs.zipWithIndex.toMap
            val fused = template.copy(children = Seq(
              sketchAliases(canon).toAttribute,
              CreateArray(qExprs.map(_.asInstanceOf[Expression]))))
            val item = GetArrayItem(fused, Literal(qIndex(e.children(1).canonicalized)))
            Alias(CaseWhen(Seq((IsNaN(item), Literal(null, DoubleType))), item),
              name)(exprId = al.exprId)
          case ne => ne.toAttribute
        }
        Project(projList, aggNode)
      }

    case p: Project =>
      // group quantile calls by canonicalized sketch expression
      val calls = p.projectList.flatMap(_.collect {
        case e: Expression if isQuantileCall(e) => e
      })
      val groups = calls.groupBy(_.children.head.canonicalized)
        .filter { case (_, us) => us.map(_.children(1)).distinct.size >= 2 }
      if (groups.isEmpty) p
      else {
        // one fused call per sketch expression; q -> array index
        val rewrites: Map[Expression, (ScalaUDF, Map[Expression, Int])] =
          groups.map { case (canonical, us) =>
            val sketchExpr = us.head.children.head
            val qExprs = us.map(_.children(1).canonicalized).distinct
            val qIndex = qExprs.zipWithIndex.toMap
            val fused = template.copy(
              children = Seq(sketchExpr,
                CreateArray(qExprs.map(_.asInstanceOf[Expression]))))
            canonical -> (fused, qIndex)
          }
        val newList = p.projectList.map { ne =>
          ne.transformUp {
            case u: Expression if isQuantileCall(u) &&
                rewrites.contains(u.children.head.canonicalized) =>
              val (fused, qIndex) = rewrites(u.children.head.canonicalized)
              val idx = qIndex(u.children(1).canonicalized)
              val item = GetArrayItem(fused, Literal(idx))
              // NaN sentinel -> NULL, matching single-call semantics
              CaseWhen(Seq((IsNaN(item), Literal(null, DoubleType))), item)
          }.asInstanceOf[NamedExpression]
        }
        Project(newList, p.child)
      }
  }
}
