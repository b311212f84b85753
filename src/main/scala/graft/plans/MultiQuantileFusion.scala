package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
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

  // matches both the native expression form and (legacy) named UDF form
  private def isQuantileCall(e: Expression): Boolean = e match {
    case q: graft.sketch.DDSketchQuantileExpr =>
      q.right.foldable && q.right.dataType == DoubleType
    case u: ScalaUDF =>
      u.udfName.contains("ddsketch_quantile") && u.children.size == 2 &&
        u.children(1).foldable && u.children(1).dataType == DoubleType
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
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
