package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * `spark.sql.extensions` entry point: injects every graft SQL function
 * and the multi-quantile/cdf fusion rule at session build time, so a
 * cluster configured with
 *
 * {{{
 *   spark.sql.extensions=graft.GraftExtensions
 * }}}
 *
 * needs no driver-side `Graft.register` call at all — pure-SQL users
 * (JDBC/Thrift, notebooks, spark-sql) get the full surface on every
 * session. Equivalent to calling [[graft.sketch.Graft.register]]; the
 * two paths share one builder list so they cannot drift.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.MultiQuantileFusion)
    graft.sketch.Graft.allFunctionBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => builder(exprs)))
    }
    graft.sketch.Graft.tableFunctionBuilders.foreach { case (name, builder) =>
      ext.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => builder(exprs)))
    }
  }
}
