package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into Spark-private surface, kept to two capabilities:
 * wrapping a Catalyst Expression as a public Column, and registering an
 * expression builder under a SQL function name on a live session.
 * Everything else in graft uses public APIs only.
 */
object GraftBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A registered Scala UDF as a real Catalyst expression — needed when
    * a SQL function builder wraps a UDF (Column-level invocation nodes
    * are unevaluable inside the registry path). */
  def udfExpression(
      udf: org.apache.spark.sql.expressions.UserDefinedFunction,
      children: Seq[Expression]): Expression =
    classic.UserDefinedFunctionUtils.toScalaUDF(
      udf.asInstanceOf[org.apache.spark.sql.expressions.SparkUserDefinedFunction],
      children.toIndexedSeq)

  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }

  /** Register a SQL table function (usable in FROM clauses) on a live
    * session — the table-valued counterpart of [[registerFunction]]. */
  def registerTableFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Unit = {
    spark.asInstanceOf[classic.SparkSession].sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }
}
