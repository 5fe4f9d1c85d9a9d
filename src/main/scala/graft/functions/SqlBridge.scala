/* Bridge into Spark's private[sql] Column <-> Expression converters.
 * Spark 4 hides ExpressionUtils behind private[sql]; extension
 * libraries conventionally open it with a same-package shim. */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Execute an arbitrary LogicalPlan (tests use this to run plans
    * transformed by custom optimizer rules). */
  def ofRows(s: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  /** Apply an extensions installer to a fresh registry clone — lets
    * tests validate `spark.sql.extensions` wiring without tearing down
    * the shared session (extensions only bind at session creation). */
  def applyExtensions(install: SparkSessionExtensions => Unit)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry = {
    val ext = new SparkSessionExtensions
    install(ext)
    ext.registerFunctions(
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
  }
}
