package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's `private[sql]` classic API, used by graft's planner
  * to assemble ONE unresolved LogicalPlan per query and analyze it exactly
  * once (the compile-latency contract — Planner's class doc). Spark scopes
  * `classic.Dataset.ofRows` and the Column→Expression converter to the sql
  * package; this object lives there to re-export the two entry points.
  * No Spark internals are modified. */
object GraftPlanBridge {
  /** Eagerly convert a Column to its Catalyst Expression through the
    * session's ColumnNode converter (ExpressionUtils.expression alone
    * returns a lazy ColumnNodeExpression placeholder that only Dataset API
    * entry points resolve). */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Wrap in UnresolvedAlias unless already named — exactly what
    * Dataset.select does to its projection list. */
  def toNamed(e: Expression): NamedExpression = classic.ExpressionUtils.toNamed(e)

  /** Analyze `plan` once and wrap it as a DataFrame (Dataset.ofRows). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
