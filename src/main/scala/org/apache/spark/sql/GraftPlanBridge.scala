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

  /** Analyze with per-call SQLConf overrides applied through the
    * THREAD-LOCAL conf (`SQLConf.withExistingConf` over a clone of the
    * session conf) rather than by mutating the session conf — concurrent
    * compiles on the same session never observe each other's overrides.
    * Catalyst reads analysis-time flags via `SQLConf.get`, which prefers
    * the thread-local conf over the active session's. */
  def ofRowsWithConf(spark: SparkSession, plan: LogicalPlan,
                     overrides: Map[String, String]): DataFrame = {
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    val conf = classicSpark.sessionState.conf.clone()
    overrides.foreach { case (k, v) => conf.setConfString(k, v) }
    internal.SQLConf.withExistingConf(conf) {
      classic.Dataset.ofRows(classicSpark, plan)
    }
  }

  /** The analyzed logical plan of a DataFrame — used by the planner when a
    * sub-plan must be analyzed early (e.g. dropping a helper column whose
    * siblings have no reliable symbolic names) and the resulting resolved
    * subtree is spliced back into the ongoing unresolved fold (analysis is
    * idempotent over resolved subtrees). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** The InMemoryRelation LEAF for an already-persisted DataFrame, wrapped
    * as a new DataFrame — or None if `df` is not in the cache. Consumers
    * planned over the leaf always read the cached blocks: relying on the
    * CacheManager's analysis-time substitution instead is fragile — a
    * consumer-side CTE (`WITH x AS (SELECT … FROM view)`) hides the view
    * subtree from `useCachedData` in Spark 4.1, silently re-inlining the
    * producing plan (observed on p12's rollup; PlanAuditSpec's barrier-mode
    * test locks the fix in). */
  def cachedLeaf(df: DataFrame): Option[DataFrame] = {
    val classicDf = df.asInstanceOf[classic.Dataset[_]]
    val session = classicDf.sparkSession
    session.sharedState.cacheManager.lookupCachedData(classicDf)
      .map(cd => classic.Dataset.ofRows(session, cd.cachedRepresentation))
  }
}
