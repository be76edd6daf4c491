package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into `private[sql]` surface needed to host a custom
  * logical operator: wrap a [[LogicalPlan]] as a DataFrame, read a
  * DataFrame's analyzed plan, and register an extra planner strategy at
  * runtime (`ExperimentalMethods` — the public escape hatch for
  * strategies when the session was not built with our
  * `SparkSessionExtensions`). Lives in `org.apache.spark.sql` solely
  * for package-private access; keep it free of any logic.
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  def executedPlan(df: Dataset[_]): execution.SparkPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.executedPlan

  def optimizedPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.optimizedPlan

  /** Idempotently append a planner strategy to the session. */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }

  /** Idempotently append an optimizer rule to the session
    * (`ExperimentalMethods.extraOptimizations` — runs as a late batch, so
    * a rule registered this way still reorders operators but cannot chain
    * into the main pushdown batch; sessions built with GraftExtensions
    * get the same rule inside the operator-optimization fixed point).
    */
  def addOptimization(spark: SparkSession, r: catalyst.rules.Rule[LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(r))
      cs.experimental.extraOptimizations = cs.experimental.extraOptimizations :+ r
  }

  /** Install computed table+column statistics into the session catalog —
    * the write half of `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS`,
    * fed by our one-scan stats job instead of ANALYZE's own passes.
    */
  def alterTableStats(
      spark: SparkSession, table: String,
      stats: catalyst.catalog.CatalogStatistics): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val id = cs.sessionState.sqlParser.parseTableIdentifier(table)
    cs.sessionState.catalog.alterTableStats(id, Some(stats))
  }

  def tableStats(
      spark: SparkSession, table: String): Option[catalyst.catalog.CatalogStatistics] = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val id = cs.sessionState.sqlParser.parseTableIdentifier(table)
    cs.sessionState.catalog.getTableMetadata(id).stats
  }

  /** Optimizer's own size/row estimate of a frame (file-size based until
    * catalog stats exist; CBO-derived after).
    */
  def planStats(df: Dataset[_]): catalyst.plans.logical.Statistics =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.optimizedPlan.stats

  /** Column ⇄ catalyst Expression bridge (needed to use internal
    * aggregates like ApproxCountDistinctForIntervals from DataFrame
    * code — the same machinery ANALYZE's histogram path runs on).
    */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
