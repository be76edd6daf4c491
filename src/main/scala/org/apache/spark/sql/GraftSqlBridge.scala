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
}
