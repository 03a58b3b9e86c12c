package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into Spark's `private[sql]` Column↔Expression conversions (the
  * Spark 4 column-node refactor removed the public constructors). Lives in
  * an `org.apache.spark.sql` subpackage on purpose — the standard technique
  * for libraries that provide native Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Same bridge for whole logical plans: build a DataFrame from a custom
  * LogicalPlan node and register the planner strategy that lowers it. */
object PlanBridge {
  private def cs(spark: SparkSession): classic.SparkSession =
    spark.asInstanceOf[classic.SparkSession]

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(cs(spark), plan)

  /** Idempotent per-session strategy registration (the cluster-wide path is
    * `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = cs(spark).experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }

  /** Idempotent per-session optimizer-rule registration. */
  def addOptimization(spark: SparkSession, r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = cs(spark).experimental
    if (!exp.extraOptimizations.contains(r))
      exp.extraOptimizations = exp.extraOptimizations :+ r
  }
}
