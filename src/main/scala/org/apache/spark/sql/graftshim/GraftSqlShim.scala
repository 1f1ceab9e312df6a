package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSession}

/** Bridge into `private[sql]` constructors the public API no longer
  * exposes after the Spark 4 sql-api split: Column→Expression and
  * LogicalPlan→DataFrame. Lives under `org.apache.spark.sql` for
  * visibility — the standard pattern for third-party plan extensions.
  * Nothing here adds behavior; it only forwards. */
object GraftSqlShim {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Test hooks into `private[sql]` extension builders: what a session
    * constructed with these extensions would actually install. */
  def plannerStrategies(e: org.apache.spark.sql.SparkSessionExtensions,
                        spark: SparkSession) =
    e.buildPlannerStrategies(spark)

  def optimizerRules(e: org.apache.spark.sql.SparkSessionExtensions,
                     spark: SparkSession) =
    e.buildOptimizerRules(spark)
}
