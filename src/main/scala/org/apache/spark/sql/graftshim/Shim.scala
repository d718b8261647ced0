/*
 * Bridge into Spark's private[sql] Column↔Expression converters —
 * the standard pattern for third-party Catalyst extensions (Spark 4
 * moved the public Column API to ColumnNode, so libraries adding
 * native expressions place one converter in an org.apache.spark.sql
 * subpackage).
 */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Shim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  def analyzedPlan(df: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame].queryExecution.analyzed

  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Measured materialized size of a logical plan: executes it and
    * sums the UnsafeRow byte sizes. Plan-audit probe — row counts can
    * hide growth inside nested arrays (a 1-row frame wrapping a
    * corpus-linear collect_list), bytes cannot.
    */
  def measuredBytes(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Long =
    ofRows(spark, plan).asInstanceOf[org.apache.spark.sql.classic.DataFrame]
      .queryExecution.toRdd.map {
        case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow => u.getSizeInBytes.toLong
        case _ => 0L
      }.sum().toLong

  def experimentalStrategies(spark: org.apache.spark.sql.SparkSession):
      Seq[org.apache.spark.sql.execution.SparkStrategy] =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental.extraStrategies
      .map(_.asInstanceOf[org.apache.spark.sql.execution.SparkStrategy]).toSeq

  def addStrategy(spark: org.apache.spark.sql.SparkSession,
      s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.experimental.extraStrategies = classic.experimental.extraStrategies :+ s
  }
}
