package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` classic APIs (Column ⇄ Expression, function
  * registry) — the standard shim pattern Spark extension libraries use to
  * expose native expressions as Columns without a UDF boundary. Everything
  * here delegates to public-bytecode Spark methods; no behavior lives in
  * this package. */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, name: String,
                       info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)

  /** Rebind a DataFrame's ANALYZED plan into another session sharing the
    * same SparkContext — used to execute a plan under per-session conf
    * overrides (e.g. a no-AQE sibling session for single-partition segment
    * writes) without mutating the caller's session conf, which would race
    * with concurrent planners. The analyzed plan is fully resolved, so the
    * target session's registry/catalog state is never consulted. */
  def rebind(target: SparkSession, df: DataFrame): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      target.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.analyzed)
}
