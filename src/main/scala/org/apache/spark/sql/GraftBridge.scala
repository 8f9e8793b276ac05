package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset, SparkSession => CSparkSession}

/** Package-private bridge: lets the graft library materialize a Dataset
  * from a custom LogicalPlan (Dataset.ofRows is private[sql] — the
  * standard extension-library pattern for injected operators).
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[Dataset[_]].queryExecution.analyzed

  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Wrap a Catalyst expression as a Column WITHOUT the name-based
    * function resolution `functions.*` goes through in Spark 4 —
    * native operators use this for builtins the Trino shim shadows
    * session-wide (e.g. regexp_extract), so their semantics cannot
    * depend on whether a dialect query ran first on the session. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
