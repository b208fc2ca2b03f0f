package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor for the `private[sql]` Column <-> Expression bridge —
  * the standard technique for third-party Catalyst expressions on Spark 4
  * (Column wraps a ColumnNode; `classic.ExpressionUtils` converts).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** DataFrame over an already-computed InternalRow RDD (no row
    * re-encoding) — the handle iterative algorithms need to fold their
    * convergence statistic into the SAME job that materializes the
    * round's result (one aggregate over the persisted RDD) instead of
    * paying a separate checkpoint job plus a stat job per round.
    */
  def internalDf(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
