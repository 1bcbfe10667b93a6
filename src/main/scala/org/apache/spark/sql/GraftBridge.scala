package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so graft's custom
  * Catalyst expressions can be exposed as `Column`s. Spark 4 moved
  * `Column` to a ColumnNode facade; this is the supported conversion
  * path used by Spark's own classic DataFrame implementation.
  */
object GraftBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Typed Aggregator → Catalyst aggregate expression (the construction
    * Spark's own `udf.register(udaf(...))` uses; `UserDefinedAggregator`
    * is `private[sql]`, hence bridged here).
    */
  def scalaAggregator[IN, BUF, OUT](
      agg: org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT],
      enc: Encoder[IN],
      children: Seq[Expression]): Expression =
    org.apache.spark.sql.execution.aggregate.ScalaAggregator(
      org.apache.spark.sql.expressions.UserDefinedAggregator(agg, enc),
      children).toAggregateExpression()
}
