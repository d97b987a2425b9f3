package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x made `Column` representation-agnostic (`ColumnNode`-backed);
  * the `Expression` <-> `Column` converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils` and are `private[sql]`.
  * This object sits in a subpackage of `org.apache.spark.sql` purely to
  * re-export them for graft's custom Catalyst expressions (e.g. the EMA
  * window function in `graft.functions`).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on a LIVE session's function registry
    * (builder-time `SparkSessionExtensions` is the public path; this
    * covers already-constructed sessions).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      name: String, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
