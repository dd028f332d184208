package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` constructor; the supported
  * conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]`. This bridge is the single place the engine
  * crosses that boundary to register custom Catalyst expressions
  * (e.g. [[graft.plans.LpmLookup]]).
  */
/** `AbstractDataType` (the `inputTypes` element type) is
  * `private[sql]`; expressions outside this package that want
  * analysis-time input-type checks via `ExpectsInputTypes` mix in this
  * bridge trait and override the public `expectedInputTypes` instead. */
trait ExpectsInputTypesBridge
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  def expectedInputTypes: Seq[org.apache.spark.sql.types.DataType]
  final override def inputTypes
      : Seq[org.apache.spark.sql.types.AbstractDataType] =
    expectedInputTypes
}

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Session function registry (private[sql]) — used to register the
    * graft function library on an externally-provided session. */
  def functionRegistry(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
}
