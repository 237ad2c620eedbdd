package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the sanctioned
  * conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`, which
  * is `private[sql]`. This bridge (in an org.apache.spark.sql subpackage,
  * the usual pattern for Spark extension libraries) re-exports the two
  * conversions the graft kernel needs to register custom Catalyst
  * expressions as Columns. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType`/`TypeCollection` are `private[sql]` in Spark 4,
    * but they are the only way ExpectsInputTypes can declare "array of
    * float OR double" — re-exported here so the native expressions can
    * reject wrong-typed SQL args at analysis time. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
  def oneOf(types: org.apache.spark.sql.types.AbstractDataType*): AbstractType =
    org.apache.spark.sql.types.TypeCollection(types: _*)

  /** Register a SQL function on a LIVE session (the extensions path in
    * [[graft.sql.GraftExtensions]] only applies at session build time;
    * `SparkSession.sessionState` is private[sql], hence this bridge). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
