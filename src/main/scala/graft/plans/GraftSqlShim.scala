/* Lives in org.apache.spark.sql so graft code can lift a raw Catalyst
 * Expression into a public Column: the supported bridge
 * (classic.ExpressionUtils.column) is private[sql] in Spark 4.x after the
 * sql-api split. This shim is the only place that crosses that line.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlShim {
  /** Wrap a Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The Catalyst Expression behind a Column (classic sessions only). */
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Register a Catalyst expression builder as a SQL temp function on an
    * ALREADY-RUNNING session (sessionState is private[sql]; for sessions
    * you construct yourself, prefer
    * `builder.withExtensions(new graft.plans.GraftExtensions)`).
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
