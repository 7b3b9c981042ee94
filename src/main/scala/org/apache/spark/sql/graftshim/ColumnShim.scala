package org.apache.spark.sql

package object graftshim // keeps the file inside the sql package scope

package graftshim {

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Bridge between Catalyst [[Expression]]s and the public [[Column]]
    * API. Spark 4 made `Column.expr` / the Column constructor
    * `private[sql]` (columns are Connect-compatible ColumnNodes now), so
    * custom native expressions need this one-file shim inside the
    * `org.apache.spark.sql` package — the same pattern public Spark
    * extension libraries use.
    */
  object ColumnShim {
    def column(e: Expression): Column = ExpressionUtils.column(e)
    def expression(c: Column): Expression = ExpressionUtils.expression(c)

    /** Register a native function on a live session's FunctionRegistry
      * (the registry handle is `private[sql]`, hence here). */
    def registerFunction(
        spark: SparkSession,
        name: String,
        info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        builder: Seq[Expression] => Expression): Unit =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
        .registerFunction(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
  }
}
