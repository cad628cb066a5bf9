package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ColumnNodeToExpressionConverter

/** Bridge to the `private[sql]` Column → Catalyst Expression converter.
  *
  * Spark 4 rebased `Column` on `ColumnNode` (SPARK-46057) and made the
  * converter `private[sql]`; connectors that need the Catalyst tree of
  * a user-supplied `Column` (here: stats-based file skipping over
  * predicates) reach it from a subpackage. This is the only non-public
  * Spark surface the engine touches.
  */
object ColumnExpr {
  def expr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** Wrap a Catalyst expression back into a user-facing Column (for
    * registering custom codegen'd expressions like MinHashSignature).
    */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
