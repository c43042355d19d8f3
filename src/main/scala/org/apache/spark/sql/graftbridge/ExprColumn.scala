package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Session-independent expression ↔ Column bridge.
  *
  * Spark 4 Columns wrap ColumnNodes and the expression-backed Column
  * constructor (`classic.ExpressionUtils`) is `private[sql]`, so
  * engine-native expressions ([[graft.functions.NfcNormalize]] etc.)
  * previously had to round-trip through a per-session temp-function
  * registry — registration on `SparkSession.active` breaks when a
  * DIFFERENT session analyzes the returned Column (multi-session apps;
  * review finding). This one-hop bridge lives inside the
  * `org.apache.spark.sql` package namespace purely to re-export the two
  * conversions; the produced Column analyzes in any session.
  */
object ExprColumn {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
