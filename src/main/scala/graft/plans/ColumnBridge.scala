// Lives under org.apache.spark.sql so it can reach the private[sql]
// Column <-> catalyst Expression converters — the sanctioned seam for
// third-party Catalyst expressions since the Spark 4 Column/Expression
// decoupling (the Column API no longer exposes `.expr`).
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
