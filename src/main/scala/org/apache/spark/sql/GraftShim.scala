package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column <-> Expression converters (Spark 4
  * moved them behind `classic.ExpressionUtils`). Lives in the sql package
  * solely to re-export the two conversions graft's custom expressions need
  * — the same pattern public Spark extension libraries use. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
