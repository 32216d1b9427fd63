package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge to the sql-private Column <-> Expression converters (Spark 4
  * moved them behind `classic.ExpressionUtils`). Lives in the sql package
  * solely to re-export the two conversions graft's custom expressions need
  * — the same pattern public Spark extension libraries use. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is sql-private).
    * The plan runs through the full analyzer/optimizer/planner, so custom
    * nodes (e.g. graft's as-of join) get planned by whatever strategies the
    * session has registered. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a native function into an ALREADY-BUILT session's registry.
    * `SparkSessionExtensions.injectFunction` only works at session
    * construction; harnesses that hand us a plain session (the driver's
    * Verify, a shared notebook session) need the post-hoc path. The
    * registry is session-scoped state, so this does not leak across
    * `newSession()` boundaries. */
  def registerFunction(spark: SparkSession, id: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
