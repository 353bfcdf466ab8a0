package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crossing into `private[sql]` Spark API: build a
  * DataFrame over a custom [[LogicalPlan]] node (the extension seam
  * every planner-level operator needs — Spark exposes injection of
  * strategies via SparkSessionExtensions but not plan construction).
  * Kept to a single forwarding object so the engine's dependence on
  * non-public API is auditable in one place (public because the graft
  * package is the caller; nothing else should use it). */
object GraftSqlShims {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      session.asInstanceOf[classic.SparkSession], plan)

  /** Column → Catalyst Expression, converted EAGERLY (Spark 4 Columns
    * wrap a ColumnNode; `ExpressionUtils.expression` defers behind a
    * lazy ColumnNodeExpression that only known analyzer rules unwrap —
    * useless inside a custom plan node). A `.desc` Column converts to
    * a catalyst [[catalyst.expressions.SortOrder]]. */
  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** -0.0 → 0.0 / canonical-NaN rewrite for float-typed grouping keys
    * (the NormalizeFloatingNumbers treatment Spark applies to built-in
    * Join/Window/Aggregate keys; custom plan nodes must opt in). */
  def normalizeFloats(e: catalyst.expressions.Expression): catalyst.expressions.Expression =
    catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
