package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's classic Column internals (private[sql]): build a
  * Column from a raw Catalyst Expression and back. Lives under
  * org.apache.spark.sql so the private[sql] accessors resolve; the rest of
  * the engine stays in the graft.* packages.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to catalyst Expressions.
    * [[expression]] returns a lazy ColumnNodeExpression wrapper whose
    * children are ColumnNodes, useless for structural inspection; this
    * runs the classic converter so And/EqualTo/Literal etc. are real
    * catalyst nodes (still analysis-unresolved: attributes surface as
    * UnresolvedAttribute, function calls as UnresolvedFunction). */
  def catalyst(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
