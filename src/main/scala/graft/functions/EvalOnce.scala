package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity EVALUATION BARRIER: returns the child value unchanged but
  * reports itself non-deterministic, so the optimizer may not inline,
  * duplicate, or constant-fold it across operator boundaries
  * (optimization guide §4.4 — the same mechanism as
  * `udf(...).asNondeterministic()`, without the UDF's serialization
  * round-trip: eval and codegen both delegate straight to the child, so
  * the barrier itself costs nothing).
  *
  * Use it on an EXPENSIVE derived column that downstream expressions
  * reference more than once (a prompt assembled from a whole document,
  * a response a generator parses in several sub-expressions): without
  * the barrier, Catalyst's projection collapsing rebuilds the full
  * expression tree at every reference — q_match_single's parse
  * generator re-evaluated the document-sized prompt/response chain ~16×
  * per row. The trade is the usual one for non-deterministic
  * expressions: other predicates do not push past it, so place it where
  * nothing needs to (terminal projections feeding a consumer that reads
  * the column as-is).
  */
case class EvalOnce(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "eval_once"

  // the whole point of the expression
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EvalOnce {
  def apply(c: Column): Column =
    GraftExpressionBridge.column(new EvalOnce(GraftExpressionBridge.expression(c)))
}
