package graft.functions

import graft.operators.BpeTokenizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE token count as a Catalyst expression — the SQL-surface
  * form of [[BpeTokenizer.counter]] (`bpe_count(text)`, registered by
  * GraftExtensions with the deterministic fixture merges; library callers
  * construct it with any merges table). Eval-only (CodegenFallback): the
  * per-row work is an imperative string algorithm with no profitable
  * codegen form, and the ranks map is built ONCE at construction, not
  * per row — the property a naive `udf()` registration loses when its
  * closure rebuilds state per call.
  */
case class BpeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  @transient private lazy val count: String => Int = BpeTokenizer.counter(merges)

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String].toString).toLong

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCount {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    GraftExpressionBridge.column(
      new BpeCount(GraftExpressionBridge.expression(text), merges))
}
