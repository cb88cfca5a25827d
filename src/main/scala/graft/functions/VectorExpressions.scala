package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY.md §4 "v2"
  * tier). The higher-order-function formulations (`zip_with` + `aggregate`)
  * are semantically identical but run interpreted — outside whole-stage
  * codegen, with a closure dispatch and boxing per element. These
  * expressions emit a tight Java loop instead (one multiply-add per
  * element), which matters when distances run per candidate pair
  * (dedup/KNN joins) rather than once per row.
  *
  * Semantics (kept bit-identical to the HOF forms and the DuckDB oracle,
  * SURVEY.md §2.4 rule 3): elements are widened to double before
  * arithmetic; accumulation is a strict left-to-right fold starting at 0.0.
  * Both inputs must be arrays of float or double; the left array's length
  * drives the loop (callers guarantee equal dims — embedding columns are
  * fixed-width).
  */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @transient protected lazy val leftElem: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient protected lazy val rightElem: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType

  protected def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => a.getDouble(i)
    case _ => a.getFloat(i).toDouble
  }

  protected def genGet(v: String, i: String, t: DataType): String = t match {
    case DoubleType => s"$v.getDouble($i)"
    case _ => s"((double) $v.getFloat($i))"
  }
}

/** Squared L2 distance — the reference's FAISS IndexFlatL2 metric
  * (`/root/reference/vectorDB.py:12,38`): sum_i (a_i - b_i)^2, no sqrt.
  */
case class SquaredL2Distance(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "squared_l2"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val d = get(a, i, leftElem) - get(b, i, rightElem)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $d = ${genGet(a, i, leftElem)} - ${genGet(b, i, rightElem)};
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product: sum_i a_i * b_i. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      acc += get(a, i, leftElem) * get(b, i, rightElem)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $acc += ${genGet(a, i, leftElem)} * ${genGet(b, i, rightElem)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFoldExpression {
  def squaredL2(a: Column, b: Column): Column =
    GraftExpressionBridge.column(SquaredL2Distance(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DotProduct(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
