package graft

import graft.functions.{DotProduct, SquaredL2Distance}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the native vector expressions: `squared_l2(a, b)` and
  * `dot_product(a, b)` become callable from `spark.sql(...)`.
  *
  * Two registration paths:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) at session build;
  *  - `registerFunctions(spark)` for an already-running session.
  *
  * No custom Rule/SparkStrategy is registered — nothing in the capability
  * surface needs plan-level rewrites Catalyst lacks (SURVEY §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def binary(name: String, className: String,
                     f: (Expression, Expression) => Expression)
  : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name,
      new ExpressionInfo(className, name),
      { exprs =>
        require(exprs.size == 2, s"$name expects exactly 2 arguments, got ${exprs.size}")
        f(exprs.head, exprs(1))
      })

  private[graft] val injections = Seq(
    binary("squared_l2", classOf[SquaredL2Distance].getName, SquaredL2Distance(_, _)),
    binary("dot_product", classOf[DotProduct].getName, DotProduct(_, _)))

  /** Register on a live session (idempotent). */
  def registerFunctions(spark: SparkSession): Unit =
    injections.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
