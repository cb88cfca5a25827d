package graft

import graft.functions.{DotProduct, MinhashSignature, SimHash60, SortedIntersectCount, SquaredL2Distance}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native expressions: `squared_l2(a, b)`,
  * `dot_product(a, b)`, `sorted_intersect_count(a, b)`, `simhash60(h)`
  * and `minhash_signature(h, n)` (the library's affine constants) become
  * callable from `spark.sql(...)`.
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
    binary("dot_product", classOf[DotProduct].getName, DotProduct(_, _)),
    binary("sorted_intersect_count", classOf[SortedIntersectCount].getName,
      SortedIntersectCount(_, _)),
    ("simhash60",
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      { exprs: Seq[Expression] =>
        require(exprs.size == 1, s"simhash60 expects exactly 1 argument, got ${exprs.size}")
        SimHash60(exprs.head)
      }),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_signature"),
      { exprs: Seq[Expression] =>
        require(exprs.size == 2,
          s"minhash_signature expects (hashes, nHashes), got ${exprs.size} arguments")
        val n = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_signature: nHashes must be an INT literal, got $other")
        }
        MinhashSignature(exprs.head, n,
          graft.operators.Dedup.minhashA, graft.operators.Dedup.minhashB)
      }),
    ("bpe_count",
      new ExpressionInfo(classOf[graft.functions.BpeCount].getName, "bpe_count"),
      { exprs: Seq[Expression] =>
        require(exprs.size == 1, s"bpe_count expects exactly 1 argument, got ${exprs.size}")
        graft.functions.BpeCount(exprs.head,
          graft.operators.BpeTokenizer.fixtureMerges)
      }))

  /** Register on a live session (idempotent). */
  def registerFunctions(spark: SparkSession): Unit =
    injections.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
