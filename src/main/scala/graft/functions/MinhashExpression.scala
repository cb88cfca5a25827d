package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Minhash signature over a precomputed 60-bit hash array as a native
  * expression: one pass over the hashes updating all `nHashes`
  * accumulators — h_i = A(i)·lo + B(i)·hi + i, signature(i) = min.
  *
  * Semantically identical to the HOF form
  * (`transform(seeds, i -> array_min(transform(hashes, affine)))`) and to
  * the DuckDB oracle, but the k×|items| affine evaluations run as a tight
  * JVM loop instead of interpreted lambda dispatch (the HOF form also
  * re-walks the hash array once per seed). CodegenFallback is fine here:
  * the per-row boundary cost is one boxed array; the O(k·n) inner work is
  * already native.
  *
  * Empty input → all-null signature, matching `array_min([])` = null in
  * the HOF form.
  */
case class MinhashSignature(child: Expression, nHashes: Int,
                            a: Seq[Long], b: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](nHashes))
    val accs = Array.fill(nHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      val lo = h & 0x3FFFFFFFL
      val hi = h >> 30
      var i = 0
      while (i < nHashes) {
        val v = aArr(i) * lo + bArr(i) * hi + i
        if (v < accs(i)) accs(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(accs)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSignature {
  def apply(hashes: Column, nHashes: Int, a: Seq[Long], b: Seq[Long]): Column =
    GraftExpressionBridge.column(new MinhashSignature(
      GraftExpressionBridge.expression(hashes), nHashes, a.take(nHashes), b.take(nHashes)))
}
