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

/** 60-bit SimHash over a precomputed hash array: bit b of the result is
  * set iff Σ_h (±1 by bit b of h) > 0. Single native pass; the HOF/SQL
  * formulation re-evaluates its input argument once per bit (60× the
  * tokenize+md5 work — measured 23s vs ~1s on the near-dup join at
  * sf0.1) because interpreted lambdas have no common-subexpression
  * elimination. Empty input → 0, matching the fold-from-zero semantics.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val n = hashes.numElements()
    val acc = new Array[Int](60)
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  def apply(hashes: Column): Column =
    GraftExpressionBridge.column(new SimHash60(GraftExpressionBridge.expression(hashes)))
}

/** |A ∩ B| for two SORTED long arrays via a single merge scan — no hash
  * set, no allocation per call. `array_intersect` builds an OpenHashSet
  * per invocation, which dominates when the operator runs once per
  * candidate pair in a near-dup join. Callers must pre-sort (one
  * array_sort per row, amortized over all pairs the row joins into) and
  * pre-deduplicate; both inputs here are md5-derived distinct-item hash
  * sets, so equal counts to set intersection (collisions are mirrored in
  * the oracle's identical hashing).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    GraftExpressionBridge.column(new SortedIntersectCount(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
