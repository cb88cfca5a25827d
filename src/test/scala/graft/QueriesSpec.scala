package graft

import org.scalatest.funsuite.AnyFunSuite

/** Integration net: every declared query runs at sf0.001 and (except the
  * documented empty-capable ones) returns rows; every query has oracle
  * SQL; column names stay aligned between Spark results and the oracle
  * (the driver sorts columns by name before hashing).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Queries whose core operator is not SQL-expressible (driver records a
    * rows-only check); their semantics are pinned by unit specs instead.
    */
  val rowsOnly: Set[String] = Set("q_approx_distinct", "q_lsh_brp_topk")

  test("every declared query has oracle SQL (or is explicitly rows-only)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry returns rows (driver t1 smoke shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 and returns rows") {
      val n = fn(spark, TestSpark.sf0001).count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("time-decay shiftleft clamp: k >= 63 stays positive and saturates at 2^-62") {
    // unclamped, k=63 divides by 1L<<63 = Long.MIN_VALUE (negative term)
    // and k=100 by the mod-64-wrapped 1<<36 — the clamp pins both to 2^-62
    import spark.implicits._
    val terms = Seq((0L, 1.0), (62L, 1.0), (63L, 1.0), (100L, 1.0))
      .toDF("k", "wsum")
      .withColumn("term", org.apache.spark.sql.functions.expr(
        "wsum / cast(shiftleft(1L, cast(least(k, 62) AS int)) AS double)"))
      .orderBy("k").collect().map(_.getDouble(2))
    assert(terms.forall(_ > 0.0))
    assert(terms(0) == 1.0)
    assert(terms(1) == terms(2) && terms(2) == terms(3))
  }
}
