package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registered SQL functions compute the native expressions") {
    GraftExtensions.registerFunctions(spark)
    val row = spark.sql(
      """SELECT squared_l2(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l2,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp""".stripMargin)
      .collect().head
    assert(row.getDouble(0) == 25.0)
    assert(row.getDouble(1) == 11.0)
  }

  test("registration is idempotent and float arrays are accepted") {
    GraftExtensions.registerFunctions(spark)
    GraftExtensions.registerFunctions(spark)
    val r = spark.sql(
      "SELECT squared_l2(array(CAST(1.0 AS FLOAT)), array(CAST(0.0 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(r == 1.0)
  }
}
