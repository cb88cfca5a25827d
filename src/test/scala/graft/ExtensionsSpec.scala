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

  test("set/sketch functions match their Column-API forms") {
    GraftExtensions.registerFunctions(spark)
    val row = spark.sql(
      """SELECT sorted_intersect_count(array(1L, 3L, 7L), array(3L, 5L, 7L)) AS ic,
        |       simhash60(array(5L, 9L)) AS sh,
        |       minhash_signature(array(5L, 9L), 2) AS sig""".stripMargin)
      .collect().head
    assert(row.getInt(0) == 2)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ref = Seq(Seq(5L, 9L)).toDF("h")
      .select(graft.functions.SimHash60(col("h")).as("sh"),
        graft.operators.Dedup.minhashSignatureFromHashes(col("h"), 2).as("sig"))
      .collect().head
    assert(row.getLong(1) == ref.getLong(0))
    assert(row.getSeq[Long](2) == ref.getSeq[Long](1))
  }

  test("bpe_count SQL function matches the tokenizer; nulls pass through") {
    GraftExtensions.registerFunctions(spark)
    val row = spark.sql(
      "SELECT bpe_count(' the scan line') AS n, bpe_count(CAST(NULL AS STRING)) AS nn")
      .collect().head
    val expect = graft.operators.BpeTokenizer.countTokens(" the scan line",
      graft.operators.BpeTokenizer.fixtureMerges).toLong
    assert(row.getLong(0) == expect)
    assert(row.isNullAt(1))
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
