package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // 90% of rows share key 1 (the skew); distributor = row id
    val big = (1L to 2000L).map(i => (if (i % 10 == 0) i % 7 else 1L, i))
      .toDF("k", "row_id")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"),
      (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "v")
    val plain = big.join(small, "k").select("row_id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Layout.saltedJoin(big, small, "k", 8, col("row_id"))
      .select("row_id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
  }

  test("salted aggregation equals the plain aggregation") {
    val df = (1L to 1000L).map(i => (i % 3, i.toDouble)).toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Layout.saltedSumCount(df, "k", "v", 8, col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("co-bucketed join runs without a shuffle exchange") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
    val customer = Tables.customer(spark, TestSpark.sf0001)
    Layout.writeBucketed(orders, "orders_b", "o_custkey", 8)
    Layout.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey", 8)
    val joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
  }

  test("partitioned write + filtered scan prunes partitions") {
    val path = Files.createTempDirectory("graft_part").toString + "/events"
    Layout.writePartitioned(
      Tables.events(spark, TestSpark.sf0001), path, "event_type")
    val scan = spark.read.parquet(path).where(col("event_type") === "purchase")
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("event_type"), s"no partition pruning:\n$physical")
    // only the purchase directory is read
    assert(scan.count() ==
      Tables.events(spark, TestSpark.sf0001)
        .where(col("event_type") === "purchase").count())
  }
}
