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

  test("mortonCode interleaves bits (hand-computed values)") {
    val rows = Seq((0, 0), (1, 0), (0, 1), (3, 1), (2, 2), (5, 3))
      .toDF("a", "b")
      .select(Layout.mortonCode(col("a"), col("b"), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a-bit i -> 2i, b-bit i -> 2i+1:
    // (0,0)=0 (1,0)=1 (0,1)=2 (3,1)=0b0111=7 (2,2)=0b1100=12 (5,3)=0b11011=27
    assert(rows == Seq(0L, 1L, 2L, 7L, 12L, 27L))
    // the Column expression and the driver-local mirror agree on a grid
    val grid = (for { a <- 0 until 32; b <- 0 until 32 } yield (a, b)).toDF("a", "b")
    val mismatches = grid
      .select(col("a"), col("b"), Layout.mortonCode(col("a"), col("b"), 8).as("z"))
      .collect()
      .count(r => r.getLong(2) != Layout.mortonLocal(r.getInt(0), r.getInt(1), 8))
    assert(mismatches == 0)
  }

  test("z-order layout covers compact boxes in BOTH dimensions (vs 1-D sort stripes)") {
    val pts = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y))
      .toDF("x", "y")
    def extents(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max(col("x")) - min(col("x"))).as("dx"),
          (max(col("y")) - min(col("y"))).as("dy"))
        .collect().map(r => (r.getAs[Int]("dx"), r.getAs[Int]("dy"))).toSeq
    val z = extents(Layout.zorderBy(pts, col("x"), col("y"), 16, bits = 6))
    val stripes = extents(pts.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))
    // stripe layout: x tight but y spans the whole domain in every file
    assert(stripes.forall(_._2 >= 60), "sanity: 1-D sort leaves y unbounded")
    // z-order: the SUM of both extents stays far below the stripe layout's
    // (each range of z-codes is a compact box, modulo sampled boundaries)
    val zCost = z.map { case (dx, dy) => dx + dy }.sum.toDouble / z.size
    val sCost = stripes.map { case (dx, dy) => dx + dy }.sum.toDouble / stripes.size
    assert(zCost < sCost / 1.5, s"z layout not tighter: z=$zCost stripes=$sCost")
    assert(z.forall { case (dx, dy) => dx < 64 && dy < 64 })
  }

  test("writeZOrdered round-trips all rows") {
    val path = Files.createTempDirectory("graft_z").toString + "/pts"
    val pts = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y))
      .toDF("x", "y")
    Layout.writeZOrdered(pts, path, col("x"), col("y"), nFiles = 4, bits = 5)
    val back = spark.read.parquet(path)
    assert(back.count() == 1024)
    assert(back.columns.toSeq == Seq("x", "y"), "the z helper column must not persist")
  }
}
