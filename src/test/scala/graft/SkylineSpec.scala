package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frontier(rows: Seq[(Double, Long, Long)], blocks: Int = 4): Set[(Double, Long)] =
    Skyline.skyline2d(rows.toDF("price", "sz", "id"),
        col("price"), col("sz"), col("id"), blocks)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet

  /** brute-force dominance definition */
  private def expected(rows: Seq[(Double, Long, Long)]): Set[(Double, Long)] = {
    val pts = rows.map(r => (r._1, r._2)).distinct
    pts.filter { case (x, y) => !pts.exists { case (bx, by) =>
      bx <= x && by >= y && (bx < x || by > y) } }.toSet
  }

  test("drops dominated points, keeps the staircase") {
    val rows = Seq[(Double, Long, Long)](
      (1.0, 1L, 1L), (2.0, 3L, 2L), (3.0, 2L, 3L), // (3.0,2) dominated by (2.0,3)
      (4.0, 5L, 4L), (2.5, 3L, 5L))                // (2.5,3) dominated by (2.0,3)
    assert(frontier(rows) == Set((1.0, 1L), (2.0, 3L), (4.0, 5L)))
    assert(frontier(rows) == expected(rows))
  }

  test("duplicate points collapse to one frontier point with cnt and min id") {
    val rows = Seq[(Double, Long, Long)]((1.0, 2L, 7L), (1.0, 2L, 3L), (5.0, 1L, 9L))
    val out = Skyline.skyline2d(rows.toDF("price", "sz", "id"),
        col("price"), col("sz"), col("id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set((1.0, 2L, 3L, 2L))) // (5.0,1) dominated; rep=min id 3, cnt 2
  }

  test("same x keeps only the max y; same y keeps only the min x") {
    val rows = Seq[(Double, Long, Long)](
      (1.0, 1L, 1L), (1.0, 4L, 2L), (3.0, 4L, 3L))
    assert(frontier(rows) == Set((1.0, 4L)))
  }

  test("matches the brute-force definition on pseudo-random data, any block count") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(300)((rnd.nextInt(50).toDouble, rnd.nextInt(50).toLong,
      rnd.nextInt(1000).toLong))
    val want = expected(rows)
    for (b <- Seq(1, 8, 64)) assert(frontier(rows, b) == want, s"blocks=$b")
  }
}
