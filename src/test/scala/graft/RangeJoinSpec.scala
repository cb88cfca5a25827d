package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val points = Seq((1L, 0L), (2L, 5L), (3L, 14L), (4L, 29L), (5L, -3L))
    .toDF("pid", "p")
  lazy val intervals = Seq((10L, 0L, 4L), (11L, 3L, 20L), (12L, 25L, 25L), (13L, -5L, -1L))
    .toDF("iid", "lo", "hi")

  private def matched(binWidth: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(points, intervals,
        col("p"), col("lo"), col("hi"), binWidth)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // ground truth by definition: lo <= p <= hi
  val expected: Set[(Long, Long)] = (for {
    (pid, p) <- Seq((1L, 0L), (2L, 5L), (3L, 14L), (4L, 29L), (5L, -3L))
    (iid, lo, hi) <- Seq((10L, 0L, 4L), (11L, 3L, 20L), (12L, 25L, 25L), (13L, -5L, -1L))
    if lo <= p && p <= hi
  } yield (pid, iid)).toSet

  test("binned result equals the theta-join definition (bin ~ interval length)") {
    assert(matched(5L) == expected)
  }

  test("result is invariant to bin width (intervals spanning many bins)") {
    for (w <- Seq(1L, 2L, 7L, 100L)) assert(matched(w) == expected, s"width $w")
  }

  test("bounds are inclusive on both ends and negatives bin by floor division") {
    assert(matched(7L).contains((1L, 10L))) // p=0 == lo
    assert(matched(7L).contains((3L, 11L))) // interior
    assert(matched(7L).contains((5L, 13L))) // negative axis
    assert(!matched(7L).contains((2L, 12L)))
  }

  test("each matching pair appears exactly once (no bin-overlap duplicates)") {
    val rows = RangeJoin.pointInInterval(points, intervals,
        col("p"), col("lo"), col("hi"), 2L)
      .select(col("pid"), col("iid")).collect()
    assert(rows.length == rows.distinct.length)
    assert(rows.length == expected.size)
  }
}
