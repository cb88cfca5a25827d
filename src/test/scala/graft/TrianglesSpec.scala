package graft

import graft.operators.Triangles
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def nodes(ids: Long*): DataFrame = ids.toDF("id")
  private def edges(es: (Long, Long)*): DataFrame = es.toDF("id_a", "id_b")

  private def run(n: DataFrame, e: DataFrame): Map[Long, Long] =
    Triangles.perNode(n, e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("single triangle counts once at every vertex; outsider gets zero") {
    val got = run(nodes(1L, 2L, 3L, 9L),
      edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 9L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 0L))
  }

  test("K4: every vertex is in C(3,2) = 3 triangles") {
    val got = run(nodes(1L, 2L, 3L, 4L),
      edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("duplicate, reversed, and self-loop edges are canonicalized away") {
    val got = run(nodes(1L, 2L, 3L),
      edges((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L), (2L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("hub star with one rim edge: only the closed wedge is a triangle") {
    // hub 1 connects to 2..6; the single rim edge (2,3) closes one wedge
    val rim = (2L to 6L).map(i => (1L, i))
    val got = run(nodes(1L to 6L: _*), edges(rim :+ ((2L, 3L)): _*))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L, 6L -> 0L))
  }

  test("two disjoint triangles count independently") {
    val got = run(nodes(1L, 2L, 3L, 10L, 11L, 12L),
      edges((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 1L, 11L -> 1L, 12L -> 1L))
  }
}
