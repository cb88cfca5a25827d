package graft

import graft.functions.TopK
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("insert keeps the k best with id tiebreak (pure kernel)") {
    val entries = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (4L, 1.0), (5L, 7.0))
    val buf = entries.foldLeft(List.empty[TopK.Entry])((b, e) => TopK.insert(b, e, 3))
    // best-first after finish-order sort: (2,9.0) beats (3,9.0) on id
    assert(buf.sortWith((a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)) == List((2L, 9.0), (3L, 9.0), (5L, 7.0)))
  }

  test("aggregator: top-k per key on a Dataset matches a window sort") {
    val data = (1L to 100L).map(i => (s"g${i % 3}", (i, (i % 17).toDouble)))
    val ds = data.toDS()
    val got = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopK.byScore(5).name("top"))
      .collect().toMap
    // reference: plain Scala per-group sort
    val expect = data.groupBy(_._1).map { case (g, rows) =>
      g -> rows.map(_._2)
        .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
        .take(5)
    }
    got.foreach { case (g, top) => assert(top.toList == expect(g).toList, s"group $g") }
  }

  test("merge order does not change the result (determinism)") {
    val es = (1L to 50L).map(i => (i, (i * 31 % 23).toDouble))
    val a = es.take(25).foldLeft(List.empty[TopK.Entry])((b, e) => TopK.insert(b, e, 7))
    val b = es.drop(25).foldLeft(List.empty[TopK.Entry])((b2, e) => TopK.insert(b2, e, 7))
    val agg = TopK.topK(7)
    assert(agg.finish(agg.merge(a, b)) == agg.finish(agg.merge(b, a)))
  }
}
