package graft

import graft.functions.HeavyHitters
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class HeavyHittersSpec extends AnyFunSuite {

  private def foldAll(items: Seq[String], k: Int): HeavyHitters.Counts =
    items.foldLeft(Map.empty: HeavyHitters.Counts)(HeavyHitters.add(_, _, k))

  test("buffer never exceeds k counters") {
    val items = (1 to 500).map(i => s"x${i % 60}")
    var buf: HeavyHitters.Counts = Map.empty
    items.foreach { it =>
      buf = HeavyHitters.add(buf, it, 10)
      assert(buf.size <= 10)
    }
  }

  test("guarantee: every item over n/(k+1) survives any merge tree") {
    val rnd = new Random(7)
    // 3 heavy items (~20% each), long tail of singletons
    val heavy = Seq.fill(200)("A") ++ Seq.fill(180)("B") ++ Seq.fill(160)("C")
    val tail = (1 to 400).map(i => s"t$i")
    val items = rnd.shuffle(heavy ++ tail)
    val k = 20
    for (splits <- Seq(2, 5, 8)) {
      val parts = items.grouped(math.ceil(items.size.toDouble / splits).toInt).toSeq
      val merged = parts.map(foldAll(_, k))
        .reduce(HeavyHitters.mergeCounts(_, _, k))
      assert(merged.size <= k)
      assert(Set("A", "B", "C").subsetOf(merged.keySet),
        s"heavy items lost at $splits splits: ${merged.keySet}")
    }
  }

  test("merge subtracts the (k+1)-th largest and keeps positives only") {
    val b1 = Map("a" -> 10L, "b" -> 5L)
    val b2 = Map("c" -> 3L, "d" -> 1L)
    val m = HeavyHitters.mergeCounts(b1, b2, 3)
    assert(m == Map("a" -> 9L, "b" -> 4L, "c" -> 2L)) // d's 1 is the cut
  }

  test("sketch finish returns the sorted candidate set and the total count") {
    val agg = HeavyHitters.sketch(5)
    val items = Seq("b", "a", "b", "c", "a", "b")
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == (Seq("a", "b", "c"), 6L))
  }

  test("sketch merge sums totals across partials") {
    val agg = HeavyHitters.sketch(5)
    val b1 = Seq("a", "b").foldLeft(agg.zero)(agg.reduce)
    val b2 = Seq("a", "c", "c").foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(b1, b2))._2 == 5L)
  }
}
