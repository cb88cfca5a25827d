package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  lazy val quotes = Seq( // (sym, time, price)
    ("A", ts("2024-01-01 09:00:00"), 10.0),
    ("A", ts("2024-01-01 10:00:00"), 11.0),
    ("B", ts("2024-01-01 09:30:00"), 20.0)
  ).toDF("sym", "qts", "price")

  lazy val trades = Seq( // (sym, time, qty)
    ("A", ts("2024-01-01 09:30:00"), 1L), // → price 10.0
    ("A", ts("2024-01-01 10:00:00"), 2L), // exactly at quote → inclusive → 11.0
    ("A", ts("2024-01-01 08:00:00"), 3L), // before any quote → null
    ("B", ts("2024-01-01 11:00:00"), 4L), // → 20.0
    ("C", ts("2024-01-01 12:00:00"), 5L)  // no quotes for key → null
  ).toDF("sym", "tts", "qty")

  test("as-of picks the latest right row at-or-before each left row") {
    val out = AsOfJoin.asOf(trades, "sym", "tts", quotes, "sym", "qts", Seq("price"))
      .collect().map(r => (r.getLong(2), Option(r.get(3)))).toMap
    assert(out == Map(
      1L -> Some(10.0), 2L -> Some(11.0), 3L -> None,
      4L -> Some(20.0), 5L -> None))
  }

  test("all left rows survive (left-join semantics)") {
    val out = AsOfJoin.asOf(trades, "sym", "tts", quotes, "sym", "qts", Seq("price"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == trades.columns.toSeq :+ "price")
  }

  test("forward as-of picks the earliest right row at-or-after each left row") {
    // trade 1 (09:30) → next quote 10:00 = 11.0; trade 2 exactly at 10:00
    // → inclusive → 11.0; trade 3 (08:00) → 09:00 = 10.0; trade 4 (11:00,
    // B) is after B's only quote → null; trade 5 keyless → null
    val out = AsOfJoin.asOfForward(trades, "sym", "tts", quotes, "sym", "qts", Seq("price"))
      .collect().map(r => (r.getLong(2), Option(r.get(3)))).toMap
    assert(out == Map(
      1L -> Some(11.0), 2L -> Some(11.0), 3L -> Some(10.0),
      4L -> None, 5L -> None))
  }

  test("forward keeps all left rows and the left column order") {
    val out = AsOfJoin.asOfForward(trades, "sym", "tts", quotes, "sym", "qts", Seq("price"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == trades.columns.toSeq :+ "price")
  }

  test("NULL payload cells come from the matched row, never a stale older one") {
    // The 10:00 quote has a NULL price but a real venue: a trade after it
    // must see (NULL, Y) — all fields from that row — not the 09:00 price
    // stitched with the 10:00 venue.
    val q = Seq(
      ("A", ts("2024-01-01 09:00:00"), Option(10.0), "X"),
      ("A", ts("2024-01-01 10:00:00"), Option.empty[Double], "Y")
    ).toDF("sym", "qts", "price", "venue")
    val t = Seq(
      ("A", ts("2024-01-01 09:30:00"), 1L), // → (10.0, X)
      ("A", ts("2024-01-01 10:30:00"), 2L)  // → (NULL, Y), not (10.0, Y)
    ).toDF("sym", "tts", "qty")
    val out = AsOfJoin.asOf(t, "sym", "tts", q, "sym", "qts", Seq("price", "venue"))
      .collect().map(r => (r.getLong(2), (Option(r.get(3)), r.getString(4)))).toMap
    assert(out(1L) == (Some(10.0), "X"))
    assert(out(2L) == (None, "Y"))
  }
}
