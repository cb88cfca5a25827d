package graft

import graft.operators.ScoreParser
import org.scalatest.funsuite.AnyFunSuite

/** Parser fixtures from FIXTURES.md §2 against the reference semantics
  * (`rag_model.py:83-97`) — including the all-or-nothing failure mode.
  */
class ScoreParserSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parse(resp: String): Seq[(String, Long)] =
    ScoreParser.parseScores(Seq((1L, resp)).toDF("doc_id", "response"), "response", "doc_id")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq

  test("well-formed response parses to section→score rows") {
    assert(parse("SCORES:\nskills: 8\nexperience: 6") ==
      Seq(("skills", 8), ("experience", 6)))
  }

  test("prose before SCORES: is ignored") {
    assert(parse("Sure! Here you go.\nSCORES:\n skills : 7 ") == Seq(("skills", 7)))
  }

  test("lines without ':' are skipped") {
    assert(parse("SCORES:\nskills: 5\nnot a kv line\neducation: 3") ==
      Seq(("skills", 5), ("education", 3)))
  }

  test("a single non-integer value voids ALL scores (reference try/except)") {
    assert(parse("SCORES:\nskills: 5\nexperience: high") == Seq.empty)
    assert(parse("SCORES:\nskills: 8.5") == Seq.empty) // Python int() rejects floats
  }

  test("no SCORES block → empty") {
    assert(parse("I cannot rate this resume.") == Seq.empty)
  }

  test("CRLF responses parse like Python str.strip (\\r is whitespace)") {
    assert(parse("SCORES:\r\nskills: 8\r\neducation: 6\r\n") ==
      Seq(("skills", 8), ("education", 6)))
    assert(parse("SCORES:\n\tskills\t: \t7\t") == Seq(("skills", 7)))
  }

  test("negative and plus-signed integers parse like Python int()") {
    assert(parse("SCORES:\na: -2\nb: +3") == Seq(("a", -2), ("b", 3)))
  }

  test("parser never throws and never emits null scores on arbitrary input") {
    assert(parse("SCORES:\na: 99999999999") == Seq(("a", 99999999999L))) // > Int.MaxValue
    assert(parse("SCORES:\na: 999999999999999999999999") == Seq.empty) // > Long range -> malformed
    val rnd = new scala.util.Random(42)
    val weird = (1 to 200).map { i =>
      val chars = "SCORES:\n\r\t :abc0189+-é☃"
      (i.toLong, (0 until rnd.nextInt(40)).map(_ => chars(rnd.nextInt(chars.length))).mkString)
    }
    val out = ScoreParser.parseScores(
      weird.toDF("doc_id", "response"), "response", "doc_id")
    val rows = out.collect()
    assert(rows.forall(!_.isNullAt(2))) // int-validated before cast
  }

  test("final score is the 2dp-rounded mean (app.py:94)") {
    val scores = Seq((1L, "s1", 7), (1L, "s2", 8), (2L, "s1", 1))
      .toDF("doc_id", "section", "score")
    val out = ScoreParser.finalScores(scores, "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out == Map(1L -> 7.5, 2L -> 1.0))
  }
}
