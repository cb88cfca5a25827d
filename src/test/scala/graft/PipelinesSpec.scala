package graft

import graft.operators.{Inference, Pipelines}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end route analogs (SURVEY §7 M4) with deterministic stand-ins
  * for the LLM/embedding edges.
  */
class PipelinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("concatPages joins page texts with \\n in page order") {
    val pages = Seq((1L, 2, "world"), (1L, 1, "hello"), (2L, 1, "solo"))
      .toDF("doc_id", "page_no", "text")
    val out = Pipelines.concatPages(pages, "doc_id", "page_no", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "hello\nworld", 2L -> "solo"))
  }

  test("matchSingle: chunk → prompt → scorer → parse → mean") {
    val pages = Seq(
      (1L, 1, "Summary: data engineer\nSkills: spark, scala"),
      (2L, 1, "no recognizable sections here")
    ).toDF("doc_id", "page_no", "text")
    // Deterministic scorer: score 8 for every section named in the prompt.
    val scorer: DataFrame => DataFrame = prompts =>
      prompts.withColumn("response",
        concat(lit("SCORES:\n"),
          concat_ws("\n", transform(
            filter(split(col("prompt"), "\n"), l => l.startsWith("- ")),
            l => concat(substring(l, 3, 1000), lit(": 8"))))))
    val out = Pipelines.matchSingle(pages, "needs spark", scorer)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out == Map(1L -> 8.0)) // doc 2 has no sections → no row
  }

  test("shortlist: top-N by distance with normalized scores and order") {
    val resumes = Seq(
      ("a.pdf", "content a", Seq(0f, 0f, 0f, 0f)), // d=0  → 10.0
      ("b.pdf", "content b", Seq(1f, 0f, 0f, 0f)), // d=1  → 5.0
      ("c.pdf", "content c", Seq(3f, 0f, 0f, 0f)), // d=9  → 1.0
      ("d.pdf", "content d", Seq(1f, 0f, 0f, 0f))  // tie with b → name tiebreak
    ).toDF("file_name", "content", "embedding")
    val out = Pipelines.shortlist(resumes, Seq(0.0, 0.0, 0.0, 0.0), 3)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq == Seq(("a.pdf", 10.0), ("b.pdf", 5.0), ("d.pdf", 5.0)))
  }

  test("shortlist with topN > M returns all, ordered") {
    val resumes = Seq(("x", "cx", Seq(1f, 1f)), ("y", "cy", Seq(0f, 0f)))
      .toDF("file_name", "content", "embedding")
    val out = Pipelines.shortlist(resumes, Seq(0.0, 0.0), 10)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("y", "x"))
  }

  test("sectionsAsMap rebuilds the reference dict shape in document order") {
    val chunks = Seq(
      (1L, "skills", "spark", 1), (1L, "summary", "eng", 0), (2L, "skills", "sql", 0)
    ).toDF("doc_id", "section", "content", "pos")
    val maps = Pipelines.sectionsAsMap(chunks)
      .collect().map(r => r.getLong(0) -> r.getMap[String, String](1)).toMap
    assert(maps(1L).toSeq == Seq("summary" -> "eng", "skills" -> "spark"))
    assert(maps(2L).toSeq == Seq("skills" -> "sql"))
  }

  test("Inference.mapBatches batches correctly and aligns outputs") {
    val df = (1 to 10).map(i => (i.toLong, s"text$i")).toDF("id", "prompt")
    var batchSizes = Seq.empty[Int] // local to driver in local mode tests
    val out = Inference.mapBatches(df, "prompt", "response", batchSize = 4) { batch =>
      batch.map(s => s"echo:$s")
    }
    val rows = out.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(rows(3L) == "echo:text3" && rows.size == 10)
  }

  test("pseudoEmbedding is deterministic and dimension-correct") {
    val a = Inference.pseudoEmbedding("hello", 16)
    val b = Inference.pseudoEmbedding("hello", 16)
    val c = Inference.pseudoEmbedding("other", 16)
    assert(a.toSeq == b.toSeq && a.length == 16 && a.toSeq != c.toSeq)
    assert(a.forall(x => x >= -1f && x < 1f))
  }
}
