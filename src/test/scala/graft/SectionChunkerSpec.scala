package graft

import graft.operators.SectionChunker
import org.scalatest.funsuite.AnyFunSuite

/** Chunker semantics per the reference (`rag_model.py:18-42`,
  * `constants.py:116-124`); fixture shape from FIXTURES.md §2.
  */
class SectionChunkerSpec extends AnyFunSuite {

  val resume: String =
    """John Doe, some preamble that must be dropped.
      |SUMMARY: An engineer.
      |Work History
      |Acme Corp 2019-2024.
      |Technical Skills: scala, spark
      |Portfolio: github.com/x
      |Academics: BSc
      |Achievements: cert-1
      |Strengths: grit
      |Skills: python only
      |""".stripMargin

  lazy val chunks: Map[String, (String, Int)] =
    SectionChunker.chunk(resume).map { case (k, c, p) => k -> (c, p) }.toMap

  test("all seven canonical keys resolve from aliases") {
    assert(chunks.keySet == Set("summary", "experience", "skills",
      "projects", "education", "certifications", "strengths"))
  }

  test("preamble before first header is dropped") {
    assert(!chunks.values.exists(_._1.contains("preamble")))
  }

  test("content is the trimmed slice up to the next header") {
    assert(chunks("summary")._1 == "An engineer.")
    assert(chunks("experience")._1 == "Acme Corp 2019-2024.")
    assert(chunks("education")._1 == "BSc")
  }

  test("duplicate section keeps the LAST occurrence (dict overwrite)") {
    assert(chunks("skills")._1 == "python only")
  }

  test("duplicate section keeps its FIRST insertion position (dict order)") {
    // Python: d[k] = v replaces the value but not the key's slot — skills
    // was inserted before projects/education even though its winning
    // content comes from the final occurrence.
    val order = SectionChunker.chunk(resume).map(_._1)
    assert(order == Seq("summary", "experience", "skills", "projects",
      "education", "certifications", "strengths"))
  }

  test("headers match via ':' or newline form, case-insensitively") {
    assert(chunks.contains("experience")) // "Work History\n" — newline form
    assert(chunks.contains("summary"))    // "SUMMARY:" — uppercase + colon
  }

  test("text without headers chunks to nothing") {
    assert(SectionChunker.chunk("no headers here at all").isEmpty)
  }

  test("every chunk content is a substring of the input (property)") {
    for (t <- Seq(resume, "Skills: a\nSkills: b", "objective:\nX\nabilities: y")) {
      SectionChunker.chunk(t).foreach { case (k, c, _) =>
        assert(t.contains(c), s"chunk $k not a substring")
        assert(SectionChunker.sectionPatterns.exists(_._1 == k))
      }
    }
  }

  test("DataFrame form explodes to (id, section, content, pos) rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, resume), (2L, "no headers")).toDF("doc_id", "text")
    val out = SectionChunker.chunkSections(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.count(_._1 == 1L) == 7)
    assert(!out.exists(_._1 == 2L))
  }
}
