package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end analogs of the reference's two routes as DataFrame library
  * functions (SURVEY.md §7 M4):
  *
  *  - `matchSingle` ≈ POST /result (`app.py:69-119`): pages → concat (C1) →
  *    section chunks (C2) → scoring prompt (C11) → pluggable scorer (C12)
  *    → parse (C13) → mean score (C10);
  *  - `shortlist` ≈ POST /shortlist (`app.py:133-180`,
  *    `rag_model_mass.py:17-47`): all resumes vs a JD vector — top-N by
  *    squared-L2, normalized 0–10 score, distance order (C7→C8→C9).
  *
  * The LLM/embedding steps stay behind `Inference`-style plugs — they are
  * the only non-deterministic edges, and everything around them (prompt
  * assembly, parsing, aggregation, ranking) is declarative, deterministic,
  * and tested. At scale each stage is a narrow map or a keyed
  * aggregation; nothing collects to the driver.
  */
object Pipelines {

  /** C1: per-doc page concat with "\n", in page order (`app.py:82,155`).
    * Order is enforced by sorting (page_no, text) structs inside the
    * aggregate — shuffle order never observable (SURVEY §2.4 rule 6).
    */
  def concatPages(pages: DataFrame, idCol: String, pageNoCol: String,
                  textCol: String): DataFrame =
    pages.groupBy(col(idCol))
      .agg(concat_ws("\n",
        transform(
          array_sort(collect_list(struct(col(pageNoCol).as("p"), col(textCol).as("t")))),
          s => s.getField("t"))).as("text"))

  /** Default scoring-prompt template; same placeholders as the reference's
    * SCORE_ALL_SECTIONS_PROMPT (`constants.py:82-114`) without its prose.
    */
  val defaultScoreTemplate: String =
    """Rate each resume section against the job description from 0 to 10.
      |Sections:
      |{section_names_list}
      |
      |RESUME SECTIONS:
      |{sections_text}
      |
      |JOB DESCRIPTION:
      |{jd_text}
      |
      |Reply with SCORES: followed by one "section: score" line per section.""".stripMargin

  /** C11 prompt assembly per doc from chunked sections (document order):
    * sections_text = "[sec]\ncontent" blocks joined by "\n\n"; names list =
    * "- sec" lines (`rag_model.py:69-79`).
    */
  def assembleScoringPrompts(chunks: DataFrame, jdText: String,
                             template: String = defaultScoreTemplate): DataFrame = {
    val ordered = array_sort(collect_list(struct(
      col("pos").as("p"), col("section").as("s"), col("content").as("c"))))
    chunks.groupBy(col("doc_id"))
      .agg(
        concat_ws("\n\n", transform(ordered,
          e => concat(lit("["), e.getField("s"), lit("]\n"), e.getField("c")))).as("sections_text"),
        concat_ws("\n", transform(ordered,
          e => concat(lit("- "), e.getField("s")))).as("section_names_list"))
      .select(col("doc_id"),
        // EvalOnce: every downstream consumer (the scorer's token scan,
        // the parse generator) references `prompt` several times, and
        // without the barrier Catalyst inlines this document-sized
        // replace chain at every reference (guide §4.4; measured in
        // q_match_single's plan — 16 copies inside one Generate)
        graft.functions.EvalOnce(
          replacePlaceholders(lit(template), Map(
            "section_names_list" -> col("section_names_list"),
            "sections_text" -> col("sections_text"),
            "jd_text" -> lit(jdText)))).as("prompt"))
  }

  private def replacePlaceholders(tpl: Column, subs: Map[String, Column]): Column =
    subs.foldLeft(tpl) { case (acc, (k, v)) =>
      // replace(str, search, replace) — literal, not regex
      replace(acc, lit("{" + k + "}"), v)
    }

  /** Chunked sections as the reference's map form (`dict[section → text]`,
    * SURVEY §1 #2): (doc_id, sections MAP<STRING,STRING>). Relational rows
    * remain the primary form; the map is for API parity with callers that
    * want the dict shape.
    */
  def sectionsAsMap(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("doc_id"))
      .agg(map_from_entries(transform(
        array_sort(collect_list(struct(col("pos"), col("section"), col("content")))),
        e => struct(e.getField("section"), e.getField("content")))).as("sections"))

  /** matchSingle: pages (idCol, pageNoCol, textCol) + JD → per-doc final
    * score. `scorer` maps (doc_id, prompt) → (doc_id, response) — the C12
    * plug (an LLM batch call in production, a deterministic stand-in in
    * tests). Returns (doc_id, final_score).
    */
  def matchSingle(pages: DataFrame, jdText: String,
                  scorer: DataFrame => DataFrame,
                  idCol: String = "doc_id", pageNoCol: String = "page_no",
                  textCol: String = "text"): DataFrame = {
    val docs = concatPages(pages, idCol, pageNoCol, textCol)
      .withColumnRenamed(idCol, "doc_id")
    val chunks = SectionChunker.chunkSections(docs, "text", "doc_id")
    val prompts = assembleScoringPrompts(chunks, jdText)
    // EvalOnce: the parse generator's sub-expressions (block, lines,
    // parsed, the all-or-nothing guard) reference `response` several
    // times — pin it so the scorer's expression evaluates once per row
    // instead of once per reference (guide §4.4)
    val responses = scorer(prompts)
      .withColumn("response", graft.functions.EvalOnce(col("response")))
    val scores = ScoreParser.parseScores(responses, "response", "doc_id")
    ScoreParser.finalScores(scores, "doc_id")
  }

  /** shortlist: resumes (fileNameCol, contentCol, embCol) + JD vector →
    * top-N (file_name, score, content) in ascending-distance order with
    * file_name tiebreak; score = round(10/(1+d²), 2)
    * (`rag_model_mass.py:13-15,37-46`).
    */
  def shortlist(resumes: DataFrame, jdVec: Seq[Double], topN: Int,
                fileNameCol: String = "file_name", contentCol: String = "content",
                embCol: String = "embedding"): DataFrame =
    resumes
      .withColumn("_dist", VectorOps.squaredL2ToQuery(col(embCol), jdVec))
      .orderBy(col("_dist").asc, col(fileNameCol).asc)
      .limit(topN)
      .select(col(fileNameCol).as("file_name"),
        round(VectorOps.score(col("_dist")), 2).as("score"),
        col(contentCol).as("content"))
}
