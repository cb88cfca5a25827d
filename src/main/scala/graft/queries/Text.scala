package graft.queries

import graft.Tables
import graft.operators.SectionChunker
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text pipeline queries over `documents` (SURVEY.md §2.4, M2): scan+filter,
  * cleaning, tokenization, exact dedup, header extraction. All built-ins
  * (codegen'd string/regex functions) — filters and projections reach the
  * parquet scan.
  */
object Text {

  /** English docs with ≥200 chars (pushed-down scan filter). */
  def docScanFilter(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .where(col("lang") === "en" && col("n_chars") >= 200)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id").asc)

  /** Text + filename sanitize (reference `secure_filename` analog,
    * `app.py:75` + header canonicalization lowercase, `rag_model.py:28`).
    */
  def docCleanProject(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", "").as("clean_text"),
        regexp_replace(col("source"), "[^A-Za-z0-9_.-]", "_").as("clean_source"))
      .orderBy(col("doc_id").asc)

  /** Top-20 tokens by frequency (whitespace tokenization; ties by word). */
  def docTokensTop20(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(20)

  /** Exact dedup by content hash: md5(text) groups, canonical doc = min id.
    * At 100 TB this is the standard first dedup pass — one shuffle on the
    * 128-bit hash, no text comparison.
    */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("text_md5"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("text_md5").asc)

  /** First canonical section-header alias appearing in each doc (C2's
    * header-alias table as a whole-word regexp_extract; Java∩RE2 subset).
    */
  def sectionExtract(s: SparkSession, d: String): DataFrame = {
    val aliases = SectionChunker.sectionPatterns.map(_._2).mkString("|")
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract(lower(col("text")), s"\\b($aliases)\\b", 1).as("first_header"))
      .orderBy(col("doc_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_doc_scan_filter" -> docScanFilter,
    "q_doc_clean_project" -> docCleanProject,
    "q_doc_tokens_top20" -> docTokensTop20,
    "q_dedup_exact" -> dedupExact,
    "q_section_extract" -> sectionExtract,
  )

  private val aliasesSql: String =
    SectionChunker.sectionPatterns.map(_._2.stripPrefix("(").stripSuffix(")")).mkString("|")

  val oracleSql: Map[String, String] = Map(
    "q_doc_scan_filter" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE lang = 'en' AND n_chars >= 200 ORDER BY doc_id ASC""".stripMargin,
    "q_doc_clean_project" ->
      """SELECT doc_id,
        |  regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS clean_text,
        |  regexp_replace(source, '[^A-Za-z0-9_.-]', '_', 'g') AS clean_source
        |FROM documents ORDER BY doc_id ASC""".stripMargin,
    "q_doc_tokens_top20" ->
      """SELECT word, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word
        |ORDER BY cnt DESC, word ASC LIMIT 20""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_md5, MIN(doc_id) AS canonical_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY text_md5 ASC""".stripMargin,
    "q_section_extract" ->
      s"""SELECT doc_id,
         |  regexp_extract(lower(text), '\\b($aliasesSql)\\b', 1) AS first_header
         |FROM documents ORDER BY doc_id ASC""".stripMargin,
  )
}
