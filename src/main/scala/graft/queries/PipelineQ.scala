package graft.queries

import graft.Tables
import graft.functions.VectorOps
import graft.operators.Pipelines
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries that drive the composed pipelines (SURVEY §7 M4/M5)
  * through the driver's correctness gate:
  *
  *  - q_shortlist: the bulk route (C7 top-N → C8 score → C9 projection)
  *    over the embeddings table, oracle-checked;
  *  - q_match_single: the single-resume route end-to-end (page concat →
  *    section chunk → prompt assembly → deterministic scorer → parse →
  *    mean), fully oracled: the chunker's find-all-headers + slice pass
  *    is `regexp_extract_all` (headers, in order) + `regexp_split_to_
  *    array` (the content between them) over the same regex — RE2 and
  *    java.util.regex agree on leftmost-first alternation for these
  *    patterns — with keep-last/first-pos dedup as arg_max/min GROUP BY.
  *    The deterministic scorer gives every section the same clamped
  *    JD-token overlap, so parse → mean collapses to that overlap,
  *    computed over the prompt prefix exactly as the Spark scorer does;
  *  - q_session_window / q_sliding_window: batch forms of the streaming
  *    windows (EventStreams), oracled via gaps-and-islands / window
  *    self-expansion SQL. The session oracle truncates ts to µs BEFORE
  *    the gap comparison (Spark reads the ns parquet at µs precision, so
  *    the grouping decision must run on the same values), and outputs
  *    truncate to seconds (SURVEY §7 risk c).
  */
object PipelineQ {

  /** Embeddings table dressed as the bulk-resume input (file_name,
    * content, embedding) — `store_embeddings_mass`'s contract
    * (`vectorDB.py:19-24`).
    */
  private def resumes(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      concat(lit("vec_"), lpad(col("vec_id").cast("string"), 6, "0")).as("file_name"),
      concat(lit("doc "), col("vec_id").cast("string")).as("content"),
      col("embedding"))

  def shortlist(s: SparkSession, d: String): DataFrame =
    Pipelines.shortlist(resumes(s, d), VectorOps.queryVector(s, d, 0L), topN = 5)

  /** Documents with synthetic section headers injected (the documents
    * table is headerless word bags), then the full matchSingle chain with
    * a deterministic JD-token-overlap scorer standing in for the LLM.
    */
  def matchSingle(s: SparkSession, d: String): DataFrame = {
    val jd = "spark data query join filter window stream"
    val jdTokens = jd.split(" ").toSet
    val pages = Tables.documents(s, d).select(
      col("doc_id"), lit(1).as("page_no"),
      concat(
        lit("Summary: "), substring(col("text"), 1, 120), lit("\n"),
        lit("Skills: "), substring(col("text"), 121, 120), lit("\n"),
        lit("Experience: "), substring(col("text"), 241, 10000)).as("text"))
    val scorer: DataFrame => DataFrame = prompts => {
      // Deterministic stand-in for the LLM (C12): for each "- section"
      // line in the prompt, score = min(10, overlap of the doc's SECTION
      // tokens with the JD tokens). Only the text before the JOB
      // DESCRIPTION block counts — the prompt embeds the JD itself, and
      // scoring over the whole prompt would give every doc the same
      // constant overlap.
      val sectionNames = filter(split(col("prompt"), "\n"), l => l.startsWith("- "))
      val resumePart = element_at(split(col("prompt"), "JOB DESCRIPTION:"), 1)
      val promptTokens = array_distinct(split(regexp_replace(resumePart, "\n", " "), " "))
      val overlap = size(filter(promptTokens, t => t.isInCollection(jdTokens)))
      // the per-SECTION transform lambda references the clamped overlap,
      // which scans the whole prompt — EvalOnce pins it to one
      // evaluation per doc instead of one per section (guide §4.4)
      prompts
        .withColumn("ov",
          graft.functions.EvalOnce(least(overlap, lit(10)).cast("string")))
        .withColumn("response",
          concat(lit("SCORES:\n"),
            concat_ws("\n", transform(sectionNames,
              l => concat(substring(l, 3, 1000), lit(": "), col("ov"))))))
        .drop("ov")
    }
    Pipelines.matchSingle(pages, jd, scorer)
      .orderBy(col("doc_id").asc)
  }

  def sessionWindow(s: SparkSession, d: String): DataFrame =
    EventStreams.userSessions(Tables.events(s, d), gap = "30 minutes")
      .select(
        date_trunc("second", col("session_start")).as("session_start"),
        date_trunc("second", col("session_end")).as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy(col("user_id").asc, col("session_start").asc)

  def slidingWindow(s: SparkSession, d: String): DataFrame =
    EventStreams.slidingTypeCounts(Tables.events(s, d))
      .select(col("win_start"), col("event_type"), col("n"))
      .orderBy(col("win_start").asc, col("event_type").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shortlist" -> shortlist,
    "q_match_single" -> matchSingle,
    "q_session_window" -> sessionWindow,
    "q_sliding_window" -> slidingWindow,
  )

  private val l2 =
    """list_reduce(list_transform(range(1, len(e.embedding) + 1),
      |  i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))
      |     * (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))),
      |  (acc, v) -> acc + v)""".stripMargin

  /** The combined header regex, RE2-flagged; group 1 = the alias (same
    * alternation order as SectionChunker.sectionPatterns).
    */
  private val hdrRe: String =
    "(?i)(" + graft.operators.SectionChunker.sectionPatterns.map(_._2)
      .map(p => p.stripPrefix("(").stripSuffix(")")).mkString("|") + ")\\s*[:\\n]"

  private def canonCase: String =
    graft.operators.SectionChunker.sectionPatterns.map { case (k, p) =>
      s"    WHEN regexp_full_match(hdr, '(?i)$p') THEN '$k'"
    }.mkString("CASE\n", "\n", "\n    END")

  private val matchSingleOracle: String =
    s"""WITH pt AS (SELECT doc_id,
       |    'Summary: ' || substr(text, 1, 120) || chr(10) ||
       |    'Skills: ' || substr(text, 121, 120) || chr(10) ||
       |    'Experience: ' || substr(text, 241, 10000) AS text
       |  FROM documents),
       |m AS (SELECT doc_id,
       |    regexp_extract_all(text, '$hdrRe', 1) AS hdrs,
       |    regexp_split_to_array(text, '$hdrRe') AS parts
       |  FROM pt),
       |raw AS (SELECT doc_id, i AS pos0, hdrs[CAST(i AS BIGINT)] AS hdr,
       |    trim(parts[CAST(i + 1 AS BIGINT)], ' ' || chr(9) || chr(10) || chr(13)) AS content
       |  FROM m CROSS JOIN LATERAL (SELECT unnest(range(1, len(hdrs) + 1)) AS i)),
       |canon AS (SELECT doc_id, pos0, content, $canonCase AS section
       |  FROM raw),
       |ded AS (SELECT doc_id, section, MIN(pos0) AS pos,
       |    arg_max(content, pos0) AS content
       |  FROM canon GROUP BY doc_id, section),
       |agg AS (SELECT doc_id,
       |    string_agg('[' || section || ']' || chr(10) || content,
       |      chr(10) || chr(10) ORDER BY pos) AS sections_text,
       |    string_agg('- ' || section, chr(10) ORDER BY pos) AS names
       |  FROM ded GROUP BY doc_id),
       |pr AS (SELECT doc_id,
       |    'Rate each resume section against the job description from 0 to 10.' || chr(10) ||
       |    'Sections:' || chr(10) || names || chr(10) || chr(10) ||
       |    'RESUME SECTIONS:' || chr(10) || sections_text || chr(10) || chr(10) AS prefix
       |  FROM agg),
       |sc AS (SELECT doc_id,
       |    len(list_filter(list_distinct(string_split(
       |      replace(str_split(prefix, 'JOB DESCRIPTION:')[1], chr(10), ' '), ' ')),
       |      t -> t IN ('spark','data','query','join','filter','window','stream'))) AS overlap
       |  FROM pr)
       |SELECT doc_id, CAST(LEAST(overlap, 10) AS DOUBLE) AS final_score
       |FROM sc ORDER BY doc_id ASC""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_match_single" -> matchSingleOracle,
    "q_shortlist" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT 'vec_' || lpad(CAST(e.vec_id AS VARCHAR), 6, '0') AS file_name,
         |  'doc ' || CAST(e.vec_id AS VARCHAR) AS content, $l2 AS dist
         |  FROM embeddings e CROSS JOIN q)
         |SELECT file_name, ROUND(10.0 / (1.0 + dist), 2) AS score, content
         |FROM d ORDER BY dist ASC, file_name ASC LIMIT 5""".stripMargin,
    "q_session_window" ->
      """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts,
        |    value, event_id FROM events),
        |o AS (SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT CAST(date_trunc('second', MIN(ts)) AS TIMESTAMP) AS session_start,
        |  CAST(date_trunc('second', MAX(ts) + INTERVAL 30 MINUTE) AS TIMESTAMP) AS session_end,
        |  user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id ASC, session_start ASC""".stripMargin,
    "q_sliding_window" ->
      """SELECT CAST(time_bucket(INTERVAL 15 MINUTE, ts) - to_minutes(off) AS TIMESTAMP) AS win_start,
        |  event_type, COUNT(*) AS n
        |FROM events CROSS JOIN (SELECT unnest([0, 15, 30, 45]) AS off)
        |GROUP BY 1, 2 ORDER BY win_start ASC, event_type ASC""".stripMargin,
  )
}
