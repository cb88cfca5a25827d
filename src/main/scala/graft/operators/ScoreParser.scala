package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LLM score-response parser — exact reproduction of the reference's
  * semantics (`/root/reference/rag_model.py:83-97`):
  *
  *  - the scores block is `re.search("SCORES:\s*(.*)", resp, DOTALL)`,
  *    i.e. everything after the first `SCORES:`; no match → no scores;
  *  - the block is split into lines; lines without `:` are skipped;
  *  - each remaining line is `strip()`ed then split on the FIRST `:`;
  *    key = trimmed left part, score = int of trimmed right part;
  *  - **all-or-nothing**: the reference wraps the whole comprehension in
  *    one try/except, so a single non-integer value line discards every
  *    score for that response (→ empty map), not just the bad line.
  *
  * Integer syntax is mirrored as `^[+-]?[0-9]+$` (Python `int()` rejects
  * decimals like "8.5"; a bare SQL cast would truncate them instead).
  */
object ScoreParser {

  private val intPattern = "^[+-]?[0-9]+$"

  /** Python str.strip() strips ALL whitespace (\r, \t, …); Spark's trim()
    * only strips ASCII spaces — a CRLF response would otherwise leave a
    * trailing \r on every value and void the whole parse.
    */
  private def pyStrip(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** Array of (section, score) structs parsed from one response column;
    * empty array when there is no SCORES block or any value is malformed.
    */
  def scoresArray(resp: Column): Column = {
    val block = regexp_extract(resp, "(?s)SCORES:\\s*(.*)", 1)
    val kvLines = filter(split(block, "\n"), l => instr(l, ":") > 0)
    val parsed = transform(kvLines, l => {
      val lt = pyStrip(l)
      val key = pyStrip(substring_index(lt, ":", 1))
      val rawVal = pyStrip(expr_substr_after_first_colon(lt))
      struct(
        key.as("section"),
        // try_cast: ANSI mode would otherwise THROW on a >2^63 digit run
        // (Python's unbounded int() succeeds there — beyond long range the
        // line is treated as malformed instead, voiding the doc's scores).
        when(rawVal.rlike(intPattern), rawVal.try_cast("long")).otherwise(lit(null)).as("score"))
    })
    val anyBad = exists(parsed, p => p.getField("score").isNull)
    when(block === "" || anyBad, array().cast("array<struct<section:string,score:bigint>>"))
      .otherwise(parsed)
  }

  /** Everything after the first ':' (Python split(":", 1)[1]). */
  private def expr_substr_after_first_colon(s: Column): Column =
    substring(s, instr(s, ":") + 1, lit(Int.MaxValue))

  /** Explode responses into (idCols..., section, score) rows. */
  def parseScores(df: DataFrame, respCol: String, idCols: String*): DataFrame = {
    val ids = idCols.map(col)
    df.select(ids :+ explode(scoresArray(col(respCol))).as("kv"): _*)
      .select(ids :+ col("kv.section").as("section") :+ col("kv.score").as("score"): _*)
  }

  /** C14 feedback/explanation post-process (`rag_model.py:109-114`,
    * `rag_model_mass.py:58-62`): trimmed response with the reference's
    * fallback string when the response is null/empty.
    */
  def feedback(resp: Column, fallback: String = "Could not extract feedback."): Column =
    coalesce(nullif(trim(resp), lit("")), lit(fallback))

  /** Final score per id: mean of section scores rounded to 2 dp
    * (`app.py:94`; Spark `round` is HALF_UP where Python's is half-even —
    * indistinguishable away from exact .005 boundaries). Ids with no
    * scores produce no row (the reference raises instead, `app.py:91-92`).
    */
  def finalScores(scores: DataFrame, idCols: String*): DataFrame =
    scores.groupBy(idCols.map(col): _*)
      .agg(round(avg(col("score")), 2).as("final_score"))
}
