package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Resume section chunker — exact reproduction of the reference's
  * `chunk_by_section` semantics (`/root/reference/rag_model.py:18-42`,
  * patterns `/root/reference/constants.py:116-124`):
  *
  *  - headers are `(alias)\s*[:\n]`, case-insensitive, found in document
  *    order; the slice for a header runs from the end of its match to the
  *    start of the next match (or end of text), then `.trim`;
  *  - the matched header text is canonicalized by case-insensitive
  *    fullmatch against the 7 canonical patterns in declaration order;
  *  - text before the first header (preamble) is dropped;
  *  - a later duplicate of the same canonical key overwrites the earlier
  *    one (dict-overwrite in the reference → keep-last here).
  *
  * Spark shape: one row per (doc, section) via a deterministic Scala
  * function exposed both as a plain function (unit-testable without Spark)
  * and as `explode`-able DataFrame transform. The per-doc work is pure
  * string processing — embarrassingly parallel, no shuffle except the
  * keep-last window, which is partitioned by doc_id and therefore scales
  * with the data.
  */
object SectionChunker {

  /** Canonical key → alias pattern, in reference declaration order
    * (`constants.py:116-124`). Order matters: first fullmatch wins.
    */
  val sectionPatterns: Seq[(String, String)] = Seq(
    "summary" -> "(summary|objective|about me)",
    "experience" -> "(experience|work history|professional experience)",
    "skills" -> "(skills|technologies|technical skills)",
    "projects" -> "(projects|portfolio)",
    "education" -> "(education|academics)",
    "certifications" -> "(certifications|qualifications|achievements|endorsements)",
    "strengths" -> "(strengths|capabilities|abilities|merits)",
  )

  /** The combined header regex: `(alias1|...|aliasN)\s*[:\n]`, case-insensitive. */
  val headerRegex: String =
    "(" + sectionPatterns.map(_._2).mkString("|") + ")\\s*[:\\n]"

  private val headerPattern =
    java.util.regex.Pattern.compile(headerRegex, java.util.regex.Pattern.CASE_INSENSITIVE)

  private val canonical: Seq[(String, java.util.regex.Pattern)] =
    sectionPatterns.map { case (k, p) =>
      k -> java.util.regex.Pattern.compile(p, java.util.regex.Pattern.CASE_INSENSITIVE)
    }

  /** Pure chunker: text → (section, content, pos). Mirrors the
    * reference's dict overwrite exactly: a duplicate header replaces the
    * CONTENT but keeps the key's original insertion slot — so `pos` is
    * the first-occurrence index and the content is the last
    * occurrence's (Python `d[k] = v` preserves insertion order).
    */
  def chunk(text: String): Seq[(String, String, Int)] = {
    val m = headerPattern.matcher(text)
    val matches = Iterator.continually(m.find())
      .takeWhile(identity)
      .map(_ => (m.group(1), m.start(), m.end()))
      .toVector
    val raw = matches.zipWithIndex.flatMap { case ((header, _, end), i) =>
      val next = if (i + 1 < matches.size) matches(i + 1)._2 else text.length
      val key = canonical.collectFirst {
        case (k, p) if p.matcher(header.trim.toLowerCase).matches() => k
      }
      key.map(k => (k, text.substring(end, next).trim, i))
    }
    // content from the LAST occurrence, position from the FIRST
    raw.groupBy(_._1).map { case (k, occ) =>
      (k, occ.maxBy(_._3)._2, occ.map(_._3).min)
    }.toSeq.sortBy(_._3)
  }

  private val chunkUdf = udf { text: String =>
    if (text == null) Seq.empty[(String, String, Int)] else chunk(text)
  }

  /** DataFrame form: explode `textCol` into (section, content, pos) rows,
    * keyed by the caller's id columns. One row in → N rows out, no shuffle.
    */
  def chunkSections(df: DataFrame, textCol: String, idCols: String*): DataFrame = {
    val ids = idCols.map(col)
    df.select(ids :+ explode(chunkUdf(col(textCol))).as("chunk"): _*)
      .select(ids :+ col("chunk._1").as("section")
        :+ col("chunk._2").as("content") :+ col("chunk._3").as("pos"): _*)
  }

  /** Pure-SQL alternative for keep-last dedup when chunks already exist as
    * rows: row_number over (doc, section) by pos desc — used at scale when
    * the chunker output is materialized and re-deduped after a union.
    */
  def keepLast(df: DataFrame, docCol: String): DataFrame = {
    val w = Window.partitionBy(col(docCol), col("section")).orderBy(col("pos").desc)
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }
}
