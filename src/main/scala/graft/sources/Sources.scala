package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Document ingestion (SURVEY §2.1 S1–S7): "file → text rows" with
  * extension dispatch, the reference's loader surface
  * (`/root/reference/utils.py:11-19`, `app.py:148-157`) re-expressed as
  * one distributed read over a glob instead of a per-upload driver loop.
  *
  * TXT is read natively (`wholetext`). PDF/DOCX byte streams are read
  * via `binaryFile` and routed through a pluggable extractor function —
  * by default `BinaryText.extract`, a pure-JVM PDF/DOCX text parser
  * (FlateDecode + Tj/TJ operators; zip + w:t runs) that falls back to
  * `extractTextStub`'s printable-ASCII salvage for anything it can't
  * read. Unknown extensions raise, mirroring the reference's ValueError
  * dispatch (`utils.py:18-19`).
  */
object Sources {

  /** `secure_filename` analog (`app.py:75,149`): keep [A-Za-z0-9_.-]. */
  def sanitizeFilename(c: Column): Column =
    regexp_replace(c, "[^A-Za-z0-9_.-]", "_")

  /** Lower-cased file extension of a path column. */
  def extension(path: Column): Column =
    lower(regexp_extract(path, "\\.([A-Za-z0-9]+)$", 1))

  /** Sanitized basename of a (URI-encoded) path column —
    * `input_file_name()`/binaryFile paths percent-encode spaces etc.
    */
  private def fileNameOf(path: Column): Column =
    sanitizeFilename(url_decode(element_at(split(path, "/"), -1)))

  /** S3: whole-file text documents from a glob → (path, file_name, text).
    * One row per file, read in parallel across executors.
    */
  def readWholeText(spark: SparkSession, glob: String): DataFrame =
    spark.read.option("wholetext", "true").text(glob)
      .select(input_file_name().as("path"), col("value").as("text"))
      .withColumn("file_name", fileNameOf(col("path")))
      .select(col("path"), col("file_name"), col("text"))

  /** Fallback text extractor for binary formats: salvages printable-ASCII
    * runs (≥4 chars) from the bytes. Deterministic; `BinaryText.extract`
    * (the loadDocuments default) tries the real PDF/DOCX parsers first
    * and lands here only for unparseable bytes.
    */
  def extractTextStub(bytes: Array[Byte]): String = {
    if (bytes == null) return ""
    val sb = new StringBuilder
    val run = new StringBuilder
    def flush(): Unit = {
      if (run.length >= 4) {
        if (sb.nonEmpty) sb.append('\n')
        sb.append(run)
      }
      run.clear()
    }
    bytes.foreach { b =>
      if (b >= 0x20 && b < 0x7f) run.append(b.toChar) else flush()
    }
    flush()
    sb.toString
  }

  /** S1/S2/S4/S5: load a mixed-format document directory. txt reads as
    * text; pdf/docx bytes go through `extract` (default: the real
    * BinaryText parser with stub fallback); unknown extensions fail the
    * job with the dispatch error (reference `utils.py:18-19`) unless
    * `strict = false` drops them. `password`, when set, is offered to
    * the PDF standard security handler (threaded to PdfCrypto; wrong
    * password degrades to salvage) and overrides `extract`'s default.
    * Returns (path, file_name, format, text).
    */
  def loadDocuments(spark: SparkSession, glob: String,
                    extract: Array[Byte] => String = BinaryText.extract,
                    strict: Boolean = true,
                    password: Option[String] = None): DataFrame = {
    val ex = password match {
      case Some(pw) => (b: Array[Byte]) => BinaryText.extract(b, pw)
      case None => extract
    }
    val extractUdf = udf(ex)
    val raw = spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .withColumn("format", extension(col("path")))
    val dispatched = raw.withColumn("text",
      when(col("format") === "txt", col("content").cast("string"))
        .when(col("format").isin("pdf", "docx"), extractUdf(col("content")))
        .otherwise(
          if (strict) raise_error(concat(lit("Unsupported file format: ."), col("format")))
          else lit(null)))
    val kept = if (strict) dispatched else dispatched.where(col("text").isNotNull)
    kept.select(col("path"), fileNameOf(col("path")).as("file_name"),
      col("format"), col("text"))
  }

  /** Schema-explicit CSV read (no inference — SURVEY §1 discipline). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** Schema-explicit JSON-lines read. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSONL corpus ingest — the interchange format bulk text corpora
    * actually ship as. Schema-explicit (no inference pass over 100 TB),
    * with malformed-line policy surfaced as data, not job failure:
    *   - permissive (default): bad lines yield a row with data columns
    *     NULL and the raw line captured in `_corrupt` — quarantine by
    *     `where(col("_corrupt").isNotNull)` and keep loading;
    *   - dropMalformed: bad lines silently dropped;
    *   - failFast: first bad line fails the read (CI-gate mode).
    * The `_corrupt` column exists only in permissive mode (Spark requires
    * it declared in the schema to capture into it).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                mode: String = "PERMISSIVE"): DataFrame = {
    val m = mode.toUpperCase
    val withCorrupt = if (m == "PERMISSIVE") schema.add("_corrupt", "string") else schema
    spark.read.schema(withCorrupt)
      .option("mode", m)
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
  }
}
