package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * One parquet file per table under `sfDir`; explicit pass-through of the
  * footer schema (FIXTURES.md §1) — no inference, no casts at scan time so
  * parquet predicate pushdown / column pruning stay effective.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has shipped as two parquet physical types across driver
    * testdata generations, so the loader adapts on the scanned type:
    *
    *  - TIMESTAMP(NANOS): Spark 4 refuses it by default; read as raw INT64
    *    nanos (legacy conf) and convert with integral division — `ts div
    *    1000` stays in long arithmetic; a double intermediate would lose
    *    microseconds at 1.7e18-ns epochs. Declared queries only bucket at
    *    ≥1s so the ns→µs truncation is unobservable vs the DuckDB oracle
    *    (SURVEY.md §7 risk c).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): scanned natively as
    *    TIMESTAMP_NTZ; cast to session-TZ TIMESTAMP (session is pinned to
    *    UTC, so the wall-clock is the same instant) so every downstream
    *    query keeps seeing the exact type the ns-era loader produced.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
