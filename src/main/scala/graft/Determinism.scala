package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine determinism helpers (SURVEY.md §2.4 rules).
  *
  * Money/value aggregates are computed over DECIMAL(18,2) so partial
  * aggregation order (map-side combine, shuffle merge order) cannot change the
  * result — decimal addition is exact and associative, double addition is not.
  * Final outputs are cast back to DOUBLE: an exact decimal converts to the
  * same IEEE double in every engine, so Spark and the DuckDB oracle produce
  * bit-identical values without relying on matching ROUND implementations.
  */
object Determinism {
  val Dec: DecimalType = DecimalType(18, 2)

  /** Cast to DECIMAL(18,2) before aggregation (exact at cents precision). */
  def dec2(c: Column): Column = c.cast(Dec)

  /** Exact decimal sum surfaced as DOUBLE (deterministic across engines). */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Deterministic average: exact decimal sum as double, divided by count.
    * Identical IEEE ops in Spark and DuckDB → bit-identical result; avoids
    * both engines' (different) ROUND-on-double semantics.
    */
  def davg(c: Column): Column = sum(dec2(c)).cast(DoubleType) / count(lit(1))
}
