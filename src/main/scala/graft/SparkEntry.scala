package graft

import graft.queries.{Advanced, Analysis, Clustering, Media, PipelineQ, GraphQ, Relational, Retrieval, SemanticQ, Stats, Temporal, Text, Tpch, Typed, VectorQ}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2.4): every key
  * has a matching DuckDB oracle in `oracleSql` (column names aligned — the
  * driver sorts columns by name before hashing values) unless the operator
  * is not SQL-expressible, in which case the driver records a rows-only
  * check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the vertical-slice query (scan → vector distance → top-k).
    */
  def entry(spark: SparkSession): DataFrame =
    VectorQ.l2Topk(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Text.queries ++ VectorQ.queries ++
      Analysis.queries ++ PipelineQ.queries ++ Advanced.queries ++ Tpch.queries ++
      Typed.queries ++ Clustering.queries ++ Stats.queries ++ Retrieval.queries ++
      Temporal.queries ++ GraphQ.queries ++ SemanticQ.queries ++ Media.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ Text.oracleSql ++ VectorQ.oracleSql ++
      Analysis.oracleSql ++ PipelineQ.oracleSql ++ Advanced.oracleSql ++ Tpch.oracleSql ++
      Typed.oracleSql ++ Clustering.oracleSql ++ Stats.oracleSql ++ Retrieval.oracleSql ++
      Temporal.oracleSql ++ GraphQ.oracleSql ++ SemanticQ.oracleSql ++ Media.oracleSql
}
