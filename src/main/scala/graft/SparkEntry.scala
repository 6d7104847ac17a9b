package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{LlmQueries, ReferenceQueries, RelationalQueries, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query catalog: [[graft.queries.ReferenceQueries]] (the reference's
  * fold/scan operator family), [[graft.queries.RelationalQueries]] (host
  * relational surface + benchmark shapes). Every query ends in a
  * deterministic ORDER BY; money aggregates are decimal-exact for
  * cross-engine hash parity (see [[graft.queries.Tables]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own first scan example (running max over order
    * dates, examples_scan.py:9–25) on parquet. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.scanRunningMax(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.defs ++ RelationalQueries.defs ++ LlmQueries.defs ++ StreamingQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (non-associative whole-frame kernels — pinned by golden tests
    * instead, FIXTURES.md §A). */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracles ++ RelationalQueries.oracles ++ LlmQueries.oracles ++ StreamingQueries.oracles
}
