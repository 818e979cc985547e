package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Aggregates the per-area query registries; every entry in [[queries]]
 * with a matching entry in [[oracleSql]] is hash-checked against DuckDB
 * at sf0.01 by the driver.
 */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TsdbQueries.defs("q_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TsdbQueries.defs ++ EventsQueries.defs ++ PipelineQueries.defs ++ MetaQueriesSuite.defs ++ RollupQueries.defs ++ StreamQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
   * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TsdbQueries.oracles ++ EventsQueries.oracles ++ PipelineQueries.oracles ++ MetaQueriesSuite.oracles ++ RollupQueries.oracles ++ StreamQueries.oracles
}
