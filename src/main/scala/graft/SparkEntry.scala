package graft

import graft.queries.{CoreQueries, CurationQueries, EvalQueries, EventQueries, ExchangeQueries, ExtendedQueries, PipelineQueries, ProfilingQueries, RecallQueries, RelationalQueries, SelectionQueries, StreamingQueries, WarehouseQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the training-data
  * extension set) is a named entry in `queries`; every SQL-expressible one
  * has a DuckDB oracle in `oracleSql` with IDENTICAL output column names
  * and value representations (money = exact decimal sums cast to double).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q03CustomerMart(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtendedQueries.queries ++ PipelineQueries.queries ++
      ExchangeQueries.queries ++ RecallQueries.queries ++ RelationalQueries.queries ++
      CurationQueries.queries ++ WarehouseQueries.queries ++ EventQueries.queries ++
      StreamingQueries.queries ++ SelectionQueries.queries ++ ProfilingQueries.queries ++
      EvalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ ExtendedQueries.oracles ++ PipelineQueries.oracles ++
      ExchangeQueries.oracles ++ RecallQueries.oracles ++ RelationalQueries.oracles ++
      CurationQueries.oracles ++ WarehouseQueries.oracles ++ EventQueries.oracles ++
      StreamingQueries.oracles ++ SelectionQueries.oracles ++ ProfilingQueries.oracles ++
      EvalQueries.oracles
}
