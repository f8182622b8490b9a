package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per SURVEY §2 operator from the
  * per-category objects under `graft.operators`; `oracleSql` carries the
  * DuckDB-runnable equivalent for every oracle-able key (SURVEY §2.Z.10:
  * plain table names over the same parquet fixtures).
  */
object SparkEntry {

  /** Flagship query (TPC-H q1 pricing summary, SURVEY §2.D `agg_groupby`)
    * on sf0.001; driver smoke-checks rows>0. Deliberately avoids the
    * events table so it works on any driver-built session (no
    * nanosAsLong requirement — SURVEY §7.0). */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.aggGroupby(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Aggregates.queries ++ Relational.queries ++ Joins.queries ++
      Windows.queries ++ SetOps.queries ++ JoinsAdvanced.queries ++ Functions.queries ++
      Streaming.queries ++ SourcesSinks.queries ++ LlmOps.queries ++
      LlmOpsExtra.queries ++ Multimodal.queries ++ Skew.queries ++ SqlOps.queries ++
      TimeSeries.queries ++ Clustering.queries ++ Analytics.queries ++ Analytics2.queries ++ LlmOpsPipeline.queries ++
      DataQuality.queries ++ RuntimeFilter.queries ++ ScaleIdioms.queries ++ Workload.queries ++
      JdbcSink.queries ++ Billing.queries ++ EventPattern.queries ++ BpeTrain.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Aggregates.oracleSql ++ Relational.oracleSql ++ Joins.oracleSql ++
      Windows.oracleSql ++ SetOps.oracleSql ++ JoinsAdvanced.oracleSql ++ Functions.oracleSql ++
      Streaming.oracleSql ++ SourcesSinks.oracleSql ++ LlmOps.oracleSql ++
      LlmOpsExtra.oracleSql ++ Multimodal.oracleSql ++ Skew.oracleSql ++ SqlOps.oracleSql ++
      TimeSeries.oracleSql ++ Clustering.oracleSql ++ Analytics.oracleSql ++ Analytics2.oracleSql ++ LlmOpsPipeline.oracleSql ++
      DataQuality.oracleSql ++ RuntimeFilter.oracleSql ++ ScaleIdioms.oracleSql ++ Workload.oracleSql ++
      JdbcSink.oracleSql ++ Billing.oracleSql ++ EventPattern.oracleSql ++ BpeTrain.oracleSql
}
