package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped by area under `graft.queries.*`; this object
  * only aggregates the registries.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("map_events")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.ExtQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.LakeQueries.queries ++
      graft.queries.TrainQueries.queries ++
      graft.queries.TpchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
      graft.queries.AnalyticsQueries.oracleSql ++
      graft.queries.ExtQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.RelationalQueries.oracleSql ++
      graft.queries.CorpusQueries.oracleSql ++
      graft.queries.LakeQueries.oracleSql ++
      graft.queries.TrainQueries.oracleSql ++
      graft.queries.TpchQueries.oracleSql
}
