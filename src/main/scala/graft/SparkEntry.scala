package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOfJoin, Curation, DataQuality, Dedup, Erasure, Events, Features, Layout, Multimodal, Relational, Retrieval, Similarity, Sketches, StarSchema, Stats, TextAnalysis, TimeSeries, WindowAnalytics}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query registry of every operator module. Each query is a
  * lazy `(SparkSession, sfDir) => DataFrame`; `oracleSql` carries the
  * DuckDB-runnable equivalent for the driver's differential check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarSchema.factSalesDetail(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    StarSchema.queries ++ Relational.queries ++ TextAnalysis.queries ++
      Events.queries ++ Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      AsOfJoin.queries ++ WindowAnalytics.queries ++ Stats.queries ++ TimeSeries.queries ++
      Sketches.queries ++ Features.queries ++ DataQuality.queries ++ Curation.queries ++
      Layout.queries ++ Retrieval.queries ++ Erasure.queries ++ graft.sources.TextSources.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    StarSchema.oracles ++ Relational.oracles ++ TextAnalysis.oracles ++
      Events.oracles ++ Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++
      AsOfJoin.oracles ++ WindowAnalytics.oracles ++ Stats.oracles ++ TimeSeries.oracles ++
      Sketches.oracles ++ Features.oracles ++ DataQuality.oracles ++ Curation.oracles ++
      Layout.oracles ++ Retrieval.oracles ++ Erasure.oracles ++ graft.sources.TextSources.oracles
}
