package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CurationQueries, DedupQueries, EmbeddingQueries, MultimodalQueries, PipelineQueries, RelationalQueries, RetrievalQueries, TemporalQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory gate: one named DataFrame query per
  * implemented operator from SURVEY.md §2 (plus the large-scale pipeline
  * extensions), each paired — where ANSI-SQL-expressible — with a DuckDB
  * oracle in `oracleSql` that the driver hash-compares at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema revenue per region: scan → broadcast dim joins → hash agg.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.regionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ EmbeddingQueries.queries ++
      PipelineQueries.queries ++ MultimodalQueries.queries ++
      CurationQueries.queries ++ TemporalQueries.queries ++ RetrievalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ EmbeddingQueries.oracles ++
      PipelineQueries.oracles ++ MultimodalQueries.oracles ++
      CurationQueries.oracles ++ TemporalQueries.oracles ++ RetrievalQueries.oracles
}
