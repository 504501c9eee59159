package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by per-domain modules under `graft.queries`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference injector's full hot path (SURVEY.md §3.2) in batch form.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("entry_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ scale
    * extensions).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.InjectorQueries.all ++
      graft.queries.RelationalQueries.all ++
      graft.queries.AnalyticQueries.all ++
      graft.queries.TpchQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.DedupQueries.all ++
      graft.queries.SimilarityQueries.all ++
      graft.queries.AvroQueries.all ++
      graft.queries.MultimodalQueries.all ++
      graft.queries.CorpusQueries.all ++
      graft.queries.EsAggQueries.all ++
      graft.queries.EsDslQueries.all ++
      graft.queries.EventQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.InjectorQueries.oracles ++
      graft.queries.RelationalQueries.oracles ++
      graft.queries.AnalyticQueries.oracles ++
      graft.queries.TpchQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.SimilarityQueries.oracles ++
      graft.queries.AvroQueries.oracles ++
      graft.queries.MultimodalQueries.oracles ++
      graft.queries.CorpusQueries.oracles ++
      graft.queries.EsAggQueries.oracles ++
      graft.queries.EsDslQueries.oracles ++
      graft.queries.EventQueries.oracles
}
