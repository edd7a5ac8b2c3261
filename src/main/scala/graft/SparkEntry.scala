package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** All verifiable operators/queries, grouped per SURVEY.md §2 sections. */
  def allQueries: Seq[Q] =
    RelationalQueries.all ++ ExtendedQueries.all ++ TpchMoreQueries.all ++
      TpchRestQueries.all ++
      AnalyticsQueries.all ++ TransformQueries.all ++ TextQueries.all ++
      DataPipelineQueries.all ++ StreamQueries.all ++ CurationQueries.all ++
      GeoQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
