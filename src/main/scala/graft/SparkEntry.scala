package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{CoreQueries, KqlQueries, PipelineQueries, Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered queries (operator inventory + pipeline ops). */
  def registry: Seq[Q] = CoreQueries.all ++ KqlQueries.all ++ PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * SURVEY §7.2's milestone-1 slice, compiled by the actual KQL engine:
    * parse → lower → Catalyst (filter pushdown → partial/final agg →
    * TakeOrderedAndProject).
    */
  def entry(spark: SparkSession): DataFrame = {
    val cat = graft.kql.Catalog.forTestData(spark, "/root/testdata/sf0.001")
    graft.kql.Kql.run(spark, cat,
      """events
        | | where event_type == 'error'
        | | summarize c=count() by h=bin(ts, 1h)
        | | top 10 by c desc, h asc""".stripMargin)
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
