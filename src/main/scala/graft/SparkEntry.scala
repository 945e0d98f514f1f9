package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{CoreQueries, KqlQueries, PipelineQueries, Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered queries (operator inventory + pipeline ops). */
  def registry: Seq[Q] = CoreQueries.all ++ KqlQueries.all ++ PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors SURVEY §7.2's milestone-1 slice: filter → bin(1h) → count → top.
    */
  def entry(spark: SparkSession): DataFrame = {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    events
      .filter(col("event_type") === "error")
      .groupBy(graft.functions.KqlFunctions.binTime(col("ts"), 3600L * 1000000L).as("h"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("h"))
      .limit(10)
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
