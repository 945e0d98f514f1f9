package graft.server

import java.sql.Timestamp
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import graft.sources.Sinks

/** Query-status tracking over an upsert sink — the reference's
  * `QueryStatusWriter` (`miso-server/src/query_status.rs`, exercised by
  * `tests/query_status.rs`): one record per query id, upserted through the
  * lifecycle planning → running → success/error/canceled, never duplicated.
  *
  * The status table is itself just parquet, so it can be registered in a
  * [[graft.kql.Catalog]] and queried with KQL like any other collection.
  */
object QueryStatus {
  val QueryIdField = "query_id"
  val QueryField = "query"
  val StatusField = "status"
  val StartTimeField = "start_time"
  val EndTimeField = "end_time"
  val RunTimeSecondsField = "run_time_seconds"
  val ErrorField = "error"

  val schema: StructType = StructType(Seq(
    StructField(QueryIdField, StringType, nullable = false),
    StructField(QueryField, StringType, nullable = false),
    StructField(StatusField, StringType, nullable = false),
    StructField(StartTimeField, TimestampType, nullable = false),
    StructField(EndTimeField, TimestampType, nullable = true),
    StructField(RunTimeSecondsField, DoubleType, nullable = true),
    StructField(ErrorField, StringType, nullable = true)))
}

final class QueryStatusWriter(spark: SparkSession, path: String) {
  import QueryStatus._

  private def upsertRow(
      id: String, query: String, status: String, startMs: Long,
      endMs: Option[Long], error: Option[String]): Unit = {
    val row = Row(
      id, query, status, new Timestamp(startMs),
      endMs.map(new Timestamp(_)).orNull,
      endMs.map(e => (e - startMs) / 1000.0).map(Double.box).orNull,
      error.orNull)
    val df = spark.createDataFrame(
      java.util.Collections.singletonList(row), schema)
    Sinks.upsert(spark, df, path, QueryIdField)
  }

  /** Record `planning` and return the handle that advances the record. */
  def start(id: String, query: String): QueryStatusHandle = {
    val startMs = System.currentTimeMillis()
    upsertRow(id, query, "planning", startMs, None, None)
    new QueryStatusHandle(this, id, query, startMs)
  }

  private[server] def update(
      id: String, query: String, status: String, startMs: Long): Unit =
    upsertRow(id, query, status, startMs, None, None)

  private[server] def finish(
      id: String, query: String, status: String, startMs: Long,
      error: Option[String]): Unit =
    upsertRow(id, query, status, startMs, Some(System.currentTimeMillis()), error)
}

final class QueryStatusHandle(
    writer: QueryStatusWriter, id: String, query: String, startMs: Long) {
  /** Advance the status (e.g. `running`) without closing the record. */
  def update(status: String): Unit = writer.update(id, query, status, startMs)

  /** Close the record: sets end time + run time, optional error. */
  def finish(status: String, error: Option[String] = None): Unit =
    writer.finish(id, query, status, startMs, error)
}
