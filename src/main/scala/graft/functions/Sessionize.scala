package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-based sessionization — grouping a user's events into sessions
  * separated by idle gaps, the standard shape for assembling training
  * examples from event/interaction logs.
  *
  * Batch path uses Spark's built-in `session_window` (a merging
  * session-interval aggregation, Catalyst-native): one shuffle on
  * (key, merged-window), map-side partial merge, spills — the right plan
  * at 100 TB. A session's `end` is last event time + gap, per
  * `session_window` semantics: session intervals that touch are merged,
  * so an event at `diff <= gap` extends the session and one at
  * `diff > gap` opens a new session (StreamingSpec pins `diff == gap`
  * merging; the streaming twin and the DuckDB oracle agree).
  *
  * The value aggregate is integer cents (`round(value*100)`), not a raw
  * double sum — double addition is order-sensitive across engines, integer
  * addition is associative, so the DuckDB oracle hash-matches exactly.
  * The streaming analog with explicit state lives in
  * [[graft.streaming.StreamingSessionize]].
  */
object Sessionize {

  def valueCents(value: Column): Column =
    round(value * 100).cast("bigint")

  /** One row per (key, session): start, end (last + gap), event count, and
    * the summed value in cents.
    */
  def sessions(
      df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, valueCol: String): DataFrame =
    df.groupBy(
        col(keyCol),
        session_window(col(tsCol), s"$gapSeconds seconds").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(valueCents(col(valueCol))).as("sum_cents"))
      .select(
        col(keyCol),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"),
        col("sum_cents"))
}
