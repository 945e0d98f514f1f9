package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL join with watermark-bounded state — the classic
  * event-attribution shape (impression joined to the click that follows it
  * within an attribution window), which no batch operator replaces when
  * both sides arrive continuously.
  *
  * Spark buffers both sides' state and needs two bounds to prune it:
  * watermarks on both event-time columns, and a time-range join condition
  * tying the two clocks together. With both present, a left row is held
  * only until `right watermark > left ts + window`, so state is
  * O(rate × window), never unbounded — the 100 TB streaming requirement.
  *
  * The reference engine has no streaming joins at all (its `join` is a
  * batch build-side hash join, miso-workflow/src/join.rs); this is
  * Structured Streaming native capability surfaced KQL-adjacently.
  */
object StreamingJoin {

  /** Inner interval join: rows of `left` matched to rows of `right` with
    * the same `keyCol` whose event time lands in
    * [left ts, left ts + windowSeconds].
    *
    * @param leftWatermark  e.g. "30 seconds" — how late left events may be
    * @param rightWatermark bound for the right side (also prunes left
    *                       state once right's watermark passes the window)
    * @return (key, left ts as l_ts, right ts as r_ts, lag_seconds)
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      windowSeconds: Long,
      leftWatermark: String, rightWatermark: String): DataFrame = {
    val l = left
      .select(col(keyCol).as("__k"), col(leftTsCol).as("l_ts"))
      .withWatermark("l_ts", leftWatermark)
    val r = right
      .select(col(keyCol).as("__rk"), col(rightTsCol).as("r_ts"))
      .withWatermark("r_ts", rightWatermark)
    l.join(r,
      col("__k") === col("__rk") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("__k").as("key"), col("l_ts"), col("r_ts"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts")))
          .cast("double")./(lit(1e6)).as("lag_seconds"))
  }

  /** First-touch attribution on top of [[intervalJoin]]: per (key, left
    * event), keep only the EARLIEST matching right event — streaming
    * dropDuplicates on the (key, l_ts) pair keeps the first match emitted;
    * with event-time-ordered arrival that is the earliest click (exact
    * under ordered delivery, first-arrival otherwise — stated, not
    * hidden). State prunes on the same watermarks.
    */
  def firstTouch(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      windowSeconds: Long,
      leftWatermark: String, rightWatermark: String): DataFrame =
    // the join output carries BOTH event-time columns; the dedup needs
    // exactly one, so r_ts is rebuilt as a plain value (a fresh
    // expression drops the event-time tag) and the state prunes on
    // l_ts's inherited watermark
    intervalJoin(left, right, keyCol, leftTsCol, rightTsCol,
      windowSeconds, leftWatermark, rightWatermark)
      .select(col("key"), col("l_ts"),
        timestamp_micros(unix_micros(col("r_ts"))).as("r_ts"),
        col("lag_seconds"))
      .dropDuplicates("key", "l_ts")
}
