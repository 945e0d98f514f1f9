package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment join: match each point row to the interval rows
  * `[start, end]` (inclusive bounds) that contain its timestamp, for the
  * same key — attributing events to sessions, labels to feature windows,
  * log lines to deploy windows.
  *
  * The naive lowering — equi-join on the key, range predicate as a
  * post-filter — degrades per key: a key with `p` points and `i` intervals
  * materializes `p × i` candidate rows before the filter. This
  * implementation buckets time instead: points land in one fixed-width
  * bin, intervals explode across every bin they overlap (via `sequence`),
  * and the join runs on `(key, bin)` with the containment predicate as the
  * residual — candidates are only the pairs that share a bin, so the
  * per-key blow-up is bounded by interval length ÷ bin width. Pick
  * `binSeconds` near the typical interval length: ~1 bin per interval,
  * candidates ≈ true matches. One shuffle per side; intervals shuffle
  * `⌈len/bin⌉` copies (the standard space/skew trade of a bucketed range
  * join).
  *
  * Points on a shared bin boundary match from exactly one bin; an interval
  * emits its boundary bin once (`sequence` is inclusive), so no dedup pass
  * is needed.
  */
object Temporal {

  private def bin(ts: Column, binSeconds: Long): Column =
    floor(unix_timestamp(ts) / binSeconds).cast("long")

  /** Rolling trailing-window features per key: for every row, the count of
    * that key's rows and the exact integer-cents value sum within the
    * trailing `windowSeconds` (inclusive both ends) — rate/velocity
    * features for anomaly detection and feature engineering.
    *
    * One shuffle on the key, then a single sorted pass per partition
    * (range frames evaluate incrementally). The sum is integer cents, not
    * raw doubles: trailing-window double sums would be order-sensitive and
    * engine-divergent. A pathological hot key serializes into one task —
    * the standard mitigation is slicing such keys by coarse time range
    * with one window-length of overlap and dropping the warm-up rows.
    */
  def rollingWindow(
      df: DataFrame, keyCol: String, tsCol: String,
      windowSeconds: Long, valueCol: String): DataFrame = {
    // the range key is MICROSECONDS, not unix_timestamp seconds: flooring
    // to whole seconds silently widens the window for rows with
    // sub-second components (a row 3600.4s back floors to exactly 3600s
    // and sneaks in) — caught by the sf0.1 oracle, invisible at sf0.01
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col("__ts_us"))
      .rangeBetween(-windowSeconds * 1000000L, 0)
    df.withColumn("__ts_us", unix_micros(col(tsCol)))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_cents_window",
        sum(round(col(valueCol) * 100).cast("bigint")).over(w))
      .drop("__ts_us")
  }

  /** Gap-filled time series (the KQL `make-series` shape): per-group counts
    * at a fixed `step`, with missing buckets emitted as zero over each
    * group's own [min, max] bucket range. The grid generates from the tiny
    * per-group bounds table (`sequence` + explode — rows = buckets, not
    * data), then left-joins the real counts back.
    */
  def makeSeries(
      df: DataFrame, groupCol: String, tsCol: String,
      stepSeconds: Long): DataFrame = {
    // floor division, not `div`: `div` truncates toward zero, which shifts
    // pre-1970 (negative-epoch) timestamps into the bucket AFTER them —
    // floor matches bin()/date_trunc semantics on historical data.
    // Unix seconds stay well inside double's 2^53 exact range.
    val counts = df
      .groupBy(col(groupCol),
        timestamp_seconds(
          floor(unix_timestamp(col(tsCol)) / stepSeconds).cast("long")
            * stepSeconds).as("h"))
      .agg(count(lit(1)).as("n"))
    val grid = counts.groupBy(col(groupCol))
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col(groupCol),
        explode(sequence(col("h0"), col("h1"),
          expr(s"interval $stepSeconds seconds"))).as("h"))
    grid.join(counts, Seq(groupCol, "h"), "left")
      .select(col(groupCol), col("h"), coalesce(col("n"), lit(0L)).as("n"))
  }

  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      ts: String,
      start: String,
      end: String,
      binSeconds: Long = 3600L): DataFrame = {
    val p = points.withColumn("__bin", bin(col(ts), binSeconds))
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(start), binSeconds), bin(col(end), binSeconds))))
    p.join(iv, Seq(key, "__bin"))
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .drop("__bin")
  }
}
