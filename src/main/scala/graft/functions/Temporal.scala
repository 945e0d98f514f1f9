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
