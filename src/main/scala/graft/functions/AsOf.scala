package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the payload of
  * the most recent right row with `right.ts <= left.ts` for the same key —
  * the standard shape for enriching an event with the latest prior state
  * (last quote before a trade, last page view before a purchase, feature
  * snapshot as of a label's timestamp).
  *
  * Spark has no native as-of join, and the naive formulation — an
  * inequality join plus a per-left-row max — plans as a broadcast
  * nested-loop join with a quadratic probe, which is unusable at scale.
  * This implementation is the union+carry-forward lowering instead:
  * tag both inputs, union them by name, and run one running
  * `last(_, ignoreNulls)` window per payload column ordered by
  * `(ts, side)`. Cost is ONE shuffle on the key and a single linear pass
  * per partition (running frames evaluate incrementally) — the same
  * asymptotics as a sort-merge join, no candidate blow-up. Rights sort
  * before lefts at equal timestamps, so a right row at exactly `left.ts`
  * matches (inclusive `<=`, the same convention as DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`, which the gate uses as its oracle).
  *
  * Semantics notes:
  *   - Left-outer: a left row with no prior right row keeps null payloads.
  *   - A null payload VALUE on a right row is transparent (the carry
  *     keeps the previous non-null); pre-aggregate rights if nulls are
  *     meaningful.
  *   - Several right rows sharing (key, ts) are ambiguous — collapse them
  *     first (e.g. groupBy(key, ts).agg(max(...))) for determinism.
  *   - A single hot key serializes into one task (window partitioning);
  *     at 100 TB split such keys by coarse time range and carry the
  *     boundary state, as SCALE.md's skew note describes.
  */
object AsOf {

  /** @param payload right-side columns to carry; they land on the output
    *                prefixed (`asof_<name>`), together with the matched
    *                right timestamp as `asof_<ts>`. */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val carried = (ts +: payload).map(p => prefix + p)
    // a right row with a null timestamp can match nothing (ts >= null is
    // never true), but under asc ordering nulls sort FIRST, so without
    // this filter its payload would carry into every left row of the key
    val r = right.filter(col(ts).isNotNull)
      .select(
        col(key) +: col(ts) +:
          (col(ts).as(prefix + ts) +:
            payload.map(p => col(p).as(prefix + p))): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCarry = carried.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    withCarry.filter(col("__side") === 1)
      .select(left.columns.map(col) ++ carried.map(col): _*)
  }
}
