package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Progressive (partial) results, the Spark-native answer to the reference's
  * partial-stream machinery (`miso-workflow/src/partial_stream.rs`,
  * `partial_stream_tracker.rs`): miso snapshots blocking operators and emits
  * debounced refining aggregates over SSE; Structured Streaming's `update`/
  * `complete` output modes ARE that semantics — each micro-batch refines the
  * aggregate state, with watermarks (a capability the reference lacks)
  * bounding state for free.
  *
  * The batch engine needs none of this (results return when done); this
  * layer exists for parity with "aggregate refines while the query runs".
  */
object Progressive {

  /** Run an aggregation KQL-style over a file stream, refining results into
    * an in-memory table as data arrives.
    *
    * Output-mode tradeoff (be honest about it): `complete` keeps the whole
    * refined snapshot queryable — the exact miso partial-stream experience —
    * but retains ALL aggregation state (watermarks do not prune in complete
    * mode), so it fits bounded key spaces (dashboards over event types,
    * rolling top-ks). For unbounded keys (time bins advancing forever) use
    * `update` with a watermarked aggregation like [[binnedCounts]]: state
    * is pruned, and each batch emits only changed rows.
    *
    * @param dir        directory of parquet files (each new file = a batch,
    *                   the analog of one source/split completing in miso)
    * @param schema     input schema (streaming reads need it declared)
    * @param transform  aggregation over the streaming DataFrame
    * @param queryName  in-memory sink table name (read snapshots with
    *                   `spark.table(queryName)`)
    * @param debounceMs emission cadence — the analog of miso's 1 s
    *                   partial-stream debounce
    * @param outputMode `complete` (full snapshot, unbounded state) or
    *                   `update` (changed rows only, watermark-pruned state)
    */
  def aggregateStream(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      transform: DataFrame => DataFrame,
      queryName: String,
      debounceMs: Long = 1000L,
      outputMode: String = "complete"): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(dir)
    transform(src).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime(debounceMs))
      .start()
  }

  /** Windowed (binned) streaming aggregation with a watermark — the
    * streaming form of `summarize n=count() by bin(ts, w)`; late data beyond
    * the watermark is dropped and state is bounded (the 100 TB requirement
    * miso's unbounded in-memory snapshots can't meet). NOTE: the
    * state-pruning guarantee requires `append`/`update` output mode —
    * complete mode ignores watermarks by design.
    */
  /** Streaming form of the `session_count` / `activity_engagement`
    * sliding distinct count (round 8): each event contributes to every
    * bin in the lookback window STARTING at its own bin — the batch
    * lowering's bounded explode (fan-out = lookbackBins, never
    * data-dependent) — then `(id, bin)` dedup within the watermark and a
    * per-bin count. In `update` output mode each micro-batch emits only
    * the bins whose distinct count refined — exactly the reference's
    * partial_stream experience for the activity analytics — while the
    * watermark prunes both the dedup and aggregation state (the
    * unbounded-key caveat `complete` mode has does not apply).
    *
    * The exact-distinct trick: streaming `count_distinct` is unsupported,
    * but dedup-then-count over the SAME event-time column is, and is
    * exactly equivalent.
    */
  def slidingEngagement(
      stream: DataFrame,
      idCol: String,
      tsCol: String,
      binSeconds: Long,
      lookbackBins: Int,
      watermark: String): DataFrame = {
    val binUs = binSeconds * 1000000L
    val tb = (floor(unix_micros(col(tsCol).cast("timestamp")) / binUs)
      .cast("long") * binUs)
    stream
      .select(col(idCol).as("__id"), tb.as("__tb"))
      .withColumn("__t", explode(sequence(col("__tb"),
        col("__tb") + lit((lookbackBins - 1).toLong * binUs), lit(binUs))))
      .select(col("__id"), timestamp_micros(col("__t")).as("bin"))
      .withWatermark("bin", watermark)
      .dropDuplicates("__id", "bin")
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("count_sessions"))
  }

  /** Streaming form of `activity_counts`'s `new_dcount` series (round 9):
    * per bin, the number of ids seen for the FIRST time — global
    * first-seen dedup on the id (`dropDuplicatesWithinWatermark` keyed on
    * the id alone) feeding a per-bin count, refining in `update` mode like
    * [[slidingEngagement]] (per-bin dcount itself is
    * `slidingEngagement(lookbackBins = 1)`).
    *
    * `dropDuplicatesWithinWatermark` is the load-bearing choice: plain
    * `dropDuplicates("__id")` NEVER evicts — Spark prunes dedup state by
    * watermark only when the event-time column is among the dedup keys —
    * so id-only state would grow with every distinct id ever seen. The
    * within-watermark form expires each id's entry once the watermark
    * passes its last-seen event time, giving bounded O(active ids) state.
    *
    * Bounded-state semantics, stated honestly: an id silent for longer
    * than the watermark has its dedup state dropped, so a comeback after
    * that horizon counts as new again — the unavoidable trade of the
    * batch plugin's full-history `new_dcount` for bounded streaming
    * state. First-seen attribution is by arrival order (equals event
    * order for in-order streams).
    */
  def newUsersPerBin(
      stream: DataFrame,
      idCol: String,
      tsCol: String,
      binSeconds: Long,
      watermark: String): DataFrame = {
    val binUs = binSeconds * 1000000L
    val tb = timestamp_micros(
      floor(unix_micros(col(tsCol).cast("timestamp")) / binUs)
        .cast("long") * binUs)
    stream
      .select(col(idCol).as("__id"), tb.as("bin"))
      .withWatermark("bin", watermark)
      .dropDuplicatesWithinWatermark("__id")
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("new_users"))
  }

  def binnedCounts(
      stream: DataFrame,
      tsCol: String,
      window: String,
      watermark: String,
      extraKeys: Seq[String] = Nil): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(
        (org.apache.spark.sql.functions.window(col(tsCol), window).as("w")) +:
          extraKeys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select((col("w.start").as("bin") +: extraKeys.map(col)) :+ col("n"): _*)
}
