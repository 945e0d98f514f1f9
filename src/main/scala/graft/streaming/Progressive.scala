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
    * @param dir        directory of parquet files (each new file = a batch,
    *                   the analog of one source/split completing in miso)
    * @param schema     input schema (streaming reads need it declared)
    * @param transform  aggregation over the streaming DataFrame
    * @param queryName  in-memory sink table name (read snapshots with
    *                   `spark.table(queryName)`)
    * @param debounceMs emission cadence — the analog of miso's 1 s
    *                   partial-stream debounce
    */
  def aggregateStream(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      transform: DataFrame => DataFrame,
      queryName: String,
      debounceMs: Long = 1000L): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(dir)
    transform(src).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime(debounceMs))
      .start()
  }

  /** Windowed (binned) streaming aggregation with a watermark — the
    * streaming form of `summarize n=count() by bin(ts, w)`; late data beyond
    * the watermark is dropped and state is bounded (the 100 TB requirement
    * miso's unbounded in-memory snapshots can't meet).
    */
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
