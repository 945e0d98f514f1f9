package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming exact dedup — the continuous-ingest twin of
  * [[graft.functions.Dedup.exactDupGroups]]: drop any document whose
  * content hash was already seen, as data arrives.
  *
  * `dropDuplicatesWithinWatermark` keys state on the content hash and —
  * unlike plain `dropDuplicates`, whose state grows forever — evicts
  * entries once they age past the event-time watermark. At 100 TB-ingest
  * scale that bound is what keeps the state store finite: the operator
  * holds only the hashes seen inside the watermark horizon, spilled and
  * checkpointed by the state store like any streaming agg. Duplicates
  * further apart than the horizon are caught by the periodic batch
  * `exactDupGroups` compaction pass — the standard lambda split.
  */
object StreamingDedup {

  /** Deduplicate a streaming frame by content hash of `textCol`.
    *
    * @param events    streaming DataFrame with an event-time column
    * @param tsCol     event-time column used for the watermark
    * @param textCol   content column; rows with equal md5 are duplicates
    * @param horizon   watermark delay, e.g. "1 hour" — dup-detection window
    */
  def dedupStream(
      events: DataFrame, tsCol: String, textCol: String,
      horizon: String): DataFrame =
    events
      .withColumn("__text_hash", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")

  /** Continuous-ingest NEAR-dup dedup against a PERSISTED MinHash index
    * (round 11) — the streaming form of the `pl_index_update` lifecycle:
    * every micro-batch probes the stored corpus index with the
    * gate-proven batch operator
    * ([[graft.functions.Dedup.incrementalMinhashDedup]]), sinks the
    * survivors, and (when `appendSurvivors`) appends them to the index —
    * so later micro-batches near-dup against earlier ones, exactly the
    * nightly build→probe→append loop compressed to micro-batch cadence.
    *
    * `foreachBatch` is the right tool, not a streaming plan: the probe
    * needs batch-only primitives (an eager signature checkpoint and an
    * anti-join against drops derived from the batch itself — a
    * stream-stream anti-join no streaming planner accepts), and the
    * micro-batch boundary makes them legal — the same pattern lakehouse
    * MERGE sinks use. Index reload per micro-batch is metadata-only (a
    * file listing + a one-row meta read); survivors materialize via
    * `localCheckpoint` BEFORE the append so the sink's rows cannot
    * observe the index state their own append mutates.
    *
    * @param sink runs once per micro-batch on the SURVIVING rows (full
    *             input columns)
    */
  def minhashDedupStream(
      events: DataFrame, indexPath: String, idCol: String, textCol: String,
      threshold: Double, appendSurvivors: Boolean = true)(
      sink: DataFrame => Unit): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val idx = graft.functions.Dedup.loadMinhashIndex(spark, indexPath)
        val survIds = graft.functions.Dedup.incrementalMinhashDedup(
          batch, idx, idCol, textCol, threshold)
        val survivors = batch
          .join(survIds, Seq(idCol), "left_semi").localCheckpoint()
        if (appendSurvivors)
          graft.functions.Dedup.appendToMinhashIndex(
            spark, indexPath, survivors, idCol, textCol)
        sink(survivors)
      }
      .start()
}
