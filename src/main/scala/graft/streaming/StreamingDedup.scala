package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
