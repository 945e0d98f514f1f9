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
    * file listing + a one-row meta read).
    *
    * REPLAY SAFETY (Structured Streaming re-executes a micro-batch after
    * a sink failure or a crash before the batch commits): a re-executed
    * probe would find the batch's OWN previously-appended survivors in
    * the index — each an exact self-dup — and silently drop them. The
    * per-batch body therefore commits its survivor-id MANIFEST under
    * `<indexPath>/_batches/` before touching the index; a replay detects
    * the manifest and rebuilds the same survivor set from it instead of
    * re-probing, re-appends only if the append marker is missing (a
    * crash between append and marker can duplicate index rows once —
    * probe-neutral, since candidates and drops are set-semantics), and
    * hands the sink the identical rows. The sink must be idempotent per
    * batchId, as for every foreachBatch sink.
    *
    * @param sink runs once per micro-batch on the SURVIVING rows (full
    *             input columns)
    */
  def minhashDedupStream(
      events: DataFrame, indexPath: String, idCol: String, textCol: String,
      threshold: Double, appendSurvivors: Boolean = true)(
      sink: DataFrame => Unit): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(probeBatch(batch, indexPath, batchId, idCol, textCol,
          threshold, appendSurvivors))
      }
      .start()

  /** The per-micro-batch body of [[minhashDedupStream]], exposed so
    * replay idempotence is directly testable: calling it twice with the
    * same batchId returns the same survivor set and leaves the index
    * correct (StreamingDedupSpec pins it). */
  def probeBatch(batch: DataFrame, indexPath: String, batchId: Long,
      idCol: String, textCol: String, threshold: Double,
      appendSurvivors: Boolean): DataFrame = {
    import graft.functions.Dedup
    val spark = batch.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val manifestDir = s"$indexPath/_batches/manifest-$batchId"
    val manifestDone =
      new org.apache.hadoop.fs.Path(s"$manifestDir/_SUCCESS")
    val appendMarker =
      new org.apache.hadoop.fs.Path(s"$indexPath/_batches/appended-$batchId")
    val fs = manifestDone.getFileSystem(hconf)
    val replay = fs.exists(manifestDone)
    val survivors =
      if (replay)
        // the index may already contain this batch's survivors (their
        // self-matches would wrongly drop them) — rebuild from the
        // committed manifest, never re-probe
        batch.join(spark.read.parquet(manifestDir), Seq(idCol), "left_semi")
          .localCheckpoint()
      else {
        val idx = Dedup.loadMinhashIndex(spark, indexPath)
        val s = batch
          .join(Dedup.incrementalMinhashDedup(
            batch, idx, idCol, textCol, threshold), Seq(idCol), "left_semi")
          .localCheckpoint()
        // the manifest's _SUCCESS is the batch's commit point: written
        // before any index mutation, so every earlier crash re-probes a
        // clean index and every later crash replays from the manifest
        s.select(idCol).write.mode("overwrite").parquet(manifestDir)
        s
      }
    if (appendSurvivors && !fs.exists(appendMarker)) {
      Dedup.appendToMinhashIndex(spark, indexPath, survivors, idCol, textCol)
      fs.create(appendMarker, true).close()
    }
    survivors
  }
}
