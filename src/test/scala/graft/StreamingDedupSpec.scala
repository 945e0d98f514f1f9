package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup

final case class DedupDoc(ts: Timestamp, text: String)

/** Streaming exact dedup: duplicates inside the watermark horizon are
  * dropped; state is evicted past the horizon (the bound that keeps the
  * state store finite at ingest scale).
  */
class StreamingDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("drops in-horizon duplicates, evicts state past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DedupDoc]
    val q = StreamingDedup.dedupStream(
      input.toDF(), "ts", "text", horizon = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        DedupDoc(t("2024-01-01 00:00:00"), "alpha"),
        DedupDoc(t("2024-01-01 00:10:00"), "beta"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)

      // same content re-arrives inside the horizon → dropped; a far-future
      // row advances the watermark past alpha's expiry
      input.addData(
        DedupDoc(t("2024-01-01 00:20:00"), "alpha"),
        DedupDoc(t("2024-01-01 05:00:00"), "gamma"))
      q.processAllAvailable()
      val afterB2 = spark.table("dedup_out").as[DedupDoc].collect()
        .map(_.text).toSeq
      assert(afterB2.count(_ == "alpha") == 1, "in-horizon dup must drop")
      assert(afterB2.contains("gamma"))

      // alpha's hash state is older than the advanced watermark → evicted;
      // a late re-occurrence is treated as new (the batch compaction pass
      // owns cross-horizon dups)
      input.addData(DedupDoc(t("2024-01-01 06:00:00"), "alpha"))
      q.processAllAvailable()
      val afterB3 = spark.table("dedup_out").as[DedupDoc].collect()
        .map(_.text).toSeq
      assert(afterB3.count(_ == "alpha") == 2,
        "state must be evicted past the horizon")
    } finally q.stop()
  }

  test("streaming minhash probe appends survivors between micro-batches") {
    import graft.functions.Dedup
    implicit val sqlCtx = spark.sqlContext
    // persisted day-0 corpus index
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "red orange yellow green blue indigo violet"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-stream-idx").toString
    Dedup.saveMinhashIndex(Dedup.minhashIndex(corpus, "doc_id", "text"), dir)
    val input = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = graft.streaming.StreamingDedup.minhashDedupStream(
      input.toDF().toDF("doc_id", "text"), dir, "doc_id", "text",
      threshold = 0.8) { surv =>
      seen ++= surv.collect().map(_.getLong(0)); ()
    }
    try {
      // micro-batch 1: a corpus dup (drops) + a fresh doc (survives,
      // appends)
      input.addData(
        (10L, "alpha beta gamma delta epsilon zeta eta theta"),
        (11L, "one two three four five six seven eight"))
      q.processAllAvailable()
      assert(seen.toSet == Set(11L), s"batch-1 survivors: $seen")
      // micro-batch 2: a dup of batch-1's SURVIVOR must now drop (the
      // append is what makes it visible), a fresh doc survives
      input.addData(
        (20L, "one two three four five six seven eight"),
        (21L, "nine ten eleven twelve thirteen fourteen"))
      q.processAllAvailable()
      assert(seen.toSet == Set(11L, 21L),
        s"batch-2 must drop the dup of the appended survivor: $seen")
    } finally q.stop()
  }

  test("replayed micro-batch returns the same survivors, not self-dedup") {
    import graft.functions.Dedup
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-replay-idx").toString
    Dedup.saveMinhashIndex(Dedup.minhashIndex(corpus, "doc_id", "text"), dir)
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // corpus dup
      (11L, "one two three four five six seven eight"))       // survivor
      .toDF("doc_id", "text")
    def run() = graft.streaming.StreamingDedup.probeBatch(
      batch, dir, batchId = 7L, "doc_id", "text",
      threshold = 0.8, appendSurvivors = true)
      .collect().map(_.getLong(0)).toSet
    assert(run() == Set(11L))
    // Structured Streaming re-executes a micro-batch after a crash
    // before commit: the index now holds doc 11's own rows, so a naive
    // re-probe would self-dedup it away and the retry would emit NOTHING
    // for a doc the pipeline never delivered. The manifest replay path
    // must return the identical survivor set.
    assert(run() == Set(11L),
      "a replayed batch must re-emit its committed survivors")
    // and the replay did not double the appended index rows (the append
    // marker short-circuits the second append)
    val setRows = TestSpark.spark.read.parquet(s"$dir/sets")
      .where(org.apache.spark.sql.functions.col("__cid") === 11L).count()
    assert(setRows == 1L, s"survivor appended exactly once: $setRows")
  }
}
