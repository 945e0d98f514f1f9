package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Temporal

/** Bin-bucketed interval join pinned against the naive equi-join+filter
  * lowering — same result set, bounded candidate generation.
  */
class TemporalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val points = Seq(
    (1L, 100L, ts("2024-01-01 10:30:00")), // inside iv A
    (2L, 100L, ts("2024-01-01 12:00:00")), // exactly at A's end (inclusive)
    (3L, 100L, ts("2024-01-01 12:00:01")), // just past A
    (4L, 100L, ts("2024-01-01 09:59:59")), // just before A
    (5L, 100L, ts("2024-01-02 03:10:00")), // inside the long iv B
    (6L, 200L, ts("2024-01-01 10:30:00")), // right time, wrong key
    (7L, 100L, ts("2024-01-01 11:00:00"))  // bin-boundary instant inside A
  ).toDF("pid", "key", "ts")

  private val intervals = Seq(
    (10L, 100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")), // A: 2h
    (11L, 100L, ts("2024-01-02 00:00:00"), ts("2024-01-02 23:00:00")), // B: 23h
    (12L, 300L, ts("2024-01-01 00:00:00"), ts("2024-01-01 23:59:59"))  // other key
  ).toDF("iid", "key", "start", "end")

  private def naive(p: DataFrame, iv: DataFrame): Set[(Long, Long)] =
    p.join(iv, Seq("key"))
      .filter(col("ts") >= col("start") && col("ts") <= col("end"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("intervalJoin matches the naive lowering, bounds inclusive") {
    val got = Temporal.intervalJoin(
      points, intervals, "key", "ts", "start", "end", binSeconds = 3600L)
      .select("pid", "iid").as[(Long, Long)].collect().toList
    assert(got.toSet == naive(points, intervals))
    // no duplicate matches from an interval spanning many bins
    assert(got.size == got.toSet.size)
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (5L, 11L), (7L, 10L)))
  }

  test("intervalJoin is insensitive to the bin width") {
    for (bin <- Seq(60L, 3600L, 86400L)) {
      val got = Temporal.intervalJoin(
        points, intervals, "key", "ts", "start", "end", binSeconds = bin)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.toSet == naive(points, intervals), s"bin=$bin")
      assert(got.length == got.toSet.size, s"bin=$bin dup rows")
    }
  }
}
