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

  test("rollingWindow counts the trailing range inclusively per key") {
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 7L, ts("2024-01-01 10:30:00"), 2.0),
      (3L, 7L, ts("2024-01-01 11:00:00"), 4.0), // exactly 1h after #1: included
      (4L, 7L, ts("2024-01-01 12:30:00"), 8.0), // everything else aged out
      (5L, 8L, ts("2024-01-01 10:45:00"), 16.0) // other key, inside #2's hour
    ).toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.rollingWindow(ev, "user_id", "ts", 3600L, "value")
      .orderBy("event_id")
      .select("event_id", "n_window", "sum_cents_window")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 100L), (2L, 2L, 300L), (3L, 3L, 700L),
      (4L, 1L, 800L), (5L, 1L, 1600L)))
  }

  test("rollingWindow respects sub-second boundaries (no second-flooring)") {
    // #2 sits 3600.4 s after #1: OUTSIDE the hour. Flooring timestamps to
    // whole seconds would report the gap as exactly 3600 and include it —
    // the bug the sf0.1 oracle caught.
    val ev = Seq(
      (1L, 7L, Timestamp.valueOf("2024-01-01 10:00:00.300"), 1.0),
      (2L, 7L, Timestamp.valueOf("2024-01-01 11:00:00.700"), 2.0),
      (3L, 7L, Timestamp.valueOf("2024-01-01 11:30:00.100"), 4.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.rollingWindow(ev, "user_id", "ts", 3600L, "value")
      .orderBy("event_id").select("event_id", "n_window")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("makeSeries floors pre-1970 timestamps into the preceding bucket") {
    // regression: `div` truncates toward zero, so unix -1800 landed in the
    // 1970-01-01 00:00 bucket instead of 1969-12-31 23:00
    val ev = Seq(
      (1L, "g", ts("1969-12-31 23:30:00")),
      (2L, "g", ts("1970-01-01 00:30:00"))
    ).toDF("id", "g", "ts")
    val got = Temporal.makeSeries(ev, "g", "ts", 3600L)
      .orderBy("h")
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm").as("h"), col("n"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("1969-12-31 23:00", 1L), ("1970-01-01 00:00", 1L)))
  }

  test("makeSeries zero-fills interior gaps over each group's own range") {
    val ev = Seq(
      (1L, "a", ts("2024-01-01 10:10:00")),
      (2L, "a", ts("2024-01-01 10:20:00")),
      (3L, "a", ts("2024-01-01 13:00:00")), // 11:00 and 12:00 are gaps
      (4L, "b", ts("2024-01-01 00:30:00"))  // single-bucket group: no gaps
    ).toDF("id", "g", "ts")
    val got = Temporal.makeSeries(ev, "g", "ts", 3600L)
      .orderBy("g", "h")
      .select("g", "n").as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 2L), ("a", 0L), ("a", 0L), ("a", 1L), // 10,11,12,13
      ("b", 1L)))
  }
}
