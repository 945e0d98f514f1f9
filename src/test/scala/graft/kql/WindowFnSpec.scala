package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Serialized window scalars: row_number/prev/next/row_cumsum, valid only
  * after a sort (KQL's serialize model — the sort keys define the window
  * order).
  */
class WindowFnSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      (3L, 30L), (1L, 10L), (2L, 20L), (4L, 40L)
    ).toDF("id", "v"))
    c
  }

  test("row_number follows the sort order, starting at 1") {
    val rows = Kql.run(spark, cat,
      "t | sort by id asc | extend rn = row_number() | project id, rn | sort by id asc")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("row_number takes a starting index") {
    val rows = Kql.run(spark, cat,
      "t | sort by id asc | extend rn = row_number(10) | project rn | sort by rn asc")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 11L, 12L, 13L))
  }

  test("prev/next with defaults and offsets") {
    val rows = Kql.run(spark, cat,
      """t | sort by id asc
        |  | extend p = prev(v), p0 = prev(v, 1, 0), n2 = next(v, 2)
        |  | project id, p, p0, n2 | sort by id asc""".stripMargin).collect()
    assert(rows(0).isNullAt(1))           // no previous row
    assert(rows(0).getLong(2) == 0L)      // default fills it
    assert(rows(0).getLong(3) == 30L)     // next-next value
    assert(rows(3).isNullAt(3))           // no next-next at the tail
    assert(rows(2).getLong(1) == 20L)
  }

  test("row_cumsum accumulates in sort order and keeps integer typing") {
    val rows = Kql.run(spark, cat,
      "t | sort by id asc | extend c = row_cumsum(v) | project c | sort by c asc").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 30L, 60L, 100L))
  }

  test("window scalars without a preceding sort are rejected") {
    val e = intercept[KqlParseException] {
      Kql.run(spark, cat, "t | extend rn = row_number()")
    }
    assert(e.getMessage.contains("serialized"))
  }

  test("where/project preserve serialization; summarize destroys it") {
    // filter between sort and window: still serialized
    val rows = Kql.run(spark, cat,
      """t | sort by id asc | where id != 2
        |  | extend rn = row_number() | project id, rn | sort by id asc""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (3L, 2L), (4L, 3L)))
    val e = intercept[KqlParseException] {
      Kql.run(spark, cat,
        """t | sort by id asc | summarize n = count() by v
          |  | extend rn = row_number()""".stripMargin)
    }
    assert(e.getMessage.contains("serialized"))
  }

  test("dropping or redefining a sort key de-serializes the input") {
    // project away the key: window must be rejected, not silently random
    val e1 = intercept[KqlParseException] {
      Kql.run(spark, cat, "t | sort by v asc | project id | extend rn = row_number()")
    }
    assert(e1.getMessage.contains("serialized"))
    // overwrite the key: same
    val e2 = intercept[KqlParseException] {
      Kql.run(spark, cat,
        "t | sort by v asc | extend v = 0 - v | extend rn = row_number()")
    }
    assert(e2.getMessage.contains("serialized"))
    // projecting the key THROUGH keeps serialization
    val ok = Kql.run(spark, cat,
      "t | sort by v asc | project id, v | extend rn = row_number() | sort by rn asc")
      .collect()
    assert(ok.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("prev/next default fills only out-of-bounds rows, not real nulls") {
    val c2 = new Catalog(spark)
    import spark.implicits._
    c2.register("u", Seq(
      (1L, Some(10L)), (2L, None: Option[Long]), (3L, Some(30L))
    ).toDF("id", "v"))
    val rows = Kql.run(spark, c2,
      """u | sort by id asc | extend p = prev(v, 1, 0 - 1)
        |  | project id, p | sort by id asc""".stripMargin).collect()
    assert(rows(0).getLong(1) == -1L) // no previous row: default
    assert(rows(1).getLong(1) == 10L)
    assert(rows(2).isNullAt(1))       // previous row EXISTS, value is null
  }

  test("descending sort keys order the window the same way") {
    val rows = Kql.run(spark, cat,
      "t | sort by id desc | extend rn = row_number() | project id, rn | sort by rn asc")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((4L, 1L), (3L, 2L), (2L, 3L), (1L, 4L)))
  }

  test("row_window_session: idle gap starts a new session") {
    val c2 = new Catalog(spark)
    import spark.implicits._
    c2.register("ev", Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00")),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:20:00")), // > 10m gap
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:21:00"))
    ).toDF("id", "at"))
    val rows = Kql.run(spark, c2,
      """ev | sort by at asc
        | | extend s = row_window_session(at, 1h, 10m)
        | | project id, s | sort by id asc""".stripMargin).collect()
    assert(rows(0).getTimestamp(1) == rows(1).getTimestamp(1))
    assert(rows(2).getTimestamp(1) == rows(3).getTimestamp(1))
    assert(rows(0).getTimestamp(1) != rows(2).getTimestamp(1))
    assert(rows(2).getTimestamp(1).toString.startsWith("2024-01-01 00:20:00"))
  }

  test("row_window_session: maxDuration restarts greedily at the breaking row") {
    val c2 = new Catalog(spark)
    import spark.implicits._
    // rows every 4 minutes, idle 10m never trips; maxDuration 10m does:
    // 00:00, 00:04, 00:08 in session 1 (08 ≤ 10m); 00:12 is 12m past the
    // session start → NEW session anchored at 00:12 (not 00:10), then
    // 00:16, 00:20 ride it, 00:24 is 12m past 00:12 → third session
    c2.register("ev", (0 to 6).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i * 4}%02d:00")))
      .toDF("id", "at"))
    val rows = Kql.run(spark, c2,
      """ev | sort by at asc
        | | extend s = row_window_session(at, 10m, 1h)
        | | project id, s | sort by id asc""".stripMargin).collect()
    val starts = rows.map(_.getTimestamp(1).toString.substring(0, 19))
    assert(starts.toSeq == Seq(
      "2024-01-01 00:00:00", "2024-01-01 00:00:00", "2024-01-01 00:00:00",
      "2024-01-01 00:12:00", "2024-01-01 00:12:00", "2024-01-01 00:12:00",
      "2024-01-01 00:24:00"))
  }

  test("row_window_session distributes under partition by") {
    val c2 = new Catalog(spark)
    import spark.implicits._
    c2.register("ev", Seq(
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 00:30:00")),
      ("u2", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("u2", java.sql.Timestamp.valueOf("2024-01-01 00:05:00"))
    ).toDF("u", "at"))
    val rows = Kql.run(spark, c2,
      """ev | partition by u (sort by at asc
        |     | extend s = row_window_session(at, 8h, 10m))
        | | summarize n = dcount(s) by u | sort by u asc""".stripMargin)
      .collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("u1", 2L), ("u2", 1L))) // u1's 30m gap splits; u2 stays one
  }

  test("row_window_session requires a serialized input") {
    assertThrows[KqlParseException] {
      Kql.run(spark, cat,
        "t | extend s = row_window_session(now(), 1h, 10m)")
    }
  }
}
