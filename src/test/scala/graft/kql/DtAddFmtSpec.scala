package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import java.sql.Timestamp

/** datetime_add (calendar-aware months/years, exact micros otherwise),
  * format_datetime (Kusto→Java pattern translation), and the `_cs`
  * predicate aliases.
  */
class DtAddFmtSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      (1L, ts("2024-01-31 10:30:45.123"), "Hello World")
    ).toDF("id", "d", "s"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("datetime_add months clamps day-of-month and keeps time-of-day") {
    val r = run(
      """t | project m = datetime_add('month', 1, d),
        |     y = datetime_add('year', -1, d),
        |     dy = datetime_add('day', 2, d),
        |     h = datetime_add('hour', -11, d),
        |     sec = datetime_add('second', 15, d)""".stripMargin).collect().head
    assert(r.getTimestamp(0) == ts("2024-02-29 10:30:45.123")) // clamped
    assert(r.getTimestamp(1) == ts("2023-01-31 10:30:45.123"))
    assert(r.getTimestamp(2) == ts("2024-02-02 10:30:45.123"))
    assert(r.getTimestamp(3) == ts("2024-01-30 23:30:45.123"))
    assert(r.getTimestamp(4) == ts("2024-01-31 10:31:00.123"))
  }

  test("format_datetime translates Kusto patterns") {
    val r = run(
      """t | project a = format_datetime(d, 'yyyy-MM-dd HH:mm:ss'),
        |     b = format_datetime(d, 'yyyy/MM/dd hh:mm tt'),
        |     c = format_datetime(d, 'HH:mm:ss.fff')""".stripMargin).collect().head
    assert(r.getString(0) == "2024-01-31 10:30:45")
    assert(r.getString(1) == "2024/01/31 10:30 AM")
    assert(r.getString(2) == "10:30:45.123")
  }

  test("format_datetime requires a literal pattern") {
    intercept[KqlParseException](run("t | project a = format_datetime(d, s)"))
  }

  test("_cs aliases behave as the (case-sensitive) base forms") {
    assert(run("t | where s contains_cs 'World' | count")
      .collect().head.getLong(0) == 1L)
    assert(run("t | where s contains_cs 'world' | count")
      .collect().head.getLong(0) == 0L)
    assert(run("t | where s startswith_cs 'Hello' | count")
      .collect().head.getLong(0) == 1L)
    assert(run("t | where s !endswith_cs 'World' | count")
      .collect().head.getLong(0) == 0L)
  }
}
