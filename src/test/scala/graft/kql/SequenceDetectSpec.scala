package graft.kql

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `evaluate sequence_detect` — cascaded as-of sequence detection. */
class SequenceDetectSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("ev", Seq(
      // user 1: clean view → cart → buy inside the windows
      (1L, ts(0), "view"), (1L, ts(5), "cart"), (1L, ts(8), "buy"),
      // user 2: cart→buy gap exceeds the 10m step window
      (2L, ts(0), "view"), (2L, ts(5), "cart"), (2L, ts(40), "buy"),
      // user 3: total span exceeds the 30m duration (gaps each ok)
      (3L, ts(0), "view"), (3L, ts(25), "cart"), (3L, ts(34), "buy"),
      // user 4: buy with no cart before it
      (4L, ts(0), "view"), (4L, ts(5), "buy"),
      // user 5: two views — the buy binds to the NEAREST prior cart/view
      (5L, ts(0), "view"), (5L, ts(2), "view"), (5L, ts(4), "cart"),
      (5L, ts(6), "buy")
    ).toDF("uid", "t", "etype"))
    c
  }

  private def run(q: String) = Kql.run(spark, cat, q).collect()

  test("sequences bind to nearest predecessors inside the windows") {
    val rows = run(
      """ev | extend v = etype == 'view', c = etype == 'cart',
        |            b = etype == 'buy'
        | | evaluate sequence_detect(t, 10m, 30m, v, c, b, uid)
        | | sort by uid asc""".stripMargin)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 5L))
    // user 1: 0 → 5 → 8 minutes, duration 8m
    assert(rows(0).getLong(4) == 8L * 60000000L)
    // user 5: v binds to the LATER view (minute 2), not minute 0
    assert(rows(1).getTimestamp(1) == ts(2))
    assert(rows(1).getLong(4) == 4L * 60000000L)
  }

  test("two-step form and same-instant steps") {
    val c2 = new Catalog(spark)
    c2.register("e2", Seq(
      (1L, ts(0), true, false), (1L, ts(0), false, true)
    ).toDF("uid", "t", "a", "b"))
    val rows = Kql.run(spark, c2,
      "e2 | evaluate sequence_detect(t, 5m, 5m, a, b, uid)").collect()
    // a at the exact anchor instant matches (inclusive as-of)
    assert(rows.length == 1 && rows(0).getLong(3) == 0L)
  }

  test("flags must be distinct, and at least two of them") {
    val e = intercept[KqlParseException](run(
      "ev | extend v = etype == 'view' " +
        "| evaluate sequence_detect(t, 5m, 5m, v, v, uid)"))
    assert(e.getMessage.contains("distinct"))
    val e2 = intercept[KqlParseException](run(
      "ev | evaluate sequence_detect(t, 5m, 5m, uid)"))
    assert(e2.getMessage.contains("at least two"))
  }
}
